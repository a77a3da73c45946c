// Native video decoder: libavformat/libavcodec -> BGR24 frames.
//
// Host-side runtime component replacing the reference's cv2.VideoCapture
// (main.py:163, main2.py:33) with a first-party decode path that feeds the
// FramePipe ring directly: open a file/RTSP URL, decode sequentially, and
// color-convert each frame into a caller-provided BGR24 buffer (the layout
// the pipeline's uint8 frame batches use). Self-contained C ABI for the
// ctypes binding in runtime/native.py; Python falls back to cv2 when this
// library (or its ffmpeg dependencies) is absent.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>

namespace {

struct VDec {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* dec = nullptr;
    SwsContext* sws = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    int stream = -1;
    int width = 0;
    int height = 0;
    double fps = 0.0;
    bool eof_sent = false;
    // geometry the cached SwsContext was built for — streams (RTSP
    // renegotiation) can change mid-decode, requiring a rebuild
    int sws_w = 0;
    int sws_h = 0;
    int sws_fmt = AV_PIX_FMT_NONE;
};

void vdec_free(VDec* v) {
    if (!v) return;
    if (v->sws) sws_freeContext(v->sws);
    if (v->frame) av_frame_free(&v->frame);
    if (v->pkt) av_packet_free(&v->pkt);
    if (v->dec) avcodec_free_context(&v->dec);
    if (v->fmt) avformat_close_input(&v->fmt);
    delete v;
}

}  // namespace

extern "C" {

void* vdec_open(const char* url) {
    VDec* v = new VDec();
    if (avformat_open_input(&v->fmt, url, nullptr, nullptr) < 0) {
        vdec_free(v);
        return nullptr;
    }
    if (avformat_find_stream_info(v->fmt, nullptr) < 0) {
        vdec_free(v);
        return nullptr;
    }
    const AVCodec* codec = nullptr;
    v->stream = av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                    &codec, 0);
    if (v->stream < 0 || !codec) {
        vdec_free(v);
        return nullptr;
    }
    AVStream* st = v->fmt->streams[v->stream];
    v->dec = avcodec_alloc_context3(codec);
    if (!v->dec ||
        avcodec_parameters_to_context(v->dec, st->codecpar) < 0 ||
        avcodec_open2(v->dec, codec, nullptr) < 0) {
        vdec_free(v);
        return nullptr;
    }
    v->width = v->dec->width;
    v->height = v->dec->height;
    AVRational fr = st->avg_frame_rate;
    v->fps = fr.den > 0 ? static_cast<double>(fr.num) / fr.den : 0.0;
    v->pkt = av_packet_alloc();
    v->frame = av_frame_alloc();
    if (!v->pkt || !v->frame || v->width <= 0 || v->height <= 0) {
        vdec_free(v);
        return nullptr;
    }
    return v;
}

int vdec_info(void* handle, int* w, int* h, double* fps) {
    VDec* v = static_cast<VDec*>(handle);
    if (!v) return -1;
    *w = v->width;
    *h = v->height;
    *fps = v->fps;
    return 0;
}

// Decode the next frame into out (BGR24, height*width*3 bytes).
// Returns 1 on frame, 0 on clean EOF, <0 on error/short buffer.
int vdec_read(void* handle, uint8_t* out, int64_t capacity) {
    VDec* v = static_cast<VDec*>(handle);
    if (!v) return -2;
    const int64_t need =
        static_cast<int64_t>(v->width) * v->height * 3;
    if (capacity < need) return -3;

    for (;;) {
        int rc = avcodec_receive_frame(v->dec, v->frame);
        if (rc == 0) {
            if (!v->sws || v->frame->width != v->sws_w ||
                v->frame->height != v->sws_h ||
                v->frame->format != v->sws_fmt) {
                if (v->sws) sws_freeContext(v->sws);
                v->sws = sws_getContext(
                    v->frame->width, v->frame->height,
                    static_cast<AVPixelFormat>(v->frame->format),
                    v->width, v->height, AV_PIX_FMT_BGR24,
                    SWS_BILINEAR, nullptr, nullptr, nullptr);
                if (!v->sws) return -4;
                v->sws_w = v->frame->width;
                v->sws_h = v->frame->height;
                v->sws_fmt = v->frame->format;
            }
            uint8_t* dst[4] = {out, nullptr, nullptr, nullptr};
            int dst_stride[4] = {v->width * 3, 0, 0, 0};
            sws_scale(v->sws, v->frame->data, v->frame->linesize, 0,
                      v->frame->height, dst, dst_stride);
            av_frame_unref(v->frame);
            return 1;
        }
        if (rc == AVERROR_EOF) return 0;
        if (rc != AVERROR(EAGAIN)) return -5;

        // decoder wants input
        if (v->eof_sent) return 0;
        rc = av_read_frame(v->fmt, v->pkt);
        if (rc < 0) {
            avcodec_send_packet(v->dec, nullptr);  // flush
            v->eof_sent = true;
            continue;
        }
        if (v->pkt->stream_index == v->stream) {
            if (avcodec_send_packet(v->dec, v->pkt) < 0) {
                av_packet_unref(v->pkt);
                return -6;
            }
        }
        av_packet_unref(v->pkt);
    }
}

void vdec_close(void* handle) { vdec_free(static_cast<VDec*>(handle)); }

}  // extern "C"

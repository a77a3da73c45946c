// Frame prefetch ring: single-producer single-consumer bounded queue.
//
// Host-side runtime component: a decode thread pushes raw frame buffers
// while the consumer drains device-batch-sized groups, overlapping video
// decode with TPU compute. This replaces the reference's ad-hoc
// ThreadPoolExecutor download/decode concurrency (SURVEY.md §2.3) with a
// fixed-memory, lock-bounded pipeline.
//
// Self-contained C++17 + pthreads; built into libsafr_native.so (Makefile).

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct FramePipe {
    explicit FramePipe(size_t slot_bytes, int n_slots)
        : slot_bytes(slot_bytes), slots(n_slots) {
        storage.resize(slot_bytes * static_cast<size_t>(n_slots));
    }

    size_t slot_bytes;
    int slots;
    std::vector<uint8_t> storage;

    std::mutex mu;
    std::condition_variable not_full;
    std::condition_variable not_empty;
    int head = 0;     // next write slot
    int tail = 0;     // next read slot
    int count = 0;    // committed frames in ring
    bool closed = false;

    uint8_t* slot_ptr(int idx) {
        return storage.data() + slot_bytes * static_cast<size_t>(idx);
    }
};

}  // namespace

extern "C" {

void* fp_create(size_t slot_bytes, int n_slots) {
    if (slot_bytes == 0 || n_slots <= 0) return nullptr;
    return new FramePipe(slot_bytes, n_slots);
}

void fp_destroy(void* q) { delete static_cast<FramePipe*>(q); }

// Producer: blocking write of one frame (copies `data`, len <= slot_bytes).
// Returns 1 on success, 0 on timeout or closed pipe.
int fp_push(void* q, const uint8_t* data, size_t len, int timeout_ms) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p || len > p->slot_bytes) return 0;
    std::unique_lock<std::mutex> lock(p->mu);
    if (!p->not_full.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                              [p] { return p->count < p->slots || p->closed; }))
        return 0;
    if (p->closed) return 0;
    std::memcpy(p->slot_ptr(p->head), data, len);
    p->head = (p->head + 1) % p->slots;
    p->count += 1;
    p->not_empty.notify_one();
    return 1;
}

// Consumer: blocking read of one frame into `out` (slot_bytes copied).
// Returns 1 on success, 0 on timeout, -1 when closed and drained.
int fp_pop(void* q, uint8_t* out, int timeout_ms) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) return 0;
    std::unique_lock<std::mutex> lock(p->mu);
    if (!p->not_empty.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                               [p] { return p->count > 0 || p->closed; }))
        return 0;
    if (p->count == 0) return -1;  // closed and drained
    std::memcpy(out, p->slot_ptr(p->tail), p->slot_bytes);
    p->tail = (p->tail + 1) % p->slots;
    p->count -= 1;
    p->not_full.notify_one();
    return 1;
}

// ---------------------------------------------------------------------------
// Zero-copy producer/consumer API. The copying fp_push/fp_pop pair costs
// four 6 MB memcpys per 1080p frame end to end (decode buffer -> bytes ->
// ring -> pop buffer -> batch row); reserve/commit and peek/release let the
// decoder write INTO the ring slot and the consumer assemble batches OUT of
// it, leaving exactly one unavoidable copy (batch assembly). SPSC contract:
// at most one outstanding reserve (producer) and one outstanding peek
// (consumer) at a time.
// ---------------------------------------------------------------------------

// Producer: pointer to the next write slot, or nullptr on timeout/closed.
// The caller decodes into it, then fp_commit() publishes the frame.
uint8_t* fp_reserve(void* q, int timeout_ms) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) return nullptr;
    std::unique_lock<std::mutex> lock(p->mu);
    if (!p->not_full.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                              [p] { return p->count < p->slots || p->closed; }))
        return nullptr;
    if (p->closed) return nullptr;
    return p->slot_ptr(p->head);
}

void fp_commit(void* q) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) return;
    std::lock_guard<std::mutex> lock(p->mu);
    p->head = (p->head + 1) % p->slots;
    p->count += 1;
    p->not_empty.notify_one();
}

// Consumer: pointer to the oldest committed frame without copying.
// rc_out: 1 = pointer valid, 0 = timeout, -1 = closed and drained.
uint8_t* fp_peek(void* q, int timeout_ms, int* rc_out) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) { if (rc_out) *rc_out = 0; return nullptr; }
    std::unique_lock<std::mutex> lock(p->mu);
    if (!p->not_empty.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                               [p] { return p->count > 0 || p->closed; })) {
        if (rc_out) *rc_out = 0;
        return nullptr;
    }
    if (p->count == 0) { if (rc_out) *rc_out = -1; return nullptr; }
    if (rc_out) *rc_out = 1;
    return p->slot_ptr(p->tail);
}

void fp_release(void* q) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) return;
    std::lock_guard<std::mutex> lock(p->mu);
    p->tail = (p->tail + 1) % p->slots;
    p->count -= 1;
    p->not_full.notify_one();
}

void fp_close(void* q) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) return;
    std::lock_guard<std::mutex> lock(p->mu);
    p->closed = true;
    p->not_empty.notify_all();
    p->not_full.notify_all();
}

int fp_size(void* q) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) return 0;
    std::lock_guard<std::mutex> lock(p->mu);
    return p->count;
}

int fp_closed(void* q) {
    auto* p = static_cast<FramePipe*>(q);
    if (!p) return 1;
    std::lock_guard<std::mutex> lock(p->mu);
    return p->closed ? 1 : 0;
}

}  // extern "C"

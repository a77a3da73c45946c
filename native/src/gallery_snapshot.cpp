// Gallery snapshot store: binary checkpoint of the [G, D] embedding matrix.
//
// The explicit checkpoint/resume subsystem the reference lacks (SURVEY.md
// §5): atomic write (tmp + rename), CRC32-verified load, fixed
// little-endian layout:
//   magic "SAFRGAL1" | int64 rows | int64 dim |
//   int64 ids[rows] | float32 data[rows*dim] | uint32 crc32(payload)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t i = 0; i < 256; i++) {
            uint32_t c = i;
            for (int k = 0; k < 8; k++)
                c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
            table[i] = c;
        }
        init = true;
    }
    crc = ~crc;
    for (size_t i = 0; i < len; i++)
        crc = table[(crc ^ buf[i]) & 0xFF] ^ (crc >> 8);
    return ~crc;
}

constexpr char kMagic[8] = {'S', 'A', 'F', 'R', 'G', 'A', 'L', '1'};

}  // namespace

extern "C" {

// Returns 0 on success, negative error codes otherwise.
int gs_write(const char* path, const float* data, int64_t rows, int64_t dim,
             const int64_t* ids) {
    std::string tmp = std::string(path) + ".tmp";
    FILE* f = std::fopen(tmp.c_str(), "wb");
    if (!f) return -1;

    uint32_t crc = 0;
    auto wr = [&](const void* buf, size_t len) -> bool {
        crc = crc32_update(crc, static_cast<const uint8_t*>(buf), len);
        return std::fwrite(buf, 1, len, f) == len;
    };

    bool ok = std::fwrite(kMagic, 1, 8, f) == 8
        && wr(&rows, sizeof(rows)) && wr(&dim, sizeof(dim))
        && wr(ids, sizeof(int64_t) * static_cast<size_t>(rows))
        && wr(data, sizeof(float) * static_cast<size_t>(rows * dim))
        && std::fwrite(&crc, 1, sizeof(crc), f) == sizeof(crc);
    ok = (std::fclose(f) == 0) && ok;
    if (!ok) { std::remove(tmp.c_str()); return -2; }
    if (std::rename(tmp.c_str(), path) != 0) {
        std::remove(tmp.c_str());
        return -3;
    }
    return 0;
}

// Reads header; returns 0 on success and fills rows/dim.
int gs_read_header(const char* path, int64_t* rows, int64_t* dim) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    char magic[8];
    bool ok = std::fread(magic, 1, 8, f) == 8
        && std::memcmp(magic, kMagic, 8) == 0
        && std::fread(rows, 1, sizeof(int64_t), f) == sizeof(int64_t)
        && std::fread(dim, 1, sizeof(int64_t), f) == sizeof(int64_t);
    std::fclose(f);
    return ok ? 0 : -2;
}

// Reads payload into caller-allocated buffers sized for exactly
// (expect_rows, expect_dim); verifies CRC. The caller learned the shape
// from gs_read_header — a concurrent rewrite between the two calls must
// fail cleanly (-4), never overflow the buffers.
// Returns 0 ok, -3 on CRC mismatch, -4 on shape mismatch.
int gs_read(const char* path, float* data_out, int64_t* ids_out,
            int64_t expect_rows, int64_t expect_dim) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    char magic[8];
    int64_t rows = 0, dim = 0;
    uint32_t crc = 0;
    bool ok = std::fread(magic, 1, 8, f) == 8
        && std::memcmp(magic, kMagic, 8) == 0;

    auto rd = [&](void* buf, size_t len) -> bool {
        if (std::fread(buf, 1, len, f) != len) return false;
        crc = crc32_update(crc, static_cast<uint8_t*>(buf), len);
        return true;
    };
    ok = ok && rd(&rows, sizeof(rows)) && rd(&dim, sizeof(dim));
    if (ok && (rows != expect_rows || dim != expect_dim)) {
        std::fclose(f);
        return -4;
    }
    ok = ok && rd(ids_out, sizeof(int64_t) * static_cast<size_t>(rows))
        && rd(data_out, sizeof(float) * static_cast<size_t>(rows * dim));
    uint32_t stored = 0;
    ok = ok && std::fread(&stored, 1, sizeof(stored), f) == sizeof(stored);
    std::fclose(f);
    if (!ok) return -2;
    return (stored == crc) ? 0 : -3;
}

}  // extern "C"

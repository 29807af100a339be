// Native burst ingestion: the host-side data-loader hot path.
//
// The reference's ingestion (rawpy/libraw decode + per-CFA-channel black-level
// subtraction, normalization and white-balance gains, utils_dng.py:150-160)
// is a pure-Python loop over strided views. This library provides the same
// normalization plus MIPI RAW10/RAW12 unpacking as multithreaded C++,
// exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread burst_loader.cpp -o libburst.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

void normalize_rows(const uint16_t* in, float* out, int64_t h, int64_t w,
                    const int* cfa, const float* black, const float* gain,
                    int64_t row0, int64_t row1) {
    // out[y, x] = (in[y, x] - black[c]) * gain[c],  c = cfa[(y%2)*2 + (x%2)]
    for (int64_t y = row0; y < row1; ++y) {
        const uint16_t* src = in + y * w;
        float* dst = out + y * w;
        const int cy = static_cast<int>(y & 1) * 2;
        const float b0 = black[cfa[cy + 0]];
        const float g0 = gain[cfa[cy + 0]];
        const float b1 = black[cfa[cy + 1]];
        const float g1 = gain[cfa[cy + 1]];
        int64_t x = 0;
        for (; x + 1 < w; x += 2) {
            dst[x] = (static_cast<float>(src[x]) - b0) * g0;
            dst[x + 1] = (static_cast<float>(src[x + 1]) - b1) * g1;
        }
        if (x < w) dst[x] = (static_cast<float>(src[x]) - b0) * g0;
    }
}

template <typename Fn>
void parallel_rows(int64_t h, int threads, Fn&& fn) {
    threads = std::max(1, std::min<int>(threads,
                       static_cast<int>(std::thread::hardware_concurrency())));
    if (threads <= 1 || h < 64) {
        fn(0, h);
        return;
    }
    std::vector<std::thread> pool;
    int64_t chunk = (h + threads - 1) / threads;
    for (int t = 0; t < threads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = std::min<int64_t>(h, r0 + chunk);
        if (r0 >= r1) break;
        pool.emplace_back([&fn, r0, r1] { fn(r0, r1); });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Normalize a stack of raw frames: uint16 (n, h, w) -> float32 (n, h, w).
// cfa: 4 ints (row-major 2x2 channel ids); black/gain: per-channel (>=3).
// gain[c] should be  wb[c]/wb[1] / (white_level - black[c])  precomputed by
// the caller (matching reference utils_dng.py:150-160 exactly).
void hmsr_normalize_burst(const uint16_t* in, float* out, int64_t n,
                          int64_t h, int64_t w, const int* cfa,
                          const float* black, const float* gain, int threads) {
    for (int64_t f = 0; f < n; ++f) {
        const uint16_t* src = in + f * h * w;
        float* dst = out + f * h * w;
        parallel_rows(h, threads, [&](int64_t r0, int64_t r1) {
            normalize_rows(src, dst, h, w, cfa, black, gain, r0, r1);
        });
    }
}

// Unpack MIPI RAW10: every 5 bytes -> 4 pixels (10 bit).
void hmsr_unpack_raw10(const uint8_t* in, uint16_t* out, int64_t n_groups) {
    for (int64_t g = 0; g < n_groups; ++g) {
        const uint8_t* p = in + g * 5;
        uint16_t* q = out + g * 4;
        const uint8_t low = p[4];
        q[0] = static_cast<uint16_t>((p[0] << 2) | ((low >> 0) & 0x3));
        q[1] = static_cast<uint16_t>((p[1] << 2) | ((low >> 2) & 0x3));
        q[2] = static_cast<uint16_t>((p[2] << 2) | ((low >> 4) & 0x3));
        q[3] = static_cast<uint16_t>((p[3] << 2) | ((low >> 6) & 0x3));
    }
}

// Unpack MIPI RAW12: every 3 bytes -> 2 pixels (12 bit).
void hmsr_unpack_raw12(const uint8_t* in, uint16_t* out, int64_t n_groups) {
    for (int64_t g = 0; g < n_groups; ++g) {
        const uint8_t* p = in + g * 3;
        uint16_t* q = out + g * 2;
        const uint8_t low = p[2];
        q[0] = static_cast<uint16_t>((p[0] << 4) | (low & 0xF));
        q[1] = static_cast<uint16_t>((p[1] << 4) | (low >> 4));
    }
}

}  // extern "C"

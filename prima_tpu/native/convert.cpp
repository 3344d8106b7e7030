// Native GGUF block converter: raw quant blocks -> device uniform layout.
//
// The load-time hot path (the role ggml-quants.c's dequant/repack routines
// play in the reference, and ggml-aarch64.c's repacked layouts): decodes
// Q4_K / Q6_K / Q8_0 / Q4_0 blocks and emits the TPU uniform layout
// (qs + premultiplied f32 scales/mins), optionally already column-permuted
// for the Pallas kernel (kperm: p = t*S + s). Multithreaded over rows with
// plain std::thread; exposed through a C ABI for ctypes.
//
// Bit-exactness contract: scale products follow the same rounding order as
// the numpy reference (device_format.py) which follows ggml's C
// (d * sc as float, dmin * m as float).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// f16 (IEEE binary16, little-endian) -> f32
inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(mant & 0x400)) { mant <<= 1; exp--; }
            mant &= 0x3FF;
            bits = sign | (exp << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, sizeof(out));
    return out;
}

inline uint16_t rd16(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}

// Q4_K scale/min unpack (get_scale_min_k4, ggml-quants.c)
inline void scale_min_k4(const uint8_t* q, int j, uint8_t* sc, uint8_t* m) {
    if (j < 4) {
        *sc = q[j] & 63;
        *m = q[j + 4] & 63;
    } else {
        *sc = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
    }
}

template <typename F>
void parallel_rows(int64_t rows, F fn) {
    unsigned n = std::thread::hardware_concurrency();
    if (n == 0) n = 4;
    if (n > 32) n = 32;
    if (rows < (int64_t)n * 4) { fn(0, rows); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (rows + n - 1) / n;
    for (unsigned i = 0; i < n; i++) {
        int64_t r0 = i * chunk, r1 = std::min<int64_t>(rows, r0 + chunk);
        if (r0 >= r1) break;
        ts.emplace_back(fn, r0, r1);
    }
    for (auto& t : ts) t.join();
}

// natural q value of column c in a Q4_K row (raw = row base)
inline int q4k_val(const uint8_t* raw, int64_t c) {
    const uint8_t* b = raw + (c >> 8) * 144;
    int wc = c & 255;
    const uint8_t byte = b[16 + (wc >> 6) * 32 + (wc & 31)];
    return (wc & 32) ? (byte >> 4) : (byte & 0x0F);
}

inline int q4_0_val(const uint8_t* raw, int64_t c) {
    const uint8_t* b = raw + (c >> 5) * 18;
    int wc = c & 31;
    const uint8_t byte = b[2 + (wc & 15)];
    return (wc & 16) ? (byte >> 4) : (byte & 0x0F);
}

inline int q6k_val(const uint8_t* raw, int64_t c) {
    const uint8_t* b = raw + (c >> 8) * 210;
    int wc = c & 255;
    int h = wc >> 7;         // half: 0 or 1
    int j = wc & 127;        // 0..127 within half
    int region = j >> 5;     // 0..3 (q1..q4)
    int off = j & 31;
    const uint8_t* ql = b + h * 64;
    const uint8_t* qh = b + 128 + h * 32;
    int lo, hi;
    switch (region) {
        case 0: lo = ql[off] & 0x0F;      hi = (qh[off] >> 0) & 3; break;
        case 1: lo = ql[32 + off] & 0x0F; hi = (qh[off] >> 2) & 3; break;
        case 2: lo = ql[off] >> 4;        hi = (qh[off] >> 4) & 3; break;
        default: lo = ql[32 + off] >> 4;  hi = (qh[off] >> 6) & 3; break;
    }
    return (lo | (hi << 4)) - 32;
}

}  // namespace

extern "C" {

// Q4_K: raw (rows, k/256*144) -> compact grouped layout: qs nib4 (rows, k/2),
// 6-bit scale/min CODES int8 (rows, k/32), superblock bases d/dmin f32
// (rows, k/256). The effective scale d*code is multiplied on device (f32,
// the reference's rounding).
// kperm: 0 = natural order; 1 = kernel order p = t*S + sigma(s) with
// sigma(s) = (s % 8)*G + s/8 (G = k/256), codes stored in sigma order.
// packed (requires kperm): emit the native 4.5-bit footprint instead —
// scales u8 = sc | (mn>>4)<<6; mins u8 (rows, S/2) pairing lo4(s) with
// lo4(s + S/2); d i32 = raw f16 bits (dmin << 16 | d).
void prima_conv_q4k(const uint8_t* raw, int64_t rows, int64_t k,
                    uint8_t* qs, int8_t* scales, int8_t* mins,
                    float* d_out, float* dmin_out, int kperm, int packed) {
    const int64_t row_bytes = (k / 256) * 144;
    const int64_t S = k / 32;
    const int64_t G = k / 256;
    const int64_t half = k / 2;
    parallel_rows(rows, [&](int64_t r0, int64_t r1) {
        std::vector<uint8_t> sc_tmp(S), mn_tmp(S);
        for (int64_t r = r0; r < r1; r++) {
            const uint8_t* rb = raw + r * row_bytes;
            int8_t* sc_out = scales + r * S;
            int8_t* mn_out = mins + r * (packed ? S / 2 : S);
            for (int64_t blk = 0; blk < G; blk++) {
                const uint8_t* b = rb + blk * 144;
                if (packed) {
                    uint32_t bits = (uint32_t)rd16(b + 2) << 16 | rd16(b);
                    ((uint32_t*)d_out)[r * G + blk] = bits;
                } else {
                    d_out[r * G + blk] = f16_to_f32(rd16(b));
                    dmin_out[r * G + blk] = f16_to_f32(rd16(b + 2));
                }
                for (int j = 0; j < 8; j++) {
                    uint8_t s8, m8;
                    scale_min_k4(b + 4, j, &s8, &m8);
                    int64_t pos = kperm ? (int64_t)j * G + blk : blk * 8 + j;
                    if (packed) {
                        sc_tmp[pos] = s8;
                        mn_tmp[pos] = m8;
                    } else {
                        sc_out[pos] = (int8_t)s8;
                        mn_out[pos] = (int8_t)m8;
                    }
                }
            }
            if (packed) {
                for (int64_t j = 0; j < S; j++)
                    sc_out[j] = (int8_t)(sc_tmp[j] | ((mn_tmp[j] >> 4) << 6));
                for (int64_t j = 0; j < S / 2; j++)
                    mn_out[j] = (int8_t)((mn_tmp[j] & 0xF)
                                         | ((mn_tmp[j + S / 2] & 0xF) << 4));
            }
            uint8_t* q_out = qs + r * half;
            for (int64_t j = 0; j < half; j++) {
                int64_t p1 = j, p2 = j + half;
                int64_t c1, c2;
                if (kperm) {  // p = t*S + (s%8)*G + s/8  ->  c = s*32 + t
                    int64_t r1p = p1 % S, r2p = p2 % S;
                    c1 = ((r1p % G) * 8 + r1p / G) * 32 + (p1 / S);
                    c2 = ((r2p % G) * 8 + r2p / G) * 32 + (p2 / S);
                } else {
                    c1 = p1; c2 = p2;
                }
                q_out[j] = (uint8_t)(q4k_val(rb, c1) | (q4k_val(rb, c2) << 4));
            }
        }
    });
}

// Q4_0: raw (rows, k/32*18) -> qs nib4 (rows, k/2), scales (rows, k/32)
void prima_conv_q4_0(const uint8_t* raw, int64_t rows, int64_t k,
                     uint8_t* qs, float* scales, int kperm) {
    const int64_t row_bytes = (k / 32) * 18;
    const int64_t S = k / 32;
    const int64_t half = k / 2;
    parallel_rows(rows, [&](int64_t r0, int64_t r1) {
        for (int64_t r = r0; r < r1; r++) {
            const uint8_t* rb = raw + r * row_bytes;
            float* sc_out = scales + r * S;
            for (int64_t blk = 0; blk < S; blk++)
                sc_out[blk] = f16_to_f32(rd16(rb + blk * 18));
            uint8_t* q_out = qs + r * half;
            for (int64_t j = 0; j < half; j++) {
                int64_t p1 = j, p2 = j + half;
                int64_t c1, c2;
                if (kperm) {
                    c1 = (p1 % S) * 32 + (p1 / S);
                    c2 = (p2 % S) * 32 + (p2 / S);
                } else {
                    c1 = p1; c2 = p2;
                }
                q_out[j] = (uint8_t)(q4_0_val(rb, c1) | (q4_0_val(rb, c2) << 4));
            }
        }
    });
}

// Q6_K: raw (rows, k/256*210) -> compact grouped layout: qs int8 (rows, k),
// int8 scale codes (rows, k/16) and superblock base d f32 (rows, k/256);
// sigma(s) = (s % 16)*G + s/16 when kperm.
void prima_conv_q6k(const uint8_t* raw, int64_t rows, int64_t k,
                    int8_t* qs, int8_t* scales, float* d_out, int kperm) {
    const int64_t row_bytes = (k / 256) * 210;
    const int64_t S = k / 16;
    const int64_t G = k / 256;
    parallel_rows(rows, [&](int64_t r0, int64_t r1) {
        for (int64_t r = r0; r < r1; r++) {
            const uint8_t* rb = raw + r * row_bytes;
            int8_t* sc_out = scales + r * S;
            for (int64_t blk = 0; blk < G; blk++) {
                const uint8_t* b = rb + blk * 210;
                d_out[r * G + blk] = f16_to_f32(rd16(b + 208));
                const int8_t* s8 = (const int8_t*)(b + 192);
                for (int j = 0; j < 16; j++) {
                    int64_t pos = kperm ? (int64_t)j * G + blk : blk * 16 + j;
                    sc_out[pos] = s8[j];
                }
            }
            int8_t* q_out = qs + r * k;
            for (int64_t p = 0; p < k; p++) {
                int64_t c = p;
                if (kperm) {
                    int64_t rp = p % S;
                    c = ((rp % G) * 16 + rp / G) * 16 + (p / S);
                }
                q_out[p] = (int8_t)q6k_val(rb, c);
            }
        }
    });
}

// Q8_0: raw (rows, k/32*34) -> qs int8 (rows, k), scales (rows, k/32)
void prima_conv_q8_0(const uint8_t* raw, int64_t rows, int64_t k,
                     int8_t* qs, float* scales, int kperm) {
    const int64_t row_bytes = (k / 32) * 34;
    const int64_t S = k / 32;
    parallel_rows(rows, [&](int64_t r0, int64_t r1) {
        for (int64_t r = r0; r < r1; r++) {
            const uint8_t* rb = raw + r * row_bytes;
            float* sc_out = scales + r * S;
            for (int64_t blk = 0; blk < S; blk++)
                sc_out[blk] = f16_to_f32(rd16(rb + blk * 34));
            int8_t* q_out = qs + r * k;
            for (int64_t p = 0; p < k; p++) {
                int64_t c = kperm ? (p % S) * 32 + (p / S) : p;
                q_out[p] = (int8_t)rb[(c >> 5) * 34 + 2 + (c & 31)];
            }
        }
    });
}

}  // extern "C"

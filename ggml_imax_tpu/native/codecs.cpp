// Native block-quantization codecs — the C++ equivalent of the reference's
// src/ggml-quants.c hot loops (quantize_row_* / dequantize_row_*,
// /root/reference/src/ggml-quants.c:260-1100 for the basic formats and the
// K-super-block unpack loops), used by the loader/saver on the host side.
// Bit-exact with the numpy codecs in ../quant/codecs.py, which are golden-
// tested against the compiled reference (tests/fixtures/golden_quant.npz).
//
// Build: g++ -O3 -fopenmp -shared -fPIC (see build.py). Plain C ABI for
// ctypes. All entry points take block counts; rows are blocks*32 or *256.

#include <cstdint>
#include <cstring>
#include <cmath>

#if defined(_OPENMP)
#include <omp.h>
#endif

#define API extern "C" __attribute__((visibility("default")))

// ---- fp16 <-> fp32 (IEEE, round-to-nearest-even) — ggml-impl.h:402-579 ----

static inline uint16_t f32_to_f16(float f) {
    uint32_t x; std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t  exp  = (int32_t)((x >> 23) & 0xff) - 127 + 15;
    uint32_t man  = x & 0x7fffffu;
    if (((x >> 23) & 0xff) == 0xff) {                 // inf/nan
        return (uint16_t)(sign | 0x7c00u | (man ? 0x200u | (man >> 13) : 0));
    }
    if (exp >= 0x1f) return (uint16_t)(sign | 0x7c00u);   // overflow -> inf
    if (exp <= 0) {                                        // subnormal/zero
        if (exp < -10) return (uint16_t)sign;
        man |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t out   = man >> shift;
        uint32_t rem   = man & ((1u << shift) - 1);
        uint32_t half  = 1u << (shift - 1);
        if (rem > half || (rem == half && (out & 1))) out++;  // RNE
        return (uint16_t)(sign | out);
    }
    uint16_t out = (uint16_t)(sign | ((uint32_t)exp << 10) | (man >> 13));
    uint32_t rem = man & 0x1fffu;
    if (rem > 0x1000u || (rem == 0x1000u && (out & 1))) out++;
    return out;
}

static inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp  = (h >> 10) & 0x1f;
    uint32_t man  = h & 0x3ffu;
    uint32_t x;
    if (exp == 0) {
        if (man == 0) { x = sign; }
        else {
            exp = 127 - 15 + 1;
            while (!(man & 0x400u)) { man <<= 1; exp--; }
            man &= 0x3ffu;
            x = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 0x1f) {
        x = sign | 0x7f800000u | (man << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f; std::memcpy(&f, &x, 4);
    return f;
}

static inline int nearest_int(float f) {           // ggml nearest_int
    // round half to even via bit trick used by the reference
    float v = f + 12582912.0f;                      // 1.5 * 2^23
    int32_t i; std::memcpy(&i, &v, 4);
    return (i & 0x007fffff) - 0x00400000;
}

#define QK 32
#define QK_K 256

// ---------------- Q4_0 ----------------
API void q4_0_quantize(const float* x, uint8_t* out, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const float* xb = x + i * QK;
        uint8_t* o = out + i * 18;
        float amax = 0.0f, max = 0.0f;
        for (int j = 0; j < QK; ++j) {
            float v = xb[j];
            if (std::fabs(v) > amax) { amax = std::fabs(v); max = v; }
        }
        float d = max / -8.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d);
        std::memcpy(o, &dh, 2);
        for (int j = 0; j < QK / 2; ++j) {
            int lo = (int)(xb[j] * id + 8.5f);            // trunc == floor, v>=0.5
            int hi = (int)(xb[j + QK / 2] * id + 8.5f);
            if (lo > 15) lo = 15;
            if (hi > 15) hi = 15;
            o[2 + j] = (uint8_t)(lo | (hi << 4));
        }
    }
}

API void q4_0_dequantize(const uint8_t* raw, float* y, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 18;
        uint16_t dh; std::memcpy(&dh, b, 2);
        float d = f16_to_f32(dh);
        float* o = y + i * QK;
        for (int j = 0; j < QK / 2; ++j) {
            o[j]          = ((int)(b[2 + j] & 0xF) - 8) * d;
            o[j + QK / 2] = ((int)(b[2 + j] >> 4)  - 8) * d;
        }
    }
}

// ---------------- Q4_1 ----------------
API void q4_1_quantize(const float* x, uint8_t* out, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const float* xb = x + i * QK;
        uint8_t* o = out + i * 20;
        float mn = xb[0], mx = xb[0];
        for (int j = 1; j < QK; ++j) {
            if (xb[j] < mn) mn = xb[j];
            if (xb[j] > mx) mx = xb[j];
        }
        float d = (mx - mn) / 15.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
        std::memcpy(o, &dh, 2);
        std::memcpy(o + 2, &mh, 2);
        for (int j = 0; j < QK / 2; ++j) {
            int lo = (int)((xb[j] - mn) * id + 0.5f);
            int hi = (int)((xb[j + QK / 2] - mn) * id + 0.5f);
            if (lo > 15) lo = 15;
            if (hi > 15) hi = 15;
            o[4 + j] = (uint8_t)(lo | (hi << 4));
        }
    }
}

API void q4_1_dequantize(const uint8_t* raw, float* y, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 20;
        uint16_t dh, mh;
        std::memcpy(&dh, b, 2); std::memcpy(&mh, b + 2, 2);
        float d = f16_to_f32(dh), m = f16_to_f32(mh);
        float* o = y + i * QK;
        for (int j = 0; j < QK / 2; ++j) {
            o[j]          = (b[4 + j] & 0xF) * d + m;
            o[j + QK / 2] = (b[4 + j] >> 4)  * d + m;
        }
    }
}

// ---------------- Q5_0 / Q5_1 ----------------
static inline void pack_q5(const int* xi, uint8_t* qs, uint32_t* qh) {
    *qh = 0;
    for (int j = 0; j < QK / 2; ++j) {
        int lo = xi[j], hi = xi[j + QK / 2];
        qs[j] = (uint8_t)((lo & 0xF) | ((hi & 0xF) << 4));
        *qh |= ((uint32_t)((lo & 0x10) >> 4)) << j;
        *qh |= ((uint32_t)((hi & 0x10) >> 4)) << (j + QK / 2);
    }
}

API void q5_0_quantize(const float* x, uint8_t* out, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const float* xb = x + i * QK;
        uint8_t* o = out + i * 22;
        float amax = 0.0f, max = 0.0f;
        for (int j = 0; j < QK; ++j) {
            float v = xb[j];
            if (std::fabs(v) > amax) { amax = std::fabs(v); max = v; }
        }
        float d = max / -16.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d);
        std::memcpy(o, &dh, 2);
        int xi[QK];
        for (int j = 0; j < QK; ++j) {
            int v = (int)(xb[j] * id + 16.5f);
            xi[j] = v > 31 ? 31 : v;
        }
        uint32_t qh;
        pack_q5(xi, o + 6, &qh);
        std::memcpy(o + 2, &qh, 4);
    }
}

API void q5_0_dequantize(const uint8_t* raw, float* y, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 22;
        uint16_t dh; std::memcpy(&dh, b, 2);
        uint32_t qh; std::memcpy(&qh, b + 2, 4);
        float d = f16_to_f32(dh);
        float* o = y + i * QK;
        for (int j = 0; j < QK / 2; ++j) {
            int xh0 = ((qh >> j) << 4) & 0x10;
            int xh1 = (qh >> (j + 12)) & 0x10;
            o[j]          = (((b[6 + j] & 0xF) | xh0) - 16) * d;
            o[j + QK / 2] = (((b[6 + j] >> 4)  | xh1) - 16) * d;
        }
    }
}

API void q5_1_quantize(const float* x, uint8_t* out, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const float* xb = x + i * QK;
        uint8_t* o = out + i * 24;
        float mn = xb[0], mx = xb[0];
        for (int j = 1; j < QK; ++j) {
            if (xb[j] < mn) mn = xb[j];
            if (xb[j] > mx) mx = xb[j];
        }
        float d = (mx - mn) / 31.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
        std::memcpy(o, &dh, 2);
        std::memcpy(o + 2, &mh, 2);
        int xi[QK];
        for (int j = 0; j < QK; ++j) {
            xi[j] = (int)((xb[j] - mn) * id + 0.5f);
        }
        uint32_t qh;
        pack_q5(xi, o + 8, &qh);
        std::memcpy(o + 4, &qh, 4);
    }
}

API void q5_1_dequantize(const uint8_t* raw, float* y, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 24;
        uint16_t dh, mh;
        std::memcpy(&dh, b, 2); std::memcpy(&mh, b + 2, 2);
        uint32_t qh; std::memcpy(&qh, b + 4, 4);
        float d = f16_to_f32(dh), m = f16_to_f32(mh);
        float* o = y + i * QK;
        for (int j = 0; j < QK / 2; ++j) {
            int xh0 = ((qh >> j) << 4) & 0x10;
            int xh1 = (qh >> (j + 12)) & 0x10;
            o[j]          = ((b[8 + j] & 0xF) | xh0) * d + m;
            o[j + QK / 2] = ((b[8 + j] >> 4)  | xh1) * d + m;
        }
    }
}

// ---------------- Q8_0 / Q8_1 ----------------
API void q8_0_quantize(const float* x, uint8_t* out, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const float* xb = x + i * QK;
        uint8_t* o = out + i * 34;
        float amax = 0.0f;
        for (int j = 0; j < QK; ++j) {
            float v = std::fabs(xb[j]);
            if (v > amax) amax = v;
        }
        float d = amax / 127.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d);
        std::memcpy(o, &dh, 2);
        for (int j = 0; j < QK; ++j) {
            ((int8_t*)(o + 2))[j] = (int8_t)std::roundf(xb[j] * id);
        }
    }
}

API void q8_0_dequantize(const uint8_t* raw, float* y, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 34;
        uint16_t dh; std::memcpy(&dh, b, 2);
        float d = f16_to_f32(dh);
        for (int j = 0; j < QK; ++j) {
            y[i * QK + j] = ((const int8_t*)(b + 2))[j] * d;
        }
    }
}

API void q8_1_quantize(const float* x, uint8_t* out, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const float* xb = x + i * QK;
        uint8_t* o = out + i * 36;
        float amax = 0.0f;
        for (int j = 0; j < QK; ++j) {
            float v = std::fabs(xb[j]);
            if (v > amax) amax = v;
        }
        float d = amax / 127.0f;
        float id = d ? 1.0f / d : 0.0f;
        int sum = 0;
        int8_t* q = (int8_t*)(o + 4);
        for (int j = 0; j < QK; ++j) {
            q[j] = (int8_t)std::roundf(xb[j] * id);
            sum += q[j];
        }
        uint16_t dh = f32_to_f16(d);
        uint16_t sh = f32_to_f16(d * (float)sum);
        std::memcpy(o, &dh, 2);
        std::memcpy(o + 2, &sh, 2);
    }
}

API void q8_1_dequantize(const uint8_t* raw, float* y, int64_t nb) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * 36;
        uint16_t dh; std::memcpy(&dh, b, 2);
        float d = f16_to_f32(dh);
        for (int j = 0; j < QK; ++j) {
            y[i * QK + j] = ((const int8_t*)(b + 4))[j] * d;
        }
    }
}

// ---------------- K-quant dequantizers (super-blocks of 256) ----------------
// layouts: ggml-common.h:214-321; loops mirror dequantize_row_qX_K
// (ggml-quants.c) which our numpy codecs reproduce bit-exactly.

static inline void get_scale_min_k4(int j, const uint8_t* q,
                                    uint8_t* d, uint8_t* m) {
    if (j < 4) { *d = q[j] & 63; *m = q[j + 4] & 63; }
    else {
        *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
        *m = (q[j + 4] >> 4)  | ((q[j - 0] >> 6) << 4);
    }
}

API void q2_K_dequantize(const uint8_t* raw, float* y, int64_t nb) {
    const int bs = 2 + 2 + QK_K / 16 + QK_K / 4;   // 84
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * bs;
        const uint8_t* scales = b;
        const uint8_t* qs = b + QK_K / 16;
        uint16_t dh, mh;
        std::memcpy(&dh, b + QK_K / 16 + QK_K / 4, 2);
        std::memcpy(&mh, b + QK_K / 16 + QK_K / 4 + 2, 2);
        float d = f16_to_f32(dh), dmin = f16_to_f32(mh);
        float* o = y + i * QK_K;
        int is = 0;
        const uint8_t* q = qs;
        for (int n = 0; n < QK_K; n += 128) {
            int shift = 0;
            for (int j = 0; j < 4; ++j) {
                uint8_t sc = scales[is++];
                float dl = d * (sc & 0xF), ml = dmin * (sc >> 4);
                for (int l = 0; l < 16; ++l) *o++ = dl * ((q[l] >> shift) & 3) - ml;
                sc = scales[is++];
                dl = d * (sc & 0xF); ml = dmin * (sc >> 4);
                for (int l = 16; l < 32; ++l) *o++ = dl * ((q[l] >> shift) & 3) - ml;
                shift += 2;
            }
            q += 32;
        }
    }
}

API void q3_K_dequantize(const uint8_t* raw, float* y, int64_t nb) {
    const int bs = QK_K / 8 + QK_K / 4 + 12 + 2;   // 110
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * bs;
        const uint8_t* hm = b;
        const uint8_t* qs = b + QK_K / 8;
        const uint8_t* sc = b + QK_K / 8 + QK_K / 4;
        uint16_t dh; std::memcpy(&dh, b + bs - 2, 2);
        float d_all = f16_to_f32(dh);
        // unpack 16 6-bit scales (ggml-quants.c dequantize_row_q3_K)
        int8_t scales[16];
        for (int j = 0; j < 16; ++j) {
            int lo = j < 8 ? (sc[j] & 0xF) : (sc[j - 8] >> 4);
            int hi = (sc[8 + (j % 4)] >> (2 * (j / 4))) & 3;
            scales[j] = (int8_t)((lo | (hi << 4)) - 32);
        }
        float* o = y + i * QK_K;
        uint8_t m = 1;
        int is = 0;
        const uint8_t* q = qs;
        for (int n = 0; n < QK_K; n += 128) {
            int shift = 0;
            for (int j = 0; j < 4; ++j) {
                float dl = d_all * scales[is++];
                for (int l = 0; l < 16; ++l)
                    *o++ = dl * (((q[l] >> shift) & 3) - ((hm[l] & m) ? 0 : 4));
                dl = d_all * scales[is++];
                for (int l = 16; l < 32; ++l)
                    *o++ = dl * (((q[l] >> shift) & 3) - ((hm[l] & m) ? 0 : 4));
                shift += 2;
                m <<= 1;
            }
            q += 32;
        }
    }
}

API void q4_K_dequantize(const uint8_t* raw, float* y, int64_t nb) {
    const int bs = 2 + 2 + 12 + QK_K / 2;          // 144
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * bs;
        uint16_t dh, mh;
        std::memcpy(&dh, b, 2); std::memcpy(&mh, b + 2, 2);
        float d = f16_to_f32(dh), dmin = f16_to_f32(mh);
        const uint8_t* scales = b + 4;
        const uint8_t* q = b + 16;
        float* o = y + i * QK_K;
        int is = 0;
        for (int j = 0; j < QK_K; j += 64) {
            uint8_t sd, sm;
            get_scale_min_k4(is + 0, scales, &sd, &sm);
            float d1 = d * sd, m1 = dmin * sm;
            get_scale_min_k4(is + 1, scales, &sd, &sm);
            float d2 = d * sd, m2 = dmin * sm;
            for (int l = 0; l < 32; ++l) *o++ = d1 * (q[l] & 0xF) - m1;
            for (int l = 0; l < 32; ++l) *o++ = d2 * (q[l] >> 4)  - m2;
            q += 32;
            is += 2;
        }
    }
}

API void q5_K_dequantize(const uint8_t* raw, float* y, int64_t nb) {
    const int bs = 2 + 2 + 12 + QK_K / 8 + QK_K / 2;  // 176
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * bs;
        uint16_t dh, mh;
        std::memcpy(&dh, b, 2); std::memcpy(&mh, b + 2, 2);
        float d = f16_to_f32(dh), dmin = f16_to_f32(mh);
        const uint8_t* scales = b + 4;
        const uint8_t* qh = b + 16;
        const uint8_t* ql = b + 16 + QK_K / 8;
        float* o = y + i * QK_K;
        int is = 0;
        uint8_t u1 = 1, u2 = 2;
        for (int j = 0; j < QK_K; j += 64) {
            uint8_t sd, sm;
            get_scale_min_k4(is + 0, scales, &sd, &sm);
            float d1 = d * sd, m1 = dmin * sm;
            get_scale_min_k4(is + 1, scales, &sd, &sm);
            float d2 = d * sd, m2 = dmin * sm;
            for (int l = 0; l < 32; ++l)
                *o++ = d1 * ((ql[l] & 0xF) + ((qh[l] & u1) ? 16 : 0)) - m1;
            for (int l = 0; l < 32; ++l)
                *o++ = d2 * ((ql[l] >> 4)  + ((qh[l] & u2) ? 16 : 0)) - m2;
            ql += 32;
            is += 2;
            u1 <<= 2; u2 <<= 2;
        }
    }
}

API void q6_K_dequantize(const uint8_t* raw, float* y, int64_t nb) {
    const int bs = QK_K / 2 + QK_K / 4 + QK_K / 16 + 2;  // 210
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * bs;
        const uint8_t* ql = b;
        const uint8_t* qh = b + QK_K / 2;
        const int8_t* sc = (const int8_t*)(b + QK_K / 2 + QK_K / 4);
        uint16_t dh; std::memcpy(&dh, b + bs - 2, 2);
        float d = f16_to_f32(dh);
        float* o = y + i * QK_K;
        for (int n = 0; n < QK_K; n += 128) {
            for (int l = 0; l < 32; ++l) {
                int is = l / 16;
                int8_t q1 = (int8_t)((ql[l +  0] & 0xF) | (((qh[l] >> 0) & 3) << 4)) - 32;
                int8_t q2 = (int8_t)((ql[l + 32] & 0xF) | (((qh[l] >> 2) & 3) << 4)) - 32;
                int8_t q3 = (int8_t)((ql[l +  0] >> 4)  | (((qh[l] >> 4) & 3) << 4)) - 32;
                int8_t q4 = (int8_t)((ql[l + 32] >> 4)  | (((qh[l] >> 6) & 3) << 4)) - 32;
                o[l +  0] = d * sc[is + 0] * q1;
                o[l + 32] = d * sc[is + 2] * q2;
                o[l + 64] = d * sc[is + 4] * q3;
                o[l + 96] = d * sc[is + 6] * q4;
            }
            o += 128;
            ql += 64;
            qh += 32;
            sc += 8;
        }
    }
}

API void q8_K_dequantize(const uint8_t* raw, float* y, int64_t nb) {
    const int bs = 4 + QK_K + QK_K / 16 * 2;       // 292
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const uint8_t* b = raw + i * bs;
        float d; std::memcpy(&d, b, 4);
        const int8_t* q = (const int8_t*)(b + 4);
        for (int j = 0; j < QK_K; ++j) y[i * QK_K + j] = q[j] * d;
    }
}

// fp16 row conversions (ggml-impl.h table path analog)
API void f16_row_to_f32(const uint16_t* x, float* y, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) y[i] = f16_to_f32(x[i]);
}

API void f32_row_to_f16(const float* x, uint16_t* y, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) y[i] = f32_to_f16(x[i]);
}

API int codecs_abi_version(void) { return 1; }

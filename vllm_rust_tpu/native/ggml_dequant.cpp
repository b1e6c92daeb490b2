// Native GGML block dequantization.
//
// TPU-native counterpart of the loading fast path: the reference keeps
// GGUF decode in Rust (quantization/gguf/mod.rs) for the same reason —
// Python-side dequant of multi-GB checkpoints dominates model load time.
// Compiled on demand by vllm_rust_tpu/native/__init__.py (g++ -O3) and
// called through ctypes; the vectorized numpy implementations in
// quantization/gguf_file.py remain the portable fallback and the
// correctness anchor for these kernels.
//
// All layouts follow the public ggml spec; block structs are parsed
// manually from bytes (no ggml headers) so the file stands alone.

#include <cstdint>
#include <cstring>

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h >> 15) << 31;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) {
                man <<= 1;
                exp--;
            }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000 | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

inline uint16_t rd16(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}

inline uint32_t rd32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

// q4_K / q5_K 6-bit scale+min unpacking (12-byte field)
inline void k_scales(const uint8_t* s, int32_t* sc, int32_t* m) {
    for (int j = 0; j < 4; ++j) {
        sc[j] = s[j] & 63;
        m[j] = s[j + 4] & 63;
    }
    for (int j = 4; j < 8; ++j) {
        sc[j] = (s[j + 4] & 0xF) | ((s[j - 4] >> 6) << 4);
        m[j] = (s[j + 4] >> 4) | ((s[j] >> 6) << 4);
    }
}

}  // namespace

extern "C" {

void dq_q4_0(const uint8_t* in, float* out, int64_t nb) {
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = in + b * 18;
        float d = f16_to_f32(rd16(blk));
        float* o = out + b * 32;
        for (int j = 0; j < 16; ++j) {
            uint8_t q = blk[2 + j];
            o[j] = d * (float)((int)(q & 0xF) - 8);
            o[j + 16] = d * (float)((int)(q >> 4) - 8);
        }
    }
}

void dq_q8_0(const uint8_t* in, float* out, int64_t nb) {
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = in + b * 34;
        float d = f16_to_f32(rd16(blk));
        const int8_t* q = (const int8_t*)(blk + 2);
        float* o = out + b * 32;
        for (int j = 0; j < 32; ++j) o[j] = d * (float)q[j];
    }
}

void dq_q4_k(const uint8_t* in, float* out, int64_t nb) {
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = in + b * 144;
        float d = f16_to_f32(rd16(blk));
        float dmin = f16_to_f32(rd16(blk + 2));
        int32_t sc[8], m[8];
        k_scales(blk + 4, sc, m);
        const uint8_t* qs = blk + 16;
        float* o = out + b * 256;
        for (int c = 0; c < 4; ++c) {
            float s0 = d * sc[2 * c], m0 = dmin * m[2 * c];
            float s1 = d * sc[2 * c + 1], m1 = dmin * m[2 * c + 1];
            const uint8_t* ch = qs + c * 32;
            float* o0 = o + c * 64;
            for (int j = 0; j < 32; ++j) {
                o0[j] = s0 * (float)(ch[j] & 0xF) - m0;
                o0[j + 32] = s1 * (float)(ch[j] >> 4) - m1;
            }
        }
    }
}

void dq_q5_k(const uint8_t* in, float* out, int64_t nb) {
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = in + b * 176;
        float d = f16_to_f32(rd16(blk));
        float dmin = f16_to_f32(rd16(blk + 2));
        int32_t sc[8], m[8];
        k_scales(blk + 4, sc, m);
        const uint8_t* qh = blk + 16;
        const uint8_t* qs = blk + 48;
        float* o = out + b * 256;
        for (int c = 0; c < 4; ++c) {
            float s0 = d * sc[2 * c], m0 = dmin * m[2 * c];
            float s1 = d * sc[2 * c + 1], m1 = dmin * m[2 * c + 1];
            const uint8_t* ch = qs + c * 32;
            float* o0 = o + c * 64;
            for (int j = 0; j < 32; ++j) {
                int b0 = (qh[j] >> (2 * c)) & 1;
                int b1 = (qh[j] >> (2 * c + 1)) & 1;
                o0[j] = s0 * (float)((ch[j] & 0xF) | (b0 << 4)) - m0;
                o0[j + 32] = s1 * (float)((ch[j] >> 4) | (b1 << 4)) - m1;
            }
        }
    }
}

void dq_q6_k(const uint8_t* in, float* out, int64_t nb) {
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = in + b * 210;
        const uint8_t* ql = blk;
        const uint8_t* qh = blk + 128;
        const int8_t* scales = (const int8_t*)(blk + 192);
        float d = f16_to_f32(rd16(blk + 208));
        float* o = out + b * 256;
        for (int h = 0; h < 2; ++h) {
            const uint8_t* qlh = ql + h * 64;
            const uint8_t* qhh = qh + h * 32;
            const int8_t* sb = scales + h * 8;
            float* oh = o + h * 128;
            for (int l = 0; l < 32; ++l) {
                int q1 = ((qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4)) - 32;
                int q2 = ((qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4)) - 32;
                int q3 = ((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32;
                int q4 = ((qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32;
                oh[l] = d * sb[l / 16] * (float)q1;
                oh[l + 32] = d * sb[2 + l / 16] * (float)q2;
                oh[l + 64] = d * sb[4 + l / 16] * (float)q3;
                oh[l + 96] = d * sb[6 + l / 16] * (float)q4;
            }
        }
    }
}

// Extract Q4_K into the fused-kernel inputs: int4 values [256] (uint8)
// plus per-32-group scale and zero*scale (float), per super-block.
void extract_q4_k(const uint8_t* in, uint8_t* q_out, float* s_out,
                  float* zs_out, int64_t nb) {
    for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = in + b * 144;
        float d = f16_to_f32(rd16(blk));
        float dmin = f16_to_f32(rd16(blk + 2));
        int32_t sc[8], m[8];
        k_scales(blk + 4, sc, m);
        const uint8_t* qs = blk + 16;
        uint8_t* qo = q_out + b * 256;
        for (int c = 0; c < 4; ++c) {
            const uint8_t* ch = qs + c * 32;
            for (int j = 0; j < 32; ++j) {
                qo[c * 64 + j] = ch[j] & 0xF;
                qo[c * 64 + 32 + j] = ch[j] >> 4;
            }
        }
        for (int g = 0; g < 8; ++g) {
            s_out[b * 8 + g] = d * sc[g];
            zs_out[b * 8 + g] = dmin * m[g];
        }
    }
}

}  // extern "C"

// SPDX-License-Identifier: Apache-2.0
//
// Native GGUF block repack: GGML quant blocks -> TPU runtime formats.
//
// TPU-native counterpart of the reference's native layer role
// (/root/reference/vllm_metal/metal/paged_ops.cpp + build.py): the hot
// host-side path here is checkpoint load, where an 8B model's quantized
// tensors must be decoded from GGML block layouts and repacked into the
// affine group formats the Pallas kernels consume.  This library does that
// repack multithreaded at memcpy-like speed; Python falls back to the
// (slower) numpy implementation when the library is unavailable.
//
// Exported C ABI (see vllm_metal_tpu/gguf/native.py):
//   repack_q4k(raw, n_super, packed, scales, biases)
//   repack_q4_0 / repack_q4_1(raw, n_blocks, packed, scales, biases)
//   repack_q8_0(raw, n_blocks, q, scales)
//   repack_q6k(raw, n_super, q, scales)
//   dequant_*(raw, n, out)  (float32 output)
//
// All scale outputs are float32 (Python narrows to fp16 for device upload).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

inline float fp16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {
      // subnormal: normalize
      int shift = 0;
      while (!(mant & 0x400u)) { mant <<= 1; ++shift; }
      mant &= 0x3ffu;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, sizeof(f));
  return f;
}

inline uint16_t load_u16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

// parallel-for over [0, n) in contiguous chunks
template <typename F>
void pfor(int64_t n, F&& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t nthreads = std::min<int64_t>(hw, std::max<int64_t>(1, n / 1024));
  if (nthreads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

inline void k_scale_min(const uint8_t* s, uint8_t* sc, uint8_t* mn) {
  for (int j = 0; j < 4; ++j) {
    sc[j] = s[j] & 63;
    mn[j] = s[j + 4] & 63;
  }
  for (int j = 4; j < 8; ++j) {
    sc[j] = (s[j + 4] & 0x0F) | ((s[j - 4] >> 6) << 4);
    mn[j] = (s[j + 4] >> 4) | ((s[j] >> 6) << 4);
  }
}

}  // namespace

extern "C" {

// Decode one row's worth of GGML 4-bit blocks into elems[0..k), then pack
// the row in half-split order: byte j = elem j | elem j+k/2 << 4.

// Q4_K: 144-byte super-blocks of 256; rows of k elems (k % 256 == 0).
void repack_q4k(const uint8_t* raw, int64_t n_rows, int64_t k,
                uint8_t* packed, float* scales, float* biases) {
  int64_t supers = k / 256;
  pfor(n_rows, [&](int64_t rlo, int64_t rhi) {
    std::vector<uint8_t> elems(k);
    for (int64_t r = rlo; r < rhi; ++r) {
      for (int64_t si = 0; si < supers; ++si) {
        const uint8_t* b = raw + (r * supers + si) * 144;
        float d = fp16_to_f32(load_u16(b));
        float dmin = fp16_to_f32(load_u16(b + 2));
        uint8_t sc[8], mn[8];
        k_scale_min(b + 4, sc, mn);
        const uint8_t* qs = b + 16;
        uint8_t* e = elems.data() + si * 256;
        for (int c = 0; c < 4; ++c) {
          const uint8_t* q = qs + c * 32;
          for (int l = 0; l < 32; ++l) {
            e[c * 64 + l] = q[l] & 0x0F;
            e[c * 64 + 32 + l] = q[l] >> 4;
          }
        }
        for (int g = 0; g < 8; ++g) {
          scales[(r * supers + si) * 8 + g] = d * sc[g];
          biases[(r * supers + si) * 8 + g] = -dmin * mn[g];
        }
      }
      uint8_t* po = packed + r * (k / 2);
      int64_t half = k / 2;
      for (int64_t o = 0; o < half; ++o)
        po[o] = elems[o] | (elems[o + half] << 4);
    }
  });
}

// Q4_0: 18-byte blocks of 32; rows of k elems.
void repack_q4_0(const uint8_t* raw, int64_t n_rows, int64_t k,
                 uint8_t* packed, float* scales, float* biases) {
  int64_t blocks = k / 32;
  pfor(n_rows, [&](int64_t rlo, int64_t rhi) {
    std::vector<uint8_t> elems(k);
    for (int64_t r = rlo; r < rhi; ++r) {
      for (int64_t bi = 0; bi < blocks; ++bi) {
        const uint8_t* b = raw + (r * blocks + bi) * 18;
        float d = fp16_to_f32(load_u16(b));
        uint8_t* e = elems.data() + bi * 32;
        for (int l = 0; l < 16; ++l) {
          e[l] = b[2 + l] & 0x0F;
          e[16 + l] = b[2 + l] >> 4;
        }
        scales[r * blocks + bi] = d;
        biases[r * blocks + bi] = -8.0f * d;
      }
      uint8_t* po = packed + r * (k / 2);
      int64_t half = k / 2;
      for (int64_t o = 0; o < half; ++o)
        po[o] = elems[o] | (elems[o + half] << 4);
    }
  });
}

// Q4_1: 20-byte blocks of 32; rows of k elems.
void repack_q4_1(const uint8_t* raw, int64_t n_rows, int64_t k,
                 uint8_t* packed, float* scales, float* biases) {
  int64_t blocks = k / 32;
  pfor(n_rows, [&](int64_t rlo, int64_t rhi) {
    std::vector<uint8_t> elems(k);
    for (int64_t r = rlo; r < rhi; ++r) {
      for (int64_t bi = 0; bi < blocks; ++bi) {
        const uint8_t* b = raw + (r * blocks + bi) * 20;
        float d = fp16_to_f32(load_u16(b));
        float m = fp16_to_f32(load_u16(b + 2));
        uint8_t* e = elems.data() + bi * 32;
        for (int l = 0; l < 16; ++l) {
          e[l] = b[4 + l] & 0x0F;
          e[16 + l] = b[4 + l] >> 4;
        }
        scales[r * blocks + bi] = d;
        biases[r * blocks + bi] = m;
      }
      uint8_t* po = packed + r * (k / 2);
      int64_t half = k / 2;
      for (int64_t o = 0; o < half; ++o)
        po[o] = elems[o] | (elems[o + half] << 4);
    }
  });
}

// Q8_0: 34-byte blocks of 32 -> int8[32] + scale per block.
void repack_q8_0(const uint8_t* raw, int64_t n_blocks, int8_t* q,
                 float* scales) {
  pfor(n_blocks, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* b = raw + i * 34;
      scales[i] = fp16_to_f32(load_u16(b));
      std::memcpy(q + i * 32, b + 2, 32);
    }
  });
}

// Q6_K: 210-byte super-blocks of 256 -> int8[256] (q-32) + 16 scales
// (group 16).
void repack_q6k(const uint8_t* raw, int64_t n_super, int8_t* q,
                float* scales) {
  pfor(n_super, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* b = raw + i * 210;
      const uint8_t* ql = b;
      const uint8_t* qh = b + 128;
      const int8_t* sc = reinterpret_cast<const int8_t*>(b + 192);
      float d = fp16_to_f32(load_u16(b + 208));
      int8_t* qo = q + i * 256;
      for (int h = 0; h < 2; ++h) {
        const uint8_t* _ql = ql + h * 64;
        const uint8_t* _qh = qh + h * 32;
        int8_t* out = qo + h * 128;
        for (int l = 0; l < 32; ++l) {
          out[l] = (int8_t)(((_ql[l] & 0x0F) | (((_qh[l] >> 0) & 3) << 4)) - 32);
          out[l + 32] =
              (int8_t)(((_ql[l + 32] & 0x0F) | (((_qh[l] >> 2) & 3) << 4)) - 32);
          out[l + 64] =
              (int8_t)(((_ql[l] >> 4) | (((_qh[l] >> 4) & 3) << 4)) - 32);
          out[l + 96] =
              (int8_t)(((_ql[l + 32] >> 4) | (((_qh[l] >> 6) & 3) << 4)) - 32);
        }
      }
      for (int g = 0; g < 16; ++g)
        scales[i * 16 + g] = d * sc[g];
    }
  });
}

// F16 -> F32 bulk conversion.
void dequant_f16(const uint8_t* raw, int64_t n, float* out) {
  pfor(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      out[i] = fp16_to_f32(load_u16(raw + 2 * i));
  });
}

int repack_abi_version() { return 2; }

}  // extern "C"

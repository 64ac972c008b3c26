# SPDX-License-Identifier: Apache-2.0
"""GGML block-quant decode tests.

Strategy (reference test model: tier-2 kernel-contract tests, SURVEY.md §4):
1. scalar reference decoders written independently, straight from the
   llama.cpp per-element loops, checked against the vectorized decoders on
   random block bytes — catches vectorization/layout bugs;
2. encode->decode round trips bound quantization error;
3. exact repack (pack_affine_q4 / pack_q8) must reproduce dequantize() bit-for-bit.
"""

import numpy as np
import pytest

from vllm_metal_tpu.gguf.quants import (
    QUANTIZERS, dequantize, pack_affine_q4, pack_q8,
    quantize_q4_0, quantize_q4_k, quantize_q6_k, quantize_q8_0,
)
from vllm_metal_tpu.gguf.reader import GGML_BLOCK_INFO, GGMLType


def fp16(lo, hi):
    return np.frombuffer(bytes([lo, hi]), dtype=np.float16)[0].astype(np.float32)


def scalar_dequant(raw: bytes, qt: GGMLType) -> np.ndarray:
    """Element-by-element decode, transcribed from llama.cpp loops."""
    be, bb = GGML_BLOCK_INFO[qt]
    raw = np.frombuffer(raw, dtype=np.uint8)
    nb = raw.size // bb
    out = np.zeros(nb * be, dtype=np.float32)
    for i in range(nb):
        b = raw[i * bb:(i + 1) * bb]
        y = out[i * be:(i + 1) * be]
        if qt == GGMLType.Q8_0:
            d = fp16(b[0], b[1])
            q = b[2:34].view(np.int8)
            for j in range(32):
                y[j] = d * q[j]
        elif qt == GGMLType.Q4_0:
            d = fp16(b[0], b[1])
            for j in range(16):
                y[j] = d * (int(b[2 + j] & 0xF) - 8)
                y[j + 16] = d * (int(b[2 + j] >> 4) - 8)
        elif qt == GGMLType.Q4_K:
            d = fp16(b[0], b[1]); dmin = fp16(b[2], b[3])
            scales = b[4:16]
            qs = b[16:144]
            def get_scale_min(j):
                if j < 4:
                    return scales[j] & 63, scales[j + 4] & 63
                return ((scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4),
                        (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4))
            yi = 0
            q = qs
            for j in range(0, 256, 64):
                sc1, m1 = get_scale_min(2 * (j // 64))
                sc2, m2 = get_scale_min(2 * (j // 64) + 1)
                d1 = d * sc1; mm1 = dmin * m1
                d2 = d * sc2; mm2 = dmin * m2
                for l in range(32):
                    y[yi] = d1 * (q[l] & 0xF) - mm1; yi += 1
                for l in range(32):
                    y[yi] = d2 * (q[l] >> 4) - mm2; yi += 1
                q = q[32:]
        elif qt == GGMLType.Q6_K:
            ql = b[0:128]; qh = b[128:192]
            sc = b[192:208].view(np.int8)
            d = fp16(b[208], b[209])
            for n in range(2):
                _ql = ql[n * 64:]; _qh = qh[n * 32:]; _sc = sc[n * 8:]
                base = n * 128
                for l in range(32):
                    is_ = l // 16
                    q1 = int((_ql[l] & 0xF) | (((_qh[l] >> 0) & 3) << 4)) - 32
                    q2 = int((_ql[l + 32] & 0xF) | (((_qh[l] >> 2) & 3) << 4)) - 32
                    q3 = int((_ql[l] >> 4) | (((_qh[l] >> 4) & 3) << 4)) - 32
                    q4 = int((_ql[l + 32] >> 4) | (((_qh[l] >> 6) & 3) << 4)) - 32
                    y[base + l] = d * _sc[is_] * q1
                    y[base + l + 32] = d * _sc[is_ + 2] * q2
                    y[base + l + 64] = d * _sc[is_ + 4] * q3
                    y[base + l + 96] = d * _sc[is_ + 6] * q4
        else:
            raise NotImplementedError(qt)
    return out


@pytest.mark.parametrize("qt", [GGMLType.Q8_0, GGMLType.Q4_0,
                                GGMLType.Q4_K, GGMLType.Q6_K])
def test_vectorized_matches_scalar_reference(qt):
    be, bb = GGML_BLOCK_INFO[qt]
    rng = np.random.default_rng(0)
    # random *valid* blocks: encode random floats so fp16 fields are sane
    x = rng.standard_normal(8 * be).astype(np.float32)
    raw = QUANTIZERS[qt](x)
    got = dequantize(raw, qt, (8 * be,))
    want = scalar_dequant(raw.tobytes(), qt)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("qt,tol", [
    (GGMLType.Q8_0, 0.02), (GGMLType.Q4_0, 0.20),
    # our Q4_K encoder is a single-pass min/max fit (no llama.cpp iterative
    # refinement), so its error sits near the 4-bit affine floor, not below it
    (GGMLType.Q4_K, 0.10), (GGMLType.Q6_K, 0.02),
])
def test_roundtrip_error_bounded(qt, tol):
    rng = np.random.default_rng(1)
    be, _ = GGML_BLOCK_INFO[qt]
    x = rng.standard_normal(64 * be).astype(np.float32)
    raw = QUANTIZERS[qt](x)
    y = dequantize(raw, qt, x.shape)
    rms = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x ** 2))
    assert rms < tol, f"{qt.name}: relative rms {rms}"


@pytest.mark.parametrize("qt", [GGMLType.Q4_0, GGMLType.Q4_K])
def test_pack_affine_q4_exact(qt):
    rng = np.random.default_rng(2)
    n, k = 8, 256
    x = rng.standard_normal((n, k)).astype(np.float32)
    raw = QUANTIZERS[qt](x)
    dense = dequantize(raw, qt, (n, k))
    p = pack_affine_q4(raw, qt, (n, k))
    lo = (p.packed & 0xF).astype(np.float32)
    hi = (p.packed >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=-1)  # half-split layout
    scale = p.scales.repeat(32, axis=1)
    bias = p.biases.repeat(32, axis=1)
    np.testing.assert_allclose(q * scale + bias, dense, rtol=0, atol=1e-6)


@pytest.mark.parametrize("qt", [GGMLType.Q8_0, GGMLType.Q6_K])
def test_pack_q8_exact(qt):
    rng = np.random.default_rng(3)
    n, k = 8, 256
    x = rng.standard_normal((n, k)).astype(np.float32)
    raw = QUANTIZERS[qt](x)
    dense = dequantize(raw, qt, (n, k))
    p = pack_q8(raw, qt, (n, k))
    g = p.group_size
    w = p.q.astype(np.float32) * p.scales.repeat(g, axis=1)
    if p.biases is not None:
        w += p.biases.repeat(g, axis=1)
    np.testing.assert_allclose(w, dense, rtol=0, atol=1e-6)


def test_fp_formats():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        dequantize(x.tobytes() and np.frombuffer(x.tobytes(), np.uint8),
                   GGMLType.F32, (4, 8)), x)
    xh = x.astype(np.float16)
    np.testing.assert_array_equal(
        dequantize(np.frombuffer(xh.tobytes(), np.uint8), GGMLType.F16, (4, 8)),
        xh.astype(np.float32))
    u16 = (x.view(np.uint32) >> 16).astype(np.uint16)
    want = (u16.astype(np.uint32) << 16).view(np.float32)
    np.testing.assert_array_equal(
        dequantize(np.frombuffer(u16.tobytes(), np.uint8), GGMLType.BF16, (4, 8)),
        want)


@pytest.mark.parametrize("qt", [GGMLType.Q4_K, GGMLType.Q4_0])
def test_native_repack_matches_numpy_q4(qt):
    from vllm_metal_tpu.gguf.native import pack_affine_q4_native
    rng = np.random.default_rng(7)
    n, k = 16, 512
    raw = QUANTIZERS[qt](rng.standard_normal((n, k)).astype(np.float32))
    want = pack_affine_q4(raw, qt, (n, k))
    got = pack_affine_q4_native(raw, qt, (n, k))
    if got is None:
        pytest.skip("native toolchain unavailable")
    np.testing.assert_array_equal(got.packed, want.packed)
    np.testing.assert_allclose(got.scales, want.scales, rtol=1e-6)
    np.testing.assert_allclose(got.biases, want.biases, rtol=1e-6)


@pytest.mark.parametrize("qt", [GGMLType.Q8_0, GGMLType.Q6_K])
def test_native_repack_matches_numpy_q8(qt):
    from vllm_metal_tpu.gguf.native import pack_q8_native
    rng = np.random.default_rng(8)
    n, k = 16, 512
    raw = QUANTIZERS[qt](rng.standard_normal((n, k)).astype(np.float32))
    want = pack_q8(raw, qt, (n, k))
    got = pack_q8_native(raw, qt, (n, k))
    if got is None:
        pytest.skip("native toolchain unavailable")
    np.testing.assert_array_equal(got.q, want.q)
    np.testing.assert_allclose(got.scales, want.scales, rtol=1e-6)
    assert got.group_size == want.group_size

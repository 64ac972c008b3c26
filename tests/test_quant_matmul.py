# SPDX-License-Identifier: Apache-2.0
"""Fused dequant-matmul: Pallas (interpret mode on CPU) vs jnp reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.gguf.quants import (
    pack_affine_q4, pack_q8, quantize_q4_k, quantize_q6_k, quantize_q8_0,
)
from vllm_metal_tpu.gguf.reader import GGMLType
from vllm_metal_tpu.ops.quant_matmul import (
    QuantLinear, _dequant_matmul, _group_matmul, dequantize_ref, linear,
    linear_ref,
)


def make_q4(n, k, seed=0, layout="kn"):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32)
    p = pack_affine_q4(quantize_q4_k(w), GGMLType.Q4_K, (n, k))
    return QuantLinear.from_packed(p, layout=layout)


def make_q8(n, k, seed=0, qt=GGMLType.Q8_0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32)
    enc = quantize_q8_0(w) if qt == GGMLType.Q8_0 else quantize_q6_k(w)
    p = pack_q8(enc, qt, (n, k))
    return QuantLinear.from_packed(p)


def _assert_close(got, want, tol=5e-3):
    """Scale-normalized max error (kernels accumulate more precisely than
    linear_ref's bf16-rounded dequant, so elementwise rtol misfires near 0)."""
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < tol, rel


@pytest.mark.parametrize("m", [8, 64])
@pytest.mark.parametrize("entry", [_group_matmul, _dequant_matmul])
def test_q4_pallas_matches_reference(m, entry):
    n, k = 256, 512
    ql = make_q4(n, k)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((m, k)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    want = linear_ref(x, ql, jnp.float32)
    got = entry(x, ql, out_dtype=jnp.float32, interpret=True)
    _assert_close(got, want)


def test_q4_w4a8_close_to_reference():
    n, k, m = 256, 512, 16
    ql = make_q4(n, k)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((m, k)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    want = np.asarray(linear_ref(x, ql, jnp.float32))
    got = np.asarray(_group_matmul(x, ql, out_dtype=jnp.float32,
                                   interpret=True, quantized=True))
    # int8 activation quantization: ~1-2% relative error
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("qt,g", [(GGMLType.Q8_0, 32), (GGMLType.Q6_K, 16)])
@pytest.mark.parametrize("entry", [_group_matmul, _dequant_matmul])
def test_q8_pallas_matches_reference(qt, g, entry):
    n, k, m = 128, 512, 16
    ql = make_q8(n, k, qt=qt)
    assert ql.group_size == g
    x = jnp.asarray(np.random.default_rng(2).standard_normal((m, k)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    want = linear_ref(x, ql, jnp.float32)
    got = entry(x, ql, out_dtype=jnp.float32, interpret=True)
    _assert_close(got, want)


def test_linear_handles_leading_dims_and_padding():
    ql = make_q4(128, 256)
    x = jnp.ones((3, 256), jnp.bfloat16)  # M=3 needs padding to 8
    y = linear(x, ql, use_pallas=False)
    assert y.shape == (3, 128)
    y3 = linear(x[None], ql, use_pallas=False)
    assert y3.shape == (1, 3, 128)
    np.testing.assert_allclose(np.asarray(y3[0]), np.asarray(y))


def test_dense_linear():
    w = jnp.asarray(np.random.default_rng(3).standard_normal((64, 32)),
                    dtype=jnp.float32)
    ql = QuantLinear.dense(w)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((5, 32)),
                    dtype=jnp.float32)
    got = linear(x, ql, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x) @ np.asarray(w).T,
                               rtol=1e-2, atol=1e-2)


def test_dequantize_ref_q4_exact_vs_numpy():
    ql = make_q4(8, 64)
    w = np.asarray(dequantize_ref(ql))
    packed = np.asarray(ql.w).T       # "kn" [K/2, N] -> [N, K/2]
    lo = (packed & 0xF).astype(np.float32)
    hi = (packed >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=-1)  # half-split layout
    s = np.asarray(ql.scales, np.float32).T.repeat(32, axis=1)
    b = np.asarray(ql.biases, np.float32).T.repeat(32, axis=1)
    np.testing.assert_allclose(w, q * s + b, rtol=1e-6, atol=1e-6)


def test_nk_layout_matches_kn():
    """Embedding-table layout dequantizes identically and to_kn round-trips."""
    nk = make_q4(64, 128, layout="nk")
    kn = make_q4(64, 128, layout="kn")
    np.testing.assert_allclose(np.asarray(dequantize_ref(nk)),
                               np.asarray(dequantize_ref(kn)))
    conv = nk.to_kn()
    np.testing.assert_allclose(np.asarray(conv.w), np.asarray(kn.w))
    x = jnp.ones((4, 128), jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(linear(x, nk, jnp.float32)),
                               np.asarray(linear(x, kn, jnp.float32,
                                                 use_pallas=False)))


def test_linear_small_dims_fall_back():
    # N=64 (< 128 lanes): no Mosaic tiling exists; linear() must route to
    # linear_ref instead of crashing the engine step (hit when serving toy
    # GGUF checkpoints).
    from vllm_metal_tpu.ops.quant_matmul import _pallas_supported, linear
    ql = make_q4(64, 256)
    assert not _pallas_supported(ql)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((8, 256)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    got = linear(x, ql, jnp.float32, use_pallas=True)   # must fall back
    want = linear_ref(x, ql, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert _pallas_supported(make_q4(256, 512))         # real dims still go


def _stack(qls):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qls)


@pytest.mark.parametrize("layer", [0, 2])
@pytest.mark.parametrize("entry", [_group_matmul, _dequant_matmul])
def test_q4_stacked_pallas_matches_per_layer(layer, entry):
    n, k, m = 256, 512, 16
    qls = [make_q4(n, k, seed=s) for s in range(3)]
    stacked = _stack(qls)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((m, k)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    want = entry(x, qls[layer], out_dtype=jnp.float32, interpret=True)
    got = entry(x, stacked.at_layer(layer), out_dtype=jnp.float32,
                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_q8_stacked_pallas_matches_per_layer():
    n, k, m = 128, 512, 8
    qls = [make_q8(n, k, seed=s) for s in range(2)]
    stacked = _stack(qls)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((m, k)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    for layer in range(2):
        want = _group_matmul(x, qls[layer], out_dtype=jnp.float32,
                             interpret=True)
        got = _group_matmul(x, stacked.at_layer(layer),
                            out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_stacked_traced_index_under_jit():
    n, k, m = 256, 512, 8
    qls = [make_q4(n, k, seed=s) for s in range(3)]
    stacked = _stack(qls)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((m, k)),
                    dtype=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def run(i):
        return linear(x, stacked.at_layer(i), out_dtype=jnp.float32)

    for layer in range(3):
        want = linear(x, qls[layer], out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(run(layer)),
                                   np.asarray(want), rtol=1e-6, atol=1e-6)


def test_stacked_dense_linear():
    qls = [QuantLinear.dense(jnp.asarray(
        np.random.default_rng(s).standard_normal((64, 32)),
        jnp.float32).astype(jnp.bfloat16)) for s in range(2)]
    stacked = _stack(qls)
    x = jnp.ones((4, 32), jnp.bfloat16)
    for layer in range(2):
        want = linear(x, qls[layer], out_dtype=jnp.float32)
        got = linear(x, stacked.at_layer(layer), out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


# ---------------------------------------------------------------- fused seams
@pytest.mark.parametrize("quantized", [False, True])
def test_group_rms_prologue_matches_separate(quantized):
    """In-kernel rms prologue == standalone rms_norm -> matmul."""
    from vllm_metal_tpu.models.common import rms_norm
    n, k, m, eps = 256, 512, 16, 1e-5
    ql = make_q4(n, k)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32
                    ).astype(jnp.bfloat16)
    nw = jnp.asarray(rng.standard_normal((k,)), jnp.float32
                     ).astype(jnp.bfloat16)
    h = rms_norm(x, nw, eps)
    want = _group_matmul(h, ql, out_dtype=jnp.float32, interpret=True,
                         quantized=quantized)
    got = _group_matmul(x, ql, out_dtype=jnp.float32, interpret=True,
                        quantized=quantized, prep="rms", eps=eps, nw=nw)
    _assert_close(got, want, tol=1e-5 if not quantized else 2e-2)


def test_group_swiglu_prologue_and_residual():
    """In-kernel swiglu prologue + residual epilogue == separate ops."""
    n, k, m = 256, 512, 16
    ql = make_q4(n, k)
    rng = np.random.default_rng(5)
    gu = jnp.asarray(rng.standard_normal((m, 2 * k)), jnp.float32
                     ).astype(jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((m, n)), jnp.float32
                      ).astype(jnp.bfloat16)
    g = gu[:, :k].astype(jnp.float32)
    y = (g * jax.nn.sigmoid(g)).astype(jnp.bfloat16) * gu[:, k:]
    want = _group_matmul(y, ql, out_dtype=jnp.bfloat16, interpret=True
                         ) + res
    got = _group_matmul(gu, ql, out_dtype=jnp.bfloat16, interpret=True,
                        prep="swiglu_silu", res=res)
    # not bitwise: the inlined swiglu may keep f32 precision through the
    # product where the materialized-y path rounds to bf16 first
    _assert_close(got, want, tol=5e-3)


def test_linear_prep_res_fallback_matches_kernel_semantics():
    """linear(prep=..., res=...) on the non-kernel path == explicit ops."""
    from vllm_metal_tpu.models.common import rms_norm
    n, k, m, eps = 64, 96, 4, 1e-5     # tiny dims -> linear_ref fallback
    rng = np.random.default_rng(9)
    ql = QuantLinear.dense(jnp.asarray(
        rng.standard_normal((n, k)), jnp.float32))
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    nw = jnp.ones((k,), jnp.float32)
    res = jnp.asarray(rng.standard_normal((m, n)), jnp.float32
                      ).astype(jnp.bfloat16)
    want = linear(rms_norm(x, nw, eps), ql) + res
    got = linear(x, ql, prep=("rms", nw, eps), res=res)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

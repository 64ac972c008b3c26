# SPDX-License-Identifier: Apache-2.0
"""Fused dequantize + matmul for GGUF-derived weights.

The reference engine gets its fused quantized matmul for free from MLX
(``/root/reference/vllm_metal/gguf/mlx_native.py`` — ``mx.quantized_matmul``
over uint32-packed affine group-32 weights).  On TPU we own this path: a
Pallas kernel streams the packed weights HBM->VMEM, dequantizes on the VPU,
and feeds bf16 tiles to the MXU — the dense weight never materializes in HBM.

Runtime weight formats (produced by :mod:`..gguf.quants`):

* ``q4``: ``uint8 [N, K//2]`` (elem ``2k`` low nibble, ``2k+1`` high nibble)
  + ``scales``/``biases`` ``[N, K//32]``; ``w = q * scale + bias``.
* ``q8``: ``int8 [N, K]`` + ``scales [N, K//G]`` (+ optional ``biases``),
  ``G`` 16 or 32.
* ``dense``: plain bf16/f32 ``[N, K]``.

Weight layout is ``[out_features, in_features]``; ``linear(x, w)`` computes
``x @ w.T`` like the reference's projection layers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import envs
from ..utils import static_dataclass


@static_dataclass(meta_fields=("kind", "group_size"))
class QuantLinear:
    """A (possibly quantized) linear weight as a pytree.

    ``scales``/``biases`` are stored TRANSPOSED ``[K//G, N]`` so the Pallas
    kernel can block them with a 128-lane-aligned last dimension (Mosaic
    requires block last dims divisible by 128 or full).

    **Stacked form**: leaves may carry a leading layer dimension
    (``w [L, N, K//2]``, scales ``[L, K//G, N]``) with ``idx`` selecting the
    layer.  The Pallas kernels then index the layer via a prefetched scalar
    in the BlockSpec index_map — only the needed tiles ever leave HBM.  This
    avoids lax.scan's per-layer dynamic-slice materialization (~weight-size
    extra HBM copy traffic per step), the stacked-weight analogue of how the
    attention kernel indexes its stacked ``[L, ...]`` KV pool.
    """

    kind: str                      # "dense" | "q4" | "q8"
    w: jax.Array                   # dense [N,K] | packed u8 [N,K//2] | i8 [N,K]
    scales: Optional[jax.Array]    # [K//G, N] or None
    biases: Optional[jax.Array]    # [K//G, N] or None
    group_size: int = 32
    idx: Optional[jax.Array] = None  # layer index into stacked [L,...] leaves

    @property
    def stacked(self) -> bool:
        return self.w.ndim == 3

    @property
    def out_features(self) -> int:
        return self.w.shape[-2]

    @property
    def in_features(self) -> int:
        return self.w.shape[-1] * (2 if self.kind == "q4" else 1)

    def at_layer(self, i) -> "QuantLinear":
        """Select layer ``i`` of a stacked weight (lazy: kernels index it)."""
        import dataclasses
        return dataclasses.replace(self, idx=jnp.asarray(i, jnp.int32))

    @classmethod
    def dense(cls, w: jax.Array) -> "QuantLinear":
        return cls(kind="dense", w=w, scales=None, biases=None)

    @classmethod
    def from_packed(cls, p, dtype=jnp.bfloat16) -> "QuantLinear":
        """Build from gguf.quants PackedQ4/PackedQ8 (numpy, [N, K//G]
        scale layout) — transposes scale arrays into kernel layout."""
        import numpy as np
        if hasattr(p, "packed"):          # PackedQ4
            return cls(kind="q4", w=jnp.asarray(p.packed),
                       scales=jnp.asarray(
                           np.ascontiguousarray(p.scales.T).astype(dtype)),
                       biases=jnp.asarray(
                           np.ascontiguousarray(p.biases.T).astype(dtype)),
                       group_size=p.group_size)
        return cls(kind="q8", w=jnp.asarray(p.q),
                   scales=jnp.asarray(
                       np.ascontiguousarray(p.scales.T).astype(dtype)),
                   biases=None if p.biases is None else jnp.asarray(
                       np.ascontiguousarray(p.biases.T).astype(dtype)),
                   group_size=p.group_size)


def _unpack_q4(packed: jax.Array) -> jax.Array:
    """uint8 [..., K//2] -> int8-valued [..., K] (half-split layout)."""
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-1)


def _expand_groups(s: jax.Array, group_size: int) -> jax.Array:
    """[K//G, N] -> [N, K] by transposing and repeating each group value."""
    return jnp.repeat(s.T, group_size, axis=-1)


def _select_layer(ql: QuantLinear) -> QuantLinear:
    """Materialize layer ``idx`` of a stacked QuantLinear (reference path)."""
    import dataclasses

    def take(a):
        if a is None:
            return None
        return jax.lax.dynamic_index_in_dim(
            a, jnp.asarray(ql.idx, jnp.int32), 0, keepdims=False)

    return dataclasses.replace(ql, w=take(ql.w), scales=take(ql.scales),
                               biases=take(ql.biases), idx=None)


def dequantize_ref(ql: QuantLinear, dtype=jnp.float32) -> jax.Array:
    """Reference dense materialization (CPU tests / fallback)."""
    if ql.w.ndim == 3:
        ql = _select_layer(ql)
    if ql.kind == "dense":
        return ql.w.astype(dtype)
    if ql.kind == "q4":
        q = _unpack_q4(ql.w).astype(jnp.float32)
    elif ql.kind == "q8":
        q = ql.w.astype(jnp.float32)
    else:
        raise ValueError(ql.kind)
    w = q * _expand_groups(ql.scales.astype(jnp.float32), ql.group_size)
    if ql.biases is not None:
        w = w + _expand_groups(ql.biases.astype(jnp.float32), ql.group_size)
    return w.astype(dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernels
# ---------------------------------------------------------------------------

def _pick_tile(dim: int, candidates: tuple[int, ...]) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dimension {dim} has no tile among {candidates}")


def _expand_groups_mxu(s_t: jax.Array, group_size: int,
                       width: int) -> jax.Array:
    """[G, tn] transposed group scales -> [tn, width] expanded.

    Uses a one-hot matmul (exact: one nonzero per output column) because
    Mosaic supports neither jnp.repeat's broadcast-reshape nor lane
    gathers for sub-32-bit-aligned strides.
    """
    st = s_t.astype(jnp.float32)
    g = st.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (g, width), 1) // group_size
    row = jax.lax.broadcasted_iota(jnp.int32, (g, width), 0)
    e = (col == row).astype(jnp.float32)
    return jax.lax.dot_general(st, e, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _q4_tile(acc_ref, x_lo, x_hi, pbytes, s_lo_t, b_lo_t, s_hi_t, b_hi_t,
             group_size: int):
    """Accumulate one half-split q4 tile: tb packed bytes yield the low-half
    elems [k*tb, (k+1)*tb) and high-half elems [K/2 + k*tb, ...), matched
    with the corresponding x and scale slices — every byte is read exactly
    once and the unpack is nibble masks (no interleave)."""
    p32 = pbytes.astype(jnp.int32)
    lo = (p32 & 0x0F).astype(jnp.float32)
    hi = (p32 >> 4).astype(jnp.float32)
    tb = lo.shape[1]
    s_lo = _expand_groups_mxu(s_lo_t, group_size, tb)
    b_lo = _expand_groups_mxu(b_lo_t, group_size, tb)
    s_hi = _expand_groups_mxu(s_hi_t, group_size, tb)
    b_hi = _expand_groups_mxu(b_hi_t, group_size, tb)
    w_lo = (lo * s_lo + b_lo).astype(jnp.bfloat16)
    w_hi = (hi * s_hi + b_hi).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_lo, w_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        x_hi, w_hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _q4_kernel(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, b_lo_ref, s_hi_ref,
               b_hi_ref, o_ref, acc_ref, *, n_k: int, group_size: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _q4_tile(acc_ref, x_lo_ref[:], x_hi_ref[:], w_ref[:], s_lo_ref[:],
             b_lo_ref[:], s_hi_ref[:], b_hi_ref[:], group_size)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4_kernel_stacked(idx_ref, x_lo_ref, x_hi_ref, w_ref, s_lo_ref,
                       b_lo_ref, s_hi_ref, b_hi_ref, o_ref, acc_ref, *,
                       n_k: int, group_size: int):
    """Stacked-layer q4: weight refs carry a leading unit layer-block dim;
    the layer is selected by the prefetched ``idx_ref`` in the index_maps."""
    del idx_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _q4_tile(acc_ref, x_lo_ref[:], x_hi_ref[:], w_ref[0], s_lo_ref[0],
             b_lo_ref[0], s_hi_ref[0], b_hi_ref[0], group_size)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q8_tile(acc_ref, x, q8, s_t, b_t, group_size: int, has_bias: bool):
    q = q8.astype(jnp.float32)
    tk = q.shape[1]
    w = q * _expand_groups_mxu(s_t, group_size, tk)
    if has_bias:
        w = w + _expand_groups_mxu(b_t, group_size, tk)
    acc_ref[:] += jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _q8_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *, n_k: int,
               group_size: int, has_bias: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _q8_tile(acc_ref, x_ref[:], w_ref[:], s_ref[:], b_ref[:], group_size,
             has_bias)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q8_kernel_stacked(idx_ref, x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref,
                       *, n_k: int, group_size: int, has_bias: bool):
    del idx_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _q8_tile(acc_ref, x_ref[:], w_ref[0], s_ref[0], b_ref[0], group_size,
             has_bias)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _quant_matmul_pallas(x: jax.Array, ql: QuantLinear,
                         out_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jax.Array:
    """x [M, K] @ dequant(ql).T -> [M, N].  M must be a multiple of 8.

    Stacked weights (leaves ``[L, ...]`` + ``ql.idx``) run the scalar-prefetch
    variants: the layer never materializes — each grid step DMAs its tile
    straight from the stacked HBM array.
    """
    m, kdim = x.shape
    n = ql.out_features
    g = ql.group_size
    assert kdim == ql.in_features, (x.shape, ql.w.shape)
    stacked = ql.w.ndim == 3
    if stacked:
        assert ql.idx is not None, "stacked QuantLinear needs .at_layer(i)"
        idx = jnp.asarray(ql.idx, jnp.int32).reshape(1)

    tm = _pick_tile(m, (256, 128, 64, 32, 16, 8))
    tn = _pick_tile(n, (256, 128, 512))
    has_bias = ql.biases is not None
    biases = ql.biases if has_bias else ql.scales  # dummy operand when absent

    flops = 2 * m * n * kdim
    w_bytes = ql.w.size * ql.w.dtype.itemsize
    if stacked:
        w_bytes //= ql.w.shape[0]
    cost = pl.CostEstimate(
        flops=flops, transcendentals=0,
        bytes_accessed=w_bytes + m * kdim * x.dtype.itemsize + m * n * 2)

    if ql.kind == "q4":
        # k step = tb bytes = tb low elems + tb high elems (half-split)
        tb = _pick_tile(kdim // 2, (256, 128, 512, 64))
        n_k = kdim // 2 // tb
        grid = (m // tm, n // tn, n_k)
        out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
        if not stacked:
            kernel = functools.partial(_q4_kernel, n_k=n_k, group_size=g)
            return pl.pallas_call(
                kernel,
                out_shape=out_shape,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tm, tb), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),      # x low half
                    pl.BlockSpec((tm, tb), lambda i, j, k, _n=n_k:
                                 (i, k + _n), memory_space=pltpu.VMEM),  # x hi
                    pl.BlockSpec((tn, tb), lambda i, j, k: (j, k),
                                 memory_space=pltpu.VMEM),      # bytes
                    pl.BlockSpec((tb // g, tn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),      # s low
                    pl.BlockSpec((tb // g, tn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),      # b low
                    pl.BlockSpec((tb // g, tn), lambda i, j, k, _n=n_k:
                                 (k + _n, j), memory_space=pltpu.VMEM),  # s hi
                    pl.BlockSpec((tb // g, tn), lambda i, j, k, _n=n_k:
                                 (k + _n, j), memory_space=pltpu.VMEM),  # b hi
                ],
                out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
                cost_estimate=cost,
                interpret=interpret,
            )(x, x, ql.w, ql.scales, biases, ql.scales, biases)

        kernel = functools.partial(_q4_kernel_stacked, n_k=n_k, group_size=g)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tb), lambda i, j, k, l: (i, k),
                             memory_space=pltpu.VMEM),          # x low half
                pl.BlockSpec((tm, tb), lambda i, j, k, l, _n=n_k:
                             (i, k + _n), memory_space=pltpu.VMEM),  # x high
                pl.BlockSpec((1, tn, tb), lambda i, j, k, l: (l[0], j, k),
                             memory_space=pltpu.VMEM),          # bytes
                pl.BlockSpec((1, tb // g, tn), lambda i, j, k, l:
                             (l[0], k, j), memory_space=pltpu.VMEM),  # s low
                pl.BlockSpec((1, tb // g, tn), lambda i, j, k, l:
                             (l[0], k, j), memory_space=pltpu.VMEM),  # b low
                pl.BlockSpec((1, tb // g, tn), lambda i, j, k, l, _n=n_k:
                             (l[0], k + _n, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tb // g, tn), lambda i, j, k, l, _n=n_k:
                             (l[0], k + _n, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, l: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(idx, x, x, ql.w, ql.scales, biases, ql.scales, biases)

    if ql.kind == "q8":
        tk = _pick_tile(kdim, (512, 256, 128, 1024))
        n_k = kdim // tk
        grid = (m // tm, n // tn, n_k)
        out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
        if not stacked:
            kernel = functools.partial(_q8_kernel, n_k=n_k, group_size=g,
                                       has_bias=has_bias)
            return pl.pallas_call(
                kernel,
                out_shape=out_shape,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tn, tk), lambda i, j, k: (j, k),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tk // g, tn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tk // g, tn), lambda i, j, k: (k, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
                cost_estimate=cost,
                interpret=interpret,
            )(x, ql.w, ql.scales, biases)

        kernel = functools.partial(_q8_kernel_stacked, n_k=n_k, group_size=g,
                                   has_bias=has_bias)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, k, l: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tn, tk), lambda i, j, k, l: (l[0], j, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tk // g, tn), lambda i, j, k, l:
                             (l[0], k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tk // g, tn), lambda i, j, k, l:
                             (l[0], k, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, l: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(idx, x, ql.w, ql.scales, biases)

    raise ValueError(ql.kind)


def _pallas_supported(ql: QuantLinear) -> bool:
    """Whether the fused kernels can tile this layer.

    Tiny dimensions (unit-test vocabularies, toy models) have no valid
    Mosaic tiling — N below 128 lanes, or too few transposed-scale rows
    for an 8-sublane block — and must fall back to ``linear_ref`` instead
    of crashing the engine step.
    """
    def tile(dim, cands):
        return next((c for c in cands if dim % c == 0), None)

    if tile(ql.out_features, (256, 128, 512)) is None:
        return False
    g = ql.group_size
    if ql.kind == "q4":
        tb = tile(ql.in_features // 2, (256, 128, 512, 64))
        return tb is not None and tb % g == 0 and (tb // g) % 8 == 0
    if ql.kind == "q8":
        tk = tile(ql.in_features, (512, 256, 128, 1024))
        if tk is None or tk % g:
            return False
        return (tk // g) % 8 == 0 or tk == ql.in_features
    return False


def linear_ref(x: jax.Array, ql: QuantLinear,
               out_dtype=jnp.bfloat16) -> jax.Array:
    """Pure-jnp reference: x [..., K] -> [..., N].

    Matches the Pallas kernel's precision policy: dequantized weights are
    rounded to x.dtype (bf16 in serving), products accumulate in f32.
    """
    w = dequantize_ref(ql, x.dtype)
    y = jnp.einsum("...k,nk->...n", x, w,
                   preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


def linear(x: jax.Array, ql: QuantLinear, out_dtype=jnp.bfloat16,
           use_pallas: Optional[bool] = None) -> jax.Array:
    """Quantized linear: x [..., K] -> [..., N] (= x @ dequant(w).T)."""
    if ql.kind == "dense":
        w = ql.w
        if ql.stacked:
            w = jax.lax.dynamic_index_in_dim(
                w, jnp.asarray(ql.idx, jnp.int32), 0, keepdims=False)
        return jnp.einsum(
            "...k,nk->...n", x, w.astype(x.dtype)).astype(out_dtype)
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      or envs.PALLAS_INTERPRET)
    if not use_pallas or not _pallas_supported(ql):
        return linear_ref(x, ql, out_dtype)

    lead = x.shape[:-1]
    kdim = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, kdim)
    pad = (-m) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    y = _quant_matmul_pallas(x2, ql, out_dtype=out_dtype,
                             interpret=bool(envs.PALLAS_INTERPRET))
    if pad:
        y = y[:m]
    return y.reshape(*lead, ql.out_features)

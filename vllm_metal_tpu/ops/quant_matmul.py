# SPDX-License-Identifier: Apache-2.0
"""Fused dequantize + matmul for GGUF-derived weights.

The reference engine gets its fused quantized matmul for free from MLX
(``/root/reference/vllm_metal/gguf/mlx_native.py`` — ``mx.quantized_matmul``
over uint32-packed affine group-32 weights).  On TPU we own this path.

Weight storage is TRANSPOSED ("kn" layout): packed weights live as
``[K(/2), N]`` so that

* group scales/biases ``[K//G, N]`` expand along *sublanes* (cheap),
* tensor-parallel sharding is uniform across w/scales/biases
  (column-parallel shards the last dim of all three),
* the decode kernel can slice per-group K-rows as sublane slices.

Two Pallas kernels, selected by token count ``m``:

**Group-dot kernel (decode / small m).**  The affine dequant
``w = s*q + b`` never materializes.  Using
``x @ w = sum_g s[g,:] * (x_g @ q_g) + sum_g b[g,:] * xgsum[:,g]``
the raw 4-bit codes feed the MXU directly (one K=32 dot per scale group,
rescaled on the [m, tn] *output*, which is tiny at decode batch sizes),
and the bias term folds into two small dots against precomputed per-group
sums of x.  Nibbles unpack with packed-i32 masks (3 VPU ops per 4 bytes).
Since an MXU pass covers up to 128 rows, cost is independent of m <= 128:
measured 398 GB/s effective weight bandwidth exact / 630 GB/s with W4A8
activation quantization on v5e (vs 819 GB/s HBM roofline and ~100 GB/s for
a dequantize-in-VPU kernel, which is elementwise-convert bound).

**Dequant kernel (prefill / large m).**  At large m the K=32 group dots
waste MXU depth 4x on real work, so weights dequantize to bf16 tiles in
VMEM (scale expansion via one-hot MXU matmul on sublane-major scales) and
a full-depth dot runs per tile.  Per-element VPU cost amortizes over m.

``VLLM_METAL_TPU_W4A8=1`` additionally quantizes activations to int8
per-token for the group-dot kernel (s8 x s8 MXU at double rate; the bias
term still uses exact x, so only the centered term is approximated).

Runtime weight formats (produced by :mod:`..gguf.quants`):

* ``q4``: ``uint8 [K//2, N]`` half-split (byte row ``r`` holds elem ``r``
  in the low nibble and elem ``K/2 + r`` in the high nibble)
  + ``scales``/``biases`` ``[K//32, N]``; ``w = q * scale + bias``.
* ``q8``: ``int8 [K, N]`` + ``scales [K//G, N]`` (+ optional ``biases``).
* ``dense``: plain bf16/f32 ``[N, K]``.

Embedding tables keep the legacy ``layout="nk"`` (``[V, H//2]``) — they are
row-gathered, not matmul'd; ``linear()`` on an "nk" weight falls back to
the dequantize-and-einsum reference path (used only by tiny test models
and tied lm_heads that loaders didn't transpose).

Stacked form: leaves may carry a leading layer dim (``w [L, K//2, N]``)
with ``idx`` selecting the layer; kernels index it via a prefetched scalar
so only the needed tiles ever leave HBM (no per-layer materialization
under ``lax.scan``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import envs
from ..utils import static_dataclass


@static_dataclass(meta_fields=("kind", "group_size", "layout"))
class QuantLinear:
    """A (possibly quantized) linear weight as a pytree.

    layout "kn": w ``[K(/2), N]`` (matmul weights — kernel path);
    scales/biases ``[K//G, N]``.
    layout "nk": w ``[N, K(/2)]``, scales/biases ``[N, K//G]`` (embedding
    tables; EVERY leaf is row-major in N so lookups are pure row gathers —
    a column gather over a 128k-lane vocab axis measured 0.88 ms/step on
    v5e).  Gather or reference path only.
    """

    kind: str                      # "dense" | "q4" | "q8"
    w: jax.Array
    scales: Optional[jax.Array]    # [K//G, N] or None
    biases: Optional[jax.Array]    # [K//G, N] or None
    group_size: int = 32
    layout: str = "kn"
    idx: Optional[jax.Array] = None  # layer index into stacked [L,...] leaves

    @property
    def stacked(self) -> bool:
        return self.w.ndim == 3

    @property
    def out_features(self) -> int:
        if self.kind == "dense" or self.layout == "nk":
            return self.w.shape[-2]
        return self.w.shape[-1]

    @property
    def in_features(self) -> int:
        mult = 2 if self.kind == "q4" else 1
        if self.kind == "dense":
            return self.w.shape[-1]
        if self.layout == "nk":
            return self.w.shape[-1] * mult
        return self.w.shape[-2] * mult

    def at_layer(self, i) -> "QuantLinear":
        """Select layer ``i`` of a stacked weight (lazy: kernels index it)."""
        return dataclasses.replace(self, idx=jnp.asarray(i, jnp.int32))

    def to_kn(self) -> "QuantLinear":
        """Transpose an "nk" weight into the kernel "kn" layout."""
        if self.kind == "dense" or self.layout == "kn":
            return self
        axes = (0, 2, 1) if self.stacked else (1, 0)

        def t(a):
            return None if a is None else jnp.transpose(a, axes)

        return dataclasses.replace(
            self, w=t(self.w), scales=t(self.scales), biases=t(self.biases),
            layout="kn")

    @classmethod
    def dense(cls, w: jax.Array) -> "QuantLinear":
        return cls(kind="dense", w=w, scales=None, biases=None)

    @classmethod
    def from_packed(cls, p, dtype=jnp.bfloat16,
                    layout: str = "kn") -> "QuantLinear":
        """Build from gguf.quants PackedQ4/PackedQ8 (numpy, [N, K//2] packed
        + [N, K//G] scales) — "kn" transposes every leaf into the kernel
        layout; "nk" keeps them all row-major in N (gather layout)."""
        import numpy as np

        def t(a):
            if layout == "nk":
                return jnp.asarray(a)
            return jnp.asarray(np.ascontiguousarray(a.T))

        def ts(a):
            if layout == "nk":
                return jnp.asarray(a.astype(dtype))
            return jnp.asarray(np.ascontiguousarray(a.T).astype(dtype))

        if hasattr(p, "packed"):          # PackedQ4
            return cls(kind="q4", w=t(p.packed), scales=ts(p.scales),
                       biases=ts(p.biases), group_size=p.group_size,
                       layout=layout)
        return cls(kind="q8", w=t(p.q), scales=ts(p.scales),
                   biases=None if p.biases is None else ts(p.biases),
                   group_size=p.group_size, layout=layout)


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

    def take(a):
        if a is None:
            return None
        return jax.lax.dynamic_index_in_dim(
            a, jnp.asarray(ql.idx, jnp.int32), 0, keepdims=False)

    return dataclasses.replace(ql, w=take(ql.w), scales=take(ql.scales),
                               biases=take(ql.biases), idx=None)


def dequantize_ref(ql: QuantLinear, dtype=jnp.float32) -> jax.Array:
    """Reference dense materialization [N, K] (CPU tests / fallback)."""
    if ql.w.ndim == 3:
        ql = _select_layer(ql)
    if ql.kind == "dense":
        return ql.w.astype(dtype)
    w = ql.w if ql.layout == "nk" else ql.w.T   # -> [N, K(/2)]
    if ql.kind == "q4":
        q = _unpack_q4(w).astype(jnp.float32)
    elif ql.kind == "q8":
        q = w.astype(jnp.float32)
    else:
        raise ValueError(ql.kind)

    def expand(s):
        if ql.layout == "nk":     # [N, K//G] -> [N, K]
            return jnp.repeat(s.astype(jnp.float32), ql.group_size, axis=-1)
        return _expand_groups(s.astype(jnp.float32), ql.group_size)

    out = q * expand(ql.scales)
    if ql.biases is not None:
        out = out + expand(ql.biases)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernels ("kn" layout)
# ---------------------------------------------------------------------------

# group-dot kernel: widest tile that keeps w-tile DMA + f32 acc in VMEM
_GROUP_TN_TARGET = 7168
import os as _os
_GROUP_TB = int(_os.environ.get("VLLM_METAL_TPU_QMM_TB", "256"))
# packed byte rows per k step (env knob for sweeps; 256 = swept default)
_GROUP_M_MAX = 512           # above this, the dequant kernel wins
_DEQ_TM, _DEQ_TN, _DEQ_TB = 512, 1024, 256   # swept on v5e (prefill 1024)


def _nibbles(pw):
    """packed u8 [tb, tn] -> (lo, hi) u8 [tb, tn] via packed-i32 masks."""
    w32 = pltpu.bitcast(pw, jnp.int32)
    lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.uint8)
    hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.uint8)
    return lo, hi


def _act_f32(name: str, g: jax.Array) -> jax.Array:
    """Activation on f32 (kernel + fallback share this table)."""
    if name == "silu":
        return g * jax.lax.logistic(g)
    if name == "gelu":
        return jax.nn.gelu(g, approximate=False)
    if name == "gelu_tanh":
        return jax.nn.gelu(g, approximate=True)
    if name == "relu":
        return jnp.maximum(g, 0.0)
    raise ValueError(name)


def _group_kernel(idx_ref, x_ref, nw_ref, w_ref, slo_ref, shi_ref, blo_ref,
                  bhi_ref, res_ref, o_ref, acc_ref, xt_ref, gsum_ref, sx_ref,
                  *, n_k: int, gs: int, quantized: bool, kind: str,
                  has_bias: bool, kdim: int, tb: int, sg: int,
                  prep: Optional[str], eps: float, has_res: bool):
    """Decode-path kernel; grid (mi, j, k).  Tiles (leading 1 = layer):
      x        [tm, K]     raw activations (bf16); index map constant in
                           (j, k) so the block DMAs once per mi
      w        [1, tb, tn] packed q4 bytes (or s8 q8 rows)
      slo/shi  [1, tb//gs, tn] group scales;  blo/bhi group biases

    Activation prep (transpose, per-token int8 quant, per-group sums for
    the bias term) runs IN-KERNEL at the first grid step of each mi and
    persists in scratch — as separate XLA ops it cost ~7 dispatches /
    ~25 us per matmul call (measured v5e: 4.2 ms/step of glue at 8B
    decode, > half the matmul kernel time itself).

    ``sg`` = scale groups folded into one MXU dot.  With sg == 1 the
    classic path runs: one K=32 dot per group, rescaled on the [tm, tn]
    output.  That wastes 4x MXU depth (K=32 of 128) *and* 8x rows at
    decode sizes (tm=16 of 128) — measured 2.8x the tile's DMA time.
    With sg > 1 the prep step instead writes a BLOCK-DIAGONAL activation
    matrix: for each super-group of S = sg*gs contiguous K elements,
    ``xbd[sgi] [sg*tm, S]`` holds x rows replicated into sg row-blocks,
    block g masked to the gs lanes of group g.  One dot
    ``xbd[sgi] @ q[S, tn]`` then yields all sg per-group partial products
    stacked along rows — full MXU depth, sg*tm rows — and the per-group
    scales fold on [tm, tn] row-blocks of the output exactly as before.
    Nominal MACs grow sg x (zeros off the diagonal), but utilization
    grows ~(128/gs) x, a large net win for tm <= 32 (decode).

    Scratch (sg == 1):
      xt    [K, tm]  x^T   (int8 codes when quantized, bf16 otherwise)
    Scratch (sg > 1):
      xt    [K//S, sg*tm, S] block-diagonal x (int8 codes / bf16)
    Shared:
      gsum  [K//gs, tm] f32 per-group sums of exact x (pre-divided by sx
                           when quantized; the output fold restores it)
      sx    [1, tm]  f32   per-token |x|max/127 (absent when exact)

    acc += sum_g s[g] * (x_g @ q_g)  (+ gsum @ b); out = sx^T * acc.
    """
    del idx_ref
    k = pl.program_id(2)
    first = (pl.program_id(1) == 0) & (k == 0)
    ssz = sg * gs                     # super-group K span
    tm = x_ref.shape[0]

    @pl.when(first)
    def _():
        # Fused PROLOGUE (prep): the small elementwise op feeding this
        # matmul runs here instead of as its own XLA kernel — at 8B
        # decode each layer saves 3 launches + 3 HBM round-trips of the
        # activations (rms x2, swiglu x1).  Numerics mirror the
        # standalone ops exactly (f32 compute, bf16 cast at the end).
        if prep is None:
            xrows = x_ref[:].astype(jnp.bfloat16)            # [tm, K]
        elif prep == "rms":
            xf = x_ref[:].astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=1, keepdims=True)
            nw = nw_ref[:].astype(jnp.float32)               # [1, K]
            xrows = ((xf * jax.lax.rsqrt(var + eps)) * nw
                     ).astype(jnp.bfloat16)
        elif prep.startswith("swiglu_"):
            xw = x_ref[:]                                    # [tm, 2K]
            g = xw[:, :kdim].astype(jnp.float32)
            u = xw[:, kdim:].astype(jnp.bfloat16)
            xrows = _act_f32(prep[7:], g).astype(jnp.bfloat16) * u
        else:
            raise ValueError(prep)
        # transpose via MXU: dot_general(x [tm,K], I [tm,tm]) over dim 0
        eye = (jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
               ).astype(jnp.bfloat16)
        xt = jax.lax.dot_general(
            xrows, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [K, tm]
        gsum = xt.reshape(kdim // gs, gs, tm).sum(axis=1)    # [K//gs, tm]
        if quantized:
            sx = jnp.maximum(jnp.max(jnp.abs(xt), axis=0, keepdims=True),
                             1e-6) / 127.0                   # [1, tm]
            sx_ref[:] = sx
            gsum_ref[:] = gsum / sx
        else:
            gsum_ref[:] = gsum
        if sg == 1:
            if quantized:
                xt_ref[:] = jnp.clip(jnp.round(xt / sx_ref[:]), -127, 127
                                     ).astype(jnp.int8)
            else:
                xt_ref[:] = xt.astype(xt_ref.dtype)
        else:
            xrows_f = xrows.astype(jnp.float32)              # [tm, K]
            if quantized:
                sxr = jnp.maximum(
                    jnp.max(jnp.abs(xrows_f), axis=1, keepdims=True),
                    1e-6) / 127.0                            # [tm, 1]
                qx = jnp.clip(jnp.round(xrows_f / sxr), -127, 127
                              ).astype(jnp.int8)
            else:
                qx = xrows_f.astype(jnp.bfloat16)
            mask = (jax.lax.broadcasted_iota(
                        jnp.int32, (sg * tm, ssz), 1) // gs
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (sg * tm, ssz), 0) // tm)
            zero = jnp.zeros((), qx.dtype)
            for sgi in range(kdim // ssz):
                sl = qx[:, sgi * ssz:(sgi + 1) * ssz]        # [tm, S]
                rep = jnp.concatenate([sl] * sg, axis=0)     # [sg*tm, S]
                xt_ref[sgi] = jnp.where(mask, rep, zero)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    khalf = kdim // 2 if kind == "q4" else 0
    if kind == "q4":
        lo, hi = _nibbles(w_ref[0])
        halves = ((lo, 0, slo_ref, blo_ref), (hi, khalf, shi_ref, bhi_ref))
    else:
        halves = ((w_ref[0], 0, slo_ref, blo_ref),)

    acc = acc_ref[:]
    for q, off, sr, br in halves:
        if quantized:
            q = pltpu.bitcast(q, jnp.int8) if q.dtype == jnp.uint8 else q
            pet = jnp.int32
        else:
            # Mosaic has no direct {u8,s8}->bf16 cast; route via i32/f32.
            # (A bitcast trick — 0x4300|v is bf16(128+v) exactly, shift
            # folded into the bias dot — measured 1.8x SLOWER than this
            # cast chain on v5e; the u8->u16 relayout is the cost.)
            q = q.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            pet = jnp.float32
        if sg == 1:
            x = xt_ref[pl.ds(off + k * tb, tb), :]
            for gi in range(tb // gs):
                a, b = gi * gs, (gi + 1) * gs
                d = jax.lax.dot_general(
                    x[a:b, :], q[a:b, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=pet)                # [tm, tn]
                s = sr[0, gi:gi + 1, :].astype(jnp.float32)
                acc = acc + d.astype(jnp.float32) * s
        else:
            sall = sr[0].astype(jnp.float32)                   # [gtile, tn]
            for si in range(tb // ssz):
                sg_idx = (off + k * tb) // ssz + si
                xs = xt_ref[pl.ds(sg_idx, 1)][0]               # [sg*tm, S]
                d = jax.lax.dot_general(
                    xs, q[si * ssz:(si + 1) * ssz, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=pet)                # [sg*tm, tn]
                df = d.astype(jnp.float32)
                for g in range(sg):
                    gi = si * sg + g
                    acc = acc + (df[g * tm:(g + 1) * tm, :]
                                 * sall[gi:gi + 1, :])
        if has_bias:
            gr = gsum_ref[pl.ds((off + k * tb) // gs, tb // gs), :]
            acc = acc + jax.lax.dot_general(
                gr, br[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        out = acc_ref[:]
        if quantized:
            # fold the per-token scale back in (sx is [1, tm]; out rows
            # are tokens, so transpose the broadcast)
            out = out * jnp.transpose(sx_ref[:])
        out = out.astype(o_ref.dtype)
        if has_res:
            # fused residual EPILOGUE: same bf16 add the caller's
            # ``x + y`` would run, one launch + round-trip earlier
            out = out + res_ref[:]
        o_ref[:] = out


def _expand_sub(s_ref, gs: int, tb: int):
    """[G, tn] group values -> [tb, tn] expanded along sublanes via a
    one-hot bf16 MXU matmul (exact for bf16-stored scales; Mosaic supports
    neither repeat nor sublane-splitting reshapes)."""
    st = s_ref.astype(jnp.bfloat16)
    gg = st.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, gg), 0) // gs
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, gg), 1)
    e = (row == col).astype(jnp.bfloat16)
    return jax.lax.dot_general(e, st, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dequant_kernel(idx_ref, xplo_ref, xphi_ref, xlo_ref, xhi_ref, w_ref,
                    slo_ref, shi_ref, blo_ref, bhi_ref, o_ref, acc_ref,
                    wdeq, *, n_k: int, gs: int, kind: str, has_bias: bool):
    """Prefill-path kernel; grid (mi, j, k), software-pipelined.

    Tiles: xplo/xphi [tm, tb] x cols of step k-1 (clamped); xlo/xhi the
    step-k cols (used only by the epilogue matmul); w [1, tb, tn] packed
    bytes; s/b [1, tb//gs, tn].

    VPU dequant of tile k runs CONCURRENTLY with the MXU matmul of tile
    k-1 (independent ops — the units overlap when not serialized by
    data deps; the previous version alternated dequant->matmul on the
    same tile, leaving each unit idle half the time).  Staged tiles
    live in the ``wdeq`` [2, halves, tb, tn] ring.
    """
    del idx_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if kind == "q4":
        lo, hi = _nibbles(w_ref[0])
        halves = ((lo, slo_ref, blo_ref), (hi, shi_ref, bhi_ref))
        xprev = (xplo_ref, xphi_ref)
        xcur = (xlo_ref, xhi_ref)
    else:
        halves = ((w_ref[0], slo_ref, blo_ref),)
        xprev = (xplo_ref,)
        xcur = (xlo_ref,)

    cur = jax.lax.rem(k, 2)
    prev = 1 - cur

    # dequant tile k into the ring (emitted first: no dep on the matmul)
    for hidx, (q, sr, br) in enumerate(halves):
        tb = q.shape[0]
        qf = q.astype(jnp.int32).astype(jnp.float32)
        w = qf * _expand_sub(sr[0], gs, tb)
        if has_bias:
            w = w + _expand_sub(br[0], gs, tb)
        wdeq[cur, hidx] = w.astype(jnp.bfloat16)

    @pl.when(k > 0)
    def _():
        acc = acc_ref[:]
        for hidx in range(len(halves)):
            acc = acc + jax.lax.dot_general(
                xprev[hidx][:], wdeq[prev, hidx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:]
        for hidx in range(len(halves)):
            acc = acc + jax.lax.dot_general(
                xcur[hidx][:], wdeq[cur, hidx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)


def _largest_tile(n: int, target: int) -> int:
    """Widest multiple-of-128 tile <= target (n itself if smaller)."""
    if n <= target:
        return n
    return min(target, max(128, (target // 128) * 128))


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "quantized",
                                    "sg", "prep", "eps"))
def _group_matmul(x: jax.Array, ql: QuantLinear, out_dtype=jnp.bfloat16,
                  interpret: bool = False, quantized: bool = False,
                  sg: Optional[int] = None, prep: Optional[str] = None,
                  eps: float = 0.0, nw: Optional[jax.Array] = None,
                  res: Optional[jax.Array] = None):
    """Decode-path entry: x [m, K] (m mult of 8), returns [m, N].

    ``prep``: fused prologue — "rms" (norm weight ``nw`` [1, K]) or
    "swiglu_<act>" (x is [m, 2K]: act(x[:, :K]) * x[:, K:]).
    ``res``: fused residual epilogue (out += res, bf16)."""
    m, xk = x.shape
    kdim = xk // 2 if prep is not None and prep.startswith("swiglu_") else xk
    n = ql.out_features
    gs = ql.group_size
    kind = ql.kind
    has_bias = ql.biases is not None
    halved = kdim // 2 if kind == "q4" else kdim

    w3 = ql.w if ql.stacked else ql.w[None]
    s3 = ql.scales if ql.scales.ndim == 3 else ql.scales[None]
    b3 = (ql.biases if ql.biases.ndim == 3 else ql.biases[None]) \
        if has_bias else s3
    idx = (jnp.asarray(ql.idx, jnp.int32).reshape(1) if ql.stacked
           else jnp.zeros((1,), jnp.int32))

    tb = _GROUP_TB
    while halved % tb:
        tb //= 2
    n_k = halved // tb
    tm = m if m <= 128 else 128
    tn = _largest_tile(n, _GROUP_TN_TARGET)
    # Super-group fold factor (see _group_kernel): must keep sg*tm <= 128
    # MXU rows and whole super-groups per k-tile.  Auto rule (swept on
    # v5e r4, tools/qmm_sg_bench.py): sg=4 wins on shapes whose grid has
    # enough (j, k) steps to amortize the once-per-mi xbd build
    # (gateup 637->718 GB/s, down 508->623); small grids (qkv, wo: 8
    # steps) lose to the build cost, and configs whose xbd scratch
    # forces tn below the sg=1 tile width (down at sg=8) also lose.
    if sg is None:
        sg = envs.QMM_SG
    auto = sg <= 0
    if auto:
        # exact mode runs bf16 dots: the sg x FLOPs blowup exceeds the
        # utilization win at bf16 MXU rate (measured 495 -> 438 GB/s),
        # so the fold only pays with int8 activations.
        sg = 4 if quantized else 1
    while sg > 1 and (sg * tm > 128 or tb % (sg * gs) or halved % (sg * gs)):
        sg //= 2
    # Scoped-VMEM byte model: in/out blocks (double-buffered) + scratch
    # + Mosaic's live per-group dot results (both nibble halves').
    # Calibration v5e: (tm=64, tn=4096) -> 20.77 MB actual, (64, 2048)
    # -> 16.57 MB, both over the 16 MB limit; model tracks ~1.2 MB low,
    # so the cap is 14.5 MB (keeps the proven decode config
    # tm=16/tn=7168 at model 14.0 MB while pushing tm=64 to tn=1024).
    halves = 2 if kind == "q4" else 1
    gtile_b = tb // gs
    wbytes = 1 if quantized or kind == "q4" else w3.dtype.itemsize

    def stack_bytes(tn_):
        xb = 2 * tm * xk * 2                      # x blocks (2K if swiglu)
        xt = sg * kdim * tm * (1 if quantized else 2)  # x^T / xbd scratch
        gsum = (kdim // gs) * tm * 4              # group sums
        wb = 2 * tb * tn_ * wbytes                # packed w blocks
        sb = 4 * 2 * gtile_b * tn_ * 2            # scale/bias blocks
        outb = 2 * tm * tn_ * 2
        accb = tm * tn_ * 4
        live = halves * gtile_b * tm * tn_ * 4    # in-flight group dots
        resb = 2 * tm * tn_ * 2 if res is not None else 0
        return xb + xt + gsum + wb + sb + outb + accb + live + resb

    # Observed model misses on v5e: tm=16 and tm=64 compile at cap
    # 14.5 MB, but tm=32 (the 17..32-live-seq bucket) runs ~2.5 MB over
    # the model at tn=4096 (16.91 MB actual vs 16 MB scoped limit,
    # probed r4) — Mosaic's live-dot stack doesn't scale linearly in tm.
    # A tighter cap there drops tn to 2048, which compiles with margin.
    cap = 12_000_000 if tm == 32 else 14_500_000

    def final_tn(tn_):
        while tn_ > 1024 and stack_bytes(tn_) > cap:
            tn_ = max(1024, (tn_ // 2 + 127) // 128 * 128)
        return tn_

    if auto and sg > 1:
        sg1, tn1 = sg, tn
        sg = 1
        base_tn = final_tn(tn)
        steps1 = pl.cdiv(n, base_tn) * n_k
        if steps1 >= 16:
            sg = sg1
            while sg > 1 and final_tn(tn1) < base_tn:
                sg //= 2
        tn = tn1
    tn = final_tn(tn)
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn), n_k)
    gtile = tb // gs

    hi_off = n_k if kind == "q4" else 0   # q8 reuses the lo operands

    # unused prologue/epilogue operands ride along in HBM (ANY: no block
    # DMA is scheduled for them; the kernel never reads the refs)
    if nw is None:
        nw = jnp.zeros((1, 128), jnp.bfloat16)
        nw_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        nw = nw.reshape(1, kdim)
        nw_spec = pl.BlockSpec((1, kdim), lambda i, j, k, l: (0, 0),
                               memory_space=pltpu.VMEM)
    if res is None:
        res_in = jnp.zeros((8, 128), jnp.bfloat16)
        res_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        res_in = res.astype(jnp.bfloat16)
        res_spec = pl.BlockSpec((tm, tn), lambda i, j, k, l: (i, j),
                                memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, xk), lambda i, j, k, l: (i, 0),
                         memory_space=pltpu.VMEM),               # x (raw)
            nw_spec,                                             # norm w
            pl.BlockSpec((1, tb, tn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),               # packed w
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),               # s lo
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l, o=hi_off:
                         (l[0], k + o, j), memory_space=pltpu.VMEM),  # s hi
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),               # b lo
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l, o=hi_off:
                         (l[0], k + o, j), memory_space=pltpu.VMEM),  # b hi
            res_spec,                                            # residual
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, l: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),                   # acc
            pltpu.VMEM((kdim, tm) if sg == 1
                       else (kdim // (sg * gs), sg * tm, sg * gs),
                       jnp.int8 if quantized else jnp.bfloat16),  # x^T/xbd
            pltpu.VMEM((kdim // gs, tm), jnp.float32),           # gsums
            pltpu.VMEM((1, tm), jnp.float32),                    # sx
        ],
    )
    kernel = functools.partial(
        _group_kernel, n_k=n_k, gs=gs, quantized=quantized, kind=kind,
        has_bias=has_bias, kdim=kdim, tb=tb, sg=sg, prep=prep, eps=eps,
        has_res=res is not None)
    w_bytes = w3.size // w3.shape[0] * w3.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * m * n * kdim, transcendentals=0,
        bytes_accessed=w_bytes + m * kdim * 4 + m * n * 2)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=cost, interpret=interpret,
    )(idx, x.astype(jnp.bfloat16), nw, w3, s3, s3, b3, b3, res_in)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _dequant_matmul(x: jax.Array, ql: QuantLinear, out_dtype=jnp.bfloat16,
                    interpret: bool = False):
    """Prefill-path entry: x [m, K] (m mult of 8), returns [m, N]."""
    m, kdim = x.shape
    n = ql.out_features
    gs = ql.group_size
    kind = ql.kind
    has_bias = ql.biases is not None
    halved = kdim // 2 if kind == "q4" else kdim

    w3 = ql.w if ql.stacked else ql.w[None]
    s3 = ql.scales if ql.scales.ndim == 3 else ql.scales[None]
    b3 = (ql.biases if ql.biases.ndim == 3 else ql.biases[None]) \
        if has_bias else s3
    idx = (jnp.asarray(ql.idx, jnp.int32).reshape(1) if ql.stacked
           else jnp.zeros((1,), jnp.int32))

    tb = _DEQ_TB
    while halved % tb:
        tb //= 2
    n_k = halved // tb
    tm = m if m <= _DEQ_TM else _DEQ_TM
    tn = _largest_tile(n, _DEQ_TN)
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn), n_k)
    gtile = tb // gs
    hi_off = n_k if kind == "q4" else 0

    def pk(k):                     # previous k-step, clamped
        return jnp.maximum(k - 1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tb), lambda i, j, k, l: (i, pk(k)),
                         memory_space=pltpu.VMEM),          # x lo (k-1)
            pl.BlockSpec((tm, tb),
                         lambda i, j, k, l, o=hi_off: (i, pk(k) + o),
                         memory_space=pltpu.VMEM),          # x hi (k-1)
            pl.BlockSpec((tm, tb), lambda i, j, k, l: (i, k),
                         memory_space=pltpu.VMEM),          # x lo cols
            pl.BlockSpec((tm, tb), lambda i, j, k, l, o=hi_off: (i, k + o),
                         memory_space=pltpu.VMEM),          # x hi cols
            pl.BlockSpec((1, tb, tn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),               # packed w
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),               # s lo
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l, o=hi_off:
                         (l[0], k + o, j), memory_space=pltpu.VMEM),  # s hi
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),               # b lo
            pl.BlockSpec((1, gtile, tn), lambda i, j, k, l, o=hi_off:
                         (l[0], k + o, j), memory_space=pltpu.VMEM),  # b hi
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k, l: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((2, 2 if kind == "q4" else 1, tb, tn),
                       jnp.bfloat16),             # dequant pipeline ring
        ],
    )
    kernel = functools.partial(_dequant_kernel, n_k=n_k, gs=gs, kind=kind,
                               has_bias=has_bias)
    w_bytes = w3.size // w3.shape[0] * w3.dtype.itemsize
    cost = pl.CostEstimate(
        flops=2 * m * n * kdim, transcendentals=0,
        bytes_accessed=w_bytes + m * kdim * 2 + m * n * 2)
    xb = x.astype(jnp.bfloat16)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=cost, interpret=interpret,
    )(idx, xb, xb, xb, xb, w3, s3, s3, b3, b3)


def _pallas_supported(ql: QuantLinear) -> bool:
    """Whether the fused kernels can tile this layer.

    Tiny dimensions (unit-test vocabularies, toy models) have no valid
    Mosaic tiling and fall back to ``linear_ref`` instead of crashing the
    engine step.
    """
    if ql.layout != "kn":
        return False
    if ql.out_features < 128:
        return False
    halved = ql.in_features // (2 if ql.kind == "q4" else 1)
    tb = _GROUP_TB
    while tb >= ql.group_size and halved % tb:
        tb //= 2
    if halved % tb or tb < ql.group_size or tb % ql.group_size:
        return False
    # scale blocks are [tb//gs, tn]: Mosaic needs the sublane dim to be a
    # multiple of 8 (it can't be "full" — the hi half indexes at an offset)
    if (tb // ql.group_size) % 8:
        return False
    return True


def _prep_jnp(x: jax.Array, prep) -> jax.Array:
    """Reference/fallback version of the kernel prologue (same numerics:
    f32 compute, cast back to x.dtype)."""
    if prep is None:
        return x
    if prep[0] == "rms":
        w, eps = prep[1], prep[2]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return ((xf * jax.lax.rsqrt(var + eps))
                * w.astype(jnp.float32)).astype(x.dtype)
    if prep[0] == "swiglu":
        k = x.shape[-1] // 2
        g, u = x[..., :k], x[..., k:]
        return _act_f32(prep[1], g.astype(jnp.float32)).astype(x.dtype) * u
    raise ValueError(prep[0])


def linear_ref(x: jax.Array, ql: QuantLinear,
               out_dtype=jnp.bfloat16) -> jax.Array:
    """Pure-jnp reference: x [..., K] -> [..., N].

    Matches the Pallas kernels' precision policy: raw codes participate at
    x.dtype precision, products accumulate in f32.
    """
    w = dequantize_ref(ql, x.dtype)
    y = jnp.einsum("...k,nk->...n", x, w,
                   preferred_element_type=jnp.float32)
    return y.astype(out_dtype)


def linear(x: jax.Array, ql: QuantLinear, out_dtype=jnp.bfloat16,
           use_pallas: Optional[bool] = None, prep=None,
           res: Optional[jax.Array] = None) -> jax.Array:
    """Quantized linear: x [..., K] -> [..., N] (= x @ dequant(w).T).

    ``prep``: optional fused prologue — ("rms", weight, eps) normalizes x
    first; ("swiglu", act_name) treats x as [..., 2K] and feeds
    act(x[:, :K]) * x[:, K:].  ``res``: optional fused residual epilogue
    (returns out + res).  On the decode-path Pallas kernel these run
    in-kernel (no extra launches/HBM round-trips); every other path
    computes them with identical jnp ops."""
    if ql.kind == "dense":
        w = ql.w
        if ql.stacked:
            w = jax.lax.dynamic_index_in_dim(
                w, jnp.asarray(ql.idx, jnp.int32), 0, keepdims=False)
        x = _prep_jnp(x, prep)
        out = jnp.einsum(
            "...k,nk->...n", x, w.astype(x.dtype)).astype(out_dtype)
        return out if res is None else out + res
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      or envs.PALLAS_INTERPRET)
    if not use_pallas or not _pallas_supported(ql):
        out = linear_ref(_prep_jnp(x, prep), ql, out_dtype)
        return out if res is None else out + res

    lead = x.shape[:-1]
    kdim = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, kdim)
    res2 = None if res is None else res.reshape(m, ql.out_features)
    pad = (-m) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        if res2 is not None:
            res2 = jnp.pad(res2, ((0, pad), (0, 0)))
    interpret = bool(envs.PALLAS_INTERPRET)
    if x2.shape[0] <= _GROUP_M_MAX:
        pk = eps = nw = None
        if prep is not None:
            if prep[0] == "rms":
                pk, nw, eps = "rms", prep[1], float(prep[2])
            elif x2.shape[0] <= 64:
                pk, eps = f"swiglu_{prep[1]}", 0.0
            else:
                # swiglu x blocks are [tm, 2K]; beyond decode-sized tm
                # they alone blow the 16 MB scoped-VMEM budget (observed:
                # [128, 28672] bf16 double-buffered = 14.7 MB)
                x2 = _prep_jnp(x2, prep)
        y = _group_matmul(x2, ql, out_dtype=out_dtype, interpret=interpret,
                          quantized=bool(envs.W4A8), prep=pk, eps=eps or 0.0,
                          nw=nw, res=res2)
    else:
        y = _dequant_matmul(_prep_jnp(x2, prep), ql, out_dtype=out_dtype,
                            interpret=interpret)
        if res2 is not None:
            y = y + res2
    if pad:
        y = y[:m]
    return y.reshape(*lead, ql.out_features)

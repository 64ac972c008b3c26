# SPDX-License-Identifier: Apache-2.0
"""Paged varlen attention over the TurboQuant-compressed KV pool (Pallas).

The quantized sibling of ``paged_attention_kernel.py`` (same ragged-q-tile
design; see that module).  What changes — mirroring the reference's
dequant-in-kernel paths (``pagedattention.metal:1354`` TQ branches):

* K tiles arrive as int8 codes + per-32-group scale/zero planes and
  dequantize in VMEM (group expansion via a one-hot matmul).
* V tiles stay in the FWHT-rotated space: centroid lookup (compare-select
  over the small Lloyd-Max codebook) with the per-token scale folded into
  the softmax weights, and the **inverse FWHT deferred to finalization** —
  the attention accumulator lives in rotated space and one [bq, D] x [D, D]
  matmul (Hadamard x sign matrix) undoes the rotation per head-group.  This
  is the reference's "inverse FWHT in the reduce pass" optimization
  (−23% TPOT claim, ``paged_ops.cpp:421-423``) — here it costs one tiny
  MXU dot per program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import turboquant as tq

DEFAULT_BQ = 128
KV_TILE = 128
NEG_INF = -1e30


def _hadamard_signs_matrix(d: int) -> np.ndarray:
    """M such that v = r @ M.T recovers v from rotated r (normalized)."""
    h = np.array([[1.0]])
    while h.shape[0] < d:
        h = np.block([[h, h], [h, -h]])
    h = h / np.sqrt(d)
    signs = tq.fwht_signs(d)
    return (h * signs[:, None]).astype(np.float32)     # M[d, j]


def _kernel(
    layer, qsl, ctx, tile_first_seq, block_tables,
    q_blk, kc_hbm, ks_hbm, kz_hbm, vc_hbm, vs_hbm, hmat_vmem, sinks_smem,
    o_blk,
    kcb, ksb, kzb, vcb, vsb, acc, m_s, l_s, sems,
    *,
    bq: int, bs: int, g: int, d: int, scale: float, kg: int,
    k_signed: bool, k_bits: int, v_levels: tuple,
    sliding_window: Optional[int],
    logit_softcap: Optional[float], has_sinks: bool,
):
    h = pl.program_id(0)
    ti = pl.program_id(1)
    c = KV_TILE // bs
    mb = block_tables.shape[1]
    s_max = ctx.shape[0]
    row0 = ti * bq
    row_end = row0 + bq
    li = layer[0]

    for gi in range(g):
        acc[gi] = jnp.zeros((bq, d), jnp.float32)
        m_s[gi] = jnp.full((bq, 128), NEG_INF, jnp.float32)
        l_s[gi] = jnp.zeros((bq, 128), jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, KV_TILE), 0)

    def tile_copies(seq, tile, slot):
        cps = []
        for ci in range(c):
            blk_idx = jnp.minimum(tile * c + ci, mb - 1)
            blk = block_tables[seq, blk_idx]
            sl = pl.ds(ci * bs, bs)
            cps.append(pltpu.make_async_copy(
                kc_hbm.at[li, h, blk], kcb.at[slot, sl, :],
                sems.at[slot, 5 * ci + 0]))
            cps.append(pltpu.make_async_copy(
                ks_hbm.at[li, h, blk], ksb.at[slot, sl, :],
                sems.at[slot, 5 * ci + 1]))
            cps.append(pltpu.make_async_copy(
                kz_hbm.at[li, h, blk], kzb.at[slot, sl, :],
                sems.at[slot, 5 * ci + 2]))
            cps.append(pltpu.make_async_copy(
                vc_hbm.at[li, h, blk], vcb.at[slot, sl, :],
                sems.at[slot, 5 * ci + 3]))
            cps.append(pltpu.make_async_copy(
                vs_hbm.at[li, h, blk], vsb.at[slot, :, sl],
                sems.at[slot, 5 * ci + 4]))
        return cps

    def start_kv(seq, tile, slot):
        for cp in tile_copies(seq, tile, slot):
            cp.start()

    def wait_kv(seq, tile, slot):
        for cp in tile_copies(seq, tile, slot):
            cp.wait()

    def expand_groups(s32):
        """[KV_TILE, d//kg] -> [KV_TILE, d] via one-hot matmul."""
        ng = d // kg
        col = jax.lax.broadcasted_iota(jnp.int32, (ng, d), 1) // kg
        row = jax.lax.broadcasted_iota(jnp.int32, (ng, d), 0)
        e = (col == row).astype(jnp.float32)
        return jax.lax.dot_general(
            s32, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def process_seq(seq):
        q_lo = jnp.maximum(qsl[seq], row0) - row0
        q_hi = jnp.minimum(qsl[seq + 1], row_end) - row0
        ql_seq = qsl[seq + 1] - qsl[seq]
        pos_row0 = ctx[seq] - ql_seq + (row0 - qsl[seq])
        row_pos = pos_row0 + rows
        row_in = (rows >= q_lo) & (rows < q_hi)

        kv_limit = pos_row0 + q_hi
        n_tiles = pl.cdiv(kv_limit, KV_TILE)
        if sliding_window is not None:
            first_pos = jnp.maximum(pos_row0 + q_lo - sliding_window + 1, 0)
            start_tile = first_pos // KV_TILE
        else:
            start_tile = jnp.int32(0)

        start_kv(seq, start_tile, 0)

        def body(t, slot):
            @pl.when(t + 1 < n_tiles)
            def _():
                start_kv(seq, t + 1, 1 - slot)
            wait_kv(seq, t, slot)

            # --- K dequant: codes * scale + zero ---
            kc32 = kcb[slot].astype(jnp.int32)
            if not k_signed:
                kc32 = kc32 & ((1 << k_bits) - 1)
            ks = expand_groups(ksb[slot])
            kz = expand_groups(kzb[slot])
            if k_signed:
                kt = (kc32.astype(jnp.float32) * ks).astype(jnp.bfloat16)
            else:
                kt = (kc32.astype(jnp.float32) * ks + kz
                      ).astype(jnp.bfloat16)

            # --- V centroid lookup (stays in rotated space) ---
            vbits = len(v_levels).bit_length() - 1
            vc32 = vcb[slot].astype(jnp.int32) & (len(v_levels) - 1)
            vt = jnp.zeros(vc32.shape, jnp.float32)
            for idx, lv in enumerate(v_levels):
                vt = jnp.where(vc32 == idx, lv, vt)
            vt = vt.astype(jnp.bfloat16)
            vscale = vsb[slot][0]                     # [KV_TILE] f32

            kv_pos = t * KV_TILE + jax.lax.broadcasted_iota(
                jnp.int32, (bq, KV_TILE), 1)
            mask = row_in & (kv_pos <= row_pos)
            if sliding_window is not None:
                mask &= kv_pos > row_pos - sliding_window

            for gi in range(g):
                s = jax.lax.dot_general(
                    q_blk[0, gi], kt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if logit_softcap:
                    s = jnp.tanh(s / logit_softcap) * logit_softcap
                s = jnp.where(mask, s, NEG_INF)

                m_prev = m_s[gi][:, 0:1]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_new = l_s[gi][:, 0:1] * alpha \
                    + jnp.sum(p, axis=-1, keepdims=True)
                # fold the per-token V scale into p; accumulate in
                # rotated space
                pv = (p * vscale[None, :]).astype(jnp.bfloat16)
                acc[gi] = acc[gi] * alpha + jax.lax.dot_general(
                    pv, vt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_s[gi] = jnp.broadcast_to(m_new, (bq, 128))
                l_s[gi] = jnp.broadcast_to(l_new, (bq, 128))
            return 1 - slot

        jax.lax.fori_loop(start_tile, n_tiles, body, 0, unroll=False)

    def seq_cond(seq):
        return (seq < s_max) & (qsl[seq] < row_end)

    def seq_body(seq):
        @pl.when(qsl[seq + 1] > jnp.maximum(qsl[seq], row0))
        def _():
            process_seq(seq)
        return seq + 1

    jax.lax.while_loop(seq_cond, seq_body, tile_first_seq[ti * (bq // 8)])

    # finalize: one inverse-FWHT matmul per head-group undoes the rotation
    hm = hmat_vmem[:]                                  # [d, d] f32 (M)
    for gi in range(g):
        l = l_s[gi][:, 0:1]
        a = acc[gi]
        if has_sinks:
            # attention sink: a per-head virtual logit joins the softmax
            # denominator only (no value row).  The sink participates in
            # the running max (oracle: paged_attention.py quant ref takes
            # max(logits, sink)) so a sink above every attention logit
            # can't overflow exp().
            sink = sinks_smem[0, h * g + gi]
            m = m_s[gi][:, 0:1]
            m2 = jnp.maximum(m, sink)
            r = jnp.exp(m - m2)
            l = l * r + jnp.exp(sink - m2)
            a = a * r
        out_rot = a / jnp.maximum(l, 1e-30)
        out = jax.lax.dot_general(
            out_rot, hm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # out = r @ M.T
        o_blk[0, gi] = out.astype(o_blk.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "codec_k", "codec_v", "bq",
                     "logit_softcap", "has_sinks", "interpret"))
def _tq_attention_call(
    q_t, kc, ks, kz, vc, vs, hmat, sinks_arr,
    layer, qsl, ctx, tile_first_seq, block_tables,
    *, scale, sliding_window, codec_k, codec_v, bq, logit_softcap,
    has_sinks, interpret,
):
    kvh, g, t2, d = q_t.shape
    _, _, nb, bs, _ = kc.shape
    assert KV_TILE % bs == 0
    n_tiles = t2 // bq
    c = KV_TILE // bs
    kg = tq.K_BLOCK

    k_signed, k_bits = tq._K_PARAMS[codec_k]
    v_levels = tuple(float(x) for x in tq._lloyd_codebook(
        tq._V_BITS[codec_v]))

    kernel = functools.partial(
        _kernel, bq=bq, bs=bs, g=g, d=d, scale=scale, kg=kg,
        k_signed=k_signed, k_bits=k_bits, v_levels=v_levels,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        has_sinks=has_sinks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(kvh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # k codes
            pl.BlockSpec(memory_space=pl.ANY),      # k scale
            pl.BlockSpec(memory_space=pl.ANY),      # k zero
            pl.BlockSpec(memory_space=pl.ANY),      # v codes
            pl.BlockSpec(memory_space=pl.ANY),      # v scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hadamard matrix
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sinks
        ],
        out_specs=pl.BlockSpec((1, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, KV_TILE, d), jnp.int8),           # k codes
            pltpu.VMEM((2, KV_TILE, d // kg), jnp.float32),  # k scale
            pltpu.VMEM((2, KV_TILE, d // kg), jnp.float32),  # k zero
            pltpu.VMEM((2, KV_TILE, d), jnp.int8),           # v codes
            pltpu.VMEM((2, 1, KV_TILE), jnp.float32),        # v scale
            pltpu.VMEM((g, bq, d), jnp.float32),             # acc
            pltpu.VMEM((g, bq, 128), jnp.float32),           # m
            pltpu.VMEM((g, bq, 128), jnp.float32),           # l
            pltpu.SemaphoreType.DMA((2, 5 * c)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, g, t2, d), q_t.dtype),
        interpret=interpret,
    )(layer, qsl, ctx, tile_first_seq, block_tables,
      q_t, kc, ks, kz, vc, vs, hmat, sinks_arr)


def tq_paged_attention(
    q: jax.Array,              # [T, qh, d]
    cache,                     # QuantPagedKVCache
    md,
    layer_idx=0,
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    sinks: Optional[jax.Array] = None,      # [qh] f32 or None
    logit_softcap: Optional[float] = None,
    interpret: bool = False,
    bq: Optional[int] = None,
) -> jax.Array:
    t, qh, d = q.shape
    kvh = cache.num_kv_heads
    g = qh // kvh
    if scale is None:
        scale = d ** -0.5
    if bq is None:
        bq = DEFAULT_BQ if t >= DEFAULT_BQ else 8
    t2 = -(-t // bq) * bq
    qp = jnp.pad(q, ((0, t2 - t), (0, 0), (0, 0))) if t2 != t else q
    q_t = qp.reshape(t2, kvh, g, d).transpose(1, 2, 0, 3)

    has_sinks = sinks is not None
    sinks_arr = (sinks.astype(jnp.float32).reshape(1, qh) if has_sinks
                 else jnp.zeros((1, qh), jnp.float32))
    hmat = jnp.asarray(_hadamard_signs_matrix(d))
    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    # v_scale pool [L, KH, NB, bs, 1] viewed with a leading singleton so
    # the per-block DMA slice is 2D ([1, bs]); the trailing singleton is
    # the write-kernel row layout (quant_kv_cache.py)
    l, kh, nb, bs = cache.v_scale.shape[:4]
    vs = cache.v_scale.reshape(l, kh, nb, 1, bs)

    out_t = _tq_attention_call(
        q_t.astype(jnp.bfloat16), cache.k_codes, cache.k_scale,
        cache.k_zero, cache.v_codes, vs, hmat, sinks_arr,
        layer, md.query_start_loc, md.context_lens, md.tile_first_seq,
        md.block_tables,
        scale=float(scale), sliding_window=sliding_window,
        codec_k=cache.codec_k, codec_v=cache.codec_v, bq=bq,
        logit_softcap=(float(logit_softcap) if logit_softcap else None),
        has_sinks=has_sinks, interpret=interpret)
    out = out_t.transpose(2, 0, 1, 3).reshape(t2, qh, d)
    return out[:t].astype(q.dtype)

# SPDX-License-Identifier: Apache-2.0
"""Paged varlen attention over the TurboQuant-compressed KV pool (Pallas).

The quantized sibling of ``paged_attention_kernel.py`` (same ragged-q-tile
design; see that module).  What changes — mirroring the reference's
dequant-in-kernel paths (``pagedattention.metal:1354`` TQ branches):

* K tiles arrive as PACKED bit planes (ops/turboquant.py strided layout:
  8/w codes per int8 byte; sub-byte widths decompose into a 4/2-bit hi
  plane + optional 1-bit lo plane) plus bf16 per-32-group scale/zero, and
  unpack+dequantize in VMEM — the unpack is 8/w static shifts + one lane
  concat per plane (the reference's sub-8-bit unpack, ``turboquant.metal``),
  the group expansion a one-hot matmul.
* V tiles stay in the FWHT-rotated space: centroid lookup (compare-select
  over the small Lloyd-Max codebook) with the per-token scale folded into
  the softmax weights, and the **inverse FWHT deferred to finalization** —
  the attention accumulator lives in rotated space and one [bq, D] x [D, D]
  matmul (Hadamard x sign matrix) undoes the rotation per head-group.  This
  is the reference's "inverse FWHT in the reduce pass" optimization
  (−23% TPOT claim, ``paged_ops.cpp:421-423``) — here it costs one tiny
  MXU dot per program.

Packed planes cut the DMA bytes to match the compression ratio: a q4_0 K
tile moves 64+16 bytes/token instead of 128+32 — decode stays
HBM-bandwidth-bound, so less traffic is directly faster.
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


def _unpack_tile(p: jax.Array, w: int) -> jax.Array:
    """[T, d*w/8] int8 plane -> [T, d] int32 codes (strided layout:
    piece s covers code lanes [s*n, (s+1)*n) at bit offset s*w)."""
    cpb = 8 // w
    pi = p.astype(jnp.int32) & 0xFF
    return jnp.concatenate(
        [(pi >> (s * w)) & ((1 << w) - 1) for s in range(cpb)], axis=-1)


def _kernel(
    layer, qsl, ctx, tile_first_seq, block_tables,
    q_blk, *refs,
    bq: int, bs: int, g: int, d: int, scale: float, kg: int,
    k_signed: bool, k_planes: tuple, v_planes: tuple, v_levels: tuple,
    sliding_window: Optional[int],
    logit_softcap: Optional[float], has_sinks: bool,
):
    has_klo = k_planes[1] > 0
    has_vlo = v_planes[1] > 0
    n_arr = 5 + int(has_klo) + int(has_vlo)
    hbm = refs[:n_arr]
    hmat_vmem = refs[n_arr]
    sinks_smem = refs[n_arr + 1]
    o_blk = refs[n_arr + 2]
    bufs = refs[n_arr + 3:n_arr + 3 + n_arr]
    acc, m_s, l_s, sems = refs[n_arr + 3 + n_arr:]
    i_kc = 0
    i_klo = 1 if has_klo else -1
    i_ks = 1 + int(has_klo)
    i_kz = i_ks + 1
    i_vc = i_kz + 1
    i_vlo = i_vc + 1 if has_vlo else -1
    i_vs = n_arr - 1

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
            for j in range(n_arr):
                dst = (bufs[j].at[slot, :, sl] if j == i_vs
                       else bufs[j].at[slot, sl, :])
                cps.append(pltpu.make_async_copy(
                    hbm[j].at[li, h, blk], dst,
                    sems.at[slot, n_arr * ci + j]))
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

            # --- K unpack + dequant: codes * scale + zero ---
            if k_planes[0] == 8:
                kc32 = bufs[i_kc][slot].astype(jnp.int32)
                if not k_signed:
                    kc32 = kc32 & 0xFF
            else:
                kc32 = _unpack_tile(bufs[i_kc][slot], k_planes[0])
                if has_klo:
                    kc32 = kc32 | (
                        _unpack_tile(bufs[i_klo][slot], 1) << k_planes[0])
            ks = expand_groups(bufs[i_ks][slot].astype(jnp.float32))
            kz = expand_groups(bufs[i_kz][slot].astype(jnp.float32))
            if k_signed:
                kt = (kc32.astype(jnp.float32) * ks).astype(jnp.bfloat16)
            else:
                kt = (kc32.astype(jnp.float32) * ks + kz
                      ).astype(jnp.bfloat16)

            # --- V unpack + centroid lookup (stays in rotated space) ---
            if v_planes[0] == 8:
                vc32 = bufs[i_vc][slot].astype(jnp.int32) \
                    & (len(v_levels) - 1)
            else:
                vc32 = _unpack_tile(bufs[i_vc][slot], v_planes[0])
                if has_vlo:
                    vc32 = vc32 | (
                        _unpack_tile(bufs[i_vlo][slot], 1) << v_planes[0])
            vt = jnp.zeros(vc32.shape, jnp.float32)
            for idx, lv in enumerate(v_levels):
                vt = jnp.where(vc32 == idx, lv, vt)
            vt = vt.astype(jnp.bfloat16)
            vscale = bufs[i_vs][slot][0].astype(jnp.float32)  # [KV_TILE]

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
    q_t, pools, hmat, sinks_arr,
    layer, qsl, ctx, tile_first_seq, block_tables,
    *, scale, sliding_window, codec_k, codec_v, bq, logit_softcap,
    has_sinks, interpret,
):
    kvh, g, t2, d = q_t.shape
    nb, bs = pools[0].shape[2], pools[0].shape[3]
    assert KV_TILE % bs == 0
    n_tiles = t2 // bq
    c = KV_TILE // bs
    kg = tq.K_BLOCK

    k_signed, k_bits = tq._K_PARAMS[codec_k]
    k_planes = tq.plane_split(k_bits)
    v_planes = tq.plane_split(tq._V_BITS[codec_v])
    v_levels = tuple(float(x) for x in tq._lloyd_codebook(
        tq._V_BITS[codec_v]))
    n_arr = len(pools)
    i_vs = n_arr - 1

    kernel = functools.partial(
        _kernel, bq=bq, bs=bs, g=g, d=d, scale=scale, kg=kg,
        k_signed=k_signed, k_planes=k_planes, v_planes=v_planes,
        v_levels=v_levels,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        has_sinks=has_sinks)

    # double-buffered per-array staging: vs transposes ([2, 1, KV_TILE]);
    # everything else stages rows [2, KV_TILE, last]
    scratch = [
        pltpu.VMEM((2, 1, KV_TILE) if j == i_vs
                   else (2, KV_TILE, p.shape[-1]), p.dtype)
        for j, p in enumerate(pools)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(kvh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_arr + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hadamard matrix
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sinks
        ],
        out_specs=pl.BlockSpec((1, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch + [
            pltpu.VMEM((g, bq, d), jnp.float32),             # acc
            pltpu.VMEM((g, bq, 128), jnp.float32),           # m
            pltpu.VMEM((g, bq, 128), jnp.float32),           # l
            pltpu.SemaphoreType.DMA((2, n_arr * c)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, g, t2, d), q_t.dtype),
        interpret=interpret,
    )(layer, qsl, ctx, tile_first_seq, block_tables,
      q_t, *pools, hmat, sinks_arr)


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
    pools = cache._pools()[:-1] + (vs,)    # same order, vs transposed

    out_t = _tq_attention_call(
        q_t.astype(jnp.bfloat16), pools, hmat, sinks_arr,
        layer, md.query_start_loc, md.context_lens, md.tile_first_seq,
        md.block_tables,
        scale=float(scale), sliding_window=sliding_window,
        codec_k=cache.codec_k, codec_v=cache.codec_v, bq=bq,
        logit_softcap=(float(logit_softcap) if logit_softcap else None),
        has_sinks=has_sinks, interpret=interpret)
    out = out_t.transpose(2, 0, 1, 3).reshape(t2, qh, d)
    return out[:t].astype(q.dtype)

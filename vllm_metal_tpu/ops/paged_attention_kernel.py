# SPDX-License-Identifier: Apache-2.0
"""Unified paged varlen attention — Pallas TPU kernel.

One kernel serves mixed prefill+decode batches (the reference needs two
Metal kernels + C++ dispatch for this: ``pagedattention.metal:819`` per-token
and ``pagedattention_tiled.metal:531`` tiled, selected in
``paged_ops.cpp:342``).

Design (ragged q tiles): the packed varlen token dim is cut into aligned
128-row tiles driven by regular BlockSpecs (q and out are pipelined by
Mosaic; no dynamic-offset DMAs).  A tile may span several sequences — the
kernel walks them with a while-loop; each sequence runs its own
double-buffered KV-tile loop against the HBM block pool, and row masking
confines the online-softmax update to that sequence's rows, so the m/l/acc
state of one physical tile is shared conflict-free by all its sequences.
GQA: all G q-heads of one kv head ride each KV block load (the reference's
head-mapping / window-mode trick).  Sliding window skips invisible leading
KV tiles.  Semantics oracle: ``paged_attention.paged_attention_ref``.

Layouts:
  q:        [T, q_heads, head_dim] -> internally [kvh, G, T', head_dim]
  k_cache:  [kv_heads, num_blocks, block_size, head_dim]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 128      # query rows per tile
KV_TILE = 128         # kv positions per inner tile
NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    layer, qsl, ctx, tile_first_seq, block_tables,
    # inputs (q/out blocked by Mosaic; caches stay in HBM)
    q_blk, k_hbm, v_hbm, sinks_smem,
    # outputs
    o_blk,
    # scratch
    kbuf, vbuf, acc, m_s, l_s, ksem, vsem,
    *,
    bq: int, bs: int, g: int, d: int, scale: float, kv_tile: int,
    sliding_window: Optional[int], logit_softcap: Optional[float],
    has_sinks: bool,
):
    KV_TILE = kv_tile
    h = pl.program_id(0)
    ti = pl.program_id(1)
    c = KV_TILE // bs                 # cache blocks per kv tile
    mb = block_tables.shape[1]
    s_max = ctx.shape[0]
    row0 = ti * bq
    row_end = row0 + bq

    # init online-softmax state (scratch persists across grid steps)
    for gi in range(g):
        acc[gi] = jnp.zeros((bq, d), jnp.float32)
        m_s[gi] = jnp.full((bq, 128), NEG_INF, jnp.float32)
        l_s[gi] = jnp.zeros((bq, 128), jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, KV_TILE), 0)

    li = layer[0]

    def tile_dma(seq, tile, slot, ref_hbm, buf, sem):
        copies = []
        for ci in range(c):
            blk_idx = jnp.minimum(tile * c + ci, mb - 1)
            blk = block_tables[seq, blk_idx]
            copies.append(pltpu.make_async_copy(
                ref_hbm.at[li, h, blk],
                buf.at[slot, pl.ds(ci * bs, bs), :],
                sem.at[slot, ci]))
        return copies

    def start_kv(seq, tile, slot):
        for cp in tile_dma(seq, tile, slot, k_hbm, kbuf, ksem):
            cp.start()
        for cp in tile_dma(seq, tile, slot, v_hbm, vbuf, vsem):
            cp.start()

    def wait_k(seq, tile, slot):
        for cp in tile_dma(seq, tile, slot, k_hbm, kbuf, ksem):
            cp.wait()

    def wait_v(seq, tile, slot):
        for cp in tile_dma(seq, tile, slot, v_hbm, vbuf, vsem):
            cp.wait()

    def process_seq(seq):
        q_lo = jnp.maximum(qsl[seq], row0) - row0        # tile-local
        q_hi = jnp.minimum(qsl[seq + 1], row_end) - row0
        ql_seq = qsl[seq + 1] - qsl[seq]
        # absolute position of tile row r (valid only inside [q_lo, q_hi))
        pos_row0 = ctx[seq] - ql_seq + (row0 - qsl[seq])
        row_pos = pos_row0 + rows
        row_in = (rows >= q_lo) & (rows < q_hi)

        kv_limit = pos_row0 + q_hi                       # last row's pos + 1
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
            wait_k(seq, t, slot)

            kt = kbuf[slot]                              # [KV_TILE, d] bf16
            kv_pos = t * KV_TILE + jax.lax.broadcasted_iota(
                jnp.int32, (bq, KV_TILE), 1)
            mask = row_in & (kv_pos <= row_pos)
            if sliding_window is not None:
                mask &= kv_pos > row_pos - sliding_window

            # scores for all head-group members against K first, so the V
            # transfer hides behind the QK matmuls + softmax update
            ps = []
            for gi in range(g):
                s = jax.lax.dot_general(
                    q_blk[0, gi], kt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if logit_softcap:
                    s = jnp.tanh(s / logit_softcap) * logit_softcap
                s = jnp.where(mask, s, NEG_INF)

                m_prev = m_s[gi][:, 0:1]                 # [bq, 1]
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_new = l_s[gi][:, 0:1] * alpha \
                    + jnp.sum(p, axis=-1, keepdims=True)
                acc[gi] = acc[gi] * alpha
                m_s[gi] = jnp.broadcast_to(m_new, (bq, 128))
                l_s[gi] = jnp.broadcast_to(l_new, (bq, 128))
                ps.append(p.astype(jnp.bfloat16))

            wait_v(seq, t, slot)
            vt = vbuf[slot]
            for gi in range(g):
                acc[gi] = acc[gi] + jax.lax.dot_general(
                    ps[gi], vt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return 1 - slot

        jax.lax.fori_loop(start_tile, n_tiles, body, 0, unroll=False)

    # walk the sequences overlapping this q tile
    def seq_cond(seq):
        return (seq < s_max) & (qsl[seq] < row_end)

    def seq_body(seq):
        @pl.when(qsl[seq + 1] > jnp.maximum(qsl[seq], row0))
        def _():
            process_seq(seq)
        return seq + 1

    jax.lax.while_loop(seq_cond, seq_body,
                       tile_first_seq[ti * (bq // 8)])

    for gi in range(g):
        l = l_s[gi][:, 0:1]
        if has_sinks:
            sink = sinks_smem[0, h * g + gi]
            l = l + jnp.exp(sink - m_s[gi][:, 0:1])
        o_blk[0, gi] = (acc[gi] / jnp.maximum(l, 1e-30)).astype(o_blk.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap", "bq",
                     "interpret"))
def _paged_attention_call(
    q_t: jax.Array,            # [kvh, G, T', d] bf16 (T' multiple of bq)
    k_cache: jax.Array,        # [L, kvh, nb, bs, d] (stacked layer pools)
    v_cache: jax.Array,
    sinks: Optional[jax.Array],         # [qh] f32 or None
    layer: jax.Array,          # [1] layer index into the stacked pools
    qsl: jax.Array,            # [S+1] query_start_loc
    ctx: jax.Array,            # [S] context lens
    tile_first_seq: jax.Array,  # [T'/bq]
    block_tables: jax.Array,   # [S, MB]
    *,
    scale: float,
    sliding_window: Optional[int],
    logit_softcap: Optional[float],
    bq: int,
    interpret: bool,
) -> jax.Array:
    kvh, g, t2, d = q_t.shape
    _, _, nb, bs, _ = k_cache.shape
    kv_tile = max(KV_TILE, bs)        # one-DMA tiles for large blocks
    assert kv_tile % bs == 0, (kv_tile, bs)
    assert t2 % bq == 0
    n_tiles = t2 // bq
    c = kv_tile // bs

    has_sinks = sinks is not None
    sinks_arr = (sinks.astype(jnp.float32).reshape(1, kvh * g)
                 if has_sinks else jnp.zeros((1, kvh * g), jnp.float32))

    kernel = functools.partial(
        _kernel, bq=bq, bs=bs, g=g, d=d, scale=scale, kv_tile=kv_tile,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        has_sinks=has_sinks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(kvh, n_tiles),
        in_specs=[
            pl.BlockSpec((1, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),     # q tile
            pl.BlockSpec(memory_space=pl.ANY),         # k pool (HBM)
            pl.BlockSpec(memory_space=pl.ANY),         # v pool (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # sinks
        ],
        out_specs=pl.BlockSpec((1, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kv_tile, d), jnp.bfloat16),     # kbuf
            pltpu.VMEM((2, kv_tile, d), jnp.bfloat16),     # vbuf
            pltpu.VMEM((g, bq, d), jnp.float32),           # acc
            pltpu.VMEM((g, bq, 128), jnp.float32),         # m
            pltpu.VMEM((g, bq, 128), jnp.float32),         # l
            pltpu.SemaphoreType.DMA((2, c)),               # ksem
            pltpu.SemaphoreType.DMA((2, c)),               # vsem
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, g, t2, d), q_t.dtype),
        interpret=interpret,
    )(layer, qsl, ctx, tile_first_seq, block_tables,
      q_t, k_cache, v_cache, sinks_arr)


def paged_attention(
    q: jax.Array,              # [T, qh, d]
    k_cache: jax.Array,        # [L, kvh, nb, bs, d] stacked pools
    v_cache: jax.Array,
    md,                        # AttentionMetadata
    layer_idx=0,               # int or traced scalar
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    sinks: Optional[jax.Array] = None,
    logit_softcap: Optional[float] = None,
    interpret: bool = False,
    bq: Optional[int] = None,
) -> jax.Array:
    t, qh, d = q.shape
    kvh = k_cache.shape[1]
    g = qh // kvh
    if scale is None:
        scale = d ** -0.5
    if bq is None:
        # decode-heavy small buckets: 8-row tiles cut the per-sequence
        # masked-softmax/MXU waste 16x (rows in a tile mostly belong to
        # other sequences); large prefill buckets amortize KV fetches
        # across 128 rows
        bq = DEFAULT_BQ if t >= DEFAULT_BQ else 8
    t2 = -(-t // bq) * bq
    qp = jnp.pad(q, ((0, t2 - t), (0, 0), (0, 0))) if t2 != t else q
    q_t = qp.reshape(t2, kvh, g, d).transpose(1, 2, 0, 3)

    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out_t = _paged_attention_call(
        q_t.astype(jnp.bfloat16), k_cache, v_cache, sinks, layer,
        md.query_start_loc, md.context_lens, md.tile_first_seq,
        md.block_tables,
        scale=float(scale), sliding_window=sliding_window,
        logit_softcap=logit_softcap, bq=bq, interpret=interpret)

    out = out_t.transpose(2, 0, 1, 3).reshape(t2, qh, d)
    return out[:t].astype(q.dtype)

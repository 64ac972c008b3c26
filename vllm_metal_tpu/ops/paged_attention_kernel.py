# SPDX-License-Identifier: Apache-2.0
"""Unified paged varlen attention — Pallas TPU kernel.

One kernel serves mixed prefill+decode batches (the reference needs two
Metal kernels + C++ dispatch for this: ``pagedattention.metal:819`` per-token
and ``pagedattention_tiled.metal:531`` tiled, selected in
``paged_ops.cpp:342``).

Design (ragged q tiles): the packed varlen token dim is cut into aligned
128-row tiles driven by regular BlockSpecs (q and out are pipelined by
Mosaic; no dynamic-offset DMAs).  A tile may span several sequences — the
kernel walks their (sequence, kv-tile) pairs with ONE software-pipelined
loop backed by an NBUF-deep DMA ring, so KV prefetch depth spans sequence
boundaries (decode is DMA-latency bound: with double buffering each tile
and each sequence handoff stalls on one transfer).  Row masking confines
the online-softmax update to each sequence's rows, so the m/l/acc state of
one physical tile is shared conflict-free by all its sequences: a row's
pre-first-touch garbage accumulation is annihilated by the alpha=exp(-1e30
- m_real)=0 rescale the first time its own sequence scores it.
GQA: all G q-heads of one kv head ride each KV block load (the reference's
head-mapping / window-mode trick).  Sliding window skips invisible leading
KV tiles.  Semantics oracle: ``paged_attention.paged_attention_ref``.

Layouts:
  q:        [T, q_heads, head_dim] -> internally [kvh, G, T', head_dim]
  kv_cache: [L, kv_heads, num_blocks, 2*block_size, head_dim] — K in rows
            [0, bs), V in rows [bs, 2bs) of each block, so ONE descriptor
            per block fetches both (decode is DMA-issue-overhead bound).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

DEFAULT_BQ = 128      # query rows per tile
# kv positions per inner tile: per-iteration costs (semaphore waits, cursor
# math, softmax state update) amortize over the tile, so bigger is faster
# until VMEM/DMA granularity pushes back
KV_TILE = int(os.environ.get("VLLM_METAL_TPU_KV_TILE", "512"))
NBUF = int(os.environ.get("VLLM_METAL_TPU_KV_NBUF", "4"))  # DMA ring depth
NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    layer, qsl, ctx, tile_first_seq, block_tables,
    # inputs (q/out blocked by Mosaic; cache stays in HBM)
    q_blk, kv_hbm, sinks_smem,
    # outputs
    o_blk,
    # scratch
    kvbuf, acc, m_s, l_s, kvsem,
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

    # init online-softmax state (scratch persists across grid steps).
    # All g head-group members are stacked on the row dim ([g*bq, ...]) so
    # the per-tile QK/PV matmuls and softmax updates run once per tile
    # instead of g times (decode's bq=8 rows alone starve the VPU/MXU).
    gbq = g * bq
    acc[...] = jnp.zeros((gbq, d), jnp.float32)
    m_s[...] = jnp.full((gbq, 128), NEG_INF, jnp.float32)
    l_s[...] = jnp.zeros((gbq, 128), jnp.float32)

    rows_g = jax.lax.broadcasted_iota(jnp.int32, (gbq, KV_TILE), 0)
    rows = rows_g - (rows_g // bq) * bq              # tile-local row id
    cols = jax.lax.broadcasted_iota(jnp.int32, (gbq, KV_TILE), 1)

    li = layer[0]
    nbuf = kvbuf.shape[0]

    def tile_dma(seq, tile, slot):
        # one descriptor per cache block moves its K AND V rows ([2bs, d])
        copies = []
        for ci in range(c):
            blk_idx = jnp.minimum(tile * c + ci, mb - 1)
            blk = block_tables[seq, blk_idx]
            copies.append(pltpu.make_async_copy(
                kv_hbm.at[li, h, blk],
                kvbuf.at[slot, ci],
                kvsem.at[slot, ci]))
        return copies

    def start_kv(seq, tile, slot):
        for cp in tile_dma(seq, tile, slot):
            cp.start()

    def wait_kv(seq, tile, slot):
        for cp in tile_dma(seq, tile, slot):
            cp.wait()

    # ---- (sequence, kv-tile) cursor arithmetic (scalar, SMEM reads) ----
    def seq_params(seq):
        """(q_lo, q_hi, pos_row0, start_tile, n_tiles) for a valid seq."""
        seq1 = jnp.minimum(seq + 1, s_max)
        q_lo = jnp.maximum(qsl[seq], row0) - row0        # tile-local
        q_hi = jnp.minimum(qsl[seq1], row_end) - row0
        ql_seq = qsl[seq1] - qsl[seq]
        # absolute position of tile row r (valid only inside [q_lo, q_hi))
        pos_row0 = ctx[jnp.minimum(seq, s_max - 1)] - ql_seq \
            + (row0 - qsl[seq])
        kv_limit = pos_row0 + q_hi                       # last row's pos + 1
        n_tiles = pl.cdiv(kv_limit, KV_TILE)
        if sliding_window is not None:
            first_pos = jnp.maximum(pos_row0 + q_lo - sliding_window + 1, 0)
            start_tile = first_pos // KV_TILE
        else:
            start_tile = jnp.int32(0)
        return q_lo, q_hi, pos_row0, start_tile, n_tiles

    def advance_seq(s):
        """First seq >= s with rows inside this q tile (or the stop seq)."""
        def cond(x):
            x1 = jnp.minimum(x + 1, s_max)
            return (x < s_max) & (qsl[x] < row_end) \
                & (qsl[x1] <= jnp.maximum(qsl[x], row0))
        return jax.lax.while_loop(cond, lambda x: x + 1, s)

    def seq_valid(s):
        return (s < s_max) & (qsl[jnp.minimum(s, s_max)] < row_end)

    def next_cursor(s, t):
        """Successor of a VALID (seq, tile) work item."""
        n_tiles = seq_params(s)[4]

        def adv(_):
            s2 = advance_seq(s + 1)
            v2 = seq_valid(s2)
            t2 = jnp.where(v2, seq_params(s2)[3], 0)
            return s2, t2, v2

        return jax.lax.cond(
            t + 1 < n_tiles,
            lambda _: (s, t + 1, jnp.bool_(True)), adv, 0)

    def guarded_next(s, t, v):
        return jax.lax.cond(
            v, lambda _: next_cursor(s, t),
            lambda _: (s, t, jnp.bool_(False)), 0)

    def issue_and_advance(slot, s, t, v):
        @pl.when(v)
        def _():
            start_kv(s, t, slot)
        return guarded_next(s, t, v)

    s0 = advance_seq(tile_first_seq[ti * (bq // 8)])
    v0 = seq_valid(s0)
    t0 = jnp.where(v0, seq_params(s0)[3], 0)

    # fill the DMA ring: prefetch cursor runs nbuf items ahead of compute
    ps, pt, pv = s0, t0, v0
    for i in range(nbuf):
        ps, pt, pv = issue_and_advance(i, ps, pt, pv)

    qv = q_blk[0].reshape(gbq, d)                        # stacked heads

    def loop_body(carry):
        slot, cs, ct, cv, ps, pt, pv = carry
        q_lo, q_hi, pos_row0, _, _ = seq_params(cs)
        row_pos = pos_row0 + rows
        row_in = (rows >= q_lo) & (rows < q_hi)

        wait_kv(cs, ct, slot)
        tile = kvbuf[slot]                               # [c, 2bs, d] bf16
        kt = tile[:, :bs].reshape(KV_TILE, d)
        vt = tile[:, bs:].reshape(KV_TILE, d)
        kv_pos = ct * KV_TILE + cols
        mask = row_in & (kv_pos <= row_pos)
        if sliding_window is not None:
            mask &= kv_pos > row_pos - sliding_window

        # scores against K first, so the V transfer hides behind the QK
        # matmul + softmax update
        s = jax.lax.dot_general(
            qv, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [gbq, KV_TILE]
        if logit_softcap:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_s[:, 0:1]                             # [gbq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_s[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc[...] = acc[...] * alpha
        m_s[...] = jnp.broadcast_to(m_new, (gbq, 128))
        l_s[...] = jnp.broadcast_to(l_new, (gbq, 128))

        acc[...] = acc[...] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # the slot is consumed — reuse it for the next prefetch
        ps, pt, pv = issue_and_advance(slot, ps, pt, pv)
        cs, ct, cv = next_cursor(cs, ct)
        slot = jnp.where(slot + 1 == nbuf, 0, slot + 1)
        return slot, cs, ct, cv, ps, pt, pv

    jax.lax.while_loop(
        lambda carry: carry[3], loop_body,
        (jnp.int32(0), s0, t0, v0, ps, pt, pv))

    for gi in range(g):
        sl = slice(gi * bq, (gi + 1) * bq)
        l = l_s[sl, 0:1]
        if has_sinks:
            sink = sinks_smem[0, h * g + gi]
            l = l + jnp.exp(sink - m_s[sl, 0:1])
        o_blk[0, gi] = (acc[sl] / jnp.maximum(l, 1e-30)).astype(o_blk.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap", "bq",
                     "interpret"))
def _paged_attention_call(
    q_t: jax.Array,            # [kvh, G, T', d] bf16 (T' multiple of bq)
    kv_cache: jax.Array,       # [L, kvh, nb, 2*bs, d] (stacked layer pools)
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
    _, _, nb, bs2, _ = kv_cache.shape
    bs = bs2 // 2
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
            pl.BlockSpec(memory_space=pl.ANY),         # kv pool (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # sinks
        ],
        out_specs=pl.BlockSpec((1, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, c, 2 * bs, d), jnp.bfloat16),  # kv ring
            pltpu.VMEM((g * bq, d), jnp.float32),          # acc (heads stacked)
            pltpu.VMEM((g * bq, 128), jnp.float32),        # m
            pltpu.VMEM((g * bq, 128), jnp.float32),        # l
            pltpu.SemaphoreType.DMA((NBUF, c)),            # kvsem
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, g, t2, d), q_t.dtype),
        interpret=interpret,
    )(layer, qsl, ctx, tile_first_seq, block_tables,
      q_t, kv_cache, sinks_arr)


def paged_attention(
    q: jax.Array,              # [T, qh, d]
    kv_cache: jax.Array,       # [L, kvh, nb, 2*bs, d] stacked combined pools
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
    kvh = kv_cache.shape[1]
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
        q_t.astype(jnp.bfloat16), kv_cache, sinks, layer,
        md.query_start_loc, md.context_lens, md.tile_first_seq,
        md.block_tables,
        scale=float(scale), sliding_window=sliding_window,
        logit_softcap=logit_softcap, bq=bq, interpret=interpret)

    out = out_t.transpose(2, 0, 1, 3).reshape(t2, qh, d)
    return out[:t].astype(q.dtype)

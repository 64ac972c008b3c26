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
boundaries.  Every grid step processes ALL kv heads.  Each cache block's
K (and V) for all heads is one contiguous descriptor landed at the
block's ROW OFFSET of per-head-contiguous kv-tile buffers (strided-dst
DMA sustains ~450 GB/s, measured v5e), so the compute loop runs ONE wide
batched QK dot and ONE PV dot per kv tile — the previous per-block dot
pairs were MXU-issue-bound at ~2.3us per cache block (~55 GB/s decode)
regardless of block size, tile size, or ring depth.
Row masking confines the online-softmax update to each sequence's rows, so
the m/l/acc state of one physical tile is shared conflict-free by all its
sequences: a row's pre-first-touch garbage accumulation is annihilated by
the alpha=exp(-1e30 - m_real)=0 rescale the first time its own sequence
scores it.  GQA: all G q-heads of one kv head ride each KV block load (the
reference's head-mapping trick); the G members are additionally stacked on
the matmul row dim so decode's 8-row tiles still feed the MXU 32+ rows.
Sliding window skips invisible leading KV tiles.  Semantics oracle:
``paged_attention.paged_attention_ref``.

Layouts:
  q:        [T, q_heads, head_dim] -> internally [kvh, G, T', head_dim]
  kv_cache: [L, num_blocks, 2, kv_heads, block_size, head_dim] — dim 2
            splits K (0) and V (1).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 128      # query rows per tile
# kv positions per inner tile: per-iteration costs (cursor math, softmax
# state update) amortize over the tile; DMA descriptors are per block
KV_TILE = int(os.environ.get("VLLM_METAL_TPU_KV_TILE", "128"))
# DMA ring depth in SLOTS; each slot holds TWO work items (the r5 paired
# loop), so in-flight prefetch = 2*NBUF items (r4 sweep: 6 items optimal)
NBUF = int(os.environ.get("VLLM_METAL_TPU_KV_NBUF", "3"))
NEG_INF = -1e30
# scoped-vmem budget for one grid step (chip limit 16MB; leave headroom for
# Mosaic's own spills, semaphores, and the double-buffered q/out blocks)
_VMEM_BUDGET = 13 * 1024 * 1024


def _vmem_bytes(hc: int, g: int, bq: int, d: int, bs: int,
                kv_tile: int) -> int:
    gbq = g * bq
    sw = 2 * kv_tile                              # paired slot width
    return (2 * 2 * (hc * gbq * d * 2)            # q + out, double-buffered
            + NBUF * 2 * hc * sw * d * 2          # k + v tile rings
            + hc * gbq * d * 4                    # acc
            + 2 * hc * gbq * 128 * 4              # m, l
            + hc * gbq * sw * 4)                  # scores


def _kernel(
    # scalar prefetch
    layer, qsl, ctx, work_items, work_start, block_tables,
    # inputs (q/out blocked by Mosaic; cache stays in HBM)
    q_blk, kv_hbm, sinks_smem,
    # outputs
    o_blk,
    # scratch
    kbuf, vbuf, acc, m_s, l_s, kvsem,
    *,
    bq: int, bs: int, hc: int, g: int, d: int, scale: float, kv_tile: int,
    sliding_window: Optional[int], logit_softcap: Optional[float],
    has_sinks: bool,
):
    KV_TILE = kv_tile
    hi0 = pl.program_id(0)            # head-block index (hc heads per step)
    ti = pl.program_id(1)
    c = KV_TILE // bs                 # cache blocks per kv tile
    mb = block_tables.shape[1]
    s_max = ctx.shape[0]
    row0 = ti * bq
    row_end = row0 + bq

    # init online-softmax state (scratch persists across grid steps).
    # All g head-group members are stacked on the row dim ([hc, g*bq, ...])
    # so the per-tile QK/PV matmuls and softmax updates run once per tile
    # (decode's bq=8 rows alone starve the VPU/MXU).
    gbq = g * bq
    sw = 2 * KV_TILE                  # paired slot width (2 work items)
    acc[...] = jnp.zeros((hc, gbq, d), jnp.float32)
    m_s[...] = jnp.full((hc, gbq, 128), NEG_INF, jnp.float32)
    l_s[...] = jnp.zeros((hc, gbq, 128), jnp.float32)

    rows_g = jax.lax.broadcasted_iota(jnp.int32, (gbq, sw), 0)
    rows = rows_g - (rows_g // bq) * bq              # tile-local row id
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (gbq, sw), 1)
    is_b = cols2 >= KV_TILE                          # second-half columns
    col_loc = cols2 - jnp.where(is_b, KV_TILE, 0)

    li = layer[0]
    nbuf = kbuf.shape[0]

    def tile_dma(seq, tile, slot, half):
        # per cache block: one contiguous ~hc*bs*d*2B descriptor for K and
        # one for V, landed at the block's row offset of per-head
        # CONTIGUOUS kv-tile buffers (strided dst sustains ~450 GB/s) —
        # so compute below runs ONE wide dot per PAIR of tiles, not per
        # block (r5: two work items share each slot/softmax update)
        copies = []
        for ci in range(c):
            blk_idx = jnp.minimum(tile * c + ci, mb - 1)
            blk = block_tables[seq, blk_idx]
            for kv_i, buf in ((0, kbuf), (1, vbuf)):
                copies.append(pltpu.make_async_copy(
                    kv_hbm.at[li, blk, kv_i, pl.ds(hi0 * hc, hc)],
                    buf.at[slot, :,
                           pl.ds(half * KV_TILE + ci * bs, bs)],
                    kvsem.at[slot, half, ci, kv_i]))
        return copies

    # ---- host-precomputed work list ----
    # The (seq, kv-tile) visit order was computed on the host
    # (metadata._build_work_lists) and arrives as packed SMEM scalars:
    # the former on-device cursor walk (branch-free advance + per-seq
    # param recomputation) cost ~9.5us of scalar-core time PER VISIT —
    # more than the visit's 512KB KV DMA at full bandwidth.
    def unpack(w):
        packed = work_items[w]
        return packed >> 16, packed & 0xFFFF

    w0 = work_start[ti]
    w1 = work_start[ti + 1]

    def pair_item(w, half):
        """Item index for a slot half; an odd tail clamps half 1 to the
        last item (its DMA repeats, its mask is forced off — the buffer
        never holds unintialized garbage that could NaN the PV dot)."""
        return jnp.minimum(w + half, w1 - 1)

    def issue_pair(w, slot):
        @pl.when(w < w1)
        def _():
            for half in (0, 1):
                seq, tile = unpack(pair_item(w, half))
                for cp in tile_dma(seq, tile, slot, half):
                    cp.start()

    def wait_pair(w, slot):
        for half in (0, 1):
            seq, tile = unpack(pair_item(w, half))
            for cp in tile_dma(seq, tile, slot, half):
                cp.wait()

    for i in range(nbuf):
        issue_pair(w0 + 2 * i, i)

    qv = q_blk[...].reshape(hc, gbq, d)                  # stacked heads

    def seq_params(w):
        seq, tile = unpack(w)
        seq1 = jnp.minimum(seq + 1, s_max)
        q_lo = jnp.maximum(qsl[seq], row0) - row0        # tile-local
        q_hi = jnp.minimum(qsl[seq1], row_end) - row0
        pos_row0 = ctx[seq] - (qsl[seq1] - qsl[seq]) + (row0 - qsl[seq])
        return tile, q_lo, q_hi, pos_row0

    def loop_body(p_i, slot):
        w = w0 + 2 * p_i
        ta, qlo_a, qhi_a, pr_a = seq_params(pair_item(w, 0))
        tb, qlo_b, qhi_b, pr_b = seq_params(pair_item(w, 1))
        valid_b = (w + 1) < w1

        # per-element half params ([gbq, sw] via scalar selects)
        q_lo = jnp.where(is_b, qlo_b, qlo_a)
        q_hi = jnp.where(is_b, qhi_b, qhi_a)
        row_pos = jnp.where(is_b, pr_b, pr_a) + rows
        kv_pos = jnp.where(is_b, tb, ta) * KV_TILE + col_loc
        row_in = (rows >= q_lo) & (rows < q_hi)

        wait_pair(w, slot)
        # ONE wide batched QK dot over BOTH kv tiles of the pair
        s = jax.lax.dot_general(
            qv, kbuf[slot],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [hc, gbq, sw]
        mask = row_in & (kv_pos <= row_pos)
        if sliding_window is not None:
            mask &= kv_pos > row_pos - sliding_window
        mask &= jnp.logical_or(~is_b, valid_b)           # odd-tail half off
        if logit_softcap:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        s = jnp.where(mask[None], s, NEG_INF)

        m_prev = m_s[:, :, 0:1]                          # [hc, gbq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new).astype(jnp.bfloat16)
        l_new = l_s[:, :, 0:1] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=-1, keepdims=True)
        new_acc = acc[...] * alpha
        m_s[...] = jnp.broadcast_to(m_new, (hc, gbq, 128))
        l_s[...] = jnp.broadcast_to(l_new, (hc, gbq, 128))

        acc[...] = new_acc + jax.lax.dot_general(
            p, vbuf[slot],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [hc, gbq, d]

        # the slot is consumed — reuse it for the next prefetch
        issue_pair(w + 2 * nbuf, slot)
        return jnp.where(slot + 1 == nbuf, 0, slot + 1)

    n_pairs = (w1 - w0 + 1) // 2
    jax.lax.fori_loop(0, n_pairs, loop_body, jnp.int32(0))

    if has_sinks:
        for h in range(hc):
            for gi in range(g):
                sl = slice(gi * bq, (gi + 1) * bq)
                sink = sinks_smem[0, (hi0 * hc + h) * g + gi]
                # sink joins the running max so exp() stays bounded even
                # when the sink logit dominates every attention logit
                m = m_s[h, sl, 0:1]
                m2 = jnp.maximum(m, sink)
                r = jnp.exp(m - m2)
                l = l_s[h, sl, 0:1] * r + jnp.exp(sink - m2)
                o_blk[h, gi] = (acc[h, sl] * r / jnp.maximum(l, 1e-30)
                                ).astype(o_blk.dtype)
    else:
        l = l_s[:, :, 0:1]
        o_blk[...] = (acc[...] / jnp.maximum(l, 1e-30)).reshape(
            hc, g, bq, d).astype(o_blk.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap", "bq",
                     "interpret"))
def _paged_attention_call(
    q_t: jax.Array,            # [kvh, G, T', d] bf16 (T' multiple of bq)
    kv_cache: jax.Array,       # [L, nb, 2, kvh, bs, d] (stacked layer pools)
    sinks: Optional[jax.Array],         # [qh] f32 or None
    layer: jax.Array,          # [1] layer index into the stacked pools
    qsl: jax.Array,            # [S+1] query_start_loc
    ctx: jax.Array,            # [S] context lens
    work_items: jax.Array,     # [W_pad] packed seq<<16|tile visit list
    work_start: jax.Array,     # [n_tiles + 1]
    block_tables: jax.Array,   # [S, MB]
    *,
    scale: float,
    sliding_window: Optional[int],
    logit_softcap: Optional[float],
    bq: int,
    interpret: bool,
) -> jax.Array:
    kvh, g, t2, d = q_t.shape
    _, nb, _, _, bs, _ = kv_cache.shape
    kv_tile = max(KV_TILE, bs)        # one-descriptor tiles for large blocks
    assert kv_tile % bs == 0, (kv_tile, bs)
    assert t2 % bq == 0
    n_tiles = t2 // bq
    c = kv_tile // bs

    has_sinks = sinks is not None
    sinks_arr = (sinks.astype(jnp.float32).reshape(1, kvh * g)
                 if has_sinks else jnp.zeros((1, kvh * g), jnp.float32))

    # kv heads per grid step: ALL heads per step minimizes control-flow
    # iterations (decode's bound), but the per-step VMEM footprint scales
    # with hc — halve until the scoped-vmem budget fits (prefill's bq=128
    # tiles put q/out/softmax state at ~hc*1.8MB; prefill is MXU-bound so
    # smaller hc costs it nothing).
    hc = kvh
    while hc > 1 and _vmem_bytes(hc, g, bq, d, bs, kv_tile) > _VMEM_BUDGET:
        hc //= 2
    assert kvh % hc == 0

    kernel = functools.partial(
        _kernel, bq=bq, bs=bs, hc=hc, g=g, d=d, scale=scale,
        kv_tile=kv_tile, sliding_window=sliding_window,
        logit_softcap=logit_softcap, has_sinks=has_sinks)

    assert work_start.shape[0] == n_tiles + 1, \
        "metadata work list was built for a different q tiling"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(kvh // hc, n_tiles),
        in_specs=[
            pl.BlockSpec((hc, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),     # q tile (hc heads)
            pl.BlockSpec(memory_space=pl.ANY),         # kv pool (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # sinks
        ],
        out_specs=pl.BlockSpec((hc, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, hc, 2 * kv_tile, d), kv_cache.dtype),  # k ring
            pltpu.VMEM((NBUF, hc, 2 * kv_tile, d), kv_cache.dtype),  # v ring
            pltpu.VMEM((hc, g * bq, d), jnp.float32),     # acc
            pltpu.VMEM((hc, g * bq, 128), jnp.float32),   # m
            pltpu.VMEM((hc, g * bq, 128), jnp.float32),   # l
            pltpu.SemaphoreType.DMA((NBUF, 2, c, 2)),      # kvsem
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, g, t2, d), q_t.dtype),
        interpret=interpret,
    )(layer, qsl, ctx, work_items, work_start, block_tables,
      q_t, kv_cache, sinks_arr)


def paged_attention(
    q: jax.Array,              # [T, qh, d]
    kv_cache: jax.Array,       # [L, nb, 2, kvh, bs, d] stacked split pools
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
    kvh = kv_cache.shape[3]
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

    # pick the host-built work list for this layer's window (a window
    # without its own list falls back to the full list — in-kernel masks
    # keep it correct, just without the tile-skip)
    windows = getattr(md, "work_windows", (None,))
    widx = windows.index(sliding_window) if sliding_window in windows \
        else windows.index(None)
    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out_t = _paged_attention_call(
        q_t.astype(jnp.bfloat16), kv_cache, sinks, layer,
        md.query_start_loc, md.context_lens, md.work_items[widx],
        md.work_start[widx], md.block_tables,
        scale=float(scale), sliding_window=sliding_window,
        logit_softcap=logit_softcap, bq=bq, interpret=interpret)

    out = out_t.transpose(2, 0, 1, 3).reshape(t2, qh, d)
    return out[:t].astype(q.dtype)

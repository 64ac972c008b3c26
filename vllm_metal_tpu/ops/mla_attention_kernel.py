# SPDX-License-Identifier: Apache-2.0
"""MLA paged attention — Pallas TPU kernel (absorbed latent space).

TPU-native equivalent of the reference's single-pass Metal MLA decode
kernel (``/root/reference/vllm_metal/metal/mla.metal:360``, admission in
``attention/impls/mla.py:87-134``).  Key observation: absorbed MLA *is*
MQA with asymmetric dims — every query head scores the same latent row
``[c_kv | k_rope]`` (width W = R + rope_dim) and the value is the first
R columns of the key, so the kernel is the unified paged-attention
design (``paged_attention_kernel.py``: ragged q tiles, NBUF-deep DMA
ring, branch-free cursor walk, online softmax with row masking) with:

* ONE kv "head" whose G = num_query_heads members stack on the matmul
  row dim (G*bq rows keep the MXU fed even for 8-row decode tiles),
* K width W and V width R sliced from the same latent buffer — V rides
  the K fetch for free (the reference reads the latent twice per tile,
  ``mla.metal`` QK then SV loops; here it is one DMA).

Semantics oracle: ``mla_attention.mla_paged_attention_ref``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KV_TILE = 128
NBUF = 4
NEG_INF = -1e30
_VMEM_BUDGET = 13 * 1024 * 1024
# stacked matmul rows per tile (g * bq).  Mosaic's stack allocation for
# the online-softmax temporaries runs ~2x the scratch estimate; 512 rows
# keeps the worst case (W=640, R=512) inside the 16MB scoped-vmem limit
# (measured: gbq=1024 allocates 18.1MB).  Per-chip head counts beyond
# MAX_GBQ/8 (TP-sharded models stay far below) take the reference path.
MAX_GBQ = 512


def mla_kernel_supported(num_heads: int) -> bool:
    return num_heads * 8 <= MAX_GBQ


def _vmem_bytes(g: int, bq: int, w: int, r: int, bs: int,
                kv_tile: int) -> int:
    gbq = g * bq
    return (2 * 2 * (gbq * w * 2)               # q + out (out is r <= w)
            + NBUF * (kv_tile // bs) * bs * w * 2   # latent ring
            + gbq * r * 4                       # acc
            + 2 * gbq * 128 * 4                 # m, l
            + gbq * kv_tile * 4)                # scores


def _kernel(
    # scalar prefetch
    layer, qsl, ctx, tile_first_seq, block_tables,
    # inputs
    q_blk, lat_hbm,
    # outputs
    o_blk,
    # scratch
    latbuf, acc, m_s, l_s, s_scr, latsem,
    *,
    bq: int, bs: int, g: int, w: int, r: int, scale: float, kv_tile: int,
):
    ti = pl.program_id(0)
    c = kv_tile // bs
    mb = block_tables.shape[1]
    s_max = ctx.shape[0]
    row0 = ti * bq
    row_end = row0 + bq
    gbq = g * bq

    acc[...] = jnp.zeros((gbq, r), jnp.float32)
    m_s[...] = jnp.full((gbq, 128), NEG_INF, jnp.float32)
    l_s[...] = jnp.zeros((gbq, 128), jnp.float32)

    rows_g = jax.lax.broadcasted_iota(jnp.int32, (gbq, kv_tile), 0)
    rows = rows_g - (rows_g // bq) * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (gbq, kv_tile), 1)

    li = layer[0]
    nbuf = latbuf.shape[0]

    def tile_dma(seq, tile, slot):
        copies = []
        for ci in range(c):
            blk_idx = jnp.minimum(tile * c + ci, mb - 1)
            blk = block_tables[seq, blk_idx]
            copies.append(pltpu.make_async_copy(
                lat_hbm.at[li, blk], latbuf.at[slot, ci],
                latsem.at[slot, ci]))
        return copies

    def start_kv(seq, tile, slot):
        for cp in tile_dma(seq, tile, slot):
            cp.start()

    def wait_kv(seq, tile, slot):
        for cp in tile_dma(seq, tile, slot):
            cp.wait()

    def seq_params(seq):
        seq1 = jnp.minimum(seq + 1, s_max)
        q_lo = jnp.maximum(qsl[seq], row0) - row0
        q_hi = jnp.minimum(qsl[seq1], row_end) - row0
        ql_seq = qsl[seq1] - qsl[seq]
        pos_row0 = ctx[jnp.minimum(seq, s_max - 1)] - ql_seq \
            + (row0 - qsl[seq])
        kv_limit = pos_row0 + q_hi
        n_tiles = pl.cdiv(kv_limit, kv_tile)
        return q_lo, q_hi, pos_row0, jnp.int32(0), n_tiles

    def seq_has_work(s):
        s1 = jnp.minimum(s + 1, s_max)
        return (s < s_max) & (qsl[s] < row_end) \
            & (qsl[s1] > jnp.maximum(qsl[s], row0))

    def advance(s, t, v, n_t):
        wrap = t + 1 >= n_t
        s2 = s + wrap.astype(jnp.int32)
        t2 = jnp.where(wrap, 0, t + 1)
        v2 = v & (~wrap | seq_has_work(s2))
        return s2, t2, v2

    def issue_and_advance(slot, s, t, v):
        @pl.when(v)
        def _():
            start_kv(s, t, slot)
        return advance(s, t, v, seq_params(s)[4])

    s0 = tile_first_seq[ti * (bq // 8)]
    v0 = seq_has_work(s0)
    t0 = jnp.int32(0)

    ps, pt, pv = s0, t0, v0
    for i in range(nbuf):
        ps, pt, pv = issue_and_advance(i, ps, pt, pv)

    qv = q_blk[...].reshape(gbq, w)

    def loop_body(carry):
        slot, cs, ct, cv, ps, pt, pv = carry
        q_lo, q_hi, pos_row0, _, _ = seq_params(cs)
        row_pos = pos_row0 + rows
        row_in = (rows >= q_lo) & (rows < q_hi)

        wait_kv(cs, ct, slot)
        for ci in range(c):
            s_scr[:, ci * bs:(ci + 1) * bs] = jax.lax.dot_general(
                qv, latbuf[slot, ci],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [gbq, bs]
        s = s_scr[...] * scale
        kv_pos = ct * kv_tile + cols
        mask = row_in & (kv_pos <= row_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_s[:, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new).astype(jnp.bfloat16)
        l_new = l_s[:, 0:1] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=-1, keepdims=True)
        new_acc = acc[...] * alpha
        m_s[...] = jnp.broadcast_to(m_new, (gbq, 128))
        l_s[...] = jnp.broadcast_to(l_new, (gbq, 128))

        for ci in range(c):
            # value = first r columns of the latent row
            new_acc = new_acc + jax.lax.dot_general(
                p[:, ci * bs:(ci + 1) * bs], latbuf[slot, ci, :, :r],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # [gbq, r]
        acc[...] = new_acc

        ps, pt, pv = issue_and_advance(slot, ps, pt, pv)
        cs, ct, cv = advance(cs, ct, cv, seq_params(cs)[4])
        slot = jnp.where(slot + 1 == nbuf, 0, slot + 1)
        return slot, cs, ct, cv, ps, pt, pv

    jax.lax.while_loop(
        lambda carry: carry[3], loop_body,
        (jnp.int32(0), s0, t0, v0, ps, pt, pv))

    l = l_s[:, 0:1]
    o_blk[...] = (acc[...] / jnp.maximum(l, 1e-30)).reshape(
        g, bq, r).astype(o_blk.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "kv_lora_rank", "bq", "interpret"))
def _mla_attention_call(
    q_t: jax.Array,            # [g, T', W] bf16
    latents: jax.Array,        # [L, nb, bs, W] stacked layer pools
    layer: jax.Array,          # [1]
    qsl: jax.Array,
    ctx: jax.Array,
    tile_first_seq: jax.Array,
    block_tables: jax.Array,
    *,
    scale: float,
    kv_lora_rank: int,
    bq: int,
    interpret: bool,
) -> jax.Array:
    g, t2, w = q_t.shape
    _, nb, bs, _ = latents.shape
    r = kv_lora_rank
    kv_tile = max(KV_TILE, bs)
    assert kv_tile % bs == 0 and t2 % bq == 0
    n_tiles = t2 // bq
    c = kv_tile // bs

    kernel = functools.partial(_kernel, bq=bq, bs=bs, g=g, w=w, r=r,
                               scale=scale, kv_tile=kv_tile)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((g, bq, w), lambda t, *_: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # latent pool (HBM)
        ],
        out_specs=pl.BlockSpec((g, bq, r), lambda t, *_: (0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, c, bs, w), latents.dtype),  # latent ring
            pltpu.VMEM((g * bq, r), jnp.float32),         # acc
            pltpu.VMEM((g * bq, 128), jnp.float32),       # m
            pltpu.VMEM((g * bq, 128), jnp.float32),       # l
            pltpu.VMEM((g * bq, kv_tile), jnp.float32),   # scores
            pltpu.SemaphoreType.DMA((NBUF, c)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, t2, r), q_t.dtype),
        interpret=interpret,
    )(layer, qsl, ctx, tile_first_seq, block_tables, q_t, latents)


def mla_paged_attention(
    q_nope: jax.Array,         # [T, H, qk_nope_head_dim]
    q_rope: jax.Array,         # [T, H, rope_dim]
    latents: jax.Array,        # [L, nb, bs, R + rope_dim] (stacked layers)
    w_uk: jax.Array,           # [H, qk_nope_head_dim, R]
    md,                        # AttentionMetadata
    layer_idx=0,
    *,
    kv_lora_rank: int,
    scale: Optional[float] = None,
    interpret: bool = False,
    bq: Optional[int] = None,
) -> jax.Array:
    """Latent-space attention output [T, H, R] (caller applies W_uv)."""
    t, h, dn = q_nope.shape
    w = latents.shape[-1]        # lane-padded width
    r = kv_lora_rank
    if scale is None:
        scale = (dn + q_rope.shape[-1]) ** -0.5

    # absorb W_uk into the query, concat the roped part: score becomes a
    # single W-wide dot against the latent row.  Zero-pad up to the
    # pool's lane-aligned width — pad columns never contribute.
    q_abs = jnp.einsum("thd,hdr->thr", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))
    q_full = jnp.concatenate([q_abs, q_rope.astype(jnp.float32)],
                             axis=-1)                   # [T, H, R+rope]
    if q_full.shape[-1] != w:
        q_full = jnp.pad(q_full,
                         ((0, 0), (0, 0), (0, w - q_full.shape[-1])))

    assert mla_kernel_supported(h), \
        f"{h} query heads exceed the MLA kernel row budget"
    if bq is None:
        bq = 8
        while bq < 128 and h * bq * 2 <= MAX_GBQ and bq * 2 <= max(8, t):
            bq *= 2
    bs = latents.shape[2]
    assert _vmem_bytes(h, bq, w, r, bs, max(KV_TILE, bs)) <= _VMEM_BUDGET, \
        "MLA kernel tile exceeds VMEM budget; lower bq"
    t2 = -(-t // bq) * bq
    qp = jnp.pad(q_full, ((0, t2 - t), (0, 0), (0, 0))) if t2 != t \
        else q_full
    q_t = qp.transpose(1, 0, 2)                         # [H, T', W]

    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    out_t = _mla_attention_call(
        q_t.astype(jnp.bfloat16), latents, layer,
        md.query_start_loc, md.context_lens, md.tile_first_seq,
        md.block_tables,
        scale=float(scale), kv_lora_rank=r, bq=bq, interpret=interpret)

    out = out_t.transpose(1, 0, 2)[:t]                  # [T, H, R]
    return out.astype(q_nope.dtype)

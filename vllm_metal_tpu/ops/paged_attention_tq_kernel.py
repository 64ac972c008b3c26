# SPDX-License-Identifier: Apache-2.0
"""Paged varlen attention over the TurboQuant-compressed KV pool (Pallas).

The quantized sibling of ``paged_attention_kernel.py`` (same ragged-q-tile
design; see that module), over the 128-lane BLOCK-PAYLOAD pool layout
(``attention/quant_kv_cache.py``) — every DMA moves full-lane tiles, the
constraint real-TPU Mosaic puts on ANY->VMEM copies:

* K/V codes arrive as bit planes packed along the token axis
  (``turboquant.py::pack_block``); the in-VMEM unpack is 8/w static
  shifts + one SUBLANE concat per plane — no transposes, no
  vector-shift-by-vector (mirrors the reference's sub-8-bit unpack,
  ``turboquant.metal``).
* K scales/zeros arrive TRANSPOSED ``[D/32, tokens]`` and are consumed by
  GROUP-SPLIT dots: s = sum_g (q_g @ K_codes_g^T) * scale_row_g, plus one
  [bq, D/32] x [D/32, T] dot for the zero term (zero contribution to
  q.k is zero_g * sum of q's group lanes) — so the per-(token, group)
  scale never needs expanding into token-major orientation.
* V stays in FWHT-rotated space: centroid lookup, per-token scale folded
  into the softmax weights, inverse FWHT deferred to finalization (one
  [bq, D] x [D, D] matmul per head-group) — the reference's
  "inverse FWHT in the reduce pass" (−23% TPOT, ``paged_ops.cpp:421``).

Packed planes cut DMA bytes to the compression ratio: a q4_0/q3_0 tile
moves ~130 B/token instead of 512 — decode is HBM-bandwidth-bound, so
less traffic is directly faster.  Real TPU requires block_size == 128
(one block = one KV tile, so scale rows are full 128-lane); smaller
block sizes run in interpret mode (tests) or the jnp reference path.
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

import os
# perf-ablation knob (tools/tq_chain_bench.py): comma-set of
# {nodma, nok, nov, noupdate} — knocks kernel stages out to locate cost
_ABLATE = frozenset(filter(None, os.environ.get(
    "VLLM_METAL_TPU_TQ_ABLATE", "").split(",")))

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


def _unpack_chunk(hi_vals, lo_vals, bits: int, bs: int):
    """One block's loaded plane rows -> [bs, D] int32 codes.

    hi_vals [bs*hi/8, D]; lo_vals [bs/8, D] or None.  Static shifts +
    sublane concat (kernel-safe)."""
    hi, lo = tq.plane_split(bits)
    if hi == 8:
        return hi_vals.astype(jnp.int32)

    def unplane(p, w):
        cpb = 8 // w
        pi = p.astype(jnp.int32) & 0xFF
        return jnp.concatenate(
            [(pi >> (s * w)) & ((1 << w) - 1) for s in range(cpb)],
            axis=0)

    c = unplane(hi_vals, hi)
    if lo:
        c = c | (unplane(lo_vals, lo) << hi)
    return c


def _unpack_chunk3(hi_vals, lo_vals, bits: int):
    """All-heads variant: [KVH, rows, D] plane rows -> [KVH, bs, D]
    int32 codes (token axis = dim 1)."""
    hi, lo = tq.plane_split(bits)
    if hi == 8:
        return hi_vals.astype(jnp.int32)

    def unplane(p, w):
        cpb = 8 // w
        pi = p.astype(jnp.int32) & 0xFF
        return jnp.concatenate(
            [(pi >> (s * w)) & ((1 << w) - 1) for s in range(cpb)],
            axis=1)

    c = unplane(hi_vals, hi)
    if lo:
        c = c | (unplane(lo_vals, lo) << hi)
    return c


def _kernel(
    layer, qsl, ctx, work_items, work_start, block_tables,
    q_blk, *refs,
    bq: int, bs: int, g: int, hc: int, d: int, scale: float, kg: int,
    r8: int, k_signed: bool, k_bits: int, v_bits: int, v_levels: tuple,
    sliding_window: Optional[int],
    logit_softcap: Optional[float], has_sinks: bool,
):
    """r5 redesign, ported from the bf16 kernel (VERDICT r4 missing #2):
    ALL kv heads ride each visit (batched dots over the head dim), the
    (seq, tile) visit order comes from the host-built work list, and an
    NBUF-deep DMA ring prefetches across sequence boundaries — the prior
    design (one head per grid step, 2-deep buffer, on-device cursor walk)
    measured 5.7x slower than the bf16 kernel despite moving ~4x fewer
    bytes."""
    k_hi, k_lo_r = tq.block_plane_rows(bs, k_bits)
    v_hi, v_lo_r = tq.block_plane_rows(bs, v_bits)
    # r8/rs (tile-aligned rows per block) come in as static params
    ng = d // kg                          # scale groups per head dim
    hbm_codes, hbm_scales = refs[0], refs[1]
    hmat_vmem = refs[2]
    sinks_smem = refs[3]
    o_blk = refs[4]
    cbuf, sbuf = refs[5], refs[6]
    acc, m_s, l_s, sems = refs[7:]

    hi0 = pl.program_id(0)            # head-block index (hc heads each)
    ti = pl.program_id(1)
    c = KV_TILE // bs
    mb = block_tables.shape[1]
    s_max = ctx.shape[0]
    row0 = ti * bq
    row_end = row0 + bq
    li = layer[0]
    gbq = g * bq
    nbuf = cbuf.shape[0]

    acc[...] = jnp.zeros((hc, gbq, d), jnp.float32)
    m_s[...] = jnp.full((hc, gbq, 128), NEG_INF, jnp.float32)
    l_s[...] = jnp.zeros((hc, gbq, 128), jnp.float32)

    rows_g = jax.lax.broadcasted_iota(jnp.int32, (gbq, KV_TILE), 0)
    rows = rows_g - (rows_g // bq) * bq              # tile-local row id
    cols = jax.lax.broadcasted_iota(jnp.int32, (gbq, KV_TILE), 1)

    def tile_copies(seq, tile, slot):
        """TWO contiguous descriptors per cache block (codes + scales):
        all of a block's bit planes concatenate along the row axis and
        its scale sections along rows of the bf16 pool, so a visit costs
        2 DMA issues instead of the former 5-7 (each issue measured
        ~0.23 us regardless of bytes — the old kernel was issue-bound)."""
        cps = []
        for ci in range(c):
            blk_idx = jnp.minimum(tile * c + ci, mb - 1)
            blk = block_tables[seq, blk_idx]
            cps.append(pltpu.make_async_copy(
                hbm_codes.at[li, blk, pl.ds(hi0 * hc, hc)],
                cbuf.at[slot, :, pl.ds(ci * r8, r8), :],
                sems.at[slot, 2 * ci]))
            cps.append(pltpu.make_async_copy(
                hbm_scales.at[li, blk, pl.ds(hi0 * hc, hc)],
                sbuf.at[slot, :, :, pl.ds(ci * bs, bs)],
                sems.at[slot, 2 * ci + 1]))
        return cps

    def unpack(w):
        packed = work_items[w]
        return packed >> 16, packed & 0xFFFF

    w0 = work_start[ti]
    w1 = work_start[ti + 1]

    def issue(w, slot):
        @pl.when(w < w1)
        def _():
            seq, tile = unpack(w)
            for cp in tile_copies(seq, tile, slot):
                cp.start()

    def wait_kv(seq, tile, slot):
        for cp in tile_copies(seq, tile, slot):
            cp.wait()

    for i in range(nbuf):
        issue(w0 + i, i)

    def unpack_tile(slot, off, hi_rows, lo_rows, bits):
        """Code-pool row sections -> [hc, KV_TILE, D] int32 codes."""
        chunks = []
        for ci in range(c):
            b0 = ci * r8 + off
            hv = cbuf[slot, :, b0:b0 + hi_rows]
            lv = (cbuf[slot, :, b0 + hi_rows:b0 + hi_rows + lo_rows]
                  if lo_rows else None)
            chunks.append(_unpack_chunk3(hv, lv, bits))
        return chunks[0] if c == 1 else jnp.concatenate(chunks, axis=1)

    # q stacked [kvh, g*bq, d]; per-group lane sums for the zero term are
    # visit-invariant — hoisted out of the loop
    qv = q_blk[...].reshape(hc, gbq, d)
    if not k_signed:
        qsum = jnp.concatenate(
            [jnp.sum(qv[:, :, sg * kg:(sg + 1) * kg].astype(jnp.float32),
                     axis=-1, keepdims=True)
             for sg in range(ng)], axis=-1)              # [hc, gbq, ng]

    def loop_body(w, slot):
        seq, tile = unpack(w)
        seq1 = jnp.minimum(seq + 1, s_max)
        q_lo = jnp.maximum(qsl[seq], row0) - row0
        q_hi = jnp.minimum(qsl[seq1], row_end) - row0
        pos_row0 = ctx[seq] - (qsl[seq1] - qsl[seq]) + (row0 - qsl[seq])
        row_pos = pos_row0 + rows
        row_in = (rows >= q_lo) & (rows < q_hi)

        if "nodma" not in _ABLATE:
            wait_kv(seq, tile, slot)

        # --- K: unpack planes; scales stay [hc, rows, tokens] ---
        kc32 = unpack_tile(slot, 0, k_hi, k_lo_r, k_bits)
        if k_bits == 8 and not k_signed:
            kc32 = kc32 & 0xFF
        # codes are integers < 256: bf16-exact, MXU-friendly
        kcf = kc32.astype(jnp.bfloat16)               # [hc, KV_TILE, d]
        ks_f = sbuf[slot, :, :ng].astype(jnp.float32)  # [hc, ng, KV_TILE]
        kz_f = sbuf[slot, :, ng:2 * ng].astype(jnp.float32)

        # --- V: unpack + centroid lookup (rotated space) ---
        if "nov" in _ABLATE:
            vc32 = kc32
        else:
            vc32 = unpack_tile(slot, k_hi + k_lo_r, v_hi, v_lo_r, v_bits)
        if v_bits == 8:
            # affine 8-bit codec: signed codes ARE the scaled values
            # (per-token scale folds into p below) — zero VPU lookups
            vt = vc32.astype(jnp.bfloat16)
        else:
            vc32 = vc32 & (len(v_levels) - 1)
            n_lv = len(v_levels)
            half = n_lv // 2
            symmetric = all(
                abs(v_levels[i] + v_levels[n_lv - 1 - i]) < 1e-5
                for i in range(half))
            if symmetric:
                # Lloyd-Max codebooks for symmetric densities satisfy
                # level[c] = -level[n-1-c]: pick |level| with a
                # log-depth where tree + one sign select (~2x fewer VPU
                # selects than the flat n-way lookup)
                pos = vc32 >= half
                m2 = jnp.where(pos, vc32 - half, half - 1 - vc32)
                mags = [float(x) for x in v_levels[half:]]

                def pick(lo, vals):
                    if len(vals) == 1:
                        return jnp.full(m2.shape, vals[0], jnp.float32)
                    mid = len(vals) // 2
                    return jnp.where(m2 < lo + mid, pick(lo, vals[:mid]),
                                     pick(lo + mid, vals[mid:]))

                mag = pick(0, mags)
                vt = jnp.where(pos, mag, -mag)
            else:
                vt = jnp.zeros(vc32.shape, jnp.float32)
                for idx, lv in enumerate(v_levels):
                    vt = jnp.where(vc32 == idx, lv, vt)
            vt = vt.astype(jnp.bfloat16)
        vscale = sbuf[slot, :, 2 * ng].astype(jnp.float32)   # [hc, T]

        # group-split batched dots over ALL heads: per scale-group
        # partial q.codes dot, scaled by that group's per-token row
        if "nok" in _ABLATE:
            s = jax.lax.dot_general(
                qv, kcf, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            s = jnp.zeros((hc, gbq, KV_TILE), jnp.float32)
            for sg in range(ng):
                sl = slice(sg * kg, (sg + 1) * kg)
                part = jax.lax.dot_general(
                    qv[:, :, sl], kcf[:, :, sl],
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [hc, gbq, T]
                s = s + part * ks_f[:, sg:sg + 1, :]
            if not k_signed:
                # zero term: zero_g * (sum of q's group-g lanes)
                s = s + jax.lax.dot_general(
                    qsum, kz_f, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
        s = s * scale
        if logit_softcap:
            s = jnp.tanh(s / logit_softcap) * logit_softcap
        kv_pos = tile * KV_TILE + cols
        mask = row_in & (kv_pos <= row_pos)
        if sliding_window is not None:
            mask &= kv_pos > row_pos - sliding_window
        s = jnp.where(mask[None], s, NEG_INF)

        m_prev = m_s[:, :, 0:1]                       # [hc, gbq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_s[:, :, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # fold the per-token V scale into p; accumulate in rotated space
        pv = (p * vscale[:, None, :]).astype(jnp.bfloat16)
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            pv, vt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [hc, gbq, d]
        m_s[...] = jnp.broadcast_to(m_new, (hc, gbq, 128))
        l_s[...] = jnp.broadcast_to(l_new, (hc, gbq, 128))

        issue(w + nbuf, slot)
        return jnp.where(slot + 1 == nbuf, 0, slot + 1)

    jax.lax.fori_loop(w0, w1, loop_body, jnp.int32(0))

    # finalize: one inverse-FWHT matmul per head undoes the rotation
    hm = hmat_vmem[:]                                  # [d, d] f32 (M)
    for h in range(hc):
        for gi in range(g):
            sl = slice(gi * bq, (gi + 1) * bq)
            l = l_s[h, sl, 0:1]
            a = acc[h, sl]
            if has_sinks:
                # attention sink: a per-head virtual logit joins the
                # softmax denominator only (no value row).  The sink
                # participates in the running max (oracle:
                # paged_attention.py quant ref takes max(logits, sink))
                # so a sink above every attention logit can't overflow
                # exp().
                sink = sinks_smem[0, (hi0 * hc + h) * g + gi]
                m = m_s[h, sl, 0:1]
                m2 = jnp.maximum(m, sink)
                r = jnp.exp(m - m2)
                l = l * r + jnp.exp(sink - m2)
                a = a * r
            out_rot = a / jnp.maximum(l, 1e-30)
            out = jax.lax.dot_general(
                out_rot, hm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # out = r @ M.T
            o_blk[h, gi] = out.astype(o_blk.dtype)


NBUF = 4       # DMA ring depth (compressed tiles are small; deep ring
               # hides the many-descriptor latency of the 7-pool loads)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "codec_k", "codec_v", "bq",
                     "logit_softcap", "has_sinks", "interpret"))
def _tq_attention_call(
    q_t, pools, hmat, sinks_arr,
    layer, qsl, ctx, work_items, work_start, block_tables,
    *, scale, sliding_window, codec_k, codec_v, bq, logit_softcap,
    has_sinks, interpret,
):
    kvh, g, t2, d = q_t.shape
    bs = pools[-1].shape[-1]              # v_scale lanes = block_size
    assert KV_TILE % bs == 0
    n_tiles = t2 // bq
    c = KV_TILE // bs
    kg = tq.K_BLOCK

    k_signed, k_bits = tq._K_PARAMS[codec_k]
    v_bits = tq._V_BITS[codec_v]
    v_levels = tuple(float(x) for x in tq._lloyd_codebook(v_bits))
    codes_pool, scales_pool = pools
    r8 = codes_pool.shape[3]              # code rows per block
    rs = scales_pool.shape[3]             # scale rows per block

    # kv heads per grid step: all heads when the scoped-VMEM budget
    # allows (decode), halving for the big prefill tiles (same policy as
    # the bf16 kernel)
    def vmem_bytes(hc_):
        gbq = g * bq
        bufb = NBUF * hc_ * (c * r8 * d + rs * KV_TILE * 2)
        return (2 * 2 * hc_ * gbq * d * 2          # q + out (dbuf)
                + bufb
                + hc_ * gbq * d * 4                # acc
                + 2 * hc_ * gbq * 128 * 4          # m, l
                + 2 * hc_ * gbq * KV_TILE * 4      # live s / p
                + 2 * hc_ * KV_TILE * d * 4)       # unpacked codes (k, v)

    hc = kvh
    while hc > 1 and vmem_bytes(hc) > 11 * 1024 * 1024:
        hc //= 2
    assert kvh % hc == 0

    kernel = functools.partial(
        _kernel, bq=bq, bs=bs, g=g, hc=hc, d=d, scale=scale, kg=kg,
        r8=r8,
        k_signed=k_signed, k_bits=k_bits, v_bits=v_bits, v_levels=v_levels,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        has_sinks=has_sinks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(kvh // hc, n_tiles),
        in_specs=[
            pl.BlockSpec((hc, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # codes pool
            pl.BlockSpec(memory_space=pl.ANY),      # scales pool
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hadamard matrix
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sinks
        ],
        out_specs=pl.BlockSpec((hc, g, bq, d), lambda h, t, *_: (h, 0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # NBUF-ring staging: code rows stack c blocks on sublanes,
            # scale lanes stack c blocks on lanes
            pltpu.VMEM((NBUF, hc, c * r8, d), jnp.int8),     # codes
            pltpu.VMEM((NBUF, hc, rs, KV_TILE), jnp.bfloat16),  # scales
            pltpu.VMEM((hc, g * bq, d), jnp.float32),        # acc
            pltpu.VMEM((hc, g * bq, 128), jnp.float32),      # m
            pltpu.VMEM((hc, g * bq, 128), jnp.float32),      # l
            pltpu.SemaphoreType.DMA((NBUF, 2 * c)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kvh, g, t2, d), q_t.dtype),
        interpret=interpret,
    )(layer, qsl, ctx, work_items, work_start, block_tables,
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

    # host-built work list for this layer's window (same selection as the
    # bf16 kernel)
    windows = getattr(md, "work_windows", (None,))
    widx = windows.index(sliding_window) if sliding_window in windows \
        else windows.index(None)
    out_t = _tq_attention_call(
        q_t.astype(jnp.bfloat16), cache._pools(), hmat, sinks_arr,
        layer, md.query_start_loc, md.context_lens, md.work_items[widx],
        md.work_start[widx], md.block_tables,
        scale=float(scale), sliding_window=sliding_window,
        codec_k=cache.codec_k, codec_v=cache.codec_v, bq=bq,
        logit_softcap=(float(logit_softcap) if logit_softcap else None),
        has_sinks=has_sinks, interpret=interpret)
    out = out_t.transpose(2, 0, 1, 3).reshape(t2, qh, d)
    return out[:t].astype(q.dtype)

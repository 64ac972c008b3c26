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


def _kernel(
    layer, qsl, ctx, tile_first_seq, block_tables,
    q_blk, *refs,
    bq: int, bs: int, g: int, d: int, scale: float, kg: int,
    k_signed: bool, k_bits: int, v_bits: int, v_levels: tuple,
    sliding_window: Optional[int],
    logit_softcap: Optional[float], has_sinks: bool,
):
    has_klo = tq.plane_split(k_bits)[1] > 0
    has_vlo = tq.plane_split(v_bits)[1] > 0
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
    scale_kind = {i_ks, i_kz, i_vs}       # [rows, tokens] lane layout
    ng = d // kg                          # scale groups per head dim

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
            for j in range(n_arr):
                if j in scale_kind:
                    dst = bufs[j].at[slot, :, pl.ds(ci * bs, bs)]
                else:
                    rj = hbm[j].shape[3]
                    dst = bufs[j].at[slot, pl.ds(ci * rj, rj), :]
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

    def unpack_tile(hi_buf, lo_buf, bits):
        """Loaded plane buffers -> [KV_TILE, D] int32 codes."""
        hi_rows = hi_buf.shape[0] // c
        lo_rows = lo_buf.shape[0] // c if lo_buf is not None else 0
        chunks = []
        for ci in range(c):
            hv = hi_buf[ci * hi_rows:(ci + 1) * hi_rows]
            lv = (lo_buf[ci * lo_rows:(ci + 1) * lo_rows]
                  if lo_buf is not None else None)
            chunks.append(_unpack_chunk(hv, lv, bits, bs))
        return chunks[0] if c == 1 else jnp.concatenate(chunks, axis=0)

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

            # --- K: unpack planes; scales stay [rows, tokens] ---
            kc32 = unpack_tile(
                bufs[i_kc][slot],
                bufs[i_klo][slot] if has_klo else None, k_bits)
            if k_bits == 8 and not k_signed:
                kc32 = kc32 & 0xFF
            # codes are integers < 256: bf16-exact, MXU-friendly
            kcf = kc32.astype(jnp.bfloat16)               # [KV_TILE, d]
            ks_f = bufs[i_ks][slot].astype(jnp.float32)   # [ng, KV_TILE]
            kz_f = bufs[i_kz][slot].astype(jnp.float32)

            # --- V: unpack + centroid lookup (rotated space) ---
            vc32 = unpack_tile(
                bufs[i_vc][slot],
                bufs[i_vlo][slot] if has_vlo else None, v_bits)
            vc32 = vc32 & (len(v_levels) - 1)
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
                q_g = q_blk[0, gi]                        # [bq, d] bf16
                # group-split dots: per scale-group partial q.codes dot,
                # scaled by that group's per-token scale row
                s = jnp.zeros((bq, KV_TILE), jnp.float32)
                for sg in range(ng):
                    sl = slice(sg * kg, (sg + 1) * kg)
                    part = jax.lax.dot_general(
                        q_g[:, sl], kcf[:, sl],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + part * ks_f[sg:sg + 1, :]
                if not k_signed:
                    # zero term: zero_g * (sum of q's group-g lanes)
                    qsum = jnp.concatenate(
                        [jnp.sum(q_g[:, sg * kg:(sg + 1) * kg]
                                 .astype(jnp.float32),
                                 axis=-1, keepdims=True)
                         for sg in range(ng)], axis=-1)   # [bq, ng]
                    s = s + jax.lax.dot_general(
                        qsum, kz_f, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                s = s * scale
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
    bs = pools[-1].shape[-1]              # v_scale lanes = block_size
    assert KV_TILE % bs == 0
    n_tiles = t2 // bq
    c = KV_TILE // bs
    kg = tq.K_BLOCK

    k_signed, k_bits = tq._K_PARAMS[codec_k]
    v_bits = tq._V_BITS[codec_v]
    v_levels = tuple(float(x) for x in tq._lloyd_codebook(v_bits))
    n_arr = len(pools)
    i_ks = 1 + int(tq.plane_split(k_bits)[1] > 0)
    scale_kind = {i_ks, i_ks + 1, n_arr - 1}

    kernel = functools.partial(
        _kernel, bq=bq, bs=bs, g=g, d=d, scale=scale, kg=kg,
        k_signed=k_signed, k_bits=k_bits, v_bits=v_bits, v_levels=v_levels,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        has_sinks=has_sinks)

    # double-buffered per-pool staging: code planes stack c blocks on
    # sublanes [2, c*rows, D]; scale pools stack on lanes [2, rows, T]
    scratch = [
        pltpu.VMEM((2, p.shape[3], KV_TILE) if j in scale_kind
                   else (2, c * p.shape[3], d), p.dtype)
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

    out_t = _tq_attention_call(
        q_t.astype(jnp.bfloat16), cache._pools(), hmat, sinks_arr,
        layer, md.query_start_loc, md.context_lens, md.tile_first_seq,
        md.block_tables,
        scale=float(scale), sliding_window=sliding_window,
        codec_k=cache.codec_k, codec_v=cache.codec_v, bq=bq,
        logit_softcap=(float(logit_softcap) if logit_softcap else None),
        has_sinks=has_sinks, interpret=interpret)
    out = out_t.transpose(2, 0, 1, 3).reshape(t2, qh, d)
    return out[:t].astype(q.dtype)

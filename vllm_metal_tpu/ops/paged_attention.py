# SPDX-License-Identifier: Apache-2.0
"""Unified paged varlen attention — jnp reference implementation.

Computes attention for a packed mixed prefill+decode batch against the paged
KV pool, with GQA, per-layer sliding window, attention sinks, and logit
softcap — the same op surface as the reference's unified kernel pair
(``/root/reference/vllm_metal/metal/pagedattention.metal:819`` per-token and
``pagedattention_tiled.metal:531`` tiled prefill).  This module is the
semantics oracle: the Pallas kernel (``paged_attention_kernel.py``) must
match it bitwise-modulo-float-assoc on every feature.

Token-parallel formulation: each query token gathers its sequence's KV from
the block pool and masks to its visible prefix.  O(T * max_kv) memory — fine
for tests and small fallback batches, not the serving path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..attention.metadata import AttentionMetadata


def paged_attention_ref(
    q: jax.Array,                 # [T, q_heads, head_dim]
    k_cache: jax.Array,           # [kv_heads, num_blocks, block_size, hd]
    v_cache: jax.Array,
    md: AttentionMetadata,
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    sinks: Optional[jax.Array] = None,       # [q_heads] per-head sink logits
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    t, qh, d = q.shape
    kh, nb, bs, _ = k_cache.shape
    rep = qh // kh
    if scale is None:
        scale = d ** -0.5
    max_kv = md.block_tables.shape[1] * bs

    # Gather each token's sequence KV: [T, max_kv, kh, d]
    tables = md.block_tables[md.token_seq_ids]          # [T, MB]
    flat_k = k_cache.reshape(kh, nb * bs, d)
    flat_v = v_cache.reshape(kh, nb * bs, d)
    slot_idx = (tables[:, :, None] * bs
                + jnp.arange(bs)[None, None, :]).reshape(t, max_kv)
    keys = flat_k[:, slot_idx].transpose(1, 2, 0, 3)     # [T, max_kv, kh, d]
    vals = flat_v[:, slot_idx].transpose(1, 2, 0, 3)

    qf = q.astype(jnp.float32)
    kf = keys.astype(jnp.float32)
    # logits[t, h, j]: q head h attends kv head h // rep
    kf = jnp.repeat(kf, rep, axis=2)                     # [T, max_kv, qh, d]
    logits = jnp.einsum("thd,tjhd->thj", qf, kf) * scale
    if logit_softcap:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap

    pos = jnp.arange(max_kv)[None, :]                    # kv positions
    visible = pos < md.token_kv_lens[:, None]            # causal limit
    if sliding_window is not None:
        visible &= pos > (md.token_kv_lens[:, None] - 1 - sliding_window)
    logits = jnp.where(visible[:, None, :], logits, -jnp.inf)

    if sinks is not None:
        # sink participates in softmax but contributes no value
        m = jnp.maximum(jnp.max(logits, axis=-1),
                        sinks.astype(jnp.float32)[None, :])
        p = jnp.exp(logits - m[:, :, None])
        denom = p.sum(-1) + jnp.exp(sinks.astype(jnp.float32)[None, :] - m)
        p = p / denom[:, :, None]
    else:
        p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(visible[:, None, :], p, 0.0)

    vf = jnp.repeat(vals.astype(jnp.float32), rep, axis=2)
    out = jnp.einsum("thj,tjhd->thd", p, vf)
    return out.astype(q.dtype)


def paged_attention_quant_ref(
    q: jax.Array,                 # [T, q_heads, head_dim]
    cache,                        # QuantPagedKVCache
    layer_idx: int,
    md: AttentionMetadata,
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    sinks: Optional[jax.Array] = None,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Reference attention over the TurboQuant-compressed pool: gather
    codes, dequantize, then the same masked-softmax math as
    :func:`paged_attention_ref`."""
    t, qh, d = q.shape
    kh = cache.num_kv_heads
    bs = cache.block_size
    rep = qh // kh
    if scale is None:
        scale = d ** -0.5
    max_kv = md.block_tables.shape[1] * bs

    tables = md.block_tables[md.token_seq_ids]
    slot_idx = (tables[:, :, None] * bs
                + jnp.arange(bs)[None, None, :]).reshape(t, max_kv)
    keys, vals = cache.dequant_gathered(layer_idx, slot_idx, jnp.float32)

    qf = q.astype(jnp.float32)
    kf = jnp.repeat(keys, rep, axis=2)
    logits = jnp.einsum("thd,tjhd->thj", qf, kf) * scale
    if logit_softcap:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap

    pos = jnp.arange(max_kv)[None, :]
    visible = pos < md.token_kv_lens[:, None]
    if sliding_window is not None:
        visible &= pos > (md.token_kv_lens[:, None] - 1 - sliding_window)
    logits = jnp.where(visible[:, None, :], logits, -jnp.inf)

    if sinks is not None:
        m = jnp.maximum(jnp.max(logits, axis=-1),
                        sinks.astype(jnp.float32)[None, :])
        p = jnp.exp(logits - m[:, :, None])
        denom = p.sum(-1) + jnp.exp(sinks.astype(jnp.float32)[None, :] - m)
        p = p / denom[:, :, None]
    else:
        p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(visible[:, None, :], p, 0.0)

    vf = jnp.repeat(vals, rep, axis=2)
    out = jnp.einsum("thj,tjhd->thd", p, vf)
    return out.astype(q.dtype)

# SPDX-License-Identifier: Apache-2.0
"""MLA paged attention — absorbed-latent reference implementation.

Math of the reference's decode path (``/root/reference/vllm_metal/attention/
impls/mla.py:21,272``): with latent rows ``c`` (kv_lora_rank R) and shared
roped key ``k_r`` cached per token,

  score(t, h, j) = (q_nope(t,h) @ W_uk(h))ᵀ c(j) + q_rope(t,h)ᵀ k_r(j)
  out(t, h)      = W_uv(h)ᵀ  Σ_j softmax(score)(j) c(j)

i.e. the per-head key/value up-projections are *absorbed* into the query and
output sides, so attention itself runs in the compressed latent space and
cache traffic is R + rope_dim per token regardless of head count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attention.metadata import AttentionMetadata


def mla_paged_attention_ref(
    q_nope: jax.Array,          # [T, H, qk_nope_head_dim]
    q_rope: jax.Array,          # [T, H, rope_dim]
    latents: jax.Array,         # [num_blocks, block_size, R + rope_dim]
    w_uk: jax.Array,            # [H, qk_nope_head_dim, R]  (k up-projection)
    md: AttentionMetadata,
    *,
    kv_lora_rank: int,
    scale: float,
) -> jax.Array:
    """Returns latent-space attention output [T, H, R] (caller applies the
    absorbed value projection W_uv)."""
    t, h, dn = q_nope.shape
    nb, bs, w = latents.shape
    r = kv_lora_rank
    max_kv = md.block_tables.shape[1] * bs

    # absorb W_uk into the query
    q_abs = jnp.einsum("thd,hdr->thr", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))          # [T, H, R]

    tables = md.block_tables[md.token_seq_ids]            # [T, MB]
    flat = latents.reshape(nb * bs, w)
    slot_idx = (tables[:, :, None] * bs
                + jnp.arange(bs)[None, None, :]).reshape(t, max_kv)
    lat = flat[slot_idx].astype(jnp.float32)              # [T, max_kv, w]
    c = lat[..., :r]
    k_r = lat[..., r:]

    scores = (jnp.einsum("thr,tjr->thj", q_abs, c)
              + jnp.einsum("thd,tjd->thj", q_rope.astype(jnp.float32), k_r)
              ) * scale

    pos = jnp.arange(max_kv)[None, :]
    visible = pos < md.token_kv_lens[:, None]
    scores = jnp.where(visible[:, None, :], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(visible[:, None, :], p, 0.0)

    out_lat = jnp.einsum("thj,tjr->thr", p, c)            # [T, H, R]
    return out_lat.astype(q_nope.dtype)

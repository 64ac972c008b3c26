# SPDX-License-Identifier: Apache-2.0
"""Weight/cache partition specs and the in-forward TP context.

Megatron-style sharding compiled by XLA over ICI: attention and MLP first
projections are column-parallel (heads/FFN sharded), output projections are
row-parallel followed by ``psum``; embedding and lm_head shard the vocab.
The paged KV pool shards on its kv_heads axis, so paged attention itself
needs no communication — only the two psums per layer plus one logits
all-gather cross chips (these are the "collectives overlapped with decode"
from BASELINE.md: XLA's latency-hiding scheduler overlaps them with the
next layer's compute).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# linear-weight roles
_COLUMN = ("wq", "wk", "wv", "gate", "up", "wq_b")  # shard out_features
_ROW = ("wo", "down")                               # shard in_features
_VOCAB = ("embedding", "lm_head")                   # shard vocab rows
_SHARD_VEC = ("bq", "bk", "bv", "sinks")            # 1-D sharded vectors
_EXPERT = ("egate", "eup", "edown")                 # shard the expert dim
# MLA absorbed up-projections [H, ...]: shard the head dim; the latent
# path (wkv_a / wq_a / norms) replicates — every chip computes the same
# latent and writes its replicated latent-pool copy, so MLA attention
# needs no collective beyond the standard wo psum
_HEAD_STACKED = ("w_uk", "w_uv")


def _linear_spec(role: str, field: str, kind: str, layout: str,
                 stacked: bool) -> P:
    """Per-leaf spec for one QuantLinear field.

    Dense weights are ``[N, K]``; quantized "kn" weights and their
    scales/biases are ``[K(/G or /2), N]`` — the N axis flips sides, and
    stacked weights carry a leading layer dim.
    """
    shard_n = role in _COLUMN or role in _VOCAB      # else shard K
    if kind == "dense":
        dims = (P("model", None) if shard_n else P(None, "model"))
    elif layout == "nk":
        # embedding tables: EVERY leaf (w, scales, biases) is [N, ...]
        # row-major, so one spec covers all three
        dims = (P("model", None) if shard_n else P(None, "model"))
    else:                                            # "kn": [K..., N]
        dims = (P(None, "model") if shard_n else P("model", None))
    if stacked:
        return P(None, *dims)
    return dims


def weight_pspecs(weights: Any) -> Any:
    """Same-structure pytree of PartitionSpec for a model weight tree."""
    from ..ops.quant_matmul import QuantLinear

    def is_ql(x) -> bool:
        return isinstance(x, QuantLinear)

    def spec_for_path(path, leaf) -> Any:
        names = [p.name for p in path if hasattr(p, "name")]
        if any(n in _EXPERT for n in names) and is_ql(leaf):
            # expert-parallel stacked weights: dim 0 is the expert dim
            return jax.tree.map(
                lambda arr: P("model", *([None] * (arr.ndim - 1))), leaf)
        role = None
        for n in names:
            if n in _COLUMN + _ROW + _VOCAB:
                role = n
        if is_ql(leaf):
            if role is None:
                return jax.tree.map(lambda _: P(), leaf)

            def field_spec(fpath, arr):
                fname = fpath[0].name if fpath else "w"
                return _linear_spec(role, fname, leaf.kind, leaf.layout,
                                    arr.ndim == 3)
            return jax.tree_util.tree_map_with_path(field_spec, leaf)
        if role is not None:
            # bare array under a linear role (shouldn't happen, but safe)
            return P()
        if names and names[-1] in _HEAD_STACKED:
            return P("model", *([None] * (leaf.ndim - 1)))
        if names and names[-1] in _SHARD_VEC:
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for_path, weights,
                                            is_leaf=is_ql)


def cache_pspec() -> P:
    # [L, num_blocks, 2 (K|V), kv_heads, block_size, head_dim]
    return P(None, None, None, "model", None, None)


def cache_pspecs(cache: Any) -> Any:
    """Same-structure pytree of PartitionSpec for any cache type.

    The paged pool shards its kv_heads axis (attention is then fully
    local — the Megatron split gives each chip the heads its q shard
    needs); TurboQuant pools are [L, KH, NB, bs, last] so the head axis
    is dim 1.  MLA latent and GDN state pools replicate: the latent is
    shared across heads by construction, and the hybrid state cache is
    small (slots x heads x Dv x Dk) relative to the KV pool.
    """
    def leaf_spec(path, arr) -> P:
        names = [p.name for p in path if hasattr(p, "name")]
        if names and names[-1] == "kv":
            return cache_pspec()
        if names and names[-1] in ("k_codes", "k_lo", "k_scale", "k_zero",
                                   "v_codes", "v_lo", "v_scale"):
            return P(None, "model", None, None, None)
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, cache)


def shard_weights(weights: Any, mesh: Mesh) -> Any:
    specs = weight_pspecs(weights)
    return jax.tree.map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)),
        weights, specs)


def shard_cache(cache: Any, mesh: Mesh) -> Any:
    specs = cache_pspecs(cache)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        cache, specs)


class TPContext:
    """Collective hooks the model forward calls; identity when tp == 1.

    Inside ``shard_map`` the model sees *local* shards; these hooks insert
    the Megatron collectives.
    """

    def __init__(self, axis: Optional[str] = None, tp: int = 1):
        self.axis = axis
        self.tp = tp

    @property
    def enabled(self) -> bool:
        return self.axis is not None and self.tp > 1

    def reduce(self, x: jax.Array) -> jax.Array:
        """Row-parallel output reduction (after wo / down projections)."""
        if not self.enabled:
            return x
        return jax.lax.psum(x, self.axis)

    def shard_index(self) -> jax.Array:
        return jax.lax.axis_index(self.axis) if self.enabled else jnp.int32(0)

    def embed(self, table, ids: jax.Array, embed_fn, vocab_size: int
              ) -> jax.Array:
        """Vocab-sharded embedding gather: local masked lookup + psum."""
        if not self.enabled:
            return embed_fn(table, ids)
        local_v = table.w.shape[0]
        offset = self.shard_index() * local_v
        local_ids = ids - offset
        valid = (local_ids >= 0) & (local_ids < local_v)
        safe = jnp.clip(local_ids, 0, local_v - 1)
        emb = embed_fn(table, safe)
        emb = jnp.where(valid[:, None], emb, 0)
        return jax.lax.psum(emb, self.axis)

    def gather_logits(self, local_logits: jax.Array) -> jax.Array:
        """[S, V/tp] -> [S, V] (vocab-sharded lm_head)."""
        if not self.enabled:
            return local_logits
        return jax.lax.all_gather(
            local_logits, self.axis, axis=local_logits.ndim - 1, tiled=True)

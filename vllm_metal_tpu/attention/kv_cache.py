# SPDX-License-Identifier: Apache-2.0
"""Paged KV-cache block pool.

TPU-native analogue of ``MetalPagedKVCache``
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:35``): per-layer
K/V pools of shape ``[num_blocks, block_size, kv_heads, head_dim]``, stacked
over layers into single arrays so one scatter/gather indexes any layer and
the whole pool shards over the TP mesh on the kv_heads axis.  Updates are
functional — jit donation makes them in-place in HBM (the reference gets the
same effect from MLX primitive aliasing, ``paged_ops.cpp:846``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils import static_dataclass


@static_dataclass(meta_fields=("block_size",))
class PagedKVCache:
    """Stacked pools. k/v: [L, num_blocks, block_size, kv_heads, head_dim]."""

    k: jax.Array
    v: jax.Array
    block_size: int = 16

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def num_blocks(self) -> int:
        return self.k.shape[1]

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (model_cfg.num_layers, num_blocks, cache_cfg.block_size,
                 model_cfg.num_kv_heads, model_cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   block_size=cache_cfg.block_size)

    def write(self, layer_idx: int, k: jax.Array, v: jax.Array,
              slot_mapping: jax.Array) -> "PagedKVCache":
        """Scatter new K/V rows ([T, kv_heads, head_dim]) into layer's pool.

        Pad tokens carry slot -1; scatter mode='drop' discards them (the
        fused-scatter analogue of the reference's ``reshape_and_cache``,
        ``/root/reference/vllm_metal/metal/reshape_and_cache.metal:99``).
        """
        nb, bs = self.num_blocks, self.block_size
        flat_shape = (nb * bs,) + self.k.shape[3:]
        kl = self.k[layer_idx].reshape(flat_shape)
        vl = self.v[layer_idx].reshape(flat_shape)
        kl = kl.at[slot_mapping].set(k.astype(kl.dtype), mode="drop")
        vl = vl.at[slot_mapping].set(v.astype(vl.dtype), mode="drop")
        new_k = self.k.at[layer_idx].set(kl.reshape(self.k.shape[1:]))
        new_v = self.v.at[layer_idx].set(vl.reshape(self.v.shape[1:]))
        return PagedKVCache(k=new_k, v=new_v, block_size=self.block_size)

    def bytes_per_block(self) -> int:
        per = (self.block_size * self.k.shape[3] * self.k.shape[4]
               * self.k.dtype.itemsize)
        return 2 * per * self.num_layers

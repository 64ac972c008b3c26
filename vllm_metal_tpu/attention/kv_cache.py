# SPDX-License-Identifier: Apache-2.0
"""Paged KV-cache block pool.

TPU-native analogue of ``MetalPagedKVCache``
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:35``).  Layout is
``[layers, kv_heads, num_blocks, block_size, head_dim]`` — kv_heads leading
so (a) each (layer, head) pool is contiguous for the attention kernel's
per-head block DMAs and (b) tensor parallelism shards the whole pool on one
axis with a single PartitionSpec.  Updates are functional; jit donation makes
them in-place in HBM (the reference gets the same effect from MLX primitive
aliasing, ``paged_ops.cpp:846``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils import static_dataclass


@static_dataclass(meta_fields=("block_size",))
class PagedKVCache:
    """k/v: [L, kv_heads, num_blocks, block_size, head_dim]."""

    k: jax.Array
    v: jax.Array
    block_size: int = 16

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[1]

    @property
    def num_blocks(self) -> int:
        return self.k.shape[2]

    @property
    def head_dim(self) -> int:
        return self.k.shape[4]

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (model_cfg.num_layers, model_cfg.num_kv_heads, num_blocks,
                 cache_cfg.block_size, model_cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   block_size=cache_cfg.block_size)

    def write(self, layer_idx, k: jax.Array, v: jax.Array,
              slot_mapping: jax.Array) -> "PagedKVCache":
        """Scatter new K/V rows ([T, kv_heads, head_dim]) into the pool.

        ``layer_idx`` may be a Python int or a traced scalar (layer-scan
        path).  Pad tokens carry slot -1; scatter mode='drop' discards them
        (the fused-scatter analogue of the reference's ``reshape_and_cache``,
        ``/root/reference/vllm_metal/metal/reshape_and_cache.metal:99``).
        """
        import os
        import jax as _jax
        if (_jax.default_backend() == "tpu"
                and os.environ.get("VLLM_METAL_TPU_PALLAS_KV_WRITE") != "0"):
            # guaranteed in-place via the aliased Pallas write
            from ..ops.reshape_and_cache import reshape_and_cache
            nk, nv = reshape_and_cache(self.k, self.v, k, v, slot_mapping,
                                       layer_idx)
            return PagedKVCache(k=nk, v=nv, block_size=self.block_size)
        l, kh, nb, bs, d = self.k.shape
        kf = self.k.reshape(l, kh, nb * bs, d)
        vf = self.v.reshape(l, kh, nb * bs, d)
        # advanced indices (layer scalar, slots [T]) straddle the ':' slice,
        # so the indexed axes move to the front: value layout is [T, kh, d]
        kf = kf.at[layer_idx, :, slot_mapping].set(
            k.astype(self.k.dtype), mode="drop")
        vf = vf.at[layer_idx, :, slot_mapping].set(
            v.astype(self.v.dtype), mode="drop")
        return PagedKVCache(k=kf.reshape(self.k.shape),
                            v=vf.reshape(self.v.shape),
                            block_size=self.block_size)

    def bytes_per_block(self) -> int:
        l, kh, nb, bs, d = self.k.shape
        return 2 * l * kh * bs * d * self.k.dtype.itemsize

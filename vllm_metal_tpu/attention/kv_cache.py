# SPDX-License-Identifier: Apache-2.0
"""Paged KV-cache block pool.

TPU-native analogue of ``MetalPagedKVCache``
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:35``).  Layout is
``[layers, kv_heads, num_blocks, 2*block_size, head_dim]`` with K in rows
``[0, bs)`` and V in rows ``[bs, 2bs)`` of each block: kv_heads leading so
(a) each (layer, head) pool is contiguous for the attention kernel's
per-head block DMAs and (b) tensor parallelism shards the whole pool on one
axis with a single PartitionSpec.  K and V share each physical block so the
attention kernel fetches both with ONE descriptor per block — decode is
DMA-issue-overhead bound, and this halves the descriptor count.  Updates
are functional; jit donation makes them in-place in HBM (the reference gets
the same effect from MLX primitive aliasing, ``paged_ops.cpp:846``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils import static_dataclass


@static_dataclass(meta_fields=("block_size",))
class PagedKVCache:
    """kv: [L, kv_heads, num_blocks, 2*block_size, head_dim]."""

    kv: jax.Array
    block_size: int = 16

    @property
    def num_layers(self) -> int:
        return self.kv.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.kv.shape[1]

    @property
    def num_blocks(self) -> int:
        return self.kv.shape[2]

    @property
    def head_dim(self) -> int:
        return self.kv.shape[4]

    @property
    def k(self) -> jax.Array:
        """K half view [L, KH, NB, bs, D] (lazy under jit; copies if
        materialized outside — prefer slicing ``kv`` inside jit)."""
        return self.kv[:, :, :, : self.block_size]

    @property
    def v(self) -> jax.Array:
        return self.kv[:, :, :, self.block_size:]

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (model_cfg.num_layers, model_cfg.num_kv_heads, num_blocks,
                 2 * cache_cfg.block_size, model_cfg.head_dim)
        return cls(kv=jnp.zeros(shape, dtype),
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
                and self.kv.shape[-1] % 128 == 0   # Mosaic lane constraint
                and os.environ.get("VLLM_METAL_TPU_PALLAS_KV_WRITE") != "0"):
            # guaranteed in-place via the aliased Pallas write
            from ..ops.reshape_and_cache import reshape_and_cache
            nkv = reshape_and_cache(self.kv, k, v, slot_mapping, layer_idx,
                                    block_size=self.block_size)
            return PagedKVCache(kv=nkv, block_size=self.block_size)
        l, kh, nb, bs2, d = self.kv.shape
        bs = self.block_size
        flat = self.kv.reshape(l, kh, nb * bs2, d)
        # combined-row addressing: slot s -> block s//bs, K row s%bs,
        # V row bs + s%bs (keep -1 sentinel for dropped pad tokens)
        kslots = jnp.where(slot_mapping < 0, -1,
                           slot_mapping // bs * bs2 + slot_mapping % bs)
        vslots = jnp.where(slot_mapping < 0, -1, kslots + bs)
        # advanced indices (layer scalar, slots [T]) straddle the ':' slice,
        # so the indexed axes move to the front: value layout is [T, kh, d]
        flat = flat.at[layer_idx, :, kslots].set(
            k.astype(self.kv.dtype), mode="drop")
        flat = flat.at[layer_idx, :, vslots].set(
            v.astype(self.kv.dtype), mode="drop")
        return PagedKVCache(kv=flat.reshape(self.kv.shape),
                            block_size=self.block_size)

    def bytes_per_block(self) -> int:
        l, kh, nb, bs2, d = self.kv.shape
        return l * kh * bs2 * d * self.kv.dtype.itemsize

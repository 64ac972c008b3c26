# SPDX-License-Identifier: Apache-2.0
"""Paged KV-cache block pool.

TPU-native analogue of ``MetalPagedKVCache``
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:35``).  Layout is
``[layers, num_blocks, 2, kv_heads, block_size, head_dim]`` — dim 2 splits
K (0) and V (1), so one block's K (or V) for ALL kv heads is one
contiguous ~128KB region and the attention kernel can land block arrivals
at row offsets of per-head-contiguous K/V tiles (strided-dst DMA sustains
~450 GB/s, measured v5e) and run ONE wide QK/PV dot per kv tile instead
of per-block dot pairs (whose MXU-issue overhead capped decode at
~55 GB/s).  Tensor parallelism shards dim 3 (kv_heads) with a single
PartitionSpec.  Updates are functional; jit donation makes them in-place
in HBM (the reference gets the same effect from MLX primitive aliasing,
``paged_ops.cpp:846``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils import static_dataclass


@static_dataclass(meta_fields=("block_size",))
class PagedKVCache:
    """kv: [L, num_blocks, 2 (K|V), kv_heads, block_size, head_dim]."""

    kv: jax.Array
    block_size: int = 16

    @property
    def num_layers(self) -> int:
        return self.kv.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.kv.shape[3]

    @property
    def num_blocks(self) -> int:
        return self.kv.shape[1]

    @property
    def head_dim(self) -> int:
        return self.kv.shape[5]

    @property
    def k(self) -> jax.Array:
        """K view [L, KH, NB, bs, D] (reference-path layout; lazy under
        jit — prefer indexing ``kv`` directly inside kernels)."""
        return jnp.swapaxes(self.kv[:, :, 0], 1, 2)

    @property
    def v(self) -> jax.Array:
        return jnp.swapaxes(self.kv[:, :, 1], 1, 2)

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "PagedKVCache":
        # Lane-pad head_dim to a 128 multiple: TPU HBM stores arrays in
        # (8, 128)-tiled layout, so a d=64 or d=192 pool physically
        # occupies the padded lanes ANYWAY — allocating them explicitly
        # costs no extra HBM and makes every DMA slice tile-aligned
        # (Mosaic rejects sub-128 dim-5 slices: "Slice shape along
        # dimension 5 must be aligned to tiling (128)").  Writers pad
        # K/V rows; the attention seam pads q and slices the output.
        d_pad = -(-model_cfg.head_dim // 128) * 128
        # YOCO: only the leading num_cached_layers own pool storage
        shape = (model_cfg.num_cached_layers, num_blocks, 2,
                 model_cfg.num_kv_heads, cache_cfg.block_size, d_pad)
        return cls(kv=jnp.zeros(shape, dtype),
                   block_size=cache_cfg.block_size)

    def write(self, layer_idx, k: jax.Array, v: jax.Array,
              slot_mapping: jax.Array, num_tokens=None) -> "PagedKVCache":
        """Scatter new K/V rows ([T, kv_heads, head_dim]) into the pool.

        ``layer_idx`` may be a Python int or a traced scalar (layer-scan
        path).  Pad tokens carry slot -1; scatter mode='drop' discards them
        (the fused-scatter analogue of the reference's ``reshape_and_cache``,
        ``/root/reference/vllm_metal/metal/reshape_and_cache.metal:99``).
        """
        import os
        import jax as _jax
        d = self.kv.shape[-1]
        if k.shape[-1] != d:                    # lane-padded pool
            pad = ((0, 0), (0, 0), (0, d - k.shape[-1]))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        if (_jax.default_backend() == "tpu"
                and os.environ.get("VLLM_METAL_TPU_PALLAS_KV_WRITE") != "0"):
            # guaranteed in-place via the aliased Pallas write
            from ..ops.reshape_and_cache import reshape_and_cache
            nkv = reshape_and_cache(self.kv, k, v, slot_mapping, layer_idx,
                                    block_size=self.block_size,
                                    num_tokens=num_tokens)
            return PagedKVCache(kv=nkv, block_size=self.block_size)
        bs = self.block_size
        # -1 pads must map OUT of range (num_blocks): .at[] wraps negative
        # indices before the mode="drop" bounds check.
        blk = jnp.where(slot_mapping < 0, self.kv.shape[1],
                        slot_mapping // bs)
        row = slot_mapping % bs
        kv = self.kv.at[layer_idx, blk, 0, :, row].set(
            k.astype(self.kv.dtype), mode="drop")
        kv = kv.at[layer_idx, blk, 1, :, row].set(
            v.astype(self.kv.dtype), mode="drop")
        return PagedKVCache(kv=kv, block_size=self.block_size)

    def bytes_per_block(self) -> int:
        l, nb, two, kh, bs, d = self.kv.shape
        return l * two * kh * bs * d * self.kv.dtype.itemsize

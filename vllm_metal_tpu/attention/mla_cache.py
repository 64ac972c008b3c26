# SPDX-License-Identifier: Apache-2.0
"""Paged latent cache for MLA (DeepSeek-style multi-head latent attention).

TPU analogue of ``MLAPagedLatentCache``
(``/root/reference/vllm_metal/attention/caches/mla_cache.py:6``): per layer
one pool of ``[num_blocks, block_size, kv_lora_rank + qk_rope_head_dim]``
latent rows — the compressed KV (c_kv) concatenated with the shared roped
key.  All query heads read the same latent row, so there is no kv_heads
axis; under TP the latent pool is replicated and heads shard the query side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils import static_dataclass


@static_dataclass(meta_fields=("block_size", "kv_lora_rank", "rope_dim"))
class MLAPagedLatentCache:
    """latents: [L, num_blocks, block_size, W_pad].

    ``W_pad`` is ``R + rope_dim`` rounded up to a 128 multiple — Mosaic
    DMA slices must be lane-aligned, and the kernel's query pads with
    zeros so the extra columns never contribute to scores.
    """

    latents: jax.Array
    block_size: int = 16
    kv_lora_rank: int = 512
    rope_dim: int = 64

    @property
    def num_layers(self) -> int:
        return self.latents.shape[0]

    @property
    def num_blocks(self) -> int:
        return self.latents.shape[1]

    @property
    def width(self) -> int:
        """Logical row width (R + rope_dim), excluding lane padding."""
        return self.kv_lora_rank + self.rope_dim

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "MLAPagedLatentCache":
        width = model_cfg.kv_lora_rank + model_cfg.qk_rope_head_dim
        w_pad = -(-width // 128) * 128
        shape = (model_cfg.num_layers, num_blocks, cache_cfg.block_size,
                 w_pad)
        return cls(latents=jnp.zeros(shape, dtype),
                   block_size=cache_cfg.block_size,
                   kv_lora_rank=model_cfg.kv_lora_rank,
                   rope_dim=model_cfg.qk_rope_head_dim)

    def write(self, layer_idx: int, c_kv: jax.Array, k_rope: jax.Array,
              slot_mapping: jax.Array) -> "MLAPagedLatentCache":
        """Scatter latent rows.  c_kv: [T, R]; k_rope: [T, rope_dim]."""
        l, nb, bs, w_pad = self.latents.shape
        rows = jnp.concatenate(
            [c_kv, k_rope], axis=-1).astype(self.latents.dtype)
        if rows.shape[-1] != w_pad:
            rows = jnp.pad(rows, ((0, 0), (0, w_pad - rows.shape[-1])))
        flat = self.latents[layer_idx].reshape(nb * bs, w_pad)
        # -1 pads would wrap to the last slot (negative indices normalize
        # before the drop bounds check) — remap out of range instead.
        sm = jnp.where(slot_mapping < 0, nb * bs, slot_mapping)
        flat = flat.at[sm].set(rows, mode="drop")
        return MLAPagedLatentCache(
            latents=self.latents.at[layer_idx].set(
                flat.reshape(nb, bs, w_pad)),
            block_size=self.block_size, kv_lora_rank=self.kv_lora_rank,
            rope_dim=self.rope_dim)

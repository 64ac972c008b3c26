# SPDX-License-Identifier: Apache-2.0
"""Hybrid cache: paged KV pools for attention layers + GDN state slots.

TPU analogue of ``GDNPagedStateCache`` + the hybrid runtime's split layout
(``/root/reference/vllm_metal/attention/caches/gdn_cache.py:1``,
``runtime/hybrid.py:71``): full-attention layers share a paged KV pool
(indexed by their position among attention layers); GDN layers keep
per-request fixed slots — conv state ``[slots, conv_k-1, conv_dim]`` and
fp32 recurrent state ``[slots, Hv, Dv, Dk]`` — stacked per GDN layer.
Recurrent state cannot be rebuilt from KV blocks, so prefix caching is
disabled for hybrids (matching ``platform.py:487-495``) and preemption
resets the slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..utils import static_dataclass
from .kv_cache import PagedKVCache


@static_dataclass(meta_fields=("block_size",))
class HybridCache:
    kv: PagedKVCache            # stacked over ATTENTION layers only
    conv: jax.Array             # [n_gdn_layers, slots, conv_k-1, conv_dim]
    rec: jax.Array              # [n_gdn_layers, slots, Hv, Dv, Dk] f32
    block_size: int = 16

    @property
    def num_blocks(self) -> int:
        return self.kv.num_blocks

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "HybridCache":
        import dataclasses
        x = model_cfg.extra
        interval = x["full_attention_interval"]
        n_attn = model_cfg.num_layers // interval
        n_gdn = model_cfg.num_layers - n_attn
        attn_cfg = dataclasses.replace(model_cfg, num_layers=n_attn)
        kv = PagedKVCache.allocate(attn_cfg, cache_cfg, num_blocks, dtype)
        # +1 junk row: the GDN decode kernel routes pad tokens' (inert)
        # state writes to row ``slots`` so they never alias a live slot
        slots = x.get("gdn_slots", 64) + 1
        conv_dim = 2 * x["gdn_k_heads"] * x["gdn_k_dim"] \
            + x["gdn_v_heads"] * x["gdn_v_dim"]
        taps = x.get("gdn_conv_k", 4) - 1
        return cls(
            kv=kv,
            conv=jnp.zeros((n_gdn, slots, taps, conv_dim), dtype),
            rec=jnp.zeros((n_gdn, slots, x["gdn_v_heads"], x["gdn_v_dim"],
                           x["gdn_k_dim"]), jnp.float32),
            block_size=cache_cfg.block_size)

    def bytes_per_block(self) -> int:
        return self.kv.bytes_per_block()

    def reset_slots(self, slots: jax.Array) -> "HybridCache":
        """Zero the given state slots (request admission / preemption)."""
        conv = self.conv.at[:, slots].set(0.0)
        rec = self.rec.at[:, slots].set(0.0)
        return HybridCache(kv=self.kv, conv=conv, rec=rec,
                           block_size=self.block_size)

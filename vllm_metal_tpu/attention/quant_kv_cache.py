# SPDX-License-Identifier: Apache-2.0
"""TurboQuant-compressed paged KV cache.

TPU analogue of the reference's packed TQ allocation
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:160-198``): the
pool stores int8 codes plus per-block-group scale/zero (K) and per-token
scale (V).  Quantize-on-write is fused into the scatter; dequant happens at
attention read (reference jnp path here; the Pallas kernel variant fuses the
same math in-VMEM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..ops import turboquant as tq
from ..utils import static_dataclass


@static_dataclass(meta_fields=("block_size", "codec_k", "codec_v"))
class QuantPagedKVCache:
    """codes: [L, KH, NB, bs, D] int8; k scale/zero: [L, KH, NB, bs, D/32]
    f32; v scale: [L, KH, NB, bs, 1] f32 (trailing singleton so all five
    pools share the [L, KH, NB, bs, last] row structure the fused write
    kernel scatters into)."""

    k_codes: jax.Array
    k_scale: jax.Array
    k_zero: jax.Array
    v_codes: jax.Array
    v_scale: jax.Array
    block_size: int = 16
    codec_k: str = "q8_0"
    codec_v: str = "q3_0"

    # interface parity with PagedKVCache
    @property
    def num_layers(self) -> int:
        return self.k_codes.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.k_codes.shape[1]

    @property
    def num_blocks(self) -> int:
        return self.k_codes.shape[2]

    @property
    def head_dim(self) -> int:
        return self.k_codes.shape[4]

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "QuantPagedKVCache":
        l, kh = model_cfg.num_layers, model_cfg.num_kv_heads
        bs, d = cache_cfg.block_size, model_cfg.head_dim
        g = d // tq.K_BLOCK
        shape = (l, kh, num_blocks, bs, d)
        return cls(
            k_codes=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros((l, kh, num_blocks, bs, g), jnp.float32),
            k_zero=jnp.zeros((l, kh, num_blocks, bs, g), jnp.float32),
            v_codes=jnp.zeros(shape, jnp.int8),
            v_scale=jnp.zeros((l, kh, num_blocks, bs, 1), jnp.float32),
            block_size=cache_cfg.block_size,
            codec_k=cache_cfg.kv_quant_k or "q8_0",
            codec_v=cache_cfg.kv_quant_v or "q3_0",
        )

    def write(self, layer_idx: int, k: jax.Array, v: jax.Array,
              slot_mapping: jax.Array,
              num_tokens=None) -> "QuantPagedKVCache":
        """Fused quantize + scatter (the reference's ``tq_encode`` primitive,
        ``paged_ops.cpp:846``).  k/v: [T, KH, D].

        Encode math stays in jnp (rows are tiny); the scatter goes through
        the aliased Pallas write on TPU — the functional ``.at[].set``
        alternative round-trips every multi-GB pool per layer (the same
        full-pool-copy pathology ``ops/reshape_and_cache.py`` documents).
        """
        import os
        l, kh, nb, bs, d = self.k_codes.shape
        g = d // tq.K_BLOCK
        kc, ks, kz = tq.k_encode(k, self.codec_k)       # [T,KH,D],[T,KH,g]x2
        vc, vs = tq.v_encode(v, self.codec_v)           # [T,KH,D],[T,KH]

        if (jax.default_backend() == "tpu"
                and (d % 128 == 0 or (d % 8 == 0 and d <= 128))
                and os.environ.get("VLLM_METAL_TPU_PALLAS_KV_WRITE") != "0"):
            from ..ops.tq_cache_write import tq_cache_write
            pools = tq_cache_write(
                self.k_codes, self.k_scale, self.k_zero, self.v_codes,
                self.v_scale, kc, ks, kz, vc, vs[..., None],
                slot_mapping, layer_idx, block_size=bs,
                num_tokens=num_tokens)
            return QuantPagedKVCache(
                k_codes=pools[0], k_scale=pools[1], k_zero=pools[2],
                v_codes=pools[3], v_scale=pools[4],
                block_size=self.block_size,
                codec_k=self.codec_k, codec_v=self.codec_v)

        # Pad slots are -1; .at[] normalizes negatives BEFORE the bounds
        # check, so -1 would wrap to the pool's last slot. Remap to an
        # out-of-range index so mode="drop" really drops them.
        sm = jnp.where(slot_mapping < 0, nb * bs, slot_mapping)

        def scat(pool, new, flat_shape):
            p = pool[layer_idx].reshape(flat_shape)
            p = p.at[:, sm].set(
                jnp.moveaxis(new, 0, 1).astype(p.dtype), mode="drop")
            return pool.at[layer_idx].set(
                p.reshape(pool.shape[1:]))

        return QuantPagedKVCache(
            k_codes=scat(self.k_codes, kc, (kh, nb * bs, d)),
            k_scale=scat(self.k_scale, ks, (kh, nb * bs, g)),
            k_zero=scat(self.k_zero, kz, (kh, nb * bs, g)),
            v_codes=scat(self.v_codes, vc, (kh, nb * bs, d)),
            v_scale=scat(self.v_scale, vs[..., None], (kh, nb * bs, 1)),
            block_size=self.block_size,
            codec_k=self.codec_k, codec_v=self.codec_v)

    def dequant_gathered(self, layer_idx: int, slot_idx: jax.Array,
                         dtype=jnp.bfloat16):
        """Gather + dequant KV rows for the reference attention path.

        slot_idx: [T, max_kv] flat slot indices -> (k, v) [T, max_kv, KH, D].
        """
        l, kh, nb, bs, d = self.k_codes.shape
        g = d // tq.K_BLOCK
        kc = self.k_codes[layer_idx].reshape(kh, nb * bs, d)[:, slot_idx]
        ks = self.k_scale[layer_idx].reshape(kh, nb * bs, g)[:, slot_idx]
        kz = self.k_zero[layer_idx].reshape(kh, nb * bs, g)[:, slot_idx]
        vc = self.v_codes[layer_idx].reshape(kh, nb * bs, d)[:, slot_idx]
        vs = self.v_scale[layer_idx].reshape(kh, nb * bs)[:, slot_idx]
        # (v_scale stores a trailing singleton; reshape drops it)
        k = tq.k_decode(kc, ks, kz, self.codec_k, dtype)
        v = tq.v_decode(vc, vs, self.codec_v, dtype)
        # [KH, T, max_kv, D] -> [T, max_kv, KH, D]
        return (jnp.moveaxis(k, 0, 2), jnp.moveaxis(v, 0, 2))

    def bytes_per_block(self) -> int:
        l, kh, nb, bs, d = self.k_codes.shape
        g = d // tq.K_BLOCK
        per_tok = d * 2 + g * 8 + 4        # codes + k scale/zero + v scale
        return l * kh * bs * per_tok

# SPDX-License-Identifier: Apache-2.0
"""TurboQuant-compressed paged KV cache (PACKED sub-byte storage).

TPU analogue of the reference's packed TQ allocation
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:160-198`` +
bit packing ``turboquant.py:242-339``): codes store in bit planes packed
8/w per byte (see ``ops/turboquant.py``), scales/zeros in bfloat16 — so
q4_0/q3_0 really is ~3.9x smaller than bf16, matching the reference's
compression table (``docs/turboquant.md``), not just lower-precision.
Quantize-on-write is fused into the scatter; dequant happens at attention
read (reference jnp path here; the Pallas kernel unpacks the same planes
in-VMEM).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..ops import turboquant as tq
from ..utils import static_dataclass


@static_dataclass(meta_fields=("block_size", "codec_k", "codec_v",
                               "head_dim"))
class QuantPagedKVCache:
    """All pools share the ``[L, KH, NB, bs, last]`` row structure the
    fused write kernel scatters into:

    * ``k_codes``/``v_codes``: hi bit plane, int8, last = D*hi_bits/8
    * ``k_lo``/``v_lo``: optional 1-bit plane (5/3-bit codecs), last = D/8
    * ``k_scale``/``k_zero``: bf16, last = D/32
    * ``v_scale``: bf16, last = 1
    """

    k_codes: jax.Array
    k_lo: Optional[jax.Array]
    k_scale: jax.Array
    k_zero: jax.Array
    v_codes: jax.Array
    v_lo: Optional[jax.Array]
    v_scale: jax.Array
    block_size: int = 16
    codec_k: str = "q8_0"
    codec_v: str = "q3_0"
    head_dim: int = 128

    # interface parity with PagedKVCache
    @property
    def num_layers(self) -> int:
        return self.k_scale.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.k_scale.shape[1]

    @property
    def num_blocks(self) -> int:
        return self.k_scale.shape[2]

    @property
    def k_bits(self) -> int:
        return tq._K_PARAMS[self.codec_k][1]

    @property
    def v_bits(self) -> int:
        return tq._V_BITS[self.codec_v]

    @classmethod
    def allocate(cls, model_cfg: ModelConfig, cache_cfg: CacheConfig,
                 num_blocks: int, dtype=jnp.bfloat16) -> "QuantPagedKVCache":
        l, kh = model_cfg.num_layers, model_cfg.num_kv_heads
        bs, d = cache_cfg.block_size, model_cfg.head_dim
        g = d // tq.K_BLOCK
        ck = cache_cfg.kv_quant_k or "q8_0"
        cv = cache_cfg.kv_quant_v or "q3_0"
        k_hi, k_lo = tq.packed_widths(d, tq._K_PARAMS[ck][1])
        v_hi, v_lo = tq.packed_widths(d, tq._V_BITS[cv])

        def pool(last, dt=jnp.int8):
            return jnp.zeros((l, kh, num_blocks, bs, last), dt)

        return cls(
            k_codes=pool(k_hi),
            k_lo=pool(k_lo) if k_lo else None,
            k_scale=pool(g, jnp.bfloat16),
            k_zero=pool(g, jnp.bfloat16),
            v_codes=pool(v_hi),
            v_lo=pool(v_lo) if v_lo else None,
            v_scale=pool(1, jnp.bfloat16),
            block_size=bs, codec_k=ck, codec_v=cv, head_dim=d,
        )

    def _pools(self) -> tuple:
        """Present pool arrays, fixed order (None planes skipped)."""
        ps = [self.k_codes]
        if self.k_lo is not None:
            ps.append(self.k_lo)
        ps += [self.k_scale, self.k_zero, self.v_codes]
        if self.v_lo is not None:
            ps.append(self.v_lo)
        ps.append(self.v_scale)
        return tuple(ps)

    def _rebuild(self, pools: tuple) -> "QuantPagedKVCache":
        it = iter(pools)
        k_codes = next(it)
        k_lo = next(it) if self.k_lo is not None else None
        k_scale, k_zero, v_codes = next(it), next(it), next(it)
        v_lo = next(it) if self.v_lo is not None else None
        v_scale = next(it)
        return QuantPagedKVCache(
            k_codes=k_codes, k_lo=k_lo, k_scale=k_scale, k_zero=k_zero,
            v_codes=v_codes, v_lo=v_lo, v_scale=v_scale,
            block_size=self.block_size, codec_k=self.codec_k,
            codec_v=self.codec_v, head_dim=self.head_dim)

    def _encode_rows(self, k: jax.Array, v: jax.Array) -> tuple:
        """[T, KH, D] rows -> packed new-row arrays in ``_pools`` order."""
        kc, ks, kz = tq.k_encode(k, self.codec_k)       # [T,KH,D],[T,KH,g]x2
        vc, vs = tq.v_encode(v, self.codec_v)           # [T,KH,D],[T,KH]
        k_hi, k_lo = tq.pack_codes(kc, self.k_bits)
        v_hi, v_lo = tq.pack_codes(vc, self.v_bits)
        news = [k_hi]
        if self.k_lo is not None:
            news.append(k_lo)
        news += [ks, kz, v_hi]
        if self.v_lo is not None:
            news.append(v_lo)
        news.append(vs[..., None])
        return tuple(news)

    def write(self, layer_idx: int, k: jax.Array, v: jax.Array,
              slot_mapping: jax.Array,
              num_tokens=None) -> "QuantPagedKVCache":
        """Fused quantize + pack + scatter (the reference's ``tq_encode``
        primitive, ``paged_ops.cpp:846``).  k/v: [T, KH, D].

        Encode/pack math stays in jnp (rows are tiny); the scatter goes
        through the aliased Pallas write on TPU — the functional
        ``.at[].set`` alternative round-trips every multi-GB pool per
        layer (the same full-pool-copy pathology
        ``ops/reshape_and_cache.py`` documents).
        """
        import os
        kh, nb, bs = self.k_scale.shape[1:4]
        news = self._encode_rows(k, v)
        pools = self._pools()

        # The row-wave Pallas write DMAs sub-128-lane pool slices, which
        # this Mosaic toolchain rejects on real TPU (probe: ANY->VMEM
        # copies require 128-lane tiles for every dtype).  Opt-in only —
        # the 128-lane block-payload layout (tq_block_layout.py) is the
        # TPU-native path.
        if (jax.default_backend() == "tpu"
                and os.environ.get("VLLM_METAL_TPU_PALLAS_KV_WRITE") == "1"):
            from ..ops.tq_cache_write import tq_cache_write
            out = tq_cache_write(pools, news, slot_mapping, layer_idx,
                                 block_size=bs, num_tokens=num_tokens)
            return self._rebuild(out)

        # Pad slots are -1; .at[] normalizes negatives BEFORE the bounds
        # check, so -1 would wrap to the pool's last slot. Remap to an
        # out-of-range index so mode="drop" really drops them.
        sm = jnp.where(slot_mapping < 0, nb * bs, slot_mapping)

        def scat(pool, new):
            last = pool.shape[-1]
            p = pool[layer_idx].reshape(kh, nb * bs, last)
            p = p.at[:, sm].set(
                jnp.moveaxis(new, 0, 1).astype(p.dtype), mode="drop")
            return pool.at[layer_idx].set(p.reshape(pool.shape[1:]))

        return self._rebuild(tuple(
            scat(p, n) for p, n in zip(pools, news)))

    def dequant_gathered(self, layer_idx: int, slot_idx: jax.Array,
                         dtype=jnp.bfloat16):
        """Gather + unpack + dequant KV rows for the reference attention
        path.  slot_idx: [T, max_kv] flat slots -> (k, v) [T, max_kv, KH, D].
        """
        kh, nb, bs = self.k_scale.shape[1:4]
        g = self.head_dim // tq.K_BLOCK

        def gather(pool):
            last = pool.shape[-1]
            return pool[layer_idx].reshape(kh, nb * bs, last)[:, slot_idx]

        kc = tq.unpack_codes(
            gather(self.k_codes),
            gather(self.k_lo) if self.k_lo is not None else None,
            self.k_bits)
        vc = tq.unpack_codes(
            gather(self.v_codes),
            gather(self.v_lo) if self.v_lo is not None else None,
            self.v_bits)
        ks = gather(self.k_scale).astype(jnp.float32)
        kz = gather(self.k_zero).astype(jnp.float32)
        vs = gather(self.v_scale)[..., 0].astype(jnp.float32)
        k = tq.k_decode(kc, ks, kz, self.codec_k, dtype)
        v = tq.v_decode(vc, vs, self.codec_v, dtype)
        # [KH, T, max_kv, D] -> [T, max_kv, KH, D]
        return (jnp.moveaxis(k, 0, 2), jnp.moveaxis(v, 0, 2))

    def bytes_per_block(self) -> int:
        nb = self.num_blocks
        return sum(int(p.size) * p.dtype.itemsize // nb
                   for p in self._pools())

# SPDX-License-Identifier: Apache-2.0
"""TurboQuant-compressed paged KV cache (packed block-payload layout).

TPU analogue of the reference's packed TQ allocation
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:160-198`` +
bit packing ``turboquant.py:242-339``), laid out for the TPU's 128-lane
memory system: every pool stores WHOLE-BLOCK payloads whose rows keep the
full head-dim lane width —

* ``k_codes``/``v_codes``: bit planes packed along the TOKEN axis
  (``ops/turboquant.py::pack_block``): ``[L, KH, NB, bs*w/8, D]`` int8.
* ``k_lo``/``v_lo``: optional 1-bit plane (5/3-bit codecs),
  ``[L, KH, NB, bs/8, D]``.
* ``k_scale``/``k_zero``: TRANSPOSED ``[L, KH, NB, D/32, bs]`` bf16
  (lanes = tokens) — consumed by the kernel's group-split dots without
  any in-kernel transpose.
* ``v_scale``: ``[L, KH, NB, 1, bs]`` bf16.

Real-TPU Mosaic requires 128-lane DMA tiles, so the Pallas read/write
kernels engage when ``block_size == 128`` and ``head_dim % 128 == 0``
(one block = one KV tile); other configs run the jnp gather/scatter
paths (tests, CPU).  Compression matches the reference's table
(q4_0/q3_0 ~3.9x vs bf16 — docs/quantization.md).

Writes merge the step's tokens into per-block payload+mask tensors
(bit-disjoint scatter-adds, traceable under jit), then blend blocks:
``new_pool_block = (old & ~mask) | payload`` — RMW because packed bytes
interleave DIFFERENT tokens' bits, so a token write must preserve its
neighbors' fields.
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
        if bs % 8:
            raise ValueError(
                f"TurboQuant cache needs block_size % 8 == 0, got {bs}")
        g = d // tq.K_BLOCK
        ck = cache_cfg.kv_quant_k or "q8_0"
        cv = cache_cfg.kv_quant_v or "q3_0"
        k_hi, k_lo = tq.block_plane_rows(bs, tq._K_PARAMS[ck][1])
        v_hi, v_lo = tq.block_plane_rows(bs, tq._V_BITS[cv])

        def pool(rows, lanes, dt=jnp.int8):
            return jnp.zeros((l, kh, num_blocks, rows, lanes), dt)

        return cls(
            k_codes=pool(k_hi, d),
            k_lo=pool(k_lo, d) if k_lo else None,
            k_scale=pool(g, bs, jnp.bfloat16),
            k_zero=pool(g, bs, jnp.bfloat16),
            v_codes=pool(v_hi, d),
            v_lo=pool(v_lo, d) if v_lo else None,
            # 2 rows (row 1 unused): bf16 VMEM slices tile at (2, 128),
            # so a 1-row payload can't DMA on real TPU
            v_scale=pool(2, bs, jnp.bfloat16),
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

    # ------------------------------------------------------------------
    def _merged_payloads(self, k, v, slot_mapping, num_tokens=None):
        """Merge the step's [T, KH, D] rows into per-block payload+mask
        tensors (all traceable; writes happen inside the jitted step).

        Returns (ublocks [B], payloads, masks) with B = T entries:
        ublocks sorted-unique touched blocks (pad = num_blocks, dropped
        downstream); per pool j: payload/mask [B, KH, rows_j, lanes_j]
        where mask marks the bits/lanes this step owns.
        """
        t = k.shape[0]
        kh = self.num_kv_heads
        d = self.head_dim
        bs, nb = self.block_size, self.num_blocks
        g = d // tq.K_BLOCK

        kc, ks, kz = tq.k_encode(k, self.codec_k)     # [T,KH,D],[T,KH,g]x2
        vc, vs = tq.v_encode(v, self.codec_v)         # [T,KH,D],[T,KH]

        valid = slot_mapping >= 0
        if num_tokens is not None:
            valid &= jnp.arange(t) < num_tokens
        blocks = jnp.where(valid, slot_mapping // bs, nb)
        rb = jnp.where(valid, slot_mapping % bs, 0)
        ublocks = jnp.unique(blocks, size=t, fill_value=nb)
        pos = jnp.clip(jnp.searchsorted(ublocks, blocks), 0, t - 1)

        def code_planes(codes, bits):
            """[(payload, mask), ...] for the hi (and lo) plane pools."""
            hi, lo = tq.plane_split(bits)
            c = codes.astype(jnp.int32)
            if hi == 8:
                parts = [(c & 0xFF, 8)]
            else:
                c &= (1 << bits) - 1
                parts = [(c & ((1 << hi) - 1), hi)]
                if lo:
                    parts.append((c >> hi, lo))
            outs = []
            for vals, w in parts:
                n = bs * w // 8
                r = rb % n
                s = rb // n
                shifted = vals << (s[:, None, None] * w)
                mbits = ((1 << w) - 1) << (s * w)             # [T] i32
                pay = jnp.zeros((t, kh, n, d), jnp.int32).at[
                    pos, :, r].add(jnp.where(valid[:, None, None],
                                             shifted, 0))
                msk = jnp.zeros((t, n), jnp.int32).at[pos, r].add(
                    jnp.where(valid, mbits, 0))
                outs.append((pay.astype(jnp.int8),
                             jnp.broadcast_to(
                                 msk[:, None, :, None].astype(jnp.int8),
                                 (t, kh, n, d))))
            return outs

        def scale_payload(vals, rows):
            """vals [T, KH, rows] -> payload/mask [B, KH, rows, bs]."""
            pay = jnp.zeros((t, kh, rows, bs), jnp.bfloat16).at[
                pos, :, :, rb].set(
                jnp.where(valid[:, None, None], vals.astype(jnp.bfloat16),
                          0), mode="drop")
            msk = jnp.zeros((t, bs), jnp.int8).at[pos, rb].max(
                jnp.where(valid, 1, 0).astype(jnp.int8))
            return pay, jnp.broadcast_to(msk[:, None, None, :],
                                         (t, kh, rows, bs))

        pairs = code_planes(kc, self.k_bits)
        pairs.append(scale_payload(ks, g))
        pairs.append(scale_payload(kz, g))
        pairs += code_planes(vc, self.v_bits)
        vs2 = jnp.concatenate([vs[..., None], jnp.zeros_like(vs)[..., None]],
                              axis=-1)
        pairs.append(scale_payload(vs2, 2))
        payloads = tuple(p for p, _ in pairs)
        masks = tuple(m for _, m in pairs)
        return ublocks, payloads, masks

    @staticmethod
    def _blend(old, payload, mask):
        """RMW merge of a block payload (bit fields for int8 code pools,
        lane select for bf16 scale pools)."""
        if old.dtype == jnp.int8:
            return (old & ~mask) | payload
        return jnp.where(mask != 0, payload, old)

    def write(self, layer_idx: int, k: jax.Array, v: jax.Array,
              slot_mapping: jax.Array,
              num_tokens=None) -> "QuantPagedKVCache":
        """Fused quantize + pack + block-merge write (the reference's
        ``tq_encode`` primitive, ``paged_ops.cpp:846``).  k/v: [T, KH, D].
        """
        import os
        bs, nb = self.block_size, self.num_blocks
        ublocks, payloads, masks = self._merged_payloads(
            k, v, slot_mapping, num_tokens)
        pools = self._pools()

        if (jax.default_backend() == "tpu" and bs == 128
                and self.head_dim % 128 == 0
                and os.environ.get("VLLM_METAL_TPU_PALLAS_KV_WRITE") != "0"):
            from ..ops.tq_cache_write import tq_block_write
            out = tq_block_write(pools, ublocks, payloads, masks,
                                 layer_idx)
            return self._rebuild(out)

        # jnp path: gather touched blocks, blend, scatter back (pads in
        # ublocks carry block id == num_blocks -> OOB -> mode="drop")
        ub = jnp.minimum(ublocks, nb)
        new_pools = []
        for pool, pay, msk in zip(pools, payloads, masks):
            old = pool[layer_idx][:, jnp.minimum(ub, nb - 1)]  # [KH,B,r,l]
            blended = self._blend(old, jnp.moveaxis(pay, 0, 1),
                                  jnp.moveaxis(msk, 0, 1))
            # int layer index + advanced block index are separated by the
            # head slice, so the indexed dims move to the FRONT: value
            # shape is [B, KH, rows, lanes]
            new_pools.append(pool.at[layer_idx, :, ub].set(
                jnp.moveaxis(blended, 1, 0), mode="drop"))
        return self._rebuild(tuple(new_pools))

    # ------------------------------------------------------------------
    def dequant_gathered(self, layer_idx: int, slot_idx: jax.Array,
                         dtype=jnp.bfloat16):
        """Gather + unpack + dequant KV rows for the reference attention
        path.  slot_idx: [T, max_kv] flat slots -> (k, v) [T, max_kv, KH, D].

        Unpacks the layer's whole pool first (fallback-path economics:
        fine for tests/CPU; the Pallas kernel path never calls this).
        """
        kh, nb = self.num_kv_heads, self.num_blocks
        bs, d = self.block_size, self.head_dim
        g = d // tq.K_BLOCK

        kcod = tq.unpack_block(
            self.k_codes[layer_idx],
            None if self.k_lo is None else self.k_lo[layer_idx],
            self.k_bits).reshape(kh, nb * bs, d)[:, slot_idx]
        vcod = tq.unpack_block(
            self.v_codes[layer_idx],
            None if self.v_lo is None else self.v_lo[layer_idx],
            self.v_bits).reshape(kh, nb * bs, d)[:, slot_idx]
        # scale pools are [KH, NB, rows, bs] (lanes = tokens)
        ks = jnp.moveaxis(self.k_scale[layer_idx], -1, -2).reshape(
            kh, nb * bs, g)[:, slot_idx].astype(jnp.float32)
        kz = jnp.moveaxis(self.k_zero[layer_idx], -1, -2).reshape(
            kh, nb * bs, g)[:, slot_idx].astype(jnp.float32)
        vs = self.v_scale[layer_idx][:, :, 0, :].reshape(
            kh, nb * bs)[:, slot_idx].astype(jnp.float32)
        k = tq.k_decode(kcod, ks, kz, self.codec_k, dtype)
        v = tq.v_decode(vcod, vs, self.codec_v, dtype)
        # [KH, T, max_kv, D] -> [T, max_kv, KH, D]
        return (jnp.moveaxis(k, 0, 2), jnp.moveaxis(v, 0, 2))

    def bytes_per_block(self) -> int:
        nb = self.num_blocks
        return sum(int(p.size) * p.dtype.itemsize // nb
                   for p in self._pools())

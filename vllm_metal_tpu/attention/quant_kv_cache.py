# SPDX-License-Identifier: Apache-2.0
"""TurboQuant-compressed paged KV cache (packed block-payload layout).

TPU analogue of the reference's packed TQ allocation
(``/root/reference/vllm_metal/attention/caches/kv_cache.py:160-198`` +
bit packing ``turboquant.py:242-339``), laid out for the TPU's 128-lane
memory system: every pool stores WHOLE-BLOCK payloads whose rows keep the
full head-dim lane width —

* ``k_codes``/``v_codes``: bit planes packed along the TOKEN axis
  (``ops/turboquant.py::pack_block``): ``[L, NB, KH, bs*w/8, D]`` int8.
* ``k_lo``/``v_lo``: optional 1-bit plane (5/3-bit codecs),
  ``[L, NB, KH, bs/8, D]``.
* ``k_scale``/``k_zero``: TRANSPOSED ``[L, NB, KH, D/32, bs]`` bf16
  (lanes = tokens) — consumed by the kernel's group-split dots without
  any in-kernel transpose.
* ``v_scale``: ``[L, NB, KH, 1, bs]`` bf16.

The BLOCK dim precedes the head dim (r5): a visit's per-(pool, block)
DMA is then ONE contiguous ``[KH, rows, 128]`` descriptor — the
head-strided layout cost ~0.5 us of issue per copy per visit, which
dominated the q8/q4 kernels equally (bytes were nearly free).

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
    """TWO physical pools (r5): every per-block DMA issue measured
    ~0.23 us regardless of bytes, so the former 5-7 per-section pools
    made the attention kernel DMA-ISSUE-bound.  ``codes`` concatenates
    the k/v bit planes along the row axis; ``scales`` concatenates
    k_scale | k_zero | v_scale.  Section accessors below slice views for
    the jnp reference paths."""

    codes: jax.Array       # [L, NB, KH, k_hi+k_lo+v_hi+v_lo, D] int8
    scales: jax.Array      # [L, NB, KH, g+g+2, bs] bf16
    block_size: int = 16
    codec_k: str = "q8_0"
    codec_v: str = "q3_0"
    head_dim: int = 128

    # interface parity with PagedKVCache
    @property
    def num_layers(self) -> int:
        return self.scales.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.scales.shape[2]

    @property
    def num_blocks(self) -> int:
        return self.scales.shape[1]

    @property
    def k_bits(self) -> int:
        return tq._K_PARAMS[self.codec_k][1]

    @property
    def v_bits(self) -> int:
        return tq._V_BITS[self.codec_v]

    def code_rows(self) -> tuple[int, int, int, int]:
        """(k_hi, k_lo, v_hi, v_lo) section row counts in ``codes``."""
        k_hi, k_lo = tq.block_plane_rows(self.block_size, self.k_bits)
        v_hi, v_lo = tq.block_plane_rows(self.block_size, self.v_bits)
        return k_hi, k_lo, v_hi, v_lo

    # -- section views (jnp reference paths / tests) -------------------
    @property
    def k_codes(self) -> jax.Array:
        k_hi = self.code_rows()[0]
        return self.codes[:, :, :, :k_hi]

    @property
    def k_lo(self) -> Optional[jax.Array]:
        k_hi, k_lo, _, _ = self.code_rows()
        return self.codes[:, :, :, k_hi:k_hi + k_lo] if k_lo else None

    @property
    def v_codes(self) -> jax.Array:
        k_hi, k_lo, v_hi, _ = self.code_rows()
        return self.codes[:, :, :, k_hi + k_lo:k_hi + k_lo + v_hi]

    @property
    def v_lo(self) -> Optional[jax.Array]:
        k_hi, k_lo, v_hi, v_lo = self.code_rows()
        o = k_hi + k_lo + v_hi
        return self.codes[:, :, :, o:o + v_lo] if v_lo else None

    @property
    def k_scale(self) -> jax.Array:
        g = self.head_dim // tq.K_BLOCK
        return self.scales[:, :, :, :g]

    @property
    def k_zero(self) -> jax.Array:
        g = self.head_dim // tq.K_BLOCK
        return self.scales[:, :, :, g:2 * g]

    @property
    def v_scale(self) -> jax.Array:
        g = self.head_dim // tq.K_BLOCK
        return self.scales[:, :, :, 2 * g:2 * g + 2]

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
        # On the kernel-engaging config (bs 128, full-lane head dim) the
        # row counts pad to the dtype's HBM sublane tile (int8: 32,
        # bf16: 8) so whole-block DMA slices are tile-aligned; other
        # configs (tests/CPU jnp paths) stay unpadded
        r8 = k_hi + k_lo + v_hi + v_lo
        rs = 2 * g + 2
        if bs == 128 and d % 128 == 0:
            r8 = -(-r8 // 32) * 32
            rs = -(-rs // 8) * 8
        return cls(
            codes=jnp.zeros((l, num_blocks, kh, r8, d), jnp.int8),
            scales=jnp.zeros((l, num_blocks, kh, rs, bs), jnp.bfloat16),
            block_size=bs, codec_k=ck, codec_v=cv, head_dim=d,
        )

    def _pools(self) -> tuple:
        return (self.codes, self.scales)

    def _rebuild(self, pools: tuple) -> "QuantPagedKVCache":
        codes, scales = pools
        return QuantPagedKVCache(
            codes=codes, scales=scales,
            block_size=self.block_size, codec_k=self.codec_k,
            codec_v=self.codec_v, head_dim=self.head_dim)

    # ------------------------------------------------------------------
    def write_plan(self, slot_mapping, num_tokens=None, max_seqs=None):
        """LAYER-INVARIANT write bookkeeping (touched blocks, scatter
        positions), computed ONCE per step: recomputed per layer, the
        tiny sort/searchsorted ops cost several ms/step on chip."""
        import jax.numpy as jnp
        t = slot_mapping.shape[0]
        bs, nb = self.block_size, self.num_blocks
        valid = slot_mapping >= 0
        if num_tokens is not None:
            valid &= jnp.arange(t) < num_tokens
        blocks = jnp.where(valid, slot_mapping // bs, nb)
        rb = jnp.where(valid, slot_mapping % bs, 0)
        b_cap = t if max_seqs is None else min(
            t, t // bs + int(max_seqs) + 1)
        ublocks = jnp.unique(blocks, size=b_cap, fill_value=nb)
        pos = jnp.clip(jnp.searchsorted(ublocks, blocks), 0, b_cap - 1)
        return ublocks, pos, rb, valid

    def _merged_payloads(self, k, v, slot_mapping, num_tokens=None,
                         max_seqs=None, plan=None):
        """Merge the step's [T, KH, D] rows into per-block payload+mask
        tensors (all traceable; writes happen inside the jitted step).

        Returns (ublocks [B], payloads, masks): ublocks sorted-unique
        touched blocks (pad = num_blocks, dropped downstream); per pool
        j: payload/mask [B, KH, rows_j, lanes_j] where mask marks the
        bits/lanes this step owns.

        B is the worst-case TOUCHED-BLOCK count, not T (r5): each
        sequence's chunk is slot-contiguous, so B <= T//bs + max_seqs
        (+1 pad).  The old B = T built a WHOLE-BLOCK payload per token
        — 67 MB/layer of int32 intermediates at decode and GBs at
        prefill; this was the real cost hiding behind the "slow TQ
        kernel" (the attention kernel itself measures 1.2 us/visit).
        """
        t = k.shape[0]
        kh = self.num_kv_heads
        d = self.head_dim
        bs, nb = self.block_size, self.num_blocks
        g = d // tq.K_BLOCK

        kc, ks, kz = tq.k_encode(k, self.codec_k)     # [T,KH,D],[T,KH,g]x2
        vc, vs = tq.v_encode(v, self.codec_v)         # [T,KH,D],[T,KH]

        if plan is None:
            plan = self.write_plan(slot_mapping, num_tokens, max_seqs)
        ublocks, pos, rb, valid = plan
        t = ublocks.shape[0]          # payload entry count below

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
                # int8 accumulators: disjoint bit-fields never carry, so
                # wrap-add == bitwise OR (int32 cost 4x the HBM traffic).
                # Out-of-range int casts are platform-defined in XLA, so
                # map to [-128, 127] bit-exactly first.
                def to_i8(x):
                    return ((x & 0xFF) ^ 0x80) - 0x80

                shifted = to_i8(vals << (s[:, None, None] * w)
                                ).astype(jnp.int8)
                mbits = to_i8(((1 << w) - 1) << (s * w)).astype(jnp.int8)
                pay = jnp.zeros((t, kh, n, d), jnp.int8).at[
                    pos, :, r].add(jnp.where(valid[:, None, None],
                                             shifted, 0))
                msk = jnp.zeros((t, n), jnp.int8).at[pos, r].add(
                    jnp.where(valid, mbits, 0))
                outs.append((pay,
                             jnp.broadcast_to(
                                 msk[:, None, :, None],
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

        code_pairs = code_planes(kc, self.k_bits) \
            + code_planes(vc, self.v_bits)
        vs2 = jnp.concatenate([vs[..., None], jnp.zeros_like(vs)[..., None]],
                              axis=-1)
        scale_pairs = [scale_payload(ks, g), scale_payload(kz, g),
                       scale_payload(vs2, 2)]
        # concatenate sections along the row axis -> the TWO pools'
        # whole-block payloads (one DMA each in the write/read kernels),
        # zero-padded to the pools' tile-aligned row counts
        def cat_pad(pairs_, rows):
            pay = jnp.concatenate([p for p, _ in pairs_], axis=2)
            msk = jnp.concatenate([m for _, m in pairs_], axis=2)
            pad = rows - pay.shape[2]
            if pad:
                pw = ((0, 0), (0, 0), (0, pad), (0, 0))
                pay = jnp.pad(pay, pw)
                msk = jnp.pad(msk, pw)
            return pay, msk
        cp_, cm_ = cat_pad(code_pairs, self.codes.shape[3])
        sp_, sm_ = cat_pad(scale_pairs, self.scales.shape[3])
        return ublocks, (cp_, sp_), (cm_, sm_)

    @staticmethod
    def _blend(old, payload, mask):
        """RMW merge of a block payload (bit fields for int8 code pools,
        lane select for bf16 scale pools)."""
        if old.dtype == jnp.int8:
            return (old & ~mask) | payload
        return jnp.where(mask != 0, payload, old)

    def write(self, layer_idx: int, k: jax.Array, v: jax.Array,
              slot_mapping: jax.Array,
              num_tokens=None, max_seqs=None,
              plan=None) -> "QuantPagedKVCache":
        """Fused quantize + pack + block-merge write (the reference's
        ``tq_encode`` primitive, ``paged_ops.cpp:846``).  k/v: [T, KH, D].
        ``plan``: optional precomputed :meth:`write_plan` (layer-
        invariant; the runtime computes it once per step)."""
        import os
        bs, nb = self.block_size, self.num_blocks
        ublocks, payloads, masks = self._merged_payloads(
            k, v, slot_mapping, num_tokens, max_seqs=max_seqs, plan=plan)
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
            old = pool[layer_idx][jnp.minimum(ub, nb - 1)]  # [B,KH,r,l]
            blended = self._blend(old, pay, msk)
            new_pools.append(pool.at[layer_idx, ub].set(
                blended, mode="drop"))
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

        def hmajor(pool):
            return jnp.moveaxis(pool[layer_idx], 0, 1)  # [KH, NB, r, l]

        kcod = tq.unpack_block(
            hmajor(self.k_codes),
            None if self.k_lo is None else hmajor(self.k_lo),
            self.k_bits).reshape(kh, nb * bs, d)[:, slot_idx]
        vcod = tq.unpack_block(
            hmajor(self.v_codes),
            None if self.v_lo is None else hmajor(self.v_lo),
            self.v_bits).reshape(kh, nb * bs, d)[:, slot_idx]
        # scale pools are [NB, KH, rows, bs] (lanes = tokens)
        ks = jnp.moveaxis(hmajor(self.k_scale), -1, -2).reshape(
            kh, nb * bs, g)[:, slot_idx].astype(jnp.float32)
        kz = jnp.moveaxis(hmajor(self.k_zero), -1, -2).reshape(
            kh, nb * bs, g)[:, slot_idx].astype(jnp.float32)
        vs = hmajor(self.v_scale)[:, :, 0, :].reshape(
            kh, nb * bs)[:, slot_idx].astype(jnp.float32)
        k = tq.k_decode(kcod, ks, kz, self.codec_k, dtype)
        v = tq.v_decode(vcod, vs, self.codec_v, dtype)
        # [KH, T, max_kv, D] -> [T, max_kv, KH, D]
        return (jnp.moveaxis(k, 0, 2), jnp.moveaxis(v, 0, 2))

    def bytes_per_block(self) -> int:
        nb = self.num_blocks
        return sum(int(p.size) * p.dtype.itemsize // nb
                   for p in self._pools())

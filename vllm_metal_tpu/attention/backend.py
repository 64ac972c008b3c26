# SPDX-License-Identifier: Apache-2.0
"""Attention backend: wires model layers to the paged KV pool.

Replaces the reference's runtime-protocol + wrapper-patching machinery
(``/root/reference/vllm_metal/attention/runtime/mha.py:16``,
``impls/sdpa_wrapper.py:45``) with a functional seam: ``make_attn_fn``
returns the ``attn_fn`` the model forward calls per layer; cache updates
thread through a closure cell and are retrieved after the forward.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .. import envs
from ..config import ModelConfig
from ..ops.paged_attention import paged_attention_ref
from .kv_cache import PagedKVCache
from .metadata import AttentionMetadata


class PagedAttentionBackend:
    """Selects kernel vs reference path and owns per-layer dispatch policy."""

    def __init__(self, model_cfg: ModelConfig,
                 use_pallas: Optional[bool] = None):
        self.cfg = model_cfg
        if use_pallas is None:
            if model_cfg.is_mla:
                # MLA kernel constraint: the latent rank fills 128-lane
                # registers (rope tail may be unaligned; Mosaic masks it)
                dim_ok = model_cfg.kv_lora_rank % 128 == 0
            else:
                # the pool lane-pads head_dim to a 128 multiple
                # (kv_cache.allocate) and the attend seam pads q, so any
                # head dim lowers; cap at 512 for VMEM tile budgets (the
                # reference templates {64..512},
                # pagedattention.metal:2310-2339)
                dim_ok = model_cfg.head_dim <= 512
            use_pallas = (jax.default_backend() == "tpu" and dim_ok
                          and not envs.FORCE_REFERENCE_ATTENTION)
            if jax.default_backend() == "tpu" and not dim_ok:
                import logging
                logging.getLogger(__name__).warning(
                    "head_dim=%d unsupported by the Pallas attention "
                    "kernel; falling back to the (slow) jnp reference "
                    "path", model_cfg.head_dim)
        self.use_pallas = use_pallas
        from ..models.common import yarn_attention_factor
        self.scale = model_cfg.extra.get(
            "attn_scale", model_cfg.head_dim ** -0.5) \
            * yarn_attention_factor(model_cfg.rope_scaling)

    def attend(self, layer_idx: int, q: jax.Array, k: jax.Array,
               v: jax.Array, cache: PagedKVCache,
               md: AttentionMetadata,
               sinks: Optional[jax.Array] = None,
               tq_plan=None) -> tuple[jax.Array, PagedKVCache]:
        """Write k/v into the pool, then attend q against the pool."""
        from .quant_kv_cache import QuantPagedKVCache
        if isinstance(cache, QuantPagedKVCache):
            # bound the touched-block payload count (B <= T//bs + S + 1);
            # tq_plan (runtime-hoisted, layer-invariant) skips the
            # per-layer unique/searchsorted
            cache = cache.write(
                layer_idx, k, v, md.slot_mapping,
                num_tokens=md.num_tokens,
                max_seqs=md.query_start_loc.shape[0] - 1,
                plan=tq_plan)
        else:
            cache = cache.write(layer_idx, k, v, md.slot_mapping,
                                num_tokens=md.num_tokens)
        if isinstance(layer_idx, int):
            window = self.cfg.layer_sliding_window(layer_idx)
        else:
            # traced layer index (scan path): per-layer window dispatch is
            # impossible, so the config must be uniform
            assert self.cfg.sliding_window_pattern is None
            window = self.cfg.sliding_window
        d = q.shape[-1]
        dp = cache.head_dim
        if not isinstance(cache, QuantPagedKVCache) and dp != d:
            # lane-padded pool (see kv_cache.allocate): pad q to the
            # pool's 128-multiple width; zero lanes are inert in QK/PV
            # dots and the padded output columns slice away below
            q = jnp.pad(q, ((0, 0), (0, 0), (0, dp - d)))
        if isinstance(cache, QuantPagedKVCache):
            # real-TPU Mosaic requires 128-lane DMA tiles: the TQ kernel
            # engages on chip when one block == one KV tile (block_size
            # 128, head_dim % 128) so every payload row is full-lane;
            # interpret mode (parity tests) runs any block size
            tq_kernel_ok = bool(envs.PALLAS_INTERPRET) or \
                jax.default_backend() != "tpu" or \
                (cache.block_size == 128 and self.cfg.head_dim % 128 == 0)
            if self.use_pallas and tq_kernel_ok:
                from ..ops.paged_attention_tq_kernel import tq_paged_attention
                out = tq_paged_attention(
                    q, cache, md, layer_idx, scale=self.scale,
                    sliding_window=window, sinks=sinks,
                    logit_softcap=self.cfg.attn_logit_softcap,
                    interpret=bool(envs.PALLAS_INTERPRET))
            else:
                from ..ops.paged_attention import paged_attention_quant_ref
                out = paged_attention_quant_ref(
                    q, cache, layer_idx, md,
                    scale=self.scale, sliding_window=window, sinks=sinks,
                    logit_softcap=self.cfg.attn_logit_softcap)
            return out, cache
        if self.use_pallas:
            from ..ops.paged_attention_kernel import paged_attention
            out = paged_attention(
                q, cache.kv, md, layer_idx,
                scale=self.scale, sliding_window=window, sinks=sinks,
                logit_softcap=self.cfg.attn_logit_softcap,
                interpret=bool(envs.PALLAS_INTERPRET))
        else:
            out = paged_attention_ref(
                q, cache.k[layer_idx], cache.v[layer_idx], md,
                scale=self.scale, sliding_window=window, sinks=sinks,
                logit_softcap=self.cfg.attn_logit_softcap)
        return (out[..., :d] if dp != d else out), cache

    def attend_read(self, window_layer_idx: int, ref_layer: int,
                    q: jax.Array, cache: PagedKVCache,
                    md: AttentionMetadata) -> jax.Array:
        """Attend q against an existing pool layer WITHOUT writing K/V —
        the YOCO shared-layer read (reference ``shared_kv`` path,
        ``/root/reference/vllm_metal/attention/impls/sdpa.py:221``).
        The sliding window comes from the *shared* layer's config."""
        window = self.cfg.layer_sliding_window(window_layer_idx)
        d = q.shape[-1]
        dp = cache.head_dim
        if dp != d:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, dp - d)))
        if self.use_pallas:
            from ..ops.paged_attention_kernel import paged_attention
            out = paged_attention(
                q, cache.kv, md, ref_layer,
                scale=self.scale, sliding_window=window,
                logit_softcap=self.cfg.attn_logit_softcap,
                interpret=bool(envs.PALLAS_INTERPRET))
        else:
            out = paged_attention_ref(
                q, cache.k[ref_layer], cache.v[ref_layer], md,
                scale=self.scale, sliding_window=window,
                logit_softcap=self.cfg.attn_logit_softcap)
        return out[..., :d] if dp != d else out

    def make_attn_fn(self, cache: PagedKVCache, md: AttentionMetadata,
                     sinks_per_layer: Optional[list] = None,
                     shared_md: Optional[AttentionMetadata] = None,
                     shared_rows: Optional[jax.Array] = None
                     ) -> tuple[Callable, Callable[[], PagedKVCache]]:
        """Returns (runtime for model.forward, getter for updated cache).

        ``shared_md``/``shared_rows`` enable YOCO REDUCED-QUERY fast
        prefill (reference ``attention/yoco.py:32``): the model slices
        the hidden stream to one row per sequence at the KV-shared
        boundary, and shared-layer attention runs on ``shared_md``
        (decode-shaped: query_lens == 1)."""
        rt = StepRuntime(self, cache, md, sinks_per_layer,
                         shared_md=shared_md, shared_rows=shared_rows)
        return rt, rt.final_cache


class StepRuntime:
    """Per-step attention runtime handed to the model forward.

    Callable as ``runtime(i, q, k, v)`` for MHA/GQA models; MLA models use
    :meth:`attend_mla`.  Functional cache state threads through a cell and
    is retrieved with :meth:`final_cache` after the forward.
    """

    def __init__(self, backend: PagedAttentionBackend, cache,
                 md: AttentionMetadata,
                 sinks_per_layer: Optional[list] = None,
                 shared_md: Optional[AttentionMetadata] = None,
                 shared_rows: Optional[jax.Array] = None):
        self.backend = backend
        self.md = md
        self.sinks_per_layer = sinks_per_layer
        self.shared_md = shared_md
        self.shared_rows = shared_rows
        self._cell = [cache]
        self._tq_plan = None
        from .quant_kv_cache import QuantPagedKVCache
        if isinstance(cache, QuantPagedKVCache):
            self._tq_plan = cache.write_plan(
                md.slot_mapping, md.num_tokens,
                max_seqs=md.query_start_loc.shape[0] - 1)

    def __call__(self, layer_idx, q, k, v):
        return self.attend(layer_idx, q, k, v)

    def attend(self, layer_idx, q, k, v):
        sinks = (self.sinks_per_layer[layer_idx]
                 if self.sinks_per_layer is not None else None)
        out, self._cell[0] = self.backend.attend(
            layer_idx, q, k, v, self._cell[0], self.md, sinks,
            tq_plan=self._tq_plan)
        return out

    def attend_carry(self, layer_idx, q, k, v, cache, sinks=None):
        """Explicit-carry variant (lax.scan bodies thread the cache
        themselves); shares the hoisted per-step write plan."""
        return self.backend.attend(layer_idx, q, k, v, cache, self.md,
                                   sinks, tq_plan=self._tq_plan)

    def attend_shared(self, layer_idx: int, ref_layer: int, q):
        """YOCO shared layer: read-only attention on the ref layer's KV
        (on the reduced-query metadata when fast prefill is active)."""
        return self.backend.attend_read(
            layer_idx, ref_layer, q, self._cell[0],
            self.shared_md if self.shared_md is not None else self.md)

    def attend_mla(self, layer_idx, q_nope, q_rope, c_kv, k_rope, w_uk,
                   scale):
        """MLA: write latent rows, attend in compressed space.

        Returns latent-space output [T, H, R] (the model applies W_uv)."""
        cache = self._cell[0].write(layer_idx, c_kv, k_rope,
                                    self.md.slot_mapping)
        self._cell[0] = cache
        from ..ops.mla_attention_kernel import mla_kernel_supported
        if self.backend.use_pallas \
                and mla_kernel_supported(q_nope.shape[1]):
            from ..ops.mla_attention_kernel import mla_paged_attention
            return mla_paged_attention(
                q_nope, q_rope, cache.latents, w_uk, self.md, layer_idx,
                kv_lora_rank=cache.kv_lora_rank, scale=scale,
                interpret=bool(envs.PALLAS_INTERPRET))
        from ..ops.mla_attention import mla_paged_attention_ref
        return mla_paged_attention_ref(
            q_nope, q_rope, cache.latents[layer_idx][..., :cache.width],
            w_uk, self.md, kv_lora_rank=cache.kv_lora_rank, scale=scale)

    def attend_hybrid(self, attn_pos: int, q, k, v):
        """Full-attention layer of a hybrid model (cache is HybridCache;
        attn_pos indexes the attention-layer KV pools)."""
        import dataclasses
        cache = self._cell[0]
        out, new_kv = self.backend.attend(
            attn_pos, q, k, v, cache.kv, self.md, None)
        self._cell[0] = dataclasses.replace(cache, kv=new_kv)
        return out

    def gdn_state(self, gdn_pos: int):
        c = self._cell[0]
        return c.conv[gdn_pos], c.rec[gdn_pos]

    def set_gdn_state(self, gdn_pos: int, conv, rec):
        import dataclasses
        c = self._cell[0]
        self._cell[0] = dataclasses.replace(
            c, conv=c.conv.at[gdn_pos].set(conv),
            rec=c.rec.at[gdn_pos].set(rec))

    def set_gdn_conv(self, gdn_pos: int, conv):
        import dataclasses
        c = self._cell[0]
        self._cell[0] = dataclasses.replace(
            c, conv=c.conv.at[gdn_pos].set(conv))

    def gdn_decode_update(self, gdn_pos: int, qx, kx, v, g, beta):
        """Batch-parallel delta-rule update via the Pallas decode kernel.

        Only valid when ``md.pure_decode`` (one token per request, so
        every token's state slot is distinct).  Operates on the FULL
        stacked recurrent state in place; pads route to the junk row."""
        import jax.numpy as jnp
        from ..ops.gdn_kernel import gdn_decode_step
        c = self._cell[0]
        md = self.md
        valid = md.slot_mapping >= 0
        junk = c.rec.shape[1] - 1
        tok_slots = jnp.where(
            valid, md.seq_state_slots[md.token_seq_ids], junk
        ).astype(jnp.int32)
        g = jnp.where(valid[:, None], g, 1.0)
        beta = jnp.where(valid[:, None], beta, 0.0)
        y, rec = gdn_decode_step(
            qx, kx, v, g, beta, c.rec, gdn_pos, tok_slots,
            interpret=bool(envs.PALLAS_INTERPRET))
        import dataclasses
        self._cell[0] = dataclasses.replace(c, rec=rec)
        return y

    def final_cache(self):
        return self._cell[0]

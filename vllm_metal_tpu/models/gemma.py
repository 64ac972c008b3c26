# SPDX-License-Identifier: Apache-2.0
"""Gemma-family transformer (Gemma 2/3-style: sliding-window + full
interleave, pre/post norms, logit softcap, scaled embeddings).

Shares the Llama forward skeleton; the per-layer sliding-window dispatch is
carried by ``ModelConfig.layer_sliding_window`` and honored by the attention
backends (the reference implements this as per-layer KV specs +
kernel ``sliding_window`` args — ``/root/reference/vllm_metal/v1/cache_policy.py:385``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.quant_matmul import linear
from ..utils import static_dataclass
from .common import activation, apply_rope, rms_norm, rope_frequencies
from .llama import LlamaModel, LlamaLayerWeights, LlamaWeights
from .registry import register_model


@static_dataclass()
class GemmaLayerWeights(LlamaLayerWeights):
    # Gemma2/3 sandwich norms
    post_attn_norm: Optional[jax.Array] = None
    pre_ffn_norm: Optional[jax.Array] = None
    post_ffn_norm: Optional[jax.Array] = None


@register_model("gemma", "gemma2", "gemma3", "gemma3_text")
class GemmaModel(LlamaModel):
    """Gemma: rms offset=1, scaled embeddings, sandwich norms, gelu MLP."""

    def __init__(self, cfg: ModelConfig, tp=None):
        super().__init__(cfg, tp)
        # Gemma RoPE: local (sliding) layers may use a different theta.
        local_theta = cfg.extra.get("rope_local_theta")
        self.local_inv_freq = (
            rope_frequencies(cfg.head_dim, local_theta)
            if local_theta else self.inv_freq)
        self.act = activation(cfg.extra.get("hidden_act", "gelu_tanh"))
        # YOCO (Gemma4): trailing layers reuse a caching layer's KV
        self.num_shared = int(cfg.extra.get("num_kv_shared_layers", 0) or 0)
        # Gemma4 26B/31B: per-layer variable head_dim; q/k/v zero-pad to
        # the cache head_dim and q pre-scales by the TRUE dim (reference
        # ``pad_qkv_to_cache_head_dim``, sdpa.py:375; adapter :570).
        self.layer_head_dims = cfg.extra.get("layer_head_dims")
        if self.layer_head_dims is not None:
            assert cfg.extra.get("attn_scale") == 1.0, \
                "variable head_dim needs attn_scale=1.0 (q pre-scales)"
            self._var_inv_freq = {
                dl: rope_frequencies(dl, cfg.rope_theta, cfg.rope_scaling)
                for dl in set(self.layer_head_dims)}

    def init_random(self, key, dtype=jnp.bfloat16):
        base = super().init_random(key, dtype)
        h = self.cfg.hidden_size
        nc = self.cfg.num_cached_layers
        if self.layer_head_dims is not None:
            from ..ops.quant_matmul import QuantLinear
            cfg = self.cfg
            keys = iter(jax.random.split(jax.random.fold_in(key, 11),
                                         6 * cfg.num_layers))

            def dense(shape):
                return QuantLinear.dense(
                    (jax.random.normal(next(keys), shape, jnp.float32)
                     * 0.02).astype(dtype))

            import dataclasses
            relayers = []
            for i, lw in enumerate(base.layers):
                dl = self.layer_head_dims[i]
                relayers.append(dataclasses.replace(
                    lw,
                    wq=dense((cfg.num_heads * dl, h)),
                    wk=dense((cfg.num_kv_heads * dl, h)),
                    wv=dense((cfg.num_kv_heads * dl, h)),
                    wo=dense((h, cfg.num_heads * dl)),
                    q_norm=jnp.ones((dl,), dtype)
                    if lw.q_norm is not None else None,
                    k_norm=jnp.ones((dl,), dtype)
                    if lw.k_norm is not None else None,
                ))
            base = dataclasses.replace(base, layers=relayers)
        layers = [GemmaLayerWeights(
            **{f: getattr(lw, f) for f in (
                "attn_norm", "wq", "wo", "mlp_norm",
                "gate", "up", "down", "q_norm")},
            # YOCO shared layers have no K/V projections
            wk=lw.wk if i < nc else None,
            wv=lw.wv if i < nc else None,
            k_norm=lw.k_norm if i < nc else None,
            post_attn_norm=jnp.zeros((h,), dtype),
            pre_ffn_norm=None,
            post_ffn_norm=jnp.zeros((h,), dtype),
        ) for i, lw in enumerate(base.layers)]
        return LlamaWeights(embedding=base.embedding, layers=layers,
                            final_norm=base.final_norm, lm_head=base.lm_head)

    def layer_qkv(self, lw, x, positions, lora=None):
        cfg = self.cfg
        t = x.shape[0]
        h = rms_norm(x, lw.attn_norm, cfg.rms_norm_eps, offset=1.0)
        q = linear(h, lw.wq)
        k = linear(h, lw.wk)
        v = linear(h, lw.wv)
        if lora is not None:
            q = q + lora("wq", h)
            k = k + lora("wk", h)
            v = v + lora("wv", h)
        # per-layer head_dim derived from the weight shape (static)
        dl = q.shape[-1] // cfg.num_heads
        q = q.reshape(t, -1, dl)
        k = k.reshape(t, -1, dl)
        v = v.reshape(t, -1, dl)
        if lw.q_norm is not None:
            q = rms_norm(q, lw.q_norm, cfg.rms_norm_eps, offset=1.0)
            k = rms_norm(k, lw.k_norm, cfg.rms_norm_eps, offset=1.0)
        inv = self._var_inv_freq[dl] if self.layer_head_dims is not None \
            else self.inv_freq
        q = apply_rope(q, positions, inv)
        k = apply_rope(k, positions, inv)
        if dl != cfg.head_dim:
            # zero-pad into the cache head_dim: scores/outputs are exact
            # because padded q AND k columns are both zero
            pad = ((0, 0), (0, 0), (0, cfg.head_dim - dl))
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        if self.layer_head_dims is not None:
            q = q * jnp.asarray(dl ** -0.5, q.dtype)
        return q, k, v

    def layer_post_attn(self, lw, x, attn_out, lora=None):
        t = x.shape[0]
        cfg = self.cfg
        if self.layer_head_dims is not None:
            dl = lw.wo.in_features // cfg.num_heads
            if attn_out.shape[-1] != dl:   # drop cache-dim zero padding
                attn_out = attn_out[..., :dl]
        ao = attn_out.reshape(t, -1)
        o = linear(ao, lw.wo)
        if lora is not None:
            o = o + lora("wo", ao)
        a = self.tp.reduce(o)
        if getattr(lw, "post_attn_norm", None) is not None:
            a = rms_norm(a, lw.post_attn_norm, cfg.rms_norm_eps, offset=1.0)
        x = x + a
        h = rms_norm(x, lw.mlp_norm, cfg.rms_norm_eps, offset=1.0)
        y = self.act(linear(h, lw.gate).astype(jnp.float32)).astype(h.dtype) \
            * linear(h, lw.up)
        m = self.tp.reduce(linear(y, lw.down))
        if getattr(lw, "post_ffn_norm", None) is not None:
            m = rms_norm(m, lw.post_ffn_norm, cfg.rms_norm_eps, offset=1.0)
        return x + m

    def layer_q_only(self, lw, x, positions):
        """Query path for a YOCO shared layer (no K/V projection)."""
        cfg = self.cfg
        t = x.shape[0]
        h = rms_norm(x, lw.attn_norm, cfg.rms_norm_eps, offset=1.0)
        q = linear(h, lw.wq).reshape(t, -1, cfg.head_dim)
        if lw.q_norm is not None:
            q = rms_norm(q, lw.q_norm, cfg.rms_norm_eps, offset=1.0)
        return apply_rope(q, positions, self.inv_freq)

    def forward_hidden(self, weights, token_ids, positions, attn_fn,
                       lora_fn=None, mm_embeds=None, mm_rows=None):
        cfg = self.cfg
        nc = cfg.num_cached_layers
        x = self.embed(weights, token_ids)
        if mm_embeds is not None:
            x = self.splice_mm(x, mm_embeds, mm_rows)
        shared_rows = getattr(attn_fn, "shared_rows", None)
        for i, lw in enumerate(weights.layers):
            lora = lora_fn(i) if lora_fn is not None else None
            if i >= nc:     # YOCO shared layer: read the ref layer's KV
                if i == nc and shared_rows is not None:
                    # reduced-query fast prefill (reference
                    # attention/yoco.py:32): shared layers write no KV,
                    # so only the rows that feed logits need computing —
                    # slice the stream to one row per sequence
                    x = x[shared_rows]
                    positions = positions[shared_rows]
                q = self.layer_q_only(lw, x, positions)
                attn_out = attn_fn.attend_shared(
                    i, cfg.yoco_ref_layer(i), q)
            else:
                q, k, v = self.layer_qkv(lw, x, positions, lora=lora)
                attn_out = attn_fn(i, q, k, v)
            x = self.layer_post_attn(lw, x, attn_out, lora=lora)
        return rms_norm(x, weights.final_norm, self.cfg.rms_norm_eps,
                        offset=1.0)

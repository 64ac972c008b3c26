# SPDX-License-Identifier: Apache-2.0
"""DeepSeek-style MLA transformer (multi-head latent attention).

Covers the reference's MLA runtime capability
(``/root/reference/vllm_metal/attention/runtime/mla.py:12``,
``impls/mla.py:21`` — DeepSeek/GLM/MiniCPM3 family) with a TPU-first
design: attention runs in the compressed latent space (absorbed W_uk/W_uv),
the paged cache stores ``kv_lora_rank + rope_dim`` per token, and the dense
MLP follows the Llama layer shape.  (MoE FFN variants plug into the same
attention; dense-FFN checkpoints like MiniCPM3 run as-is.)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.quant_matmul import QuantLinear, linear
from ..utils import static_dataclass
from .common import activation, apply_rope, embed_lookup, rms_norm, \
    rope_frequencies
from .moe import moe_ffn
from .registry import register_model


@static_dataclass()
class MLALayerWeights:
    attn_norm: jax.Array
    # query path: either direct q (q_lora_rank == 0) or low-rank a/b
    wq: Optional[QuantLinear]              # [H*(dn+dr), hidden]
    wq_a: Optional[QuantLinear]            # [q_lora, hidden]
    q_a_norm: Optional[jax.Array]
    wq_b: Optional[QuantLinear]            # [H*(dn+dr), q_lora]
    # kv path
    wkv_a: QuantLinear                     # [R + dr, hidden]
    kv_a_norm: jax.Array                   # [R]
    w_uk: jax.Array                        # [H, dn, R]   (from kv_b split)
    w_uv: jax.Array                        # [H, R, dv]
    wo: QuantLinear                        # [hidden, H*dv]
    mlp_norm: jax.Array
    # dense FFN (first_k_dense / MiniCPM3) — None on MoE layers
    gate: Optional[QuantLinear]
    up: Optional[QuantLinear]
    down: Optional[QuantLinear]
    # DeepSeek-V2/V3 MoE FFN (moe.MoEWeights) — None on dense layers
    moe: Optional[Any] = None


@static_dataclass()
class MLAWeights:
    embedding: QuantLinear
    layers: list[MLALayerWeights]
    final_norm: jax.Array
    lm_head: Optional[QuantLinear]


@register_model("deepseek2", "deepseek3", "minicpm3", "mla")
class MLAModel:
    def __init__(self, cfg: ModelConfig, tp: Any = None):
        assert cfg.is_mla and cfg.kv_lora_rank > 0
        self.cfg = cfg
        from ..parallel.shardings import TPContext
        self.tp = tp or TPContext()
        self.inv_freq = rope_frequencies(
            cfg.qk_rope_head_dim, cfg.rope_theta, cfg.rope_scaling)
        self.act = activation(cfg.hidden_act)
        # yarn checkpoints fold an mscale^2 factor into the attn scale
        # (config_from_hf precomputes it into extra["attn_scale"])
        self.scale = cfg.extra.get(
            "attn_scale",
            (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim) ** -0.5)

    # ------------------------------------------------------------------
    def init_random(self, key: jax.Array, dtype=jnp.bfloat16) -> MLAWeights:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 20 * cfg.num_layers + 8))

        def dense(shape, scale=0.02):
            return QuantLinear.dense(
                (jax.random.normal(next(keys), shape, jnp.float32)
                 * scale).astype(dtype))

        def arr(shape, scale=0.02):
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * scale).astype(dtype)

        h = cfg.hidden_size
        nh, dn, dr, dv, r = (cfg.num_heads, cfg.qk_nope_head_dim,
                             cfg.qk_rope_head_dim, cfg.v_head_dim,
                             cfg.kv_lora_rank)
        layers = []
        for _ in range(cfg.num_layers):
            use_qlora = cfg.q_lora_rank > 0
            layers.append(MLALayerWeights(
                attn_norm=jnp.ones((h,), dtype),
                wq=None if use_qlora else dense((nh * (dn + dr), h)),
                wq_a=dense((cfg.q_lora_rank, h)) if use_qlora else None,
                q_a_norm=jnp.ones((cfg.q_lora_rank,), dtype)
                if use_qlora else None,
                wq_b=dense((nh * (dn + dr), cfg.q_lora_rank))
                if use_qlora else None,
                wkv_a=dense((r + dr, h)),
                kv_a_norm=jnp.ones((r,), dtype),
                w_uk=arr((nh, dn, r)),
                w_uv=arr((nh, r, dv)),
                wo=dense((h, nh * dv)),
                mlp_norm=jnp.ones((h,), dtype),
                gate=dense((cfg.intermediate_size, h)),
                up=dense((cfg.intermediate_size, h)),
                down=dense((h, cfg.intermediate_size)),
            ))
        return MLAWeights(
            embedding=dense((cfg.vocab_size, h)),
            layers=layers,
            final_norm=jnp.ones((h,), dtype),
            lm_head=dense((cfg.vocab_size, h)),
        )

    # ------------------------------------------------------------------
    def embed(self, weights: MLAWeights, ids: jax.Array) -> jax.Array:
        return self.tp.embed(weights.embedding, ids, embed_lookup,
                             self.cfg.vocab_size)

    def layer_query(self, lw: MLALayerWeights, h: jax.Array,
                    positions: jax.Array):
        cfg = self.cfg
        t = h.shape[0]
        if lw.wq is not None:
            q = linear(h, lw.wq)
        else:
            qa = rms_norm(linear(h, lw.wq_a), lw.q_a_norm, cfg.rms_norm_eps)
            q = linear(qa, lw.wq_b)
        q = q.reshape(t, -1, cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
        q_nope = q[..., :cfg.qk_nope_head_dim]
        q_rope = apply_rope(q[..., cfg.qk_nope_head_dim:], positions,
                            self.inv_freq)
        return q_nope, q_rope

    def layer_latent(self, lw: MLALayerWeights, h: jax.Array,
                     positions: jax.Array):
        cfg = self.cfg
        kv = linear(h, lw.wkv_a)                      # [T, R + dr]
        c_kv = rms_norm(kv[:, :cfg.kv_lora_rank], lw.kv_a_norm,
                        cfg.rms_norm_eps)
        k_rope = apply_rope(kv[:, None, cfg.kv_lora_rank:], positions,
                            self.inv_freq)[:, 0]
        return c_kv, k_rope

    def forward_hidden(self, weights: MLAWeights, token_ids: jax.Array,
                       positions: jax.Array, runtime: Any,
                       lora_fn=None, mm_embeds=None,
                       mm_rows=None) -> jax.Array:
        assert mm_embeds is None, "MLA models have no multimodal path"
        cfg = self.cfg
        x = self.embed(weights, token_ids)
        for i, lw in enumerate(weights.layers):
            h = rms_norm(x, lw.attn_norm, cfg.rms_norm_eps)
            q_nope, q_rope = self.layer_query(lw, h, positions)
            c_kv, k_rope = self.layer_latent(lw, h, positions)
            out_lat = runtime.attend_mla(
                i, q_nope, q_rope, c_kv, k_rope, lw.w_uk, self.scale)
            # absorbed value projection: [T, H, R] x [H, R, dv] -> [T, H, dv]
            attn = jnp.einsum("thr,hrd->thd",
                              out_lat.astype(jnp.float32),
                              lw.w_uv.astype(jnp.float32)
                              ).astype(x.dtype)
            t = x.shape[0]
            x = x + self.tp.reduce(linear(attn.reshape(t, -1), lw.wo))
            hm = rms_norm(x, lw.mlp_norm, cfg.rms_norm_eps)
            if lw.moe is not None:
                y = moe_ffn(hm, lw.moe, self.act, tp=self.tp)
            else:
                y = self.act(linear(hm, lw.gate).astype(jnp.float32)
                             ).astype(hm.dtype) * linear(hm, lw.up)
                y = linear(y, lw.down)
            x = x + self.tp.reduce(y)
        return rms_norm(x, weights.final_norm, cfg.rms_norm_eps)

    def logits(self, weights: MLAWeights, hidden: jax.Array) -> jax.Array:
        head = weights.lm_head if weights.lm_head is not None \
            else weights.embedding
        return self.tp.gather_logits(
            linear(hidden, head, out_dtype=jnp.float32))

    def forward(self, weights, token_ids, positions, runtime):
        return self.logits(
            weights,
            self.forward_hidden(weights, token_ids, positions, runtime))

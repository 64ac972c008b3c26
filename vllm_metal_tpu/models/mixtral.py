# SPDX-License-Identifier: Apache-2.0
"""Mixtral-style MoE transformer: Llama attention + top-k expert FFN."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.quant_matmul import linear
from ..utils import static_dataclass
from .common import rms_norm
from .llama import LlamaLayerWeights, LlamaModel, LlamaWeights
from .moe import MoEWeights, init_random_moe, moe_ffn
from .registry import register_model


@static_dataclass()
class MixtralLayerWeights(LlamaLayerWeights):
    moe: Optional[MoEWeights] = None


@register_model("mixtral", "qwen2moe", "qwen3moe")
class MixtralModel(LlamaModel):
    def init_random(self, key: jax.Array, dtype=jnp.float32) -> LlamaWeights:
        cfg = self.cfg
        n_exp = cfg.extra.get("num_experts", 4)
        top_k = cfg.extra.get("num_experts_per_tok", 2)
        base = super().init_random(key, dtype)
        keys = jax.random.split(jax.random.fold_in(key, 7), cfg.num_layers)
        layers = []
        for i, lw in enumerate(base.layers):
            layers.append(MixtralLayerWeights(
                **{f: getattr(lw, f) for f in (
                    "attn_norm", "wq", "wk", "wv", "wo", "mlp_norm",
                    "gate", "up", "down", "q_norm", "k_norm")},
                moe=init_random_moe(keys[i], cfg.hidden_size,
                                    cfg.intermediate_size, n_exp, top_k,
                                    dtype=dtype)))
        return LlamaWeights(embedding=base.embedding, layers=layers,
                            final_norm=base.final_norm,
                            lm_head=base.lm_head)

    @staticmethod
    def stack_expert_weights(weights: LlamaWeights) -> LlamaWeights:
        """Convert every layer's MoE to the expert-parallel stacked form
        (expert dim shards over the mesh; see ``moe.MoEWeightsEP``)."""
        import dataclasses
        from .moe import stack_experts
        layers = [dataclasses.replace(lw, moe=stack_experts(lw.moe))
                  if getattr(lw, "moe", None) is not None else lw
                  for lw in weights.layers]
        return dataclasses.replace(weights, layers=layers)

    def layer_post_attn(self, lw, x, attn_out, lora=None):
        t = x.shape[0]
        ao = attn_out.reshape(t, -1)
        o = linear(ao, lw.wo)
        if lora is not None:
            o = o + lora("wo", ao)
        x = x + self.tp.reduce(o)
        h = rms_norm(x, lw.mlp_norm, self.cfg.rms_norm_eps)
        if getattr(lw, "moe", None) is not None:
            y = moe_ffn(h, lw.moe, self.act, tp=self.tp)
        else:
            y = self.act(linear(h, lw.gate).astype(jnp.float32)).astype(
                h.dtype) * linear(h, lw.up)
            y = linear(y, lw.down)
        return x + self.tp.reduce(y)

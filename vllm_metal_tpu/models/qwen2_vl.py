# SPDX-License-Identifier: Apache-2.0
"""Qwen2-VL / Qwen2.5-VL composite model: vision tower + M-RoPE LLM.

The language side is the Llama/Qwen2 transformer with 3-axis M-RoPE and
vision-embedding splice (both in :mod:`.llama` / :mod:`.common`); the
vision side is :mod:`..multimodal.vision`.  The reference builds the
equivalent from external mlx-vlm parts
(``/root/reference/vllm_metal/multimodal/qwen3_vl/adapter.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..multimodal.vision import (VisionConfig, VisionW, patch_positions,
                                 vision_forward)
from .llama import LlamaModel
from .registry import register_model


@register_model("qwen2_vl", "qwen2_5_vl")
class Qwen2VLModel(LlamaModel):
    """LlamaModel subclass owning the vision tower.

    Text weights flow through every LlamaModel path unchanged (jit,
    scan, TP); vision encoding happens outside the LLM step and its
    embeddings are spliced via ``forward_hidden(mm_embeds=..., mm_rows=...)``.
    """

    def __init__(self, cfg: ModelConfig, tp=None):
        super().__init__(cfg, tp)
        assert self.mrope_sections is not None, \
            "qwen2_vl requires cfg.extra['mrope_section']"
        self.vision_cfg: Optional[VisionConfig] = cfg.extra.get("vision_cfg")
        self.vision_weights: Optional[VisionW] = None
        self.image_token_id: int = cfg.extra.get("image_token_id", -1)

    def set_vision(self, cfg: VisionConfig, weights: VisionW) -> None:
        self.vision_cfg = cfg
        self.vision_weights = weights

    def encode_image(self, pixel_patches: np.ndarray,
                     grid_thw: tuple[int, int, int]) -> jax.Array:
        """One image's patches -> [num_llm_tokens, hidden] embeddings."""
        vc = self.vision_cfg
        assert vc is not None and self.vision_weights is not None, \
            "vision tower not loaded (set_vision)"
        pos = patch_positions(grid_thw, vc.spatial_merge_size)
        return vision_forward(vc, self.vision_weights,
                              jnp.asarray(pixel_patches), jnp.asarray(pos))


def config_from_hf_vl(path: str) -> ModelConfig:
    """Qwen2-VL HF config.json -> ModelConfig (+ vision extras)."""
    import json
    import os
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    text = {**hf, **hf.get("text_config", {})}
    n_heads = int(text["num_attention_heads"])
    hidden = int(text["hidden_size"])
    cfg = ModelConfig(
        model=path,
        architecture="qwen2_vl",
        vocab_size=int(text["vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(text["intermediate_size"]),
        num_layers=int(text["num_hidden_layers"]),
        num_heads=n_heads,
        num_kv_heads=int(text.get("num_key_value_heads", n_heads)),
        head_dim=int(text.get("head_dim", hidden // n_heads)),
        rms_norm_eps=float(text.get("rms_norm_eps", 1e-6)),
        rope_theta=float(text.get("rope_theta", 1e6)),
        max_model_len=int(text.get("max_position_embeddings", 32768)),
        tie_word_embeddings=bool(text.get("tie_word_embeddings", False)),
    )
    rs = text.get("rope_scaling") or {}
    cfg.extra["mrope_section"] = rs.get("mrope_section", [16, 24, 24])
    cfg.extra["image_token_id"] = int(text.get("image_token_id", 151655))
    if "vision_config" in hf:
        cfg.extra["vision_cfg"] = VisionConfig.from_hf(
            hf["vision_config"], hidden_size=hidden)
    return cfg


def load_hf_vl_model(path: str, dtype=jnp.bfloat16):
    """HF Qwen2-VL checkpoint dir -> (model, weights, cfg)."""
    from ..multimodal.vision import load_vision
    from .hf_loader import _ShardedReader
    from .llama import LlamaLayerWeights, LlamaWeights
    from ..ops.quant_matmul import QuantLinear

    cfg = config_from_hf_vl(path)
    reader = _ShardedReader(path)
    # text weights may be rooted at model. or language_model.model.
    root = "model." if "model.embed_tokens.weight" in reader \
        else "language_model.model."
    head_key = "lm_head.weight" if "lm_head.weight" in reader \
        else "language_model.lm_head.weight"

    def arr(key):
        a = reader.get(key)
        if a.dtype == np.uint16:
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def lin(key):
        return QuantLinear.dense(arr(key))

    def opt(key, fn):
        return fn(key) if key in reader else None

    layers = []
    for i in range(cfg.num_layers):
        p = f"{root}layers.{i}."
        layers.append(LlamaLayerWeights(
            attn_norm=arr(p + "input_layernorm.weight"),
            wq=lin(p + "self_attn.q_proj.weight"),
            wk=lin(p + "self_attn.k_proj.weight"),
            wv=lin(p + "self_attn.v_proj.weight"),
            wo=lin(p + "self_attn.o_proj.weight"),
            mlp_norm=arr(p + "post_attention_layernorm.weight"),
            gate=lin(p + "mlp.gate_proj.weight"),
            up=lin(p + "mlp.up_proj.weight"),
            down=lin(p + "mlp.down_proj.weight"),
            q_norm=opt(p + "self_attn.q_norm.weight", arr),
            k_norm=opt(p + "self_attn.k_norm.weight", arr),
            bq=opt(p + "self_attn.q_proj.bias", arr),
            bk=opt(p + "self_attn.k_proj.bias", arr),
            bv=opt(p + "self_attn.v_proj.bias", arr),
        ))
    weights = LlamaWeights(
        embedding=lin(root + "embed_tokens.weight"),
        layers=layers,
        final_norm=arr(root + "norm.weight"),
        lm_head=opt(head_key, lin),
    )
    model = Qwen2VLModel(cfg)
    vc = cfg.extra.get("vision_cfg")
    if vc is not None:
        prefix = "visual." if "visual.patch_embed.proj.weight" in reader \
            else "model.visual."
        model.set_vision(vc, load_vision(reader, vc, dtype=dtype,
                                         prefix=prefix))
    return model, weights, cfg

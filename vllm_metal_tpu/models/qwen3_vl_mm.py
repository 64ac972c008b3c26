# SPDX-License-Identifier: Apache-2.0
"""Qwen3-VL composite model: Qwen3 text stack + DeepStack vision tower.

The language side is the Llama/Qwen3 transformer (qk-norm, interleaved
M-RoPE); the vision side is :mod:`..multimodal.vision3`.  DeepStack
(arXiv:2406.04334): the tower taps K intermediate ViT layers and the
LM ADDS tap k's features to its hidden state after decoder layer k at
visual token rows (reference equivalent:
``/root/reference/vllm_metal/multimodal/qwen3_vl/adapter.py`` passing
``deepstack_visual_embeds``/``visual_pos_masks`` into the mlx-vlm LM;
transformers ``Qwen3VLTextModel._deepstack_process``).

Plumbing: ``encode_image`` returns ``[1 + K, n_tokens, hidden]`` — row
0 is the splice embedding, rows 1..K the per-layer DeepStack features.
The runner's mm-extras path forwards the stacked form untouched;
``forward_hidden`` splices row 0 at the placeholder rows and injects
row k after layer k-1 (same rows, additive).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..multimodal.vision3 import Vision3Config, Vision3W, encode_image3
from .common import rms_norm
from .llama import LlamaModel
from .registry import register_model


@register_model("qwen3_vl")
class Qwen3VLModel(LlamaModel):
    def __init__(self, cfg: ModelConfig, tp=None):
        super().__init__(cfg, tp)
        assert self.mrope_sections is not None, \
            "qwen3_vl requires cfg.extra['mrope_section']"
        self.vision_cfg: Optional[Vision3Config] = \
            cfg.extra.get("vision_cfg")
        self.vision_weights: Optional[Vision3W] = None
        self.image_token_id: int = cfg.extra.get("image_token_id", -1)
        self.num_deepstack: int = (
            len(self.vision_cfg.deepstack_indexes)
            if self.vision_cfg is not None else
            int(cfg.extra.get("num_deepstack", 0)))

    # DeepStack needs the per-layer python loop, so the loader config
    # sets scan_layers=False (the injection seam lives in the loop)

    def set_vision(self, cfg: Vision3Config, weights: Vision3W) -> None:
        self.vision_cfg = cfg
        self.vision_weights = weights
        self.num_deepstack = len(cfg.deepstack_indexes)

    def encode_image(self, pixel_patches: np.ndarray,
                     grid_thw: tuple[int, int, int]) -> jax.Array:
        """One image -> [1 + K, num_llm_tokens, hidden] (row 0 = splice
        embeds, rows 1..K = DeepStack features)."""
        vc = self.vision_cfg
        assert vc is not None and self.vision_weights is not None, \
            "vision tower not loaded (set_vision)"
        return encode_image3(vc, self.vision_weights, pixel_patches,
                             grid_thw)

    def forward_hidden(self, weights, token_ids, positions, attn_fn,
                       lora_fn=None, mm_embeds=None, mm_rows=None):
        """Deepstack-aware layer loop.

        ``mm_embeds`` is [M, H] (text-only / plain splice) or
        [1 + K, M, H] (stacked row-0 splice + DeepStack rows).
        """
        ds = None
        if mm_embeds is not None and mm_embeds.ndim == 3:
            ds = mm_embeds[1:]                       # [K, M, H]
            mm_embeds = mm_embeds[0]
        x = self.embed(weights, token_ids)
        if mm_embeds is not None:
            x = self.splice_mm(x, mm_embeds, mm_rows)
        for i, lw in enumerate(weights.layers):
            lora = lora_fn(i) if lora_fn is not None else None
            q, k, v = self.layer_qkv(lw, x, positions, lora=lora)
            attn_out = attn_fn(i, q, k, v)
            x = self.layer_post_attn(lw, x, attn_out, lora=lora)
            if ds is not None and i < ds.shape[0]:
                # additive DeepStack injection at the visual rows (pad
                # rows scatter out of bounds and drop)
                rows = jnp.where(mm_rows >= 0, mm_rows, x.shape[0])
                x = x.at[rows].add(ds[i].astype(x.dtype), mode="drop")
        return rms_norm(x, weights.final_norm, self.cfg.rms_norm_eps)


def config_from_hf_qwen3vl(path: str) -> ModelConfig:
    """Qwen3-VL HF config.json -> ModelConfig (+ vision extras)."""
    import json
    import os
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    text = {**hf, **hf.get("text_config", {})}
    n_heads = int(text["num_attention_heads"])
    hidden = int(text["hidden_size"])
    cfg = ModelConfig(
        model=path,
        architecture="qwen3_vl",
        vocab_size=int(text["vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(text["intermediate_size"]),
        num_layers=int(text["num_hidden_layers"]),
        num_heads=n_heads,
        num_kv_heads=int(text.get("num_key_value_heads", n_heads)),
        head_dim=int(text.get("head_dim", hidden // n_heads)),
        rms_norm_eps=float(text.get("rms_norm_eps", 1e-6)),
        rope_theta=float(text.get("rope_theta", 5e6)),
        max_model_len=int(text.get("max_position_embeddings", 262144)),
        tie_word_embeddings=bool(text.get("tie_word_embeddings", False)),
        qk_norm=True,
        scan_layers=False,       # DeepStack injects per layer
    )
    rs = text.get("rope_scaling") or {}
    cfg.extra["mrope_section"] = rs.get("mrope_section", [24, 20, 20])
    cfg.extra["mrope_interleaved"] = bool(rs.get("mrope_interleaved",
                                                 True))
    cfg.extra["image_token_id"] = int(hf.get("image_token_id", 151655))
    if "vision_config" in hf:
        cfg.extra["vision_cfg"] = Vision3Config.from_hf(
            hf["vision_config"], hidden_size=hidden)
    return cfg


def load_hf_qwen3vl_model(path: str, dtype=jnp.bfloat16):
    """HF Qwen3-VL checkpoint dir -> (model, weights, cfg)."""
    from ..multimodal.vision3 import load_vision3
    from ..ops.quant_matmul import QuantLinear
    from .hf_loader import _ShardedReader
    from .llama import LlamaLayerWeights, LlamaWeights

    cfg = config_from_hf_qwen3vl(path)
    reader = _ShardedReader(path)
    root = "model.language_model."

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
            q_norm=arr(p + "self_attn.q_norm.weight"),
            k_norm=arr(p + "self_attn.k_norm.weight"),
        ))
    weights = LlamaWeights(
        embedding=lin(root + "embed_tokens.weight"),
        layers=layers,
        final_norm=arr(root + "norm.weight"),
        lm_head=opt("lm_head.weight", lin),
    )
    model = Qwen3VLModel(cfg)
    vc = cfg.extra.get("vision_cfg")
    if vc is not None:
        model.set_vision(vc, load_vision3(reader, vc, dtype=dtype))
    return model, weights, cfg

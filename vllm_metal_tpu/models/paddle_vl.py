# SPDX-License-Identifier: Apache-2.0
"""PaddleOCR-VL composite: NaViT vision tower + ERNIE-4.5 M-RoPE LLM.

The reference glues mlx-vlm's PaddleOCR-VL parts behind an adapter
(``/root/reference/vllm_metal/multimodal/paddleocr_vl/adapter.py``); here
both sides are owned in-repo: the language model is the ERNIE-4.5 dense
transformer (Llama layer shape + GLM-style interleaved-pair rope,
torch-parity-tested in ``tests/test_hf_parity.py``), the tower is
:mod:`..multimodal.paddle_vision`, and image embeddings splice through
the same engine mm path as the Qwen-VL family (3-axis M-RoPE positions
from ``multimodal.mrope`` — the adapter's ``get_rope_index`` contract).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..multimodal.paddle_vision import (PaddleVisionConfig, PaddleVisionW,
                                        paddle_vision_forward)
from .llama import LlamaModel
from .registry import register_model


@register_model("paddleocr_vl")
class PaddleOCRVLModel(LlamaModel):
    """LlamaModel subclass (ERNIE text config) owning the NaViT tower."""

    def __init__(self, cfg: ModelConfig, tp=None):
        super().__init__(cfg, tp)
        assert self.mrope_sections is not None, \
            "paddleocr_vl requires cfg.extra['mrope_section']"
        self.vision_cfg: Optional[PaddleVisionConfig] = \
            cfg.extra.get("vision_cfg")
        self.vision_weights: Optional[PaddleVisionW] = None
        self.image_token_id: int = cfg.extra.get("image_token_id", -1)

    def set_vision(self, cfg: PaddleVisionConfig,
                   weights: PaddleVisionW) -> None:
        self.vision_cfg = cfg
        self.vision_weights = weights

    def encode_image(self, pixel_patches: np.ndarray,
                     grid_thw: tuple[int, int, int]) -> jax.Array:
        """One image's patches -> [num_llm_tokens, hidden] embeddings."""
        from ..multimodal.vision import patch_positions
        vc = self.vision_cfg
        assert vc is not None and self.vision_weights is not None, \
            "vision tower not loaded (set_vision)"
        pos = patch_positions(grid_thw, vc.spatial_merge_size)
        return paddle_vision_forward(
            vc, self.vision_weights, jnp.asarray(pixel_patches),
            jnp.asarray(pos), (int(grid_thw[1]), int(grid_thw[2])))


def config_from_hf_paddle(path: str) -> ModelConfig:
    """PaddleOCR-VL HF config.json -> ModelConfig (+ vision extras)."""
    import json
    import os
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    text = {**hf, **hf.get("text_config", {})}
    n_heads = int(text["num_attention_heads"])
    hidden = int(text["hidden_size"])
    cfg = ModelConfig(
        model=path,
        architecture="paddleocr_vl",
        vocab_size=int(text["vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(text["intermediate_size"]),
        num_layers=int(text["num_hidden_layers"]),
        num_heads=n_heads,
        num_kv_heads=int(text.get("num_key_value_heads", n_heads)),
        head_dim=int(text.get("head_dim", hidden // n_heads)),
        rms_norm_eps=float(text.get("rms_norm_eps", 1e-5)),
        rope_theta=float(text.get("rope_theta", 500000.0)),
        max_model_len=int(text.get("max_position_embeddings", 131072)),
        tie_word_embeddings=bool(text.get("tie_word_embeddings", True)),
    )
    if text.get("use_bias"):
        raise NotImplementedError(
            "paddleocr_vl with use_bias=True not supported yet")
    # ERNIE rope: GLM-style interleaved pairs (full dim, f32)
    cfg.extra["rope_interleaved_pairs"] = True
    rs = text.get("rope_scaling") or {}
    # 3-axis sections over head_dim//2 frequencies (t, h, w)
    cfg.extra["mrope_section"] = rs.get(
        "mrope_section", [cfg.head_dim // 4,
                          cfg.head_dim // 8, cfg.head_dim // 8])
    cfg.extra["image_token_id"] = int(
        text.get("image_token_id", hf.get("image_token_id", 100295)))
    if "vision_config" in hf:
        cfg.extra["vision_cfg"] = PaddleVisionConfig.from_hf(
            hf["vision_config"], hidden_size=hidden)
    return cfg


def load_hf_paddle_vl_model(path: str, dtype=jnp.bfloat16):
    """HF PaddleOCR-VL checkpoint dir -> (model, weights, cfg)."""
    from ..multimodal.paddle_vision import load_paddle_vision
    from ..ops.quant_matmul import QuantLinear
    from .hf_loader import _ShardedReader
    from .llama import LlamaLayerWeights, LlamaWeights

    cfg = config_from_hf_paddle(path)
    reader = _ShardedReader(path)
    root = "model." if "model.embed_tokens.weight" in reader \
        else "language_model.model."
    head_key = None
    for hk in ("lm_head.weight", "language_model.lm_head.weight"):
        if hk in reader:
            head_key = hk
            break

    def arr(key):
        a = reader.get(key)
        if a.dtype == np.uint16:
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def lin(key):
        return QuantLinear.dense(arr(key))

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
        ))
    emb = arr(root + "embed_tokens.weight")
    weights = LlamaWeights(
        embedding=QuantLinear.dense(emb),
        layers=layers,
        final_norm=arr(root + "norm.weight"),
        lm_head=QuantLinear.dense(arr(head_key)) if head_key
        else QuantLinear.dense(emb),
    )
    model = PaddleOCRVLModel(cfg)
    if cfg.extra.get("vision_cfg") is not None:
        model.set_vision(
            cfg.extra["vision_cfg"],
            load_paddle_vision(reader, cfg.extra["vision_cfg"],
                               dtype=dtype))
    return model, weights, cfg

# SPDX-License-Identifier: Apache-2.0
"""HF safetensors checkpoint loading.

The reference loads safetensors through external ``mlx_lm``
(``/root/reference/vllm_metal/v1/model_lifecycle.py:167-235``); here the
mapping is owned in-repo: ``config.json`` -> ModelConfig, sharded
``*.safetensors`` -> the functional weight pytrees.  Supports the
Llama/Qwen2/Qwen3/Mistral/Gemma2/Gemma3 families in bf16/f16/f32.
"""

from __future__ import annotations

import json
import logging
import os
from glob import glob
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.quant_matmul import QuantLinear

logger = logging.getLogger(__name__)

_ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "mistral",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
    "Gemma2ForCausalLM": "gemma2",
    "Gemma3ForCausalLM": "gemma3",
    "Gemma3ForConditionalGeneration": "gemma3",
}


def config_from_hf(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    if "text_config" in hf:          # multimodal wrapper (gemma3)
        hf = {**hf, **hf["text_config"]}
    arch_list = hf.get("architectures", ["LlamaForCausalLM"])
    arch = _ARCH_MAP.get(arch_list[0])
    if arch is None:
        raise ValueError(f"unsupported HF architecture {arch_list[0]!r}")
    n_heads = int(hf["num_attention_heads"])
    hidden = int(hf["hidden_size"])
    head_dim = int(hf.get("head_dim", hidden // n_heads))
    cfg = ModelConfig(
        model=path,
        architecture=arch,
        vocab_size=int(hf["vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(hf["intermediate_size"]),
        num_layers=int(hf["num_hidden_layers"]),
        num_heads=n_heads,
        num_kv_heads=int(hf.get("num_key_value_heads", n_heads)),
        head_dim=head_dim,
        rms_norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        rope_theta=float(hf.get("rope_theta", 10000.0)),
        rope_scaling=hf.get("rope_scaling"),
        max_model_len=int(hf.get("max_position_embeddings", 4096)),
        tie_word_embeddings=bool(hf.get("tie_word_embeddings", False)),
        qk_norm=arch == "qwen3",
    )
    if arch.startswith("gemma"):
        cfg.scale_embeddings = True
        cfg.hidden_act = "gelu_tanh"
        sw = hf.get("sliding_window")
        if sw:
            cfg.sliding_window = int(sw)
            pattern = int(hf.get("sliding_window_pattern",
                                 2 if arch == "gemma2" else 6))
            cfg.sliding_window_pattern = [
                (i + 1) % pattern != 0 for i in range(pattern)]
        if hf.get("attn_logit_softcapping"):
            cfg.attn_logit_softcap = float(hf["attn_logit_softcapping"])
        if hf.get("final_logit_softcapping"):
            cfg.logit_softcap = float(hf["final_logit_softcapping"])
        if hf.get("query_pre_attn_scalar"):
            cfg.extra["attn_scale"] = float(
                hf["query_pre_attn_scalar"]) ** -0.5
    return cfg


class _ShardedReader:
    def __init__(self, path: str):
        from safetensors import safe_open
        self._open = safe_open
        self.files = sorted(glob(os.path.join(path, "*.safetensors")))
        if not self.files:
            raise FileNotFoundError(f"no safetensors in {path}")
        self.index: dict[str, str] = {}
        for fp in self.files:
            with safe_open(fp, framework="numpy") as f:
                for k in f.keys():
                    self.index[k] = fp
        self._handles: dict[str, Any] = {}

    def __contains__(self, key: str) -> bool:
        return key in self.index

    def get(self, key: str) -> np.ndarray:
        fp = self.index[key]
        if fp not in self._handles:
            self._handles[fp] = self._open(fp, framework="numpy")
        return self._handles[fp].get_tensor(key)


def load_hf_model(path: str, dtype=jnp.bfloat16, root: str = "model.",
                  cfg=None):
    """HF checkpoint dir -> (model, weights, cfg).

    ``root`` relocates the text backbone (e.g. ``thinker.model.`` for
    Qwen3-ASR composites); ``cfg`` overrides config.json parsing.
    """
    from .gemma import GemmaLayerWeights
    from .llama import LlamaLayerWeights, LlamaWeights
    from .registry import get_model_class

    if cfg is None:
        cfg = config_from_hf(path)
    reader = _ShardedReader(path)
    is_gemma = cfg.architecture.startswith("gemma")
    layer_cls = GemmaLayerWeights if is_gemma else LlamaLayerWeights

    def arr(key: str) -> jnp.ndarray:
        a = reader.get(key)
        if a.dtype == np.uint16:   # stored bf16 views come back as u16
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def lin(key: str) -> QuantLinear:
        return QuantLinear.dense(arr(key))

    def opt(key: str, fn):
        return fn(key) if key in reader else None

    layers = []
    for i in range(cfg.num_layers):
        p = f"{root}layers.{i}."
        kw = dict(
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
            sinks=opt(p + "self_attn.sinks", arr),
        )
        if is_gemma:
            # gemma HF layout: post_attention_layernorm is the POST-attn
            # sandwich norm; pre_feedforward/post_feedforward are the MLP pair
            kw.update(
                mlp_norm=arr(p + "pre_feedforward_layernorm.weight")
                if p + "pre_feedforward_layernorm.weight" in reader
                else kw["mlp_norm"],
                post_attn_norm=opt(
                    p + "post_attention_layernorm.weight", arr),
                pre_ffn_norm=None,
                post_ffn_norm=opt(
                    p + "post_feedforward_layernorm.weight", arr),
            )
        layers.append(layer_cls(**kw))

    weights = LlamaWeights(
        embedding=lin(root + "embed_tokens.weight"),
        layers=layers,
        final_norm=arr(root + "norm.weight"),
        lm_head=opt("lm_head.weight", lin)
        if root == "model." else opt(root[:-len("model.")] + "lm_head.weight", lin),
    )
    model = get_model_class(cfg.architecture)(cfg)
    return model, weights, cfg

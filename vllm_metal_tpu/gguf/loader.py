# SPDX-License-Identifier: Apache-2.0
"""GGUF -> model weights loader.

Maps GGUF tensor names / metadata onto :class:`~..config.ModelConfig` and the
functional weight pytrees, repacking quantized tensors exactly into the TPU
runtime formats (no dense round-trip for supported qtypes).  Counterpart of
the reference's ``GGUFModelLoader`` (``/root/reference/vllm_metal/gguf/loader.py:66``)
— but K-quants are first-class here instead of rejected.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.quant_matmul import QuantLinear
from .quants import dequantize, pack_affine_q4, pack_q8
from .reader import GGMLType, GGUFFile

logger = logging.getLogger(__name__)

_Q4_TYPES = (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K)
_Q8_TYPES = (GGMLType.Q8_0, GGMLType.Q6_K, GGMLType.Q5_K, GGMLType.Q5_0)
_FP_TYPES = (GGMLType.F32, GGMLType.F16, GGMLType.BF16)


def _meta(f: GGUFFile, key: str, default: Any = None) -> Any:
    arch = f.architecture
    return f.metadata.get(f"{arch}.{key}", default)


def config_from_gguf(f: GGUFFile) -> ModelConfig:
    arch = f.architecture
    n_heads = int(_meta(f, "attention.head_count", 32))
    hidden = int(_meta(f, "embedding_length", 4096))
    head_dim = int(_meta(f, "attention.key_length", hidden // n_heads))
    vocab = f.metadata.get("tokenizer.ggml.tokens")
    vocab_size = int(_meta(f, "vocab_size", len(vocab) if vocab else 32000))
    rope_scaling: Optional[dict] = None
    st = _meta(f, "rope.scaling.type")
    if st:
        rope_scaling = {
            "rope_type": st,
            "factor": float(_meta(f, "rope.scaling.factor", 1.0)),
            "low_freq_factor": float(
                _meta(f, "rope.scaling.low_freq_factor", 1.0)),
            "high_freq_factor": float(
                _meta(f, "rope.scaling.high_freq_factor", 4.0)),
            "original_max_position_embeddings": int(_meta(
                f, "rope.scaling.original_context_length", 8192)),
        }
    cfg = ModelConfig(
        model=f.path,
        architecture=arch,
        vocab_size=vocab_size,
        hidden_size=hidden,
        intermediate_size=int(_meta(f, "feed_forward_length", 11008)),
        num_layers=int(_meta(f, "block_count", 32)),
        num_heads=n_heads,
        num_kv_heads=int(_meta(f, "attention.head_count_kv", n_heads)),
        head_dim=head_dim,
        rms_norm_eps=float(_meta(f, "attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(_meta(f, "rope.freq_base", 10000.0)),
        rope_scaling=rope_scaling,
        max_model_len=int(_meta(f, "context_length", 4096)),
        tie_word_embeddings="output.weight" not in f,
        qk_norm=f"blk.0.attn_q_norm.weight" in f,
    )
    n_exp = _meta(f, "expert_count")
    if n_exp:
        cfg.extra["num_experts"] = int(n_exp)
        cfg.extra["num_experts_per_tok"] = int(
            _meta(f, "expert_used_count", 2))
        if _meta(f, "expert_feed_forward_length"):
            cfg.intermediate_size = int(_meta(f, "expert_feed_forward_length"))
    if arch.startswith("gemma"):
        cfg.scale_embeddings = True
        sw = _meta(f, "attention.sliding_window")
        if sw:
            cfg.sliding_window = int(sw)
            # gemma2: alternate [sliding, full]; gemma3: 5 sliding : 1 full
            pattern = int(_meta(f, "attention.sliding_window_pattern",
                                2 if arch == "gemma2" else 6))
            cfg.sliding_window_pattern = [
                (i + 1) % pattern != 0 for i in range(pattern)]
        sc = _meta(f, "attn_logit_softcapping")
        if sc:
            cfg.attn_logit_softcap = float(sc)
        fc = _meta(f, "final_logit_softcapping")
        if fc:
            cfg.logit_softcap = float(fc)
        cfg.hidden_act = "gelu_tanh"
    return cfg


def load_tensor(f: GGUFFile, name: str, as_linear: bool = True,
                dtype=jnp.bfloat16, layout: str = "kn"):
    """Load one tensor: QuantLinear for 2-D weights, dense array otherwise.

    ``layout="kn"`` (default) stores packed weights transposed for the
    matmul kernels; embedding tables pass ``layout="nk"`` to keep the
    row-gatherable orientation.
    """
    info = f.tensors[name]
    raw = f.tensor_data(name)
    t = info.ggml_type
    if not as_linear or len(info.shape) != 2:
        return jnp.asarray(
            dequantize(raw, t, info.shape).astype(np.float32), dtype=dtype)
    n, k = info.shape
    if t in _Q4_TYPES and k % 256 == 0:
        from .native import pack_affine_q4_native
        p = pack_affine_q4_native(raw, t, (n, k)) \
            or pack_affine_q4(raw, t, (n, k))
        return QuantLinear.from_packed(p, layout=layout)
    if t in _Q8_TYPES and k % 256 == 0:
        from .native import pack_q8_native
        p = pack_q8_native(raw, t, (n, k)) or pack_q8(raw, t, (n, k))
        return QuantLinear.from_packed(p, layout=layout)
    if t not in _FP_TYPES:
        logger.info("densifying %s (%s, k=%d)", name, t.name, k)
    return QuantLinear.dense(jnp.asarray(
        dequantize(raw, t, info.shape).astype(np.float32), dtype=dtype))


def load_moe_experts(f: GGUFFile, name: str, n_exp: int,
                     dtype=jnp.bfloat16) -> list:
    """Split a stacked [E, N, K] expert tensor into per-expert QuantLinears.

    Quantized blocks are row-independent, so the [E*N, K] repack slices
    cleanly per expert with no requantization."""
    info = f.tensors[name]
    e, n, k = info.shape
    assert e == n_exp, (name, info.shape)
    raw = f.tensor_data(name)
    t = info.ggml_type
    if t in _Q4_TYPES and k % 256 == 0:
        from .native import pack_affine_q4_native
        p = pack_affine_q4_native(raw, t, (e * n, k)) \
            or pack_affine_q4(raw, t, (e * n, k))
        full = QuantLinear.from_packed(p)
        return [QuantLinear(
            kind="q4", w=full.w[:, i * n:(i + 1) * n],
            scales=full.scales[:, i * n:(i + 1) * n],
            biases=full.biases[:, i * n:(i + 1) * n],
            group_size=full.group_size) for i in range(e)]
    if t in _Q8_TYPES and k % 256 == 0:
        from .native import pack_q8_native
        p = pack_q8_native(raw, t, (e * n, k)) or pack_q8(raw, t, (e * n, k))
        full = QuantLinear.from_packed(p)
        return [QuantLinear(
            kind="q8", w=full.w[:, i * n:(i + 1) * n],
            scales=full.scales[:, i * n:(i + 1) * n],
            biases=None if full.biases is None
            else full.biases[:, i * n:(i + 1) * n],
            group_size=full.group_size) for i in range(e)]
    dense = dequantize(raw, t, info.shape).astype(np.float32)
    return [QuantLinear.dense(jnp.asarray(dense[i], dtype=dtype))
            for i in range(e)]


def load_llama_weights(f: GGUFFile, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Build LlamaWeights (also serves qwen2/qwen3/mistral/gemma/moe)."""
    from ..models.gemma import GemmaLayerWeights
    from ..models.llama import LlamaLayerWeights, LlamaWeights
    from ..models.mixtral import MixtralLayerWeights
    from ..models.moe import MoEWeights

    is_gemma = cfg.architecture.startswith("gemma")
    is_moe = "blk.0.ffn_gate_exps.weight" in f
    layer_cls = GemmaLayerWeights if is_gemma else (
        MixtralLayerWeights if is_moe else LlamaLayerWeights)

    def lin(name):
        return load_tensor(f, name, as_linear=True, dtype=dtype)

    def vec(name):
        return load_tensor(f, name, as_linear=False, dtype=dtype)

    def opt_vec(name):
        return vec(name) if name in f else None

    layers = []
    for i in range(cfg.num_layers):
        p = f"blk.{i}."
        n_exp = cfg.extra.get("num_experts", 0)
        if is_moe:
            moe = MoEWeights(
                router=lin(p + "ffn_gate_inp.weight"),
                gate=load_moe_experts(f, p + "ffn_gate_exps.weight", n_exp,
                                      dtype),
                up=load_moe_experts(f, p + "ffn_up_exps.weight", n_exp,
                                    dtype),
                down=load_moe_experts(f, p + "ffn_down_exps.weight", n_exp,
                                      dtype),
                top_k=cfg.extra.get("num_experts_per_tok", 2))
        kw = dict(
            attn_norm=vec(p + "attn_norm.weight"),
            wq=lin(p + "attn_q.weight"),
            wk=lin(p + "attn_k.weight"),
            wv=lin(p + "attn_v.weight"),
            wo=lin(p + "attn_output.weight"),
            mlp_norm=vec(p + "ffn_norm.weight"),
            gate=None if is_moe else lin(p + "ffn_gate.weight"),
            up=None if is_moe else lin(p + "ffn_up.weight"),
            down=None if is_moe else lin(p + "ffn_down.weight"),
            q_norm=opt_vec(p + "attn_q_norm.weight"),
            k_norm=opt_vec(p + "attn_k_norm.weight"),
            bq=opt_vec(p + "attn_q.bias"),
            bk=opt_vec(p + "attn_k.bias"),
            bv=opt_vec(p + "attn_v.bias"),
            sinks=opt_vec(p + "attn_sinks.weight"),
        )
        if is_moe:
            kw["moe"] = moe
        if is_gemma:
            kw.update(
                post_attn_norm=opt_vec(p + "post_attention_norm.weight"),
                pre_ffn_norm=opt_vec(p + "ffn_norm.weight"),
                post_ffn_norm=opt_vec(p + "post_ffw_norm.weight"),
            )
        layers.append(layer_cls(**kw))

    embedding = load_tensor(f, "token_embd.weight", as_linear=True,
                            dtype=dtype, layout="nk")
    if "output.weight" in f:
        lm_head = lin("output.weight")
    elif embedding.kind != "dense":
        # tied quantized head: keep a transposed copy so the matmul
        # kernels engage (the "nk" table would fall back to linear_ref)
        lm_head = embedding.to_kn()
    else:
        lm_head = None
    return LlamaWeights(
        embedding=embedding,
        layers=layers,
        final_norm=vec("output_norm.weight"),
        lm_head=lm_head,
    )


def load_model(path: str, dtype=jnp.bfloat16):
    """Open a GGUF file -> (model, weights, config)."""
    from ..models.registry import get_model_class

    f = GGUFFile(path)
    cfg = config_from_gguf(f)
    if cfg.extra.get("num_experts"):
        from ..models.mixtral import MixtralModel
        model_cls = MixtralModel
    else:
        model_cls = get_model_class(cfg.architecture)
    model = model_cls(cfg)
    weights = load_llama_weights(f, cfg, dtype=dtype)
    return model, weights, cfg

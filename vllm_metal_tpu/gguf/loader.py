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
    if arch == "deepseek2":
        # llama.cpp serves DeepSeek V2 AND V3 under arch "deepseek2"
        # (convert_hf_to_gguf.py DeepseekV2Model); MLA geometry keys:
        cfg.is_mla = True
        cfg.kv_lora_rank = int(_meta(f, "attention.kv_lora_rank", 512))
        cfg.q_lora_rank = int(_meta(f, "attention.q_lora_rank", 0) or 0)
        dr = int(_meta(f, "rope.dimension_count", 64))
        cfg.qk_rope_head_dim = dr
        # attention.key_length = qk_nope + qk_rope (head_dim above)
        cfg.qk_nope_head_dim = cfg.head_dim - dr
        cfg.v_head_dim = int(_meta(f, "attention.value_length",
                                   cfg.head_dim - dr))
        cfg.num_kv_heads = cfg.num_heads
        x = cfg.extra
        if n_exp:
            x["moe_intermediate_size"] = cfg.intermediate_size
            if _meta(f, "leading_dense_block_count"):
                x["first_k_dense_replace"] = int(
                    _meta(f, "leading_dense_block_count"))
            if _meta(f, "expert_shared_count"):
                x["n_shared_experts"] = int(_meta(f, "expert_shared_count"))
            if _meta(f, "expert_weights_scale"):
                x["routed_scaling_factor"] = float(
                    _meta(f, "expert_weights_scale"))
            if _meta(f, "expert_weights_norm") is not None:
                x["norm_topk_prob"] = bool(_meta(f, "expert_weights_norm"))
            if int(_meta(f, "expert_gating_func", 1) or 1) == 2:
                # V3 flavor: sigmoid scores + top2sum group selection
                x["scoring_func"] = "sigmoid"
                x["group_sel"] = "top2sum"
            if _meta(f, "attention.n_group") or _meta(f, "expert_group_count"):
                x["n_group"] = int(_meta(f, "expert_group_count")
                                   or _meta(f, "attention.n_group"))
                x["topk_group"] = int(_meta(f, "expert_group_used_count", 1))
        ylm = _meta(f, "rope.scaling.yarn_log_multiplier")
        if ylm and rope_scaling and rope_scaling.get("factor", 1.0) > 1:
            import math
            mscale = float(ylm) * math.log(rope_scaling["factor"]) + 1.0
            x["attn_scale"] = cfg.head_dim ** -0.5 * mscale * mscale
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


def load_mla_weights(f: GGUFFile, cfg: ModelConfig, dtype=jnp.bfloat16):
    """DeepSeek-V2/V3 GGUF -> MLAWeights.

    llama.cpp tensor names (constants LLM_ARCH_DEEPSEEK2): ``attn_q`` or
    ``attn_q_a``/``attn_q_a_norm``/``attn_q_b``, ``attn_kv_a_mqa``,
    ``attn_kv_a_norm``, ``attn_kv_b`` (split into the absorbed
    w_uk/w_uv), ``attn_output``; MoE layers carry ``ffn_gate_inp`` +
    ``ffn_{gate,up,down}_exps`` + ``ffn_{gate,up,down}_shexp`` +
    V3's ``exp_probs_b`` score-correction bias.
    """
    from ..models.mla import MLALayerWeights, MLAWeights
    from ..models.moe import MoEWeights

    nh = cfg.num_heads
    dn, dv, r = cfg.qk_nope_head_dim, cfg.v_head_dim, cfg.kv_lora_rank
    x = cfg.extra
    n_exp = x.get("num_experts", 0)
    first_dense = int(x.get("first_k_dense_replace", 0)) if n_exp \
        else cfg.num_layers

    def lin(name):
        return load_tensor(f, name, as_linear=True, dtype=dtype)

    def vec(name):
        return load_tensor(f, name, as_linear=False, dtype=dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"blk.{i}."
        use_qlora = cfg.q_lora_rank > 0
        # kv_b [nh*(dn+dv), R] dequantized dense: split into the absorbed
        # per-head up-projections (same as models/hf_loader.py:417-420)
        kv_b = np.asarray(
            vec(p + "attn_kv_b.weight").astype(jnp.float32)
        ).reshape(nh, dn + dv, r)
        moe = None
        if i >= first_dense and n_exp:
            kw = dict(
                router=lin(p + "ffn_gate_inp.weight"),
                gate=load_moe_experts(f, p + "ffn_gate_exps.weight",
                                      n_exp, dtype),
                up=load_moe_experts(f, p + "ffn_up_exps.weight",
                                    n_exp, dtype),
                down=load_moe_experts(f, p + "ffn_down_exps.weight",
                                      n_exp, dtype),
                top_k=x.get("num_experts_per_tok", 2),
                renormalize=bool(x.get("norm_topk_prob", True)),
                scoring=x.get("scoring_func", "softmax"),
                routed_scale=float(x.get("routed_scaling_factor", 1.0)),
                n_group=int(x.get("n_group", 1)),
                topk_group=int(x.get("topk_group", 1)),
                group_sel=x.get("group_sel", "max"),
            )
            if p + "exp_probs_b.bias" in f:
                kw["score_bias"] = vec(p + "exp_probs_b.bias")
            if p + "ffn_gate_shexp.weight" in f:
                kw["shared_gate"] = lin(p + "ffn_gate_shexp.weight")
                kw["shared_up"] = lin(p + "ffn_up_shexp.weight")
                kw["shared_down"] = lin(p + "ffn_down_shexp.weight")
            moe = MoEWeights(**kw)
        layers.append(MLALayerWeights(
            attn_norm=vec(p + "attn_norm.weight"),
            wq=None if use_qlora else lin(p + "attn_q.weight"),
            wq_a=lin(p + "attn_q_a.weight") if use_qlora else None,
            q_a_norm=vec(p + "attn_q_a_norm.weight") if use_qlora
            else None,
            wq_b=lin(p + "attn_q_b.weight") if use_qlora else None,
            wkv_a=lin(p + "attn_kv_a_mqa.weight"),
            kv_a_norm=vec(p + "attn_kv_a_norm.weight"),
            w_uk=jnp.asarray(kv_b[:, :dn, :], dtype=dtype),
            w_uv=jnp.asarray(np.transpose(kv_b[:, dn:, :], (0, 2, 1)),
                             dtype=dtype),
            wo=lin(p + "attn_output.weight"),
            mlp_norm=vec(p + "ffn_norm.weight"),
            gate=None if moe is not None else lin(p + "ffn_gate.weight"),
            up=None if moe is not None else lin(p + "ffn_up.weight"),
            down=None if moe is not None else lin(p + "ffn_down.weight"),
            moe=moe,
        ))

    embedding = load_tensor(f, "token_embd.weight", as_linear=True,
                            dtype=dtype, layout="nk")
    if "output.weight" in f:
        lm_head = lin("output.weight")
    elif embedding.kind != "dense":
        lm_head = embedding.to_kn()
    else:
        lm_head = None
    return MLAWeights(
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
    if cfg.is_mla:
        from ..models.mla import MLAModel
        model = MLAModel(cfg)
        return model, load_mla_weights(f, cfg, dtype=dtype), cfg
    if cfg.extra.get("num_experts"):
        from ..models.mixtral import MixtralModel
        model_cls = MixtralModel
    else:
        model_cls = get_model_class(cfg.architecture)
    model = model_cls(cfg)
    weights = load_llama_weights(f, cfg, dtype=dtype)
    return model, weights, cfg

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
    # MoE FFN variants of the Llama layer shape
    "MixtralForCausalLM": "mixtral",
    "Qwen2MoeForCausalLM": "qwen2moe",
    "Qwen3MoeForCausalLM": "qwen3moe",
    # multi-head latent attention family
    "DeepseekV2ForCausalLM": "deepseek2",
    "DeepseekV3ForCausalLM": "deepseek3",
    "MiniCPM3ForCausalLM": "minicpm3",
    # hybrid GDN + full-attention
    "Qwen3NextForCausalLM": "qwen3_next",
    # ERNIE 4.5 dense (PaddleOCR-VL's text backbone): llama layer shape
    # with GLM-style interleaved-pair rope (transformers
    # modeling_ernie4_5.py rotate_half + repeat_interleave cos/sin)
    "Ernie4_5ForCausalLM": "ernie4_5",
    "Ernie4_5_ForCausalLM": "ernie4_5",
}

# vision-language architectures routed to load_hf_vl_model
VL_ARCHS = {
    "Qwen2VLForConditionalGeneration",
    "Qwen2_5_VLForConditionalGeneration",
}
# PaddleOCR-VL (NaViT tower + ERNIE backbone) -> paddle_vl loader
PADDLE_ARCHS = {"PaddleOCRVLForConditionalGeneration"}
# DeepStack VL architectures routed to qwen3_vl_mm.load_hf_qwen3vl_model
VL3_ARCHS = {
    "Qwen3VLForConditionalGeneration",
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
    head_dim = int(hf.get("head_dim") or hidden // n_heads)
    is_mla = arch in ("deepseek2", "deepseek3", "minicpm3")
    if is_mla:
        head_dim = (int(hf["qk_nope_head_dim"])
                    + int(hf["qk_rope_head_dim"]))
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
        qk_norm=arch in ("qwen3", "qwen3moe", "qwen3_next"),
    )
    if is_mla:
        cfg.is_mla = True
        cfg.kv_lora_rank = int(hf["kv_lora_rank"])
        cfg.q_lora_rank = int(hf.get("q_lora_rank") or 0)
        cfg.qk_nope_head_dim = int(hf["qk_nope_head_dim"])
        cfg.qk_rope_head_dim = int(hf["qk_rope_head_dim"])
        cfg.v_head_dim = int(hf["v_head_dim"])
        cfg.num_kv_heads = n_heads
        # V3 checkpoints store rope rows pair-interleaved; the loader
        # permutes them to the half-split layout our rope uses
        cfg.extra["rope_interleave"] = bool(hf.get("rope_interleave",
                                                   arch == "deepseek3"))
        rs = hf.get("rope_scaling") or {}
        if rs.get("mscale_all_dim"):
            import math
            factor = float(rs.get("factor", 1.0))
            m_all = float(rs["mscale_all_dim"])
            mscale = (0.1 * m_all * math.log(factor) + 1.0
                      if factor > 1 else 1.0)
            cfg.extra["attn_scale"] = head_dim ** -0.5 * mscale * mscale
    if hf.get("n_routed_experts") or hf.get("num_experts") \
            or hf.get("num_local_experts"):
        x = cfg.extra
        x["num_experts"] = int(hf.get("n_routed_experts")
                               or hf.get("num_experts")
                               or hf["num_local_experts"])
        x["num_experts_per_tok"] = int(hf.get("num_experts_per_tok", 2))
        x["moe_intermediate_size"] = int(
            hf.get("moe_intermediate_size", cfg.intermediate_size))
        x["norm_topk_prob"] = bool(hf.get("norm_topk_prob",
                                          arch == "mixtral"))
        if hf.get("n_shared_experts"):
            x["n_shared_experts"] = int(hf["n_shared_experts"])
        if hf.get("shared_expert_intermediate_size"):
            x["shared_expert_intermediate_size"] = int(
                hf["shared_expert_intermediate_size"])
        if hf.get("routed_scaling_factor"):
            x["routed_scaling_factor"] = float(hf["routed_scaling_factor"])
        if hf.get("first_k_dense_replace"):
            x["first_k_dense_replace"] = int(hf["first_k_dense_replace"])
        if hf.get("decoder_sparse_step"):
            x["decoder_sparse_step"] = int(hf["decoder_sparse_step"])
        if hf.get("mlp_only_layers"):
            x["mlp_only_layers"] = list(hf["mlp_only_layers"])
        # DeepSeek routing flavor
        if arch == "deepseek3":
            x["scoring_func"] = "sigmoid"
            x["group_sel"] = "top2sum"
        tm = hf.get("topk_method")
        if tm == "group_limited_greedy" or arch == "deepseek3":
            if hf.get("n_group"):
                x["n_group"] = int(hf["n_group"])
                x["topk_group"] = int(hf.get("topk_group", 1))
    if arch == "qwen3_next":
        x = cfg.extra
        lt = hf.get("layer_types")
        if lt:
            # our hybrid model classifies by interval; verify the pattern
            # matches ((i+1) % interval == 0 -> full attention)
            interval = lt.index("full_attention") + 1 \
                if "full_attention" in lt else len(lt) + 1
            for i, t in enumerate(lt):
                want = "full_attention" if (i + 1) % interval == 0 \
                    else "linear_attention"
                if t != want:
                    raise ValueError(
                        f"unsupported layer_types pattern at {i}: {lt}")
            x["full_attention_interval"] = interval
        else:
            x["full_attention_interval"] = int(
                hf.get("full_attention_interval", 4))
        x["gdn_k_heads"] = int(hf["linear_num_key_heads"])
        x["gdn_k_dim"] = int(hf["linear_key_head_dim"])
        x["gdn_v_heads"] = int(hf["linear_num_value_heads"])
        x["gdn_v_dim"] = int(hf["linear_value_head_dim"])
        x["gdn_conv_k"] = int(hf.get("linear_conv_kernel_dim", 4))
        x["partial_rotary_factor"] = float(
            hf.get("partial_rotary_factor", 1.0))
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
    if arch == "ernie4_5":
        if hf.get("use_bias"):
            raise NotImplementedError(
                "ernie4_5 with use_bias=True not supported yet")
        cfg.extra["rope_interleaved_pairs"] = True
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


def _np_f32(a: np.ndarray) -> np.ndarray:
    if a.dtype == np.uint16:       # stored bf16 views come back as u16
        a = (a.astype(np.uint32) << 16).view(np.float32)
    return np.asarray(a, np.float32)


def _deinterleave_perm(d: int) -> np.ndarray:
    """Pair-interleaved rope rows -> half-split order (DeepSeek-V3
    ``rope_interleave`` checkpoints; HF de-interleaves at runtime in
    ``apply_rotary_pos_emb_interleave`` — we bake the permutation into the
    projection rows at load so standard rotate-half rope applies)."""
    half = d // 2
    perm = np.empty((d,), np.int64)
    perm[:half] = 2 * np.arange(half)
    perm[half:] = 2 * np.arange(half) + 1
    return perm


def _moe_from_hf(reader, p: str, cfg, lin, arr, dtype):
    """Build MoEWeights for one layer from HF names (or None if dense).

    ``p`` is the layer prefix (``model.layers.N.``).  Covers Mixtral
    (``block_sparse_moe.*`` w1/w3/w2), Qwen2/3-MoE + Qwen3-Next
    (``mlp.gate`` + ``mlp.experts.*`` + shared expert w/ sigmoid gate) and
    DeepSeek V2/V3 (``mlp.gate`` + score-correction bias + shared experts
    + group-limited routing).
    """
    from .moe import MoEWeights

    x = cfg.extra
    n_exp = x.get("num_experts", 0)
    common = dict(
        top_k=x.get("num_experts_per_tok", 2),
        renormalize=bool(x.get("norm_topk_prob", True)),
        scoring=x.get("scoring_func", "softmax"),
        routed_scale=float(x.get("routed_scaling_factor", 1.0)),
        n_group=int(x.get("n_group", 1)),
        topk_group=int(x.get("topk_group", 1)),
        group_sel=x.get("group_sel", "max"),
    )
    if p + "block_sparse_moe.gate.weight" in reader:       # mixtral
        ep = p + "block_sparse_moe.experts."
        return MoEWeights(
            router=lin(p + "block_sparse_moe.gate.weight"),
            gate=[lin(f"{ep}{e}.w1.weight") for e in range(n_exp)],
            up=[lin(f"{ep}{e}.w3.weight") for e in range(n_exp)],
            down=[lin(f"{ep}{e}.w2.weight") for e in range(n_exp)],
            **common)
    if p + "mlp.gate.weight" not in reader:
        return None                                        # dense layer
    ep = p + "mlp.experts."
    kw = dict(
        router=lin(p + "mlp.gate.weight"),
        gate=[lin(f"{ep}{e}.gate_proj.weight") for e in range(n_exp)],
        up=[lin(f"{ep}{e}.up_proj.weight") for e in range(n_exp)],
        down=[lin(f"{ep}{e}.down_proj.weight") for e in range(n_exp)],
        **common)
    if p + "mlp.gate.e_score_correction_bias" in reader:   # deepseek-v3
        kw["score_bias"] = arr(p + "mlp.gate.e_score_correction_bias")
    for hf_shared in ("mlp.shared_experts.", "mlp.shared_expert."):
        if p + hf_shared + "gate_proj.weight" in reader:
            kw["shared_gate"] = lin(p + hf_shared + "gate_proj.weight")
            kw["shared_up"] = lin(p + hf_shared + "up_proj.weight")
            kw["shared_down"] = lin(p + hf_shared + "down_proj.weight")
    if p + "mlp.shared_expert_gate.weight" in reader:      # qwen sigmoid
        kw["shared_gate_vec"] = lin(p + "mlp.shared_expert_gate.weight")
    return MoEWeights(**kw)


def load_hf_model(path: str, dtype=jnp.bfloat16, root: str = "model.",
                  cfg=None):
    """HF checkpoint dir -> (model, weights, cfg).

    ``root`` relocates the text backbone (e.g. ``thinker.model.`` for
    Qwen3-ASR composites); ``cfg`` overrides config.json parsing.
    Dispatches on family: Llama-shaped (w/ optional MoE FFN), MLA
    (DeepSeek V2/V3), hybrid GDN (Qwen3-Next) — the role of the
    reference's ``ModelLifecycle.load`` arch dispatch
    (``/root/reference/vllm_metal/v1/model_lifecycle.py:167-235``).
    """
    from .gemma import GemmaLayerWeights
    from .llama import LlamaLayerWeights, LlamaWeights
    from .mixtral import MixtralLayerWeights
    from .registry import get_model_class

    if cfg is None:
        cfg = config_from_hf(path)
    reader = _ShardedReader(path)

    def arr(key: str) -> jnp.ndarray:
        return jnp.asarray(_np_f32(reader.get(key)), dtype=dtype)

    def lin(key: str) -> QuantLinear:
        return QuantLinear.dense(arr(key))

    def opt(key: str, fn):
        return fn(key) if key in reader else None

    if cfg.is_mla:
        return _load_hf_mla(reader, cfg, dtype, root, arr, lin, opt)
    if cfg.architecture == "qwen3_next":
        return _load_hf_qwen3_next(reader, cfg, dtype, root, arr, lin, opt)

    is_gemma = cfg.architecture.startswith("gemma")
    is_moe = bool(cfg.extra.get("num_experts"))
    layer_cls = GemmaLayerWeights if is_gemma else (
        MixtralLayerWeights if is_moe else LlamaLayerWeights)

    layers = []
    for i in range(cfg.num_layers):
        p = f"{root}layers.{i}."
        moe = _moe_from_hf(reader, p, cfg, lin, arr, dtype) \
            if is_moe else None
        kw = dict(
            attn_norm=arr(p + "input_layernorm.weight"),
            wq=lin(p + "self_attn.q_proj.weight"),
            wk=lin(p + "self_attn.k_proj.weight"),
            wv=lin(p + "self_attn.v_proj.weight"),
            wo=lin(p + "self_attn.o_proj.weight"),
            mlp_norm=arr(p + "post_attention_layernorm.weight"),
            gate=None if moe is not None
            else lin(p + "mlp.gate_proj.weight"),
            up=None if moe is not None else lin(p + "mlp.up_proj.weight"),
            down=None if moe is not None
            else lin(p + "mlp.down_proj.weight"),
            q_norm=opt(p + "self_attn.q_norm.weight", arr),
            k_norm=opt(p + "self_attn.k_norm.weight", arr),
            bq=opt(p + "self_attn.q_proj.bias", arr),
            bk=opt(p + "self_attn.k_proj.bias", arr),
            bv=opt(p + "self_attn.v_proj.bias", arr),
            sinks=opt(p + "self_attn.sinks", arr),
        )
        if is_moe:
            kw["moe"] = moe
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


def _load_hf_mla(reader, cfg, dtype, root, arr, lin, opt):
    """DeepSeek V2/V3 / MiniCPM3 MLA checkpoints -> MLAWeights.

    HF names (transformers modeling_deepseek_v3.py): ``q_a_proj`` /
    ``q_a_layernorm`` / ``q_b_proj`` (or plain ``q_proj``),
    ``kv_a_proj_with_mqa`` + ``kv_a_layernorm``, ``kv_b_proj`` (split into
    the absorbed w_uk / w_uv), ``o_proj``.  ``rope_interleave`` checkpoints
    store rope rows pair-interleaved; the permutation is baked into the
    projection rows at load (see _deinterleave_perm).
    """
    import numpy as np
    from .mla import MLALayerWeights, MLAWeights
    from .registry import get_model_class

    nh = cfg.num_heads
    dn, dr, dv, r = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                     cfg.v_head_dim, cfg.kv_lora_rank)
    interleave = bool(cfg.extra.get("rope_interleave"))
    perm = _deinterleave_perm(dr)
    x = cfg.extra
    first_dense = int(x.get("first_k_dense_replace", 0)) \
        if x.get("num_experts") else cfg.num_layers

    def q_perm(w: np.ndarray) -> np.ndarray:
        """Permute each head's rope rows of a q projection [nh*(dn+dr), K]."""
        w = w.reshape(nh, dn + dr, -1)
        w = np.concatenate([w[:, :dn], w[:, dn:][:, perm]], axis=1)
        return w.reshape(nh * (dn + dr), -1)

    def kv_a_perm(w: np.ndarray) -> np.ndarray:
        """Permute the trailing k_rope rows of kv_a [R + dr, K]."""
        return np.concatenate([w[:r], w[r:][perm]], axis=0)

    layers = []
    for i in range(cfg.num_layers):
        p = f"{root}layers.{i}."
        sa = p + "self_attn."
        use_qlora = cfg.q_lora_rank > 0

        def qlin(key):
            w = _np_f32(reader.get(key))
            if interleave:
                w = q_perm(w)
            return QuantLinear.dense(jnp.asarray(w, dtype=dtype))

        kv_a_raw = _np_f32(reader.get(sa + "kv_a_proj_with_mqa.weight"))
        if interleave:
            kv_a_raw = kv_a_perm(kv_a_raw)
        kv_b = _np_f32(reader.get(sa + "kv_b_proj.weight"))
        kv_b = kv_b.reshape(nh, dn + dv, r)
        w_uk = kv_b[:, :dn, :]                         # [nh, dn, R]
        w_uv = np.transpose(kv_b[:, dn:, :], (0, 2, 1))  # [nh, R, dv]

        moe = None
        if i >= first_dense and x.get("num_experts"):
            moe = _moe_from_hf(reader, p, cfg, lin, arr, dtype)
        layers.append(MLALayerWeights(
            attn_norm=arr(p + "input_layernorm.weight"),
            wq=None if use_qlora else qlin(sa + "q_proj.weight"),
            wq_a=lin(sa + "q_a_proj.weight") if use_qlora else None,
            q_a_norm=opt(sa + "q_a_layernorm.weight", arr),
            wq_b=qlin(sa + "q_b_proj.weight") if use_qlora else None,
            wkv_a=QuantLinear.dense(jnp.asarray(kv_a_raw, dtype=dtype)),
            kv_a_norm=arr(sa + "kv_a_layernorm.weight"),
            w_uk=jnp.asarray(w_uk, dtype=dtype),
            w_uv=jnp.asarray(w_uv, dtype=dtype),
            wo=lin(sa + "o_proj.weight"),
            mlp_norm=arr(p + "post_attention_layernorm.weight"),
            gate=None if moe is not None
            else lin(p + "mlp.gate_proj.weight"),
            up=None if moe is not None else lin(p + "mlp.up_proj.weight"),
            down=None if moe is not None
            else lin(p + "mlp.down_proj.weight"),
            moe=moe,
        ))

    from .llama import LlamaWeights  # noqa: F401  (same top-level shape)
    from .mla import MLAWeights as _W
    weights = _W(
        embedding=lin(root + "embed_tokens.weight"),
        layers=layers,
        final_norm=arr(root + "norm.weight"),
        lm_head=opt("lm_head.weight", lin),
    )
    model = get_model_class(cfg.architecture)(cfg)
    return model, weights, cfg


def _load_hf_qwen3_next(reader, cfg, dtype, root, arr, lin, opt):
    """Qwen3-Next hybrid checkpoints -> Q3NWeights.

    Layout notes (transformers modeling_qwen3_next.py):

    * ``in_proj_qkvz`` rows are per-key-head blocks
      ``[q(Dk), k(Dk), v(r*Dv), z(r*Dv)]`` (fix_query_key_value_ordering);
      we re-permute into flat ``q|k|v`` (the conv channel order) + ``z``.
    * ``in_proj_ba`` rows are per-key-head ``[b(r), a(r)]``.
    * attention ``q_proj`` rows are per-head ``[query(D), gate(D)]``.
    * every Qwen3NextRMSNorm is ZERO-CENTERED (``1 + weight``); +1 is baked
      in at load.  The GDN gated out-norm (``linear_attn.norm``) is a
      plain-weight gated RMSNorm — no offset.
    """
    import numpy as np
    from .qwen3_next import (GDNLayerWeights, Q3NAttnLayerWeights,
                             Q3NWeights)
    from .registry import get_model_class

    x = cfg.extra
    hk, dk = x["gdn_k_heads"], x["gdn_k_dim"]
    hv, dv = x["gdn_v_heads"], x["gdn_v_dim"]
    ratio = hv // hk
    interval = x["full_attention_interval"]
    is_moe = bool(x.get("num_experts"))
    d = cfg.head_dim

    def arr1(key):   # zero-centered norm -> standard weight
        return arr(key) + jnp.asarray(1.0, dtype)

    def split_qkvz(key):
        w = _np_f32(reader.get(key))                   # [hk*blk, H]
        w = w.reshape(hk, 2 * dk + 2 * ratio * dv, -1)
        q = w[:, :dk].reshape(hk * dk, -1)
        k = w[:, dk:2 * dk].reshape(hk * dk, -1)
        v = w[:, 2 * dk:2 * dk + ratio * dv].reshape(hv * dv, -1)
        z = w[:, 2 * dk + ratio * dv:].reshape(hv * dv, -1)
        qkv = np.concatenate([q, k, v], axis=0)
        return (QuantLinear.dense(jnp.asarray(qkv, dtype=dtype)),
                QuantLinear.dense(jnp.asarray(z, dtype=dtype)))

    def split_ba(key):
        w = _np_f32(reader.get(key)).reshape(hk, 2 * ratio, -1)
        b = w[:, :ratio].reshape(hv, -1)
        a = w[:, ratio:].reshape(hv, -1)
        return (QuantLinear.dense(jnp.asarray(b, dtype=dtype)),
                QuantLinear.dense(jnp.asarray(a, dtype=dtype)))

    def split_q_gate(key, nh):
        w = _np_f32(reader.get(key)).reshape(nh, 2 * d, -1)
        wq = w[:, :d].reshape(nh * d, -1)
        wg = w[:, d:].reshape(nh * d, -1)
        return (QuantLinear.dense(jnp.asarray(wq, dtype=dtype)),
                QuantLinear.dense(jnp.asarray(wg, dtype=dtype)))

    layers = []
    for i in range(cfg.num_layers):
        p = f"{root}layers.{i}."
        moe = _moe_from_hf(reader, p, cfg, lin, arr, dtype) \
            if is_moe else None
        mlp_kw = dict(
            mlp_norm=arr1(p + "post_attention_layernorm.weight"),
            gate=None if moe is not None
            else lin(p + "mlp.gate_proj.weight"),
            up=None if moe is not None else lin(p + "mlp.up_proj.weight"),
            down=None if moe is not None
            else lin(p + "mlp.down_proj.weight"),
            moe=moe,
        )
        if (i + 1) % interval == 0:        # full attention layer
            wq, wg = split_q_gate(p + "self_attn.q_proj.weight",
                                  cfg.num_heads)
            layers.append(Q3NAttnLayerWeights(
                attn_norm=arr1(p + "input_layernorm.weight"),
                wq=wq, wg=wg,
                wk=lin(p + "self_attn.k_proj.weight"),
                wv=lin(p + "self_attn.v_proj.weight"),
                wo=lin(p + "self_attn.o_proj.weight"),
                q_norm=arr1(p + "self_attn.q_norm.weight"),
                k_norm=arr1(p + "self_attn.k_norm.weight"),
                **mlp_kw,
            ))
        else:                              # GDN linear-attention layer
            la = p + "linear_attn."
            in_qkv, in_z = split_qkvz(la + "in_proj_qkvz.weight")
            in_b, in_a = split_ba(la + "in_proj_ba.weight")
            conv_w = _np_f32(reader.get(la + "conv1d.weight"))[:, 0, :]
            layers.append(GDNLayerWeights(
                norm=arr1(p + "input_layernorm.weight"),
                in_qkv=in_qkv, in_z=in_z, in_a=in_a, in_b=in_b,
                conv_w=jnp.asarray(conv_w, dtype=dtype),
                conv_b=opt(la + "conv1d.bias", arr),
                a_log=arr(la + "A_log"),
                dt_bias=arr(la + "dt_bias"),
                out_norm=arr(la + "norm.weight"),
                out_proj=lin(la + "out_proj.weight"),
                **mlp_kw,
            ))

    weights = Q3NWeights(
        embedding=lin(root + "embed_tokens.weight"),
        layers=layers,
        final_norm=arr1(root + "norm.weight"),
        lm_head=opt("lm_head.weight", lin),
    )
    model = get_model_class(cfg.architecture)(cfg)
    return model, weights, cfg

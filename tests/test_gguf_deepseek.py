# SPDX-License-Identifier: Apache-2.0
"""DeepSeek-V2/V3 (arch "deepseek2") GGUF loading -> MLAModel.

The reference's GGUF path rejects non-llama architectures; ours routes
deepseek2 to the in-repo MLA model (weak-spot from round 2: a DeepSeek
GGUF could not load even though the model exists in-repo).  Oracle:
logits from the loader-built weights must match a forward over
hand-constructed MLAWeights from the same arrays.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.gguf_writer import write_gguf
from vllm_metal_tpu.gguf.loader import load_model
from vllm_metal_tpu.gguf.reader import GGMLType

V, H, L = 64, 32, 3
NH, DN, DR, DV, R, QL = 2, 16, 8, 12, 16, 24
I, NEXP, MOE_I = 48, 4, 20


def _mk_deepseek_gguf(path, seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    qt = GGMLType.F32
    tensors = {"token_embd.weight": (w(V, H), qt)}
    for i in range(L):
        p = f"blk.{i}."
        tensors.update({
            p + "attn_norm.weight": (1 + 0.1 * w(H), qt),
            p + "attn_q_a.weight": (w(QL, H), qt),
            p + "attn_q_a_norm.weight": (1 + 0.1 * w(QL), qt),
            p + "attn_q_b.weight": (w(NH * (DN + DR), QL), qt),
            p + "attn_kv_a_mqa.weight": (w(R + DR, H), qt),
            p + "attn_kv_a_norm.weight": (1 + 0.1 * w(R), qt),
            p + "attn_kv_b.weight": (w(NH * (DN + DV), R), qt),
            p + "attn_output.weight": (w(H, NH * DV), qt),
            p + "ffn_norm.weight": (1 + 0.1 * w(H), qt),
        })
        if i == 0:   # leading dense layer
            tensors.update({
                p + "ffn_gate.weight": (w(I, H), qt),
                p + "ffn_up.weight": (w(I, H), qt),
                p + "ffn_down.weight": (w(H, I), qt),
            })
        else:        # MoE + shared expert + V3 score bias
            tensors.update({
                p + "ffn_gate_inp.weight": (w(NEXP, H), qt),
                p + "ffn_gate_exps.weight": (w(NEXP, MOE_I, H), qt),
                p + "ffn_up_exps.weight": (w(NEXP, MOE_I, H), qt),
                p + "ffn_down_exps.weight": (w(NEXP, H, MOE_I), qt),
                p + "ffn_gate_shexp.weight": (w(MOE_I, H), qt),
                p + "ffn_up_shexp.weight": (w(MOE_I, H), qt),
                p + "ffn_down_shexp.weight": (w(H, MOE_I), qt),
                p + "exp_probs_b.bias": (w(NEXP), qt),
            })
    tensors["output_norm.weight"] = (1 + 0.1 * w(H), qt)
    tensors["output.weight"] = (w(V, H), qt)

    meta = {
        "general.architecture": "deepseek2",
        "deepseek2.block_count": L,
        "deepseek2.embedding_length": H,
        "deepseek2.attention.head_count": NH,
        "deepseek2.attention.head_count_kv": 1,
        "deepseek2.attention.key_length": DN + DR,
        "deepseek2.attention.value_length": DV,
        "deepseek2.attention.kv_lora_rank": R,
        "deepseek2.attention.q_lora_rank": QL,
        "deepseek2.rope.dimension_count": DR,
        "deepseek2.feed_forward_length": I,
        "deepseek2.expert_feed_forward_length": MOE_I,
        "deepseek2.expert_count": NEXP,
        "deepseek2.expert_used_count": 2,
        "deepseek2.expert_shared_count": 1,
        "deepseek2.expert_weights_scale": 1.5,
        "deepseek2.expert_weights_norm": True,
        "deepseek2.expert_gating_func": 2,
        "deepseek2.leading_dense_block_count": 1,
        "deepseek2.attention.layer_norm_rms_epsilon": 1e-5,
        "deepseek2.rope.freq_base": 10000.0,
        "deepseek2.context_length": 128,
        "deepseek2.vocab_size": V,
    }
    write_gguf(path, meta, tensors)
    return tensors


def test_deepseek_gguf_config_and_shapes(tmp_path):
    path = str(tmp_path / "ds.gguf")
    _mk_deepseek_gguf(path)
    model, weights, cfg = load_model(path, dtype=jnp.float32)
    assert cfg.is_mla and cfg.architecture == "deepseek2"
    assert cfg.kv_lora_rank == R and cfg.q_lora_rank == QL
    assert cfg.qk_nope_head_dim == DN and cfg.qk_rope_head_dim == DR
    assert cfg.v_head_dim == DV and cfg.head_dim == DN + DR
    assert cfg.extra["num_experts"] == NEXP
    assert cfg.extra["scoring_func"] == "sigmoid"
    assert cfg.extra["routed_scaling_factor"] == 1.5
    lw = weights.layers[1]
    assert lw.w_uk.shape == (NH, DN, R)
    assert lw.w_uv.shape == (NH, R, DV)
    assert lw.moe is not None and lw.moe.score_bias is not None
    assert lw.moe.shared_gate is not None
    assert weights.layers[0].moe is None
    assert weights.layers[0].gate is not None


def test_deepseek_gguf_forward_matches_direct_weights(tmp_path):
    """Loader output drives the same logits as hand-built MLAWeights."""
    from vllm_metal_tpu.attention.backend import PagedAttentionBackend
    from vllm_metal_tpu.attention.metadata import build_metadata
    from vllm_metal_tpu.attention.mla_cache import MLAPagedLatentCache
    from vllm_metal_tpu.config import CacheConfig
    from vllm_metal_tpu.models.mla import (MLALayerWeights, MLAModel,
                                           MLAWeights)
    from vllm_metal_tpu.models.moe import MoEWeights
    from vllm_metal_tpu.ops.quant_matmul import QuantLinear

    path = str(tmp_path / "ds.gguf")
    t = _mk_deepseek_gguf(path)
    model, weights, cfg = load_model(path, dtype=jnp.float32)

    def ql(name, layout="kn"):
        return QuantLinear.dense(jnp.asarray(t[name][0]))

    def vec(name):
        return jnp.asarray(t[name][0])

    layers = []
    for i in range(L):
        p = f"blk.{i}."
        kv_b = t[p + "attn_kv_b.weight"][0].reshape(NH, DN + DV, R)
        moe = None
        if i > 0:
            moe = MoEWeights(
                router=ql(p + "ffn_gate_inp.weight"),
                gate=[QuantLinear.dense(jnp.asarray(
                    t[p + "ffn_gate_exps.weight"][0][e]))
                    for e in range(NEXP)],
                up=[QuantLinear.dense(jnp.asarray(
                    t[p + "ffn_up_exps.weight"][0][e]))
                    for e in range(NEXP)],
                down=[QuantLinear.dense(jnp.asarray(
                    t[p + "ffn_down_exps.weight"][0][e]))
                    for e in range(NEXP)],
                shared_gate=ql(p + "ffn_gate_shexp.weight"),
                shared_up=ql(p + "ffn_up_shexp.weight"),
                shared_down=ql(p + "ffn_down_shexp.weight"),
                score_bias=vec(p + "exp_probs_b.bias"),
                top_k=2, renormalize=True, scoring="sigmoid",
                routed_scale=1.5, group_sel="top2sum")
        layers.append(MLALayerWeights(
            attn_norm=vec(p + "attn_norm.weight"),
            wq=None,
            wq_a=ql(p + "attn_q_a.weight"),
            q_a_norm=vec(p + "attn_q_a_norm.weight"),
            wq_b=ql(p + "attn_q_b.weight"),
            wkv_a=ql(p + "attn_kv_a_mqa.weight"),
            kv_a_norm=vec(p + "attn_kv_a_norm.weight"),
            w_uk=jnp.asarray(kv_b[:, :DN, :]),
            w_uv=jnp.asarray(np.transpose(kv_b[:, DN:, :], (0, 2, 1))),
            wo=ql(p + "attn_output.weight"),
            mlp_norm=vec(p + "ffn_norm.weight"),
            gate=None if moe else ql(p + "ffn_gate.weight"),
            up=None if moe else ql(p + "ffn_up.weight"),
            down=None if moe else ql(p + "ffn_down.weight"),
            moe=moe))
    direct = MLAWeights(
        embedding=QuantLinear.dense(
            jnp.asarray(t["token_embd.weight"][0])),
        layers=layers,
        final_norm=vec("output_norm.weight"),
        lm_head=ql("output.weight"))

    ccfg = CacheConfig(block_size=16)
    md = build_metadata(
        query_lens=[6], context_lens=[6], block_tables=[[1]],
        block_size=16, token_pad=8, seq_pad=4, max_blocks_per_seq=4)
    tokens = jnp.asarray([5, 9, 3, 33, 2, 60, 0, 0], jnp.int32)

    def fwd(wts):
        backend = PagedAttentionBackend(cfg, use_pallas=False)
        cache = MLAPagedLatentCache.allocate(cfg, ccfg, 8,
                                             dtype=jnp.float32)
        rt, final = backend.make_attn_fn(cache, md)
        hidden = model.forward_hidden(wts, tokens, md.positions, rt)
        return np.asarray(model.logits(wts, hidden))

    np.testing.assert_allclose(fwd(weights), fwd(direct),
                               atol=2e-4, rtol=2e-4)

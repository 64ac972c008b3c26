# SPDX-License-Identifier: Apache-2.0
"""MoE FFN routing + Mixtral model e2e."""

import numpy as np
import jax
import jax.numpy as jnp

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.mixtral import MixtralModel
from vllm_metal_tpu.models.moe import init_random_moe, moe_ffn

CFG = ModelConfig(
    vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=8, max_model_len=64,
    extra={"num_experts": 4, "num_experts_per_tok": 2},
)


def np_moe(x, w, top_k):
    """Numpy oracle for the routing math."""
    router = np.asarray(w.router.w, np.float32)
    logits = x @ router.T
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for t in range(x.shape[0]):
        idx = np.argsort(-probs[t])[:top_k]
        ws = probs[t][idx]
        ws = ws / ws.sum()
        for e, wt in zip(idx, ws):
            g = np.asarray(w.gate[e].w, np.float32)
            u = np.asarray(w.up[e].w, np.float32)
            d = np.asarray(w.down[e].w, np.float32)
            h = x[t] @ g.T
            h = h / (1 + np.exp(-h)) * (x[t] @ u.T)
            out[t] += wt * (h @ d.T)
    return out


def test_moe_ffn_matches_numpy():
    w = init_random_moe(jax.random.PRNGKey(0), 32, 48, 4, 2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((6, 32)),
                    jnp.float32)
    got = np.asarray(moe_ffn(x, w, jax.nn.silu), np.float32)
    want = np_moe(np.asarray(x), w, 2)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_moe_only_topk_experts_contribute():
    w = init_random_moe(jax.random.PRNGKey(2), 32, 48, 4, 1)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 32)),
                    jnp.float32)
    got = np.asarray(moe_ffn(x, w, jax.nn.silu))
    # top-1: output equals exactly one expert's output per token
    router = np.asarray(w.router.w, np.float32)
    probs = np.asarray(x) @ router.T
    for t in range(4):
        e = int(np.argmax(probs[t]))
        g = np.asarray(w.gate[e].w, np.float32)
        u = np.asarray(w.up[e].w, np.float32)
        d = np.asarray(w.down[e].w, np.float32)
        h = np.asarray(x)[t] @ g.T
        h = h / (1 + np.exp(-h)) * (np.asarray(x)[t] @ u.T)
        np.testing.assert_allclose(got[t], h @ d.T, atol=5e-3, rtol=5e-3)


def test_mixtral_engine_e2e():
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = MixtralModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(4), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=16, use_pallas=False)
    outs = eng.generate([[3, 9, 14], [27, 8]],
                        SamplingParams(temperature=0.0, max_tokens=4))
    assert len(outs) == 2
    for o in outs.values():
        assert o.finished and len(o.token_ids) == 4


def test_mixtral_gguf_load(tmp_path):
    """MoE GGUF checkpoint (llama arch + expert tensors) loads and runs."""
    import os
    from tests.gguf_writer import write_gguf
    from vllm_metal_tpu.gguf.loader import load_model
    from vllm_metal_tpu.gguf.reader import GGMLType
    rng = np.random.default_rng(0)
    V, H, L, NH, NKV, HD, I, E = 64, 32, 2, 4, 2, 8, 48, 4

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors = {"token_embd.weight": (w(V, H), GGMLType.F32),
               "output_norm.weight": (1 + 0.05 * w(H), GGMLType.F32),
               "output.weight": (w(V, H), GGMLType.F32)}
    for i in range(L):
        p = f"blk.{i}."
        tensors.update({
            p + "attn_norm.weight": (1 + 0.05 * w(H), GGMLType.F32),
            p + "attn_q.weight": (w(NH * HD, H), GGMLType.F32),
            p + "attn_k.weight": (w(NKV * HD, H), GGMLType.F32),
            p + "attn_v.weight": (w(NKV * HD, H), GGMLType.F32),
            p + "attn_output.weight": (w(H, NH * HD), GGMLType.F32),
            p + "ffn_norm.weight": (1 + 0.05 * w(H), GGMLType.F32),
            p + "ffn_gate_inp.weight": (w(E, H), GGMLType.F32),
            p + "ffn_gate_exps.weight": (w(E, I, H), GGMLType.F32),
            p + "ffn_up_exps.weight": (w(E, I, H), GGMLType.F32),
            p + "ffn_down_exps.weight": (w(E, H, I), GGMLType.F32),
        })
    meta = {
        "general.architecture": "llama",
        "llama.block_count": L, "llama.embedding_length": H,
        "llama.attention.head_count": NH,
        "llama.attention.head_count_kv": NKV,
        "llama.attention.key_length": HD,
        "llama.feed_forward_length": I,
        "llama.expert_count": E, "llama.expert_used_count": 2,
        "llama.context_length": 64, "llama.vocab_size": V,
    }
    path = str(tmp_path / "moe.gguf")
    write_gguf(path, meta, tensors)
    model, weights, cfg = load_model(path, dtype=jnp.float32)
    assert isinstance(model, MixtralModel)
    assert cfg.extra["num_experts"] == E
    assert len(weights.layers[0].moe.gate) == E

    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    eng = LLMEngine(model, weights, ecfg, num_blocks=16, use_pallas=False)
    outs = eng.generate([[5, 9, 2]], SamplingParams(temperature=0.0,
                                                    max_tokens=3))
    assert list(outs.values())[0].finished


# ---------------------------------------------------------------------------
# Expert parallelism (stacked experts sharded over the mesh)
# ---------------------------------------------------------------------------

def test_stacked_moe_matches_list():
    """MoEWeightsEP (no mesh) computes exactly what the list form does."""
    import jax.numpy as jnp
    from vllm_metal_tpu.models.moe import moe_ffn, stack_experts
    w = init_random_moe(jax.random.PRNGKey(1), 32, 48, 4, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 32), jnp.float32)
    a = np.asarray(moe_ffn(x, w, jax.nn.silu))
    b = np.asarray(moe_ffn(x, stack_experts(w), jax.nn.silu))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_expert_parallel_matches_single_device():
    """EP over a 4-way virtual mesh == single-device MoE engine logits."""
    import jax.numpy as jnp
    from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
    from vllm_metal_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs virtual multi-device CPU")
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=8, max_model_len=64,
        extra={"num_experts": 8, "num_experts_per_tok": 2},
    )
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=32,
                                  token_buckets=(16, 32)))
    model = MixtralModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(3), dtype=jnp.float32)

    single = ModelRunner(MixtralModel(cfg), weights, ecfg, num_blocks=16,
                         use_pallas=False)
    import dataclasses
    ecfg_ep = dataclasses.replace(ecfg)
    ecfg_ep.parallel = dataclasses.replace(
        ecfg.parallel, tensor_parallel_size=4, expert_parallel=True)
    mesh = make_mesh(tp=4, dp=1)
    ep = ModelRunner(MixtralModel(cfg), weights, ecfg_ep, num_blocks=16,
                     mesh=mesh, use_pallas=False)

    prompt = [3, 17, 42, 8, 25, 60]
    seq = SeqStepInput(query_tokens=prompt, context_len=len(prompt),
                       block_table=[1], params=SamplingParams(temperature=0.0))
    l1 = np.asarray(single.execute([seq]).logits)[0]
    seq2 = SeqStepInput(query_tokens=prompt, context_len=len(prompt),
                        block_table=[1],
                        params=SamplingParams(temperature=0.0))
    l2 = np.asarray(ep.execute([seq2]).logits)[0]
    np.testing.assert_allclose(l1, l2, atol=5e-3, rtol=5e-3)
    assert l1.argmax() == l2.argmax()

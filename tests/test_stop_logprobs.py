# SPDX-License-Identifier: Apache-2.0
"""Stop strings terminate generation; logprobs carry top-k alternatives.

Reference behavior source: upstream vLLM's engine (the reference plugin
inherits stop-string termination and logprobs from vLLM; SURVEY.md §0).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.detokenizer import IncrementalDetokenizer
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
)


class CharTokenizer:
    """id <-> one printable char; decode is exact concatenation."""

    eos_token_id = None

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(33 + int(i)) for i in ids)

    def encode(self, text):
        return [ord(c) - 33 for c in text]


def make_engine(seed=0, decode_window=1, tokenizer=None, **cache_kw):
    cfg = EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=16, **cache_kw),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=64,
            token_buckets=(16, 32, 64), decode_window=decode_window),
    )
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    return LLMEngine(model, weights, cfg, num_blocks=32,
                     tokenizer=tokenizer or CharTokenizer(),
                     use_pallas=False)


# ---------------------------------------------------------------- detok unit
def test_detokenizer_stop_within_token():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["X"])
    assert not d.append(ord("a") - 33)
    assert not d.append(ord("b") - 33)
    assert d.append(ord("X") - 33)
    assert d.stopped and d.stop_reason == "X"
    assert d.text == "ab"


def test_detokenizer_stop_spans_tokens():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["bc"])
    for c in "ab":
        assert not d.append(ord(c) - 33)
    assert d.append(ord("c") - 33)
    assert d.text == "a"
    assert d.stop_reason == "bc"


def test_detokenizer_include_stop():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["bc"],
                               include_stop=True)
    for c in "ab":
        d.append(ord(c) - 33)
    assert d.append(ord("c") - 33)
    assert d.text == "abc"


def test_detokenizer_safe_text_holds_back_stop_prefix():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["bcd"])
    d.append(ord("a") - 33)
    assert d.safe_text == "a"
    d.append(ord("b") - 33)
    # "b" might begin the stop string -> held back
    assert d.safe_text == "a"
    d.append(ord("c") - 33)
    assert d.safe_text == "a"
    d.append(ord("x") - 33)
    # "bcx" is not the stop -> everything releases
    assert d.safe_text == "abcx"
    assert not d.stopped


def test_detokenizer_earliest_stop_wins():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["cd", "b"])
    d.append(ord("a") - 33)
    assert d.append(ord("b") - 33)
    assert d.stop_reason == "b"
    assert d.text == "a"


# ------------------------------------------------------------- engine e2e
def _greedy_tokens(seed=3, n=12):
    eng = make_engine(seed=seed)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=n, ignore_eos=True))
    return list(out.values())[0].token_ids


def test_stop_string_terminates_generation():
    base = _greedy_tokens()
    tok = CharTokenizer()
    # stop on the 4th generated char (first occurrence checked below)
    stop_char = tok.decode([base[3]])
    first = tok.decode(base).index(stop_char)
    eng = make_engine(seed=3)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=len(base) + 10, ignore_eos=True,
        stop=[stop_char]))
    o = list(out.values())[0]
    assert o.finish_reason == "stop"
    assert o.stop_reason == stop_char
    # generation TERMINATED at the stop token (not just text truncation)
    assert len(o.token_ids) == first + 1
    assert o.text == tok.decode(base[:first])
    # engine counters confirm no overshoot past the stop
    assert eng.num_generated_tokens == first + 1


def test_stop_string_spanning_token_boundary():
    base = _greedy_tokens()
    tok = CharTokenizer()
    stop = tok.decode(base[2:4])        # two-token stop string
    eng = make_engine(seed=3)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=len(base) + 10, ignore_eos=True,
        stop=[stop]))
    o = list(out.values())[0]
    assert o.finish_reason == "stop"
    idx = tok.decode(base).index(stop)
    assert o.text == tok.decode(base)[:idx]


def test_stop_string_in_decode_window():
    """Windows overshoot at most within the fetched window, but emitted
    output must still terminate exactly at the stop string."""
    base = _greedy_tokens()
    tok = CharTokenizer()
    stop_char = tok.decode([base[5]])
    first = tok.decode(base).index(stop_char)
    eng = make_engine(seed=3, decode_window=4)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=len(base) + 20, ignore_eos=True,
        stop=[stop_char]))
    o = list(out.values())[0]
    assert o.finish_reason == "stop"
    assert len(o.token_ids) == first + 1
    assert o.text == tok.decode(base[:first])


def test_include_stop_str_in_output():
    base = _greedy_tokens()
    tok = CharTokenizer()
    stop_char = tok.decode([base[3]])
    first = tok.decode(base).index(stop_char)
    eng = make_engine(seed=3)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=len(base) + 10, ignore_eos=True,
        stop=[stop_char], include_stop_str_in_output=True))
    o = list(out.values())[0]
    assert o.text == tok.decode(base[:first + 1])


# ---------------------------------------------------------------- logprobs
def test_logprobs_topk_populated_and_sorted():
    eng = make_engine(seed=4)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=5, ignore_eos=True, logprobs=5))
    o = list(out.values())[0]
    assert o.top_logprobs is not None
    assert len(o.top_logprobs) == len(o.token_ids)
    for tok, lp, pairs in zip(o.token_ids, o.logprobs, o.top_logprobs):
        assert len(pairs) >= 5
        vals = [v for _, v in pairs]
        assert vals == sorted(vals, reverse=True)
        # greedy: the sampled token IS the top-1 alternative
        assert pairs[0][0] == tok
        assert pairs[0][1] == pytest.approx(lp, abs=1e-5)


def test_logprobs_zero_means_no_topk_compute():
    eng = make_engine(seed=4)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=3, ignore_eos=True, logprobs=0))
    o = list(out.values())[0]
    # k=0: response carries the per-token list (empty alternatives)
    assert o.top_logprobs is not None
    assert o.logprobs and all(np.isfinite(o.logprobs))


def test_logprobs_gate_decode_window():
    """logprobs requests take the single-step path (windows don't carry
    top-k rows) but still finish correctly."""
    eng = make_engine(seed=4, decode_window=4)
    out = eng.generate([[5, 6, 7]], SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True, logprobs=3))
    o = list(out.values())[0]
    assert len(o.top_logprobs) == 6
    assert eng.num_window_steps == 0


def test_logprobs_sampled_consistency():
    """Non-greedy: sampled token's reported logprob equals its entry in
    the top-k table whenever it appears there."""
    eng = make_engine(seed=7)
    out = eng.generate([[9, 8, 7, 6]], SamplingParams(
        temperature=0.8, seed=11, max_tokens=6, ignore_eos=True,
        logprobs=20))
    o = list(out.values())[0]
    for tok, lp, pairs in zip(o.token_ids, o.logprobs, o.top_logprobs):
        d = dict(pairs)
        if tok in d:
            assert d[tok] == pytest.approx(lp, abs=1e-5)

# SPDX-License-Identifier: Apache-2.0
"""Structured output: bitmask semantics + engine-level forced-choice
generation (reference model: grammar-bitmask row tests,
tests/test_grammar_bitmask.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampler import SamplingTensors, sample
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.engine.structured_output import (
    TokenTrieGrammar, pack_bitmask,
)
from vllm_metal_tpu.models.llama import LlamaModel

CFG = ModelConfig(
    vocab_size=64, hidden_size=48, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=12, max_model_len=128,
)


def test_pack_bitmask():
    m = pack_bitmask([0, 5, 33, 63], 64)
    assert m.shape == (2,)
    assert m[0] == (1 | (1 << 5))
    assert m[1] == ((1 << 1) | (1 << 31))


def test_sampler_respects_bitmask():
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64)), jnp.float32)
    mask = np.stack([pack_bitmask([7], 64), pack_bitmask([3, 9], 64)])
    st = SamplingTensors.from_lists(
        [SamplingParams(temperature=0.0)] * 2, 2, token_bitmask=mask)
    toks, _, _, _ = sample(logits, st, jnp.asarray(0))
    assert int(toks[0]) == 7
    assert int(toks[1]) in (3, 9)


def test_trie_grammar_walk():
    g = TokenTrieGrammar([[1, 2, 3], [1, 5]], vocab_size=64, eos_token_id=0)
    m0 = g.next_allowed([])
    assert m0[0] == (1 << 1)                       # only token 1
    m1 = g.next_allowed([1])
    assert m1[0] == ((1 << 2) | (1 << 5))          # 2 or 5
    m2 = g.next_allowed([1, 5])
    assert m2[0] == 1                              # terminal -> EOS only
    m3 = g.next_allowed([1, 2])
    assert m3[0] == (1 << 3)


def test_engine_forced_choice():
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False,
                    eos_token_id=0)
    choices = [[11, 22, 33], [44, 55]]
    g = TokenTrieGrammar(choices, vocab_size=CFG.vocab_size, eos_token_id=0)
    out = eng.generate([[5, 9, 2]], SamplingParams(
        temperature=0.0, max_tokens=8, grammar=g))
    toks = list(out.values())[0].token_ids
    # strip the trailing EOS if present
    if toks and toks[-1] == 0:
        toks = toks[:-1]
    assert toks in choices, toks

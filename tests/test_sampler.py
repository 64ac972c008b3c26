# SPDX-License-Identifier: Apache-2.0
"""On-device sampler semantics (reference model: tests/test_sampling.py)."""

import numpy as np
import jax.numpy as jnp

from vllm_metal_tpu.engine.sampler import SamplingTensors, sample
from vllm_metal_tpu.engine.sampling_params import SamplingParams


def make_st(params, s_pad=4, recent=None):
    return SamplingTensors.from_lists(params, s_pad, recent_tokens=recent)


def test_greedy_picks_argmax():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((4, 32)),
                         dtype=jnp.float32)
    st = make_st([SamplingParams(temperature=0.0)] * 4)
    toks, lp, _, _ = sample(logits, st, jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(logits).argmax(-1))
    assert np.all(np.asarray(lp) <= 0)


def test_seeded_sampling_deterministic():
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((4, 64)),
                         dtype=jnp.float32)
    st = make_st([SamplingParams(temperature=1.0, seed=42)] * 4)
    t1, _, _, _ = sample(logits, st, jnp.asarray(3))
    t2, _, _, _ = sample(logits, st, jnp.asarray(3))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    t3, _, _, _ = sample(logits, st, jnp.asarray(4))  # different step -> may differ
    assert np.asarray(t3).shape == (4,)


def test_top_k_restricts_support():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((4, 100)), dtype=jnp.float32)
    st = make_st([SamplingParams(temperature=1.0, top_k=3, seed=i + 1)
                  for i in range(4)])
    top3 = np.argsort(-np.asarray(logits), axis=-1)[:, :3]
    for step in range(20):
        toks, _, _, _ = sample(logits, st, jnp.asarray(step))
        for i, t in enumerate(np.asarray(toks)):
            assert t in top3[i], (i, t, top3[i])


def test_top_p_restricts_support():
    # peaked distribution: top-p=0.5 keeps only the dominant token(s)
    logits = np.full((2, 50), -10.0, np.float32)
    logits[:, 7] = 10.0
    logits[:, 9] = 9.0
    st = make_st([SamplingParams(temperature=1.0, top_p=0.5, seed=5)] * 2,
                 s_pad=2)
    for step in range(10):
        toks, _, _, _ = sample(jnp.asarray(logits), st, jnp.asarray(step))
        assert set(np.asarray(toks)).issubset({7})


def test_repetition_penalty_blocks_repeat():
    logits = np.zeros((1, 16), np.float32)
    logits[0, 3] = 2.0
    logits[0, 5] = 1.9
    recent = np.full((2, 64), -1, np.int32)
    recent[0, 0] = 3  # token 3 was emitted recently
    st = make_st([SamplingParams(temperature=0.0, repetition_penalty=5.0)],
                 s_pad=2, recent=recent)
    toks, _, _, _ = sample(jnp.asarray(logits), st, jnp.asarray(0))
    assert int(np.asarray(toks)[0]) == 5  # 3 penalized down below 5


def test_frequency_penalty_counts():
    logits = np.zeros((1, 8), np.float32)
    logits[0, 2] = 1.0
    logits[0, 4] = 0.5
    recent = np.full((2, 64), -1, np.int32)
    recent[0, :3] = 2  # token 2 emitted 3 times
    st = make_st([SamplingParams(temperature=0.0, frequency_penalty=0.3)],
                 s_pad=2, recent=recent)
    toks, _, _, _ = sample(jnp.asarray(logits), st, jnp.asarray(0))
    # 1.0 - 3*0.3 = 0.1 < 0.5
    assert int(np.asarray(toks)[0]) == 4

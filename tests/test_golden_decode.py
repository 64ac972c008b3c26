# SPDX-License-Identifier: Apache-2.0
"""Committed golden-token regression (reference tier-3 strategy,
SURVEY.md §4 / BASELINE config 1: GGUF Q4_K greedy decode on the
CPU-runnable path).

A deterministic Q4_K GGUF checkpoint (fixed seed) decoded greedily must
reproduce this exact committed sequence.  Any change to GGUF decode,
repack, model math, the paged runtime, or the sampler that alters greedy
outputs fails here first.
"""

import os

import jax.numpy as jnp
import pytest

from tests.test_llama_model import tiny_gguf
from vllm_metal_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.gguf.loader import load_model
from vllm_metal_tpu.gguf.reader import GGMLType

GOLDEN_PROMPT = [5, 17, 42, 9, 3]
GOLDEN_TOKENS = [5, 41, 5, 6, 2, 41, 16, 55, 41, 41, 41, 49, 5, 15, 2, 5,
                 21, 45, 50, 41, 41, 41, 41, 49]


def test_q4k_greedy_golden(tmp_path):
    path = str(tmp_path / "golden.gguf")
    tiny_gguf(path, seed=1234, qt=GGMLType.Q4_K)
    model, weights, mcfg = load_model(path, dtype=jnp.float32)
    cfg = EngineConfig(
        model=mcfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
    out = eng.generate([GOLDEN_PROMPT],
                       SamplingParams(temperature=0.0, max_tokens=24,
                                      ignore_eos=True))
    got = list(out.values())[0].token_ids
    assert got == GOLDEN_TOKENS, got

# SPDX-License-Identifier: Apache-2.0
"""PP serving integration: LLMEngine over a 2-stage PipelineRunner.

The reference serves PP end-to-end through the scheduler
(``/root/reference/vllm_metal/v1/model_runner.py:1930-1968``: sample on
the last stage, feed ids back through the scheduler); here logits are
psum-replicated so every device samples identically.  Greedy parity bar:
token-exact vs the single-device engine.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from vllm_metal_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                   ParallelConfig, SchedulerConfig)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.parallel.pipeline import PipelineRunner

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >=2 virtual devices")

CFG = ModelConfig(
    vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=8, max_model_len=64,
)


def _ecfg(pp=1):
    return EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16, cache_dtype="float32"),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=32,
                                  token_buckets=(16, 32)),
        parallel=ParallelConfig(pipeline_parallel_size=pp))


def _engines():
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    e1 = LLMEngine(model, weights, _ecfg(), num_blocks=16,
                   use_pallas=False)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
    runner = PipelineRunner(LlamaModel(CFG), weights, _ecfg(pp=2), mesh,
                            num_blocks=16, use_pallas=False)
    e2 = LLMEngine(runner.model, None, _ecfg(pp=2), num_blocks=16,
                   runner=runner)
    return e1, e2


@needs_devices
def test_pp_engine_greedy_matches_single():
    e1, e2 = _engines()
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 63, n)] for n in (5, 11)]
    p = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    o1 = e1.generate(prompts, p)
    o2 = e2.generate(prompts, p)
    for k in o1:
        assert o1[k].token_ids == o2[k].token_ids


@needs_devices
def test_pp_engine_sampled_and_continuous_batching():
    """Mixed sampled traffic + staggered admission through the scheduler."""
    _, e2 = _engines()
    rng = np.random.default_rng(1)
    reqs = []
    for i, n in enumerate((4, 9, 6)):
        prompt = [int(x) for x in rng.integers(1, 63, n)]
        params = SamplingParams(
            temperature=0.0 if i % 2 == 0 else 0.9, top_k=8, seed=i,
            max_tokens=5, ignore_eos=True)
        reqs.append((prompt, params))
    ids = [e2.add_request(prompt, params) for prompt, params in reqs]
    done = {}
    for _ in range(80):
        for out in e2.step():
            if out.finished:
                done[out.request_id] = out
        if len(done) == len(ids):
            break
    assert len(done) == len(ids)
    for rid in ids:
        assert len(done[rid].token_ids) == 5


@needs_devices
def test_pp_launcher_guards():
    with pytest.raises(ValueError, match="does not compose"):
        ParallelConfig(pipeline_parallel_size=2, tensor_parallel_size=2)

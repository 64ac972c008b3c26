# SPDX-License-Identifier: Apache-2.0
"""Tensor parallelism on a virtual 8-device CPU mesh.

Reference test model: SURVEY.md §4 tier 4 — distributed logic without a
cluster; parity bar mirrors the reference's PP bit-exactness check
(``docs/distributed.md``), relaxed to float tolerance because the sharded
matmuls legitimately reassociate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, ParallelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.parallel import make_mesh

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=8, num_kv_heads=4, head_dim=16, max_model_len=128,
)


def engine_cfg(tp=1):
    return EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)),
        parallel=ParallelConfig(tensor_parallel_size=tp),
    )


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices")


@needs_devices
@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(tp):
    model1 = LlamaModel(CFG)
    weights = model1.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    r1 = ModelRunner(model1, weights, engine_cfg(), num_blocks=16,
                     use_pallas=False)

    mesh = make_mesh(tp=tp)
    model2 = LlamaModel(CFG)
    r2 = ModelRunner(model2, weights, engine_cfg(tp), num_blocks=16,
                     use_pallas=False, mesh=mesh)

    prompt = [5, 17, 93, 40, 7, 66, 3]
    seq = SeqStepInput(query_tokens=prompt, context_len=len(prompt),
                       block_table=[3, 7],
                       params=SamplingParams(temperature=0.0))
    o1 = r1.execute([seq])
    o2 = r2.execute([seq])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.03, rtol=0.03)

    # decode steps stay in lockstep
    t1, t2 = int(o1.token_ids[0]), int(o2.token_ids[0])
    s1, s2 = prompt + [t1], prompt + [t2]
    for _ in range(3):
        o1 = r1.execute([SeqStepInput(
            query_tokens=[s1[-1]], context_len=len(s1), block_table=[3, 7],
            params=SamplingParams(temperature=0.0))])
        o2 = r2.execute([SeqStepInput(
            query_tokens=[s2[-1]], context_len=len(s2), block_table=[3, 7],
            params=SamplingParams(temperature=0.0))])
        np.testing.assert_allclose(np.asarray(o1.logits),
                                   np.asarray(o2.logits),
                                   atol=0.05, rtol=0.05)
        s1.append(int(o1.token_ids[0]))
        s2.append(int(o2.token_ids[0]))


@needs_devices
def test_tp_engine_e2e():
    mesh = make_mesh(tp=4)
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)
    cfg = engine_cfg(tp=4)
    runner = ModelRunner(model, weights, cfg, num_blocks=32,
                         use_pallas=False, mesh=mesh)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, runner=runner)
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 127, n)] for n in (5, 12)]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=4))
    assert len(outs) == 2
    for o in outs.values():
        assert o.finished and len(o.token_ids) == 4


@needs_devices
def test_dp_x_tp_mesh():
    # 2x4 mesh: batch replicated over data axis; still correct
    mesh = make_mesh(tp=4, dp=2)
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(2), dtype=jnp.float32)
    runner = ModelRunner(model, weights, engine_cfg(tp=4), num_blocks=16,
                         use_pallas=False, mesh=mesh)
    out = runner.execute([SeqStepInput(
        query_tokens=[1, 2, 3], context_len=3, block_table=[2],
        params=SamplingParams(temperature=0.0))])
    assert out.token_ids.shape == (1,)

# SPDX-License-Identifier: Apache-2.0
"""Pallas kernels under shard_map on the virtual CPU mesh (interpret mode).

The first real multi-chip run must not be the first time Pallas meets
shard_map: these tests run the ACTUAL kernel dispatch path (use_pallas=True,
interpret lowering) inside the TP shard_map step — per-shard kv-head pools,
aliased in-place cache writes, the fused decode window, and the TurboQuant
quantize-on-write + dequant-in-attention kernels — and check parity against
the single-device jnp reference path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, ParallelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.parallel import make_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 virtual devices")


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("VLLM_METAL_TPU_PALLAS_INTERPRET", "1")


CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=8, num_kv_heads=4, head_dim=32, max_model_len=128,
)


def engine_cfg(tp=1, kv_quant=False, decode_window=1):
    return EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=16,
                          kv_quant_k="q8_0" if kv_quant else "",
                          kv_quant_v="q8_0" if kv_quant else ""),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64),
                                  decode_window=decode_window),
        parallel=ParallelConfig(tensor_parallel_size=tp),
    )


def _seq(tokens, ctx, table):
    return SeqStepInput(query_tokens=tokens, context_len=ctx,
                        block_table=table,
                        params=SamplingParams(temperature=0.0))


@needs_devices
def test_tp_pallas_step_matches_ref():
    """Pallas(interpret) TP=2 step vs single-device jnp reference."""
    model1 = LlamaModel(CFG)
    weights = model1.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    r1 = ModelRunner(model1, weights, engine_cfg(), num_blocks=16,
                     use_pallas=False)
    mesh = make_mesh(tp=2)
    r2 = ModelRunner(LlamaModel(CFG), weights, engine_cfg(tp=2),
                     num_blocks=16, use_pallas=True, mesh=mesh)
    assert r2.backend.use_pallas

    prompt = [5, 17, 93, 40, 7, 66, 3]
    o1 = r1.execute([_seq(prompt, len(prompt), [3, 7])])
    o2 = r2.execute([_seq(prompt, len(prompt), [3, 7])])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.05, rtol=0.05)
    # a decode step reads back through the kernel-written paged pool
    nxt = int(o1.token_ids[0])
    o1 = r1.execute([_seq([nxt], len(prompt) + 1, [3, 7])])
    o2 = r2.execute([_seq([nxt], len(prompt) + 1, [3, 7])])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.05, rtol=0.05)


@needs_devices
@pytest.mark.parametrize("sampled", [False, True])
def test_tp_pallas_decode_window(sampled):
    """Fused multi-step decode window under the mesh (Pallas interpret)."""
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)
    r1 = ModelRunner(LlamaModel(CFG), weights, engine_cfg(), num_blocks=16,
                     use_pallas=False)
    mesh = make_mesh(tp=2)
    r2 = ModelRunner(LlamaModel(CFG), weights, engine_cfg(tp=2),
                     num_blocks=16, use_pallas=True, mesh=mesh)

    prompt = [9, 4, 77, 23]
    params = (SamplingParams(temperature=0.7, top_k=4, seed=7) if sampled
              else SamplingParams(temperature=0.0))
    for r in (r1, r2):
        r.execute([_seq(prompt, len(prompt), [1, 2])])
    win = [SeqStepInput(query_tokens=[55], context_len=len(prompt) + 1,
                        block_table=[1, 2], params=params,
                        recent_tokens=[55])]
    o1, lp1 = r1.execute_decode_window(win, 4)
    o2, lp2 = r2.execute_decode_window(win, 4)
    # identical programs up to float reassociation; seeded sampling uses
    # identical logits -> identical tokens at these magnitudes
    np.testing.assert_array_equal(o1, o2)
    if sampled:
        np.testing.assert_allclose(lp1, lp2, atol=0.05)


@needs_devices
def test_tp_quant_kv_step():
    """TurboQuant KV cache sharded on kv-heads under TP=2, Pallas
    quantize-on-write + dequant-in-attention kernels in interpret."""
    # TQ's V codec needs head_dim >= 64 (FWHT tile)
    qc = ModelConfig(
        vocab_size=128, hidden_size=256, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_model_len=128)

    def qcfg(tp=1):
        c = engine_cfg(tp=tp, kv_quant=True)
        return EngineConfig(model=qc, cache=c.cache, scheduler=c.scheduler,
                            parallel=c.parallel)

    model = LlamaModel(qc)
    weights = model.init_random(jax.random.PRNGKey(2), dtype=jnp.float32)
    r1 = ModelRunner(LlamaModel(qc), weights, qcfg(),
                     num_blocks=16, use_pallas=False)
    mesh = make_mesh(tp=2)
    r2 = ModelRunner(LlamaModel(qc), weights, qcfg(tp=2),
                     num_blocks=16, use_pallas=True, mesh=mesh)

    prompt = [12, 99, 3, 45, 8]
    o1 = r1.execute([_seq(prompt, len(prompt), [2, 5])])
    o2 = r2.execute([_seq(prompt, len(prompt), [2, 5])])
    # quantized KV: wider tolerance (two independent quantize paths)
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.12, rtol=0.12)
    nxt = int(o1.token_ids[0])
    o1 = r1.execute([_seq([nxt], len(prompt) + 1, [2, 5])])
    o2 = r2.execute([_seq([nxt], len(prompt) + 1, [2, 5])])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.12, rtol=0.12)


@needs_devices
def test_tp_mla_step():
    """MLA-TP: q heads + absorbed w_uk/w_uv shard, latent pool
    replicated; Pallas absorbed-MQA kernel in interpret under the mesh."""
    from vllm_metal_tpu.models.mla import MLAModel

    mc = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=1, head_dim=32, max_model_len=128,
        is_mla=True, kv_lora_rank=32, q_lora_rank=0,
        qk_rope_head_dim=16, qk_nope_head_dim=24, v_head_dim=20)

    def cfg(tp=1):
        return EngineConfig(
            model=mc, cache=CacheConfig(block_size=16),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64,
                                      token_buckets=(16, 32, 64)),
            parallel=ParallelConfig(tensor_parallel_size=tp))

    model = MLAModel(mc)
    weights = model.init_random(jax.random.PRNGKey(4), dtype=jnp.float32)
    r1 = ModelRunner(MLAModel(mc), weights, cfg(), num_blocks=16,
                     use_pallas=False)
    mesh = make_mesh(tp=2)
    r2 = ModelRunner(MLAModel(mc), weights, cfg(tp=2), num_blocks=16,
                     use_pallas=True, mesh=mesh)

    prompt = [3, 61, 12, 9]
    o1 = r1.execute([_seq(prompt, len(prompt), [1, 3])])
    o2 = r2.execute([_seq(prompt, len(prompt), [1, 3])])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.06, rtol=0.06)
    nxt = int(o1.token_ids[0])
    o1 = r1.execute([_seq([nxt], len(prompt) + 1, [1, 3])])
    o2 = r2.execute([_seq([nxt], len(prompt) + 1, [1, 3])])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.06, rtol=0.06)


@needs_devices
def test_ep_moe_pallas_step():
    """Expert-parallel MoE + Pallas attention under the mesh."""
    from vllm_metal_tpu.models.mixtral import MixtralModel

    mc = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=48, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=32, max_model_len=128,
        extra={"num_experts": 4, "num_experts_per_tok": 2})
    cfg = EngineConfig(
        model=mc, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)),
        parallel=ParallelConfig(tensor_parallel_size=2,
                                expert_parallel=True))
    model = MixtralModel(mc)
    weights = model.init_random(jax.random.PRNGKey(3), dtype=jnp.float32)

    cfg1 = EngineConfig(
        model=mc, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)),
        parallel=ParallelConfig())
    r1 = ModelRunner(MixtralModel(mc), weights, cfg1, num_blocks=16,
                     use_pallas=False)
    mesh = make_mesh(tp=2)
    r2 = ModelRunner(MixtralModel(mc), weights, cfg, num_blocks=16,
                     use_pallas=True, mesh=mesh)

    prompt = [7, 31, 2, 90]
    o1 = r1.execute([_seq(prompt, len(prompt), [1, 4])])
    o2 = r2.execute([_seq(prompt, len(prompt), [1, 4])])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.06, rtol=0.06)

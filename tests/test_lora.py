# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA serving (reference model: tests/test_lora.py — slot manager,
per-request routing, delta math)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.model_runner import ModelRunner
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.lora import LoRAAdapter, LoRAManager
from vllm_metal_tpu.lora.layers import lora_delta, LoRAPack
from vllm_metal_tpu.models.llama import LlamaModel

CFG = ModelConfig(
    vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=8, max_model_len=64,
)


def make_adapter(seed, rank=4, scaling=2.0, targets=("wq", "down")):
    rng = np.random.default_rng(seed)
    dims = LoRAManager._target_dims(CFG)
    weights = {}
    for t in targets:
        n, k = dims[t]
        weights[t] = (rng.standard_normal((CFG.num_layers, rank, k)) * 0.1,
                      rng.standard_normal((CFG.num_layers, n, rank)) * 0.1)
    return LoRAAdapter(weights=weights, rank=rank, scaling=scaling)


def test_manager_slots():
    m = LoRAManager(CFG, max_loras=2, max_rank=8)
    s1 = m.add_adapter("a", make_adapter(0))
    s2 = m.add_adapter("b", make_adapter(1))
    assert {s1, s2} == {1, 2}
    assert m.slot_for("a") == s1 and m.slot_for(None) == 0
    with pytest.raises(RuntimeError):
        m.add_adapter("c", make_adapter(2))
    m.remove_adapter("a")
    s3 = m.add_adapter("c", make_adapter(2))
    assert s3 == s1
    with pytest.raises(KeyError):
        m.slot_for("a")


def test_lora_delta_math():
    m = LoRAManager(CFG, max_loras=2, max_rank=4)
    ad = make_adapter(3, rank=4, scaling=1.5, targets=("wq",))
    slot = m.add_adapter("x", ad)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((5, 32)),
                    jnp.float32)
    slots = jnp.asarray([0, slot, slot, 0, slot], jnp.int32)
    d = np.asarray(lora_delta(x, m.packs["wq"], 0, slots), np.float32)
    a, b = ad.weights["wq"]
    a0 = jnp.asarray(a[0], jnp.bfloat16).astype(np.float32)
    b0 = (jnp.asarray(b[0] * 1.5, jnp.bfloat16)).astype(np.float32)
    want = (np.asarray(x) @ np.asarray(a0).T) @ np.asarray(b0).T
    np.testing.assert_allclose(d[1], want[1], atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(d[0], 0.0, atol=1e-6)  # null slot rows
    np.testing.assert_allclose(d[3], 0.0, atol=1e-6)


def make_engine(lora_manager=None, seed=0):
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    runner = ModelRunner(model, weights, cfg, num_blocks=32,
                         use_pallas=False, lora_manager=lora_manager)
    return LLMEngine(model, weights, cfg, num_blocks=32, runner=runner)


def test_engine_lora_routing_changes_output():
    m = LoRAManager(CFG, max_loras=2, max_rank=4)
    m.add_adapter("big", make_adapter(7, scaling=8.0,
                                      targets=("wq", "wv", "gate", "down")))
    eng = make_engine(lora_manager=m, seed=5)
    prompt = [3, 14, 15, 9, 26]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    base = eng.generate([prompt], sp)
    base_toks = list(base.values())[0].token_ids

    rid = eng.add_request(prompt, sp, lora_name="big")
    while eng.has_unfinished():
        outs = eng.step()
    lora_toks = eng_out = None
    # regenerate to collect output
    eng2 = make_engine(lora_manager=m, seed=5)
    eng2.add_request(prompt, sp, lora_name="big")
    final = None
    while eng2.has_unfinished():
        for o in eng2.step():
            if o.finished:
                final = o
    assert final is not None
    assert final.token_ids != base_toks  # adapter changed generation

    # null-slot request on the SAME engine matches the no-lora engine
    eng3 = make_engine(lora_manager=m, seed=5)
    same = eng3.generate([prompt], sp)
    assert list(same.values())[0].token_ids == base_toks


def test_mixed_batch_lora_isolation():
    """Adapted and un-adapted requests in one batch: the un-adapted request
    must produce the same tokens as an engine with no LoRA at all."""
    m = LoRAManager(CFG, max_loras=2, max_rank=4)
    m.add_adapter("a", make_adapter(9, scaling=8.0, targets=("wq", "up")))
    plain = make_engine(lora_manager=None, seed=6)
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    p1, p2 = [5, 6, 7, 8], [9, 10, 11]
    want = plain.generate([p1], sp)
    want_toks = list(want.values())[0].token_ids

    eng = make_engine(lora_manager=m, seed=6)
    eng.add_request(p1, sp)                      # no adapter
    eng.add_request(p2, sp, lora_name="a")       # adapted
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    assert outs["req-0"].token_ids == want_toks

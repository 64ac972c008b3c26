# SPDX-License-Identifier: Apache-2.0
"""TurboQuant KV cache e2e: the quantized pool must track the bf16 pool's
attention output within the codec's error budget, end-to-end through the
engine (reference model: turboquant quality-floor tests, docs/turboquant.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.attention.metadata import build_metadata
from vllm_metal_tpu.attention.quant_kv_cache import QuantPagedKVCache
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=128, max_model_len=128,
)


def test_quant_cache_write_read_roundtrip():
    ccfg = CacheConfig(block_size=16, kv_quant_k="q8_0", kv_quant_v="q3_0")
    cache = QuantPagedKVCache.allocate(CFG, ccfg, num_blocks=4)
    rng = np.random.default_rng(0)
    t = 8
    k = jnp.asarray(rng.standard_normal((t, 2, 128)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, 2, 128)), dtype=jnp.float32)
    slots = jnp.asarray([16 + i for i in range(t)], jnp.int32)  # block 1
    cache = cache.write(0, k, v, slots)
    slot_idx = jnp.asarray([[16 + i for i in range(16)]], jnp.int32)
    kd, vd = cache.dequant_gathered(0, slot_idx, jnp.float32)
    kd = np.asarray(kd)[0, :t]          # [t, KH, D]
    vd = np.asarray(vd)[0, :t]
    k_rms = np.sqrt(np.mean((kd - np.asarray(k)) ** 2))
    v_rms = np.sqrt(np.mean((vd - np.asarray(v)) ** 2)) \
        / np.sqrt(np.mean(np.asarray(v) ** 2))
    assert k_rms < 0.01, k_rms          # int8 K
    assert v_rms < 0.2, v_rms           # 3-bit Lloyd-Max V


def test_quant_cache_pad_slots_dropped():
    ccfg = CacheConfig(block_size=16, kv_quant_k="q8_0", kv_quant_v="q3_0")
    cache = QuantPagedKVCache.allocate(CFG, ccfg, num_blocks=4)
    k = jnp.ones((4, 2, 128), jnp.float32)
    slots = jnp.asarray([16, 17, -1, -1], jnp.int32)
    cache = cache.write(0, k, k, slots)
    assert np.asarray(cache.k_codes[0, 0]).any() == False  # block 0 clean
    # -1 must NOT wrap to the pool's last block
    assert np.asarray(cache.k_codes[0, 3]).any() == False
    assert np.asarray(cache.v_codes[0, 3]).any() == False
    # ...and the intended block got both tokens
    assert np.asarray(cache.k_codes[0, 1]).any()


@pytest.mark.parametrize("ck,cv,atol", [
    ("q8_0", "q3_0", 0.06),
    ("q4_0", "q3_0", 0.15),
])
def test_engine_quant_kv_close_to_fp(ck, cv, atol):
    def build(quant):
        cache_kw = dict(kv_quant_k=ck, kv_quant_v=cv) if quant else {}
        cfg = EngineConfig(
            model=CFG, cache=CacheConfig(block_size=16, **cache_kw),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=64,
                                      token_buckets=(16, 32, 64)))
        model = LlamaModel(CFG)
        weights = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
        return ModelRunner(model, weights, cfg, num_blocks=16,
                           use_pallas=False)

    r_fp = build(False)
    r_tq = build(True)
    prompt = [int(x) for x in np.random.default_rng(2).integers(1, 63, 12)]
    seq = SeqStepInput(query_tokens=prompt, context_len=len(prompt),
                       block_table=[1], params=SamplingParams(temperature=0.0))
    o_fp = r_fp.execute([seq])
    o_tq = r_tq.execute([seq])
    lf = np.asarray(o_fp.logits)[0]
    lq = np.asarray(o_tq.logits)[0]
    assert np.abs(lf - lq).mean() < atol, np.abs(lf - lq).mean()


def test_engine_e2e_with_quant_cache():
    cfg = EngineConfig(
        model=CFG,
        cache=CacheConfig(block_size=16, kv_quant_k="q8_0", kv_quant_v="q3_0"),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
    rng = np.random.default_rng(3)
    prompts = [[int(x) for x in rng.integers(1, 63, n)] for n in (5, 9)]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=4))
    assert len(outs) == 2
    for o in outs.values():
        assert o.finished and len(o.token_ids) == 4


@pytest.mark.parametrize("ck,cv", [
    ("q8_0", "q3_0"),          # 5 pools (no lo planes for K)
    ("q4_0", "q3_0"),          # packed hi planes, V lo plane
    ("q5_0", "q3_0"),          # 7 pools (both lo planes)
])
@pytest.mark.parametrize("slots", [
    [0],                                  # single decode token
    [5, 6, 7, 8, 9],                      # run crossing an 8-row tile
    [3, -1, 20, 21, -1, 22],              # pads interleaved
    [47, 0, 16],                          # non-monotonic block hops
])
def test_tq_write_kernel_matches_scatter(slots, ck, cv):
    """Aliased Pallas block-merge write (interpret) == jnp blend path
    across all pool arrays incl. packed bit planes (reference:
    TQEncodePrimitive, paged_ops.cpp:846)."""
    from vllm_metal_tpu.ops.tq_cache_write import tq_block_write

    rng = np.random.default_rng(len(slots))
    mc = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=64,
                     num_layers=2, num_heads=4, num_kv_heads=2,
                     head_dim=128, max_model_len=256)
    cc = CacheConfig(block_size=16, kv_quant_k=ck, kv_quant_v=cv)
    cache = QuantPagedKVCache.allocate(mc, cc, num_blocks=4)
    # pre-fill pools with junk so RMW blending is actually exercised
    cache = cache._rebuild(tuple(
        jnp.asarray(rng.integers(-9, 9, p.shape), jnp.int8)
        if p.dtype == jnp.int8
        else jnp.asarray(rng.standard_normal(p.shape), p.dtype)
        for p in cache._pools()))

    t = len(slots)
    t_pad = -(-t // 8) * 8
    k = rng.standard_normal((t_pad, 2, 128)).astype(np.float32)
    v = rng.standard_normal((t_pad, 2, 128)).astype(np.float32)
    sl = np.full(t_pad, -1, np.int32)
    sl[:t] = slots

    ublocks, payloads, masks = cache._merged_payloads(
        jnp.asarray(k), jnp.asarray(v), jnp.asarray(sl))
    # jnp blend path first (tq_block_write donates the pool arrays)
    want = cache.write(1, jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(sl))
    got = tq_block_write(cache._pools(), ublocks, payloads, masks, 1,
                         interpret=True)
    for g, w in zip(got, want._pools()):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("ck,cv,ktol,vtol", [
    ("q4_0", "q3_0", 0.1, 0.2),
    ("q5_0", "q3_0", 0.05, 0.2),
    ("uint2", "q2_0", 0.45, 0.42),
])
def test_packed_codec_roundtrip(ck, cv, ktol, vtol):
    """Sub-byte packed pools round-trip within each codec's error floor."""
    ccfg = CacheConfig(block_size=16, kv_quant_k=ck, kv_quant_v=cv)
    cache = QuantPagedKVCache.allocate(CFG, ccfg, num_blocks=4)
    rng = np.random.default_rng(7)
    t = 16
    k = jnp.asarray(rng.standard_normal((t, 2, 128)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, 2, 128)), dtype=jnp.float32)
    slots = jnp.asarray(list(range(32, 32 + t)), jnp.int32)
    cache = cache.write(1, k, v, slots)
    slot_idx = jnp.asarray([[32 + i for i in range(16)]], jnp.int32)
    kd, vd = cache.dequant_gathered(1, slot_idx, jnp.float32)
    kd = np.asarray(kd)[0]
    vd = np.asarray(vd)[0]
    k_rms = np.sqrt(np.mean((kd - np.asarray(k)) ** 2))
    v_rms = np.sqrt(np.mean((vd - np.asarray(v)) ** 2)) \
        / np.sqrt(np.mean(np.asarray(v) ** 2))
    assert k_rms < ktol, k_rms
    assert v_rms < vtol, v_rms


def test_packed_pool_bytes_match_compression():
    """bytes_per_block reflects REAL packed storage (the r3 gap: codes
    stored 1 byte/elem made q4_0 cost q8_0 memory)."""
    from vllm_metal_tpu.ops.turboquant import compression_ratio
    for ck, cv in (("q8_0", "q3_0"), ("q4_0", "q3_0"), ("uint2", "q3_0")):
        ccfg = CacheConfig(block_size=16, kv_quant_k=ck, kv_quant_v=cv)
        cache = QuantPagedKVCache.allocate(CFG, ccfg, num_blocks=4)
        bf16 = CFG.num_layers * CFG.num_kv_heads * 16 * CFG.head_dim * 2 * 2
        got = bf16 / cache.bytes_per_block()
        assert got == pytest.approx(
            compression_ratio(ck, cv, CFG.head_dim), rel=1e-6)
    # q4_0 must actually be ~1.5x smaller than q8_0 now
    c8 = QuantPagedKVCache.allocate(
        CFG, CacheConfig(block_size=16, kv_quant_k="q8_0",
                         kv_quant_v="q3_0"), 4)
    c4 = QuantPagedKVCache.allocate(
        CFG, CacheConfig(block_size=16, kv_quant_k="q4_0",
                         kv_quant_v="q3_0"), 4)
    assert c4.bytes_per_block() < 0.7 * c8.bytes_per_block()

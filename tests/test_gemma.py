# SPDX-License-Identifier: Apache-2.0
"""Gemma family e2e: GGUF load (sliding window pattern, softcaps, sandwich
norms, scaled embeddings) + paged-vs-dense parity + sinks wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.gguf_writer import write_gguf
from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.gguf.loader import load_model
from vllm_metal_tpu.gguf.reader import GGMLType
from vllm_metal_tpu.models.gemma import GemmaModel
from vllm_metal_tpu.models.llama import LlamaModel, dense_causal_attn

V, H, L, NH, NKV, HD, I = 64, 32, 4, 4, 2, 8, 48


def gemma_gguf(path, seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.2):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors = {"token_embd.weight": (w(V, H), GGMLType.F32)}
    for i in range(L):
        p = f"blk.{i}."
        tensors.update({
            p + "attn_norm.weight": (w(H, scale=0.05), GGMLType.F32),
            p + "attn_q.weight": (w(NH * HD, H), GGMLType.F32),
            p + "attn_k.weight": (w(NKV * HD, H), GGMLType.F32),
            p + "attn_v.weight": (w(NKV * HD, H), GGMLType.F32),
            p + "attn_output.weight": (w(H, NH * HD), GGMLType.F32),
            p + "post_attention_norm.weight": (w(H, scale=0.05),
                                               GGMLType.F32),
            p + "ffn_norm.weight": (w(H, scale=0.05), GGMLType.F32),
            p + "post_ffw_norm.weight": (w(H, scale=0.05), GGMLType.F32),
            p + "ffn_gate.weight": (w(I, H), GGMLType.F32),
            p + "ffn_up.weight": (w(I, H), GGMLType.F32),
            p + "ffn_down.weight": (w(H, I), GGMLType.F32),
        })
    tensors["output_norm.weight"] = (w(H, scale=0.05), GGMLType.F32)

    meta = {
        "general.architecture": "gemma2",
        "gemma2.block_count": L,
        "gemma2.embedding_length": H,
        "gemma2.attention.head_count": NH,
        "gemma2.attention.head_count_kv": NKV,
        "gemma2.attention.key_length": HD,
        "gemma2.feed_forward_length": I,
        "gemma2.attention.layer_norm_rms_epsilon": 1e-6,
        "gemma2.attention.sliding_window": 8,
        "gemma2.attn_logit_softcapping": 50.0,
        "gemma2.final_logit_softcapping": 30.0,
        "gemma2.context_length": 128,
        "gemma2.vocab_size": V,
    }
    write_gguf(path, meta, tensors)


def test_gemma_config_detection(tmp_path):
    path = str(tmp_path / "g.gguf")
    gemma_gguf(path)
    model, weights, cfg = load_model(path, dtype=jnp.float32)
    assert isinstance(model, GemmaModel)
    assert cfg.scale_embeddings
    assert cfg.sliding_window == 8
    assert cfg.sliding_window_pattern == [True, False]  # gemma2 alternation
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.logit_softcap == 30.0
    assert cfg.tie_word_embeddings
    assert weights.layers[0].post_attn_norm is not None
    assert weights.layers[0].post_ffn_norm is not None
    # layer window dispatch: even layers sliding, odd layers full
    assert cfg.layer_sliding_window(0) == 8
    assert cfg.layer_sliding_window(1) is None


def test_gemma_paged_matches_dense(tmp_path):
    path = str(tmp_path / "g.gguf")
    gemma_gguf(path, seed=1)
    model, weights, cfg = load_model(path, dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    prompt = [int(x) for x in np.random.default_rng(2).integers(1, V - 1, 14)]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=len(prompt), block_table=[1],
        params=SamplingParams(temperature=0.0))])
    ids = jnp.asarray(prompt, jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)
    dense = model.forward(weights, ids, pos, dense_causal_attn(cfg))
    # 4 layers of bf16 matmul noise through two tanh softcaps
    np.testing.assert_allclose(np.asarray(out.logits)[0],
                               np.asarray(dense)[-1], atol=0.08, rtol=0.08)


def test_sinks_change_attention():
    """Sink logits must flow through the paged path (GPT-OSS wiring)."""
    cfg = ModelConfig(vocab_size=32, hidden_size=32, intermediate_size=48,
                      num_layers=1, num_heads=2, num_kv_heads=2, head_dim=16,
                      max_model_len=64)
    model = LlamaModel(cfg)
    w1 = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    import dataclasses
    lw = dataclasses.replace(w1.layers[0],
                             sinks=jnp.asarray([3.0, -1.0], jnp.float32))
    w2 = dataclasses.replace(w1, layers=[lw])
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=32,
                                  token_buckets=(16, 32)))
    r1 = ModelRunner(model, w1, ecfg, num_blocks=8, use_pallas=False)
    r2 = ModelRunner(model, w2, ecfg, num_blocks=8, use_pallas=False)
    seq = SeqStepInput(query_tokens=[1, 2, 3], context_len=3,
                       block_table=[1], params=SamplingParams(temperature=0.0))
    l1 = np.asarray(r1.execute([seq]).logits)
    l2 = np.asarray(r2.execute([seq]).logits)
    assert np.abs(l1 - l2).max() > 1e-4  # sinks had an effect


# ---------------------------------------------------------------------------
# YOCO (Gemma4-style KV sharing)
# ---------------------------------------------------------------------------

def _yoco_cfg(n_shared=2):
    return ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I, num_layers=L,
        num_heads=NH, num_kv_heads=NKV, head_dim=HD, max_model_len=64,
        architecture="gemma3", scale_embeddings=True,
        sliding_window=8, sliding_window_pattern=[True, False],
        extra={"num_kv_shared_layers": n_shared})


def _dense_yoco_attn(cfg, store):
    """Dense oracle: caching layers record K/V; shared layers reuse them."""

    def masked_dense(layer_idx, q, k, v):
        t, hq, d = q.shape
        rep = hq // k.shape[1]
        kx = jnp.repeat(k, rep, axis=1)
        vx = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            kx.astype(jnp.float32)) * (d ** -0.5)
        mask = np.tril(np.ones((t, t), bool))
        w = cfg.layer_sliding_window(layer_idx)
        if w is not None:
            rows = np.arange(t)[:, None]
            mask = mask & (np.arange(t)[None, :] > rows - w)
        logits = jnp.where(jnp.asarray(mask)[None], logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("hqk,khd->qhd", p,
                          vx.astype(jnp.float32)).astype(q.dtype)

    def attn(layer_idx, q, k, v):
        store[layer_idx] = (k, v)
        return masked_dense(layer_idx, q, k, v)

    def attend_shared(layer_idx, ref_layer, q):
        k, v = store[ref_layer]
        return masked_dense(layer_idx, q, k, v)

    attn.attend_shared = attend_shared
    return attn


def test_yoco_cache_has_fewer_layers():
    cfg = _yoco_cfg()
    assert cfg.num_cached_layers == L - 2
    # shared layer 2 is sliding (pattern idx 0) -> last sliding cacher = 0
    assert cfg.yoco_ref_layer(2) == 0
    # shared layer 3 is full -> last full cacher = 1
    assert cfg.yoco_ref_layer(3) == 1
    model = GemmaModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    assert weights.layers[3].wk is None and weights.layers[2].wv is None
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    assert runner.cache.kv.shape[0] == L - 2


def test_yoco_paged_matches_dense():
    cfg = _yoco_cfg()
    model = GemmaModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(3), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    prompt = [int(x) for x in
              np.random.default_rng(4).integers(1, V - 1, 14)]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=len(prompt), block_table=[1],
        params=SamplingParams(temperature=0.0))])
    ids = jnp.asarray(prompt, jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)
    dense = model.forward(weights, ids, pos, _dense_yoco_attn(cfg, {}))
    np.testing.assert_allclose(np.asarray(out.logits)[0],
                               np.asarray(dense)[-1], atol=0.05, rtol=0.05)


def test_yoco_decode_steps_match():
    cfg = _yoco_cfg()
    model = GemmaModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(5), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    seq = [5, 9, 31, 2]
    out = runner.execute([SeqStepInput(
        query_tokens=seq, context_len=len(seq), block_table=[1, 2],
        params=SamplingParams(temperature=0.0))])
    for _ in range(4):
        seq.append(int(out.token_ids[0]))
        out = runner.execute([SeqStepInput(
            query_tokens=[seq[-1]], context_len=len(seq),
            block_table=[1, 2], params=SamplingParams(temperature=0.0))])
        ids = jnp.asarray(seq, jnp.int32)
        pos = jnp.arange(len(seq), dtype=jnp.int32)
        dense = model.forward(weights, ids, pos, _dense_yoco_attn(cfg, {}))
        np.testing.assert_allclose(np.asarray(out.logits)[0],
                                   np.asarray(dense)[-1],
                                   atol=0.05, rtol=0.05)


# ---------------------------------------------------------------------------
# Variable per-layer head_dim (Gemma4 26B/31B style)
# ---------------------------------------------------------------------------

def test_variable_head_dim_paged_matches_dense():
    cfg = ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I, num_layers=2,
        num_heads=NH, num_kv_heads=NKV, head_dim=16, max_model_len=64,
        architecture="gemma3", scale_embeddings=True,
        extra={"layer_head_dims": [8, 16], "attn_scale": 1.0})
    model = GemmaModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(8), dtype=jnp.float32)
    # layer 0 projections carry the smaller true dim
    assert weights.layers[0].wq.out_features == NH * 8
    assert weights.layers[1].wq.out_features == NH * 16
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    prompt = [int(x) for x in np.random.default_rng(9).integers(1, V - 1,
                                                                11)]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=len(prompt), block_table=[1],
        params=SamplingParams(temperature=0.0))])
    ids = jnp.asarray(prompt, jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)
    dense = model.forward(weights, ids, pos, dense_causal_attn(cfg))
    np.testing.assert_allclose(np.asarray(out.logits)[0],
                               np.asarray(dense)[-1], atol=0.05, rtol=0.05)


def test_variable_head_dim_decode_steps():
    cfg = ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I, num_layers=2,
        num_heads=NH, num_kv_heads=NKV, head_dim=16, max_model_len=64,
        architecture="gemma3", scale_embeddings=True,
        extra={"layer_head_dims": [8, 16], "attn_scale": 1.0})
    model = GemmaModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(10), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    seq = [5, 9, 31]
    out = runner.execute([SeqStepInput(
        query_tokens=seq, context_len=3, block_table=[1, 2],
        params=SamplingParams(temperature=0.0))])
    for _ in range(3):
        seq.append(int(out.token_ids[0]))
        out = runner.execute([SeqStepInput(
            query_tokens=[seq[-1]], context_len=len(seq),
            block_table=[1, 2], params=SamplingParams(temperature=0.0))])
        dense = model.forward(weights, jnp.asarray(seq, jnp.int32),
                              jnp.arange(len(seq), dtype=jnp.int32),
                              dense_causal_attn(cfg))
        np.testing.assert_allclose(np.asarray(out.logits)[0],
                                   np.asarray(dense)[-1],
                                   atol=0.05, rtol=0.05)


def test_yoco_fast_prefill_matches_full_rows():
    """Reduced-query fast prefill (shared layers compute one row/seq;
    reference attention/yoco.py:32) must be logit-identical to running
    every row through the shared layers."""
    cfg = _yoco_cfg()
    model = GemmaModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(7), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))

    def build(fast):
        r = ModelRunner(model, weights, ecfg, num_blocks=16,
                        use_pallas=False)
        if not fast:
            r._yoco_fast_active = lambda: False
        return r

    rng = np.random.default_rng(11)
    seqs = [
        SeqStepInput(query_tokens=[int(x) for x in rng.integers(1, V - 1, 14)],
                     context_len=14, block_table=[1],
                     params=SamplingParams(temperature=0.0)),
        SeqStepInput(query_tokens=[int(x) for x in rng.integers(1, V - 1, 6)],
                     context_len=6, block_table=[2],
                     params=SamplingParams(temperature=0.0)),
    ]
    fast = build(True)
    slow = build(False)
    assert fast._yoco_fast_active() and not slow._yoco_fast_active()
    o_fast = fast.execute(seqs)
    o_slow = slow.execute(seqs)
    # unjitted the two paths are BIT-exact (verified while landing this);
    # under jit the sliced and unsliced programs compile to different
    # instruction schedules whose f32 rounding drifts ~1e-3 — the same
    # noise floor both paths show against the dense oracle above
    np.testing.assert_allclose(np.asarray(o_fast.logits),
                               np.asarray(o_slow.logits),
                               atol=5e-3, rtol=5e-3)

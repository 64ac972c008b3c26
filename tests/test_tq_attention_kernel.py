# SPDX-License-Identifier: Apache-2.0
"""TQ-fused paged attention kernel vs the quantized reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.attention.metadata import build_metadata
from vllm_metal_tpu.attention.quant_kv_cache import QuantPagedKVCache
from vllm_metal_tpu.config import CacheConfig, ModelConfig
from vllm_metal_tpu.ops.paged_attention import paged_attention_quant_ref
from vllm_metal_tpu.ops.paged_attention_tq_kernel import tq_paged_attention


def setup(query_lens, context_lens, *, qh=4, kvh=2, d=128, bs=32, nb=32,
          codec_k="q8_0", codec_v="q3_0", seed=0):
    rng = np.random.default_rng(seed)
    cfg = ModelConfig(num_layers=2, num_kv_heads=kvh, head_dim=d,
                      num_heads=qh)
    ccfg = CacheConfig(block_size=bs, kv_quant_k=codec_k,
                       kv_quant_v=codec_v)
    cache = QuantPagedKVCache.allocate(cfg, ccfg, nb)

    tables, nxt = [], 1
    for cl in context_lens:
        nblk = -(-cl // bs)
        tables.append(list(range(nxt, nxt + nblk)))
        nxt += nblk
    total = sum(query_lens)
    token_pad = max(8, -(-total // 8) * 8)
    md = build_metadata(
        query_lens=query_lens, context_lens=context_lens,
        block_tables=tables, block_size=bs, token_pad=token_pad,
        seq_pad=max(4, len(query_lens)), max_blocks_per_seq=8)

    # fill the cache through real quantize-on-write for each sequence
    for i, (cl, tb) in enumerate(zip(context_lens, tables)):
        k = jnp.asarray(rng.standard_normal((cl, kvh, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((cl, kvh, d)), jnp.float32)
        slots = jnp.asarray(
            [tb[p // bs] * bs + p % bs for p in range(cl)], jnp.int32)
        cache = cache.write(1, k, v, slots)
    q = jnp.asarray(rng.standard_normal((token_pad, qh, d)),
                    jnp.float32).astype(jnp.bfloat16)
    return q, cache, md, total


def run_case(query_lens, context_lens, atol=0.06, **kw):
    q, cache, md, total = setup(query_lens, context_lens, **kw)
    want = paged_attention_quant_ref(q, cache, 1, md)
    got = tq_paged_attention(q, cache, md, 1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:total],
        np.asarray(want, np.float32)[:total], atol=atol, rtol=0.05)


def test_tq_kernel_decode():
    run_case([1, 1], [20, 45])


def test_tq_kernel_prefill():
    run_case([24], [24])


def test_tq_kernel_mixed():
    run_case([1, 10, 1], [33, 10, 64])


def test_tq_kernel_q4_k_codec():
    run_case([1, 6], [17, 30], codec_k="q4_0", atol=0.1)


def test_tq_kernel_sliding_window():
    q, cache, md, total = setup([1, 9], [70, 30])
    want = paged_attention_quant_ref(q, cache, 1, md, sliding_window=24)
    got = tq_paged_attention(q, cache, md, 1, sliding_window=24,
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:total],
        np.asarray(want, np.float32)[:total], atol=0.06, rtol=0.05)


def test_tq_kernel_softcap():
    q, cache, md, total = setup([1, 9], [40, 30])
    want = paged_attention_quant_ref(q, cache, 1, md, logit_softcap=30.0)
    got = tq_paged_attention(q, cache, md, 1, logit_softcap=30.0,
                             interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:total],
        np.asarray(want, np.float32)[:total], atol=0.06, rtol=0.05)


def test_tq_kernel_sinks():
    """Gemma-style attention sinks join the softmax denominator."""
    q, cache, md, total = setup([2, 1], [25, 50], qh=4, kvh=2)
    sinks = jnp.asarray([0.5, -0.3, 1.2, 0.0], jnp.float32)
    want = paged_attention_quant_ref(q, cache, 1, md, sinks=sinks)
    got = tq_paged_attention(q, cache, md, 1, sinks=sinks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:total],
        np.asarray(want, np.float32)[:total], atol=0.06, rtol=0.05)


def test_tq_kernel_sinks_softcap_window():
    """All three features compose (the reference's Gemma TQ serve path)."""
    q, cache, md, total = setup([1, 12], [60, 40], qh=4, kvh=2)
    sinks = jnp.asarray([0.2, 0.9, -0.5, 0.1], jnp.float32)
    want = paged_attention_quant_ref(
        q, cache, 1, md, sinks=sinks, logit_softcap=50.0,
        sliding_window=32)
    got = tq_paged_attention(
        q, cache, md, 1, sinks=sinks, logit_softcap=50.0,
        sliding_window=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:total],
        np.asarray(want, np.float32)[:total], atol=0.06, rtol=0.05)


def test_tq_kernel_q5_codec_both_lo_planes():
    """q5_0 K (4+1 planes) + q3_0 V (2+1): the 7-pool packed DMA path."""
    run_case([1, 6], [17, 30], codec_k="q5_0", atol=0.08)


def test_tq_kernel_uint2_codec():
    run_case([1, 4], [21, 12], codec_k="uint2", codec_v="q2_0", atol=0.3)

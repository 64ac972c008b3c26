# SPDX-License-Identifier: Apache-2.0
"""Pallas unified paged attention kernel vs jnp reference (interpret mode).

Reference test model: tier-2 kernel-contract tests (SURVEY.md §4) —
synthetic tensors, oracle = paged_attention_ref.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.attention.metadata import build_metadata
from vllm_metal_tpu.ops.paged_attention import paged_attention_ref
from vllm_metal_tpu.ops.paged_attention_kernel import paged_attention


def setup_case(query_lens, context_lens, *, qh=4, kvh=2, d=128, bs=32,
               nb=32, seed=0, token_pad=None, seq_pad=None, mb=8):
    rng = np.random.default_rng(seed)
    s = len(query_lens)
    seq_pad = seq_pad or max(4, s)
    total = sum(query_lens)
    token_pad = token_pad or max(8, -(-total // 8) * 8)
    # assign disjoint block tables
    tables = []
    nxt = 1
    for cl in context_lens:
        nblk = -(-cl // bs)
        tables.append(list(range(nxt, nxt + nblk)))
        nxt += nblk
    assert nxt <= nb
    md = build_metadata(
        query_lens=query_lens, context_lens=context_lens,
        block_tables=tables, block_size=bs, token_pad=token_pad,
        seq_pad=seq_pad, max_blocks_per_seq=mb)

    # stacked 2-layer pools: the kernel reads layer 1 (also covers the
    # traced layer-index path); layer 0 is decoy data
    k_cache = jnp.asarray(rng.standard_normal((2, kvh, nb, bs, d)),
                          dtype=jnp.float32).astype(jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((2, kvh, nb, bs, d)),
                          dtype=jnp.float32).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((token_pad, qh, d)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    return q, k_cache, v_cache, md, total


def run_both(q, k, v, md, **kw):
    want = paged_attention_ref(q, k[1], v[1], md, **kw)
    # kernel input is the split pool [L, NB, 2, KH, bs, D]
    kv = jnp.stack([k, v], axis=1).transpose(0, 3, 1, 2, 4, 5)
    got = paged_attention(q, kv, md, layer_idx=1, interpret=True, **kw)
    return got, want


def check(got, want, total, atol=0.02):
    got = np.asarray(got, np.float32)[:total]
    want = np.asarray(want, np.float32)[:total]
    np.testing.assert_allclose(got, want, atol=atol, rtol=0.02)


@pytest.mark.parametrize("case", [
    ([1], [7]),                       # single decode
    ([1, 1, 1], [5, 33, 64]),         # decode batch, varied ctx
    ([12], [12]),                     # small prefill
    ([40], [40]),                     # prefill crossing block boundary
])
def test_kernel_matches_reference_basic(case):
    q, k, v, md, total = setup_case(*case)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


def test_kernel_mixed_batch():
    q, k, v, md, total = setup_case(
        [1, 1, 20, 7], [9, 45, 20, 30], token_pad=32)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


def test_kernel_long_prefill_multi_item():
    # query length > BQ(128): multiple work items per seq
    q, k, v, md, total = setup_case([150], [150], bs=32, nb=16,
                                    token_pad=152, mb=8)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


def test_kernel_prefill_continuation():
    # chunked prefill: 20 new tokens on top of 90 cached
    q, k, v, md, total = setup_case([20], [110], bs=32, nb=16, mb=8)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


def test_kernel_gqa_group_sizes():
    for qh, kvh in [(4, 4), (8, 2), (8, 1)]:
        q, k, v, md, total = setup_case([1, 9], [40, 9], qh=qh, kvh=kvh,
                                        seed=qh)
        got, want = run_both(q, k, v, md)
        check(got, want, total)


def test_kernel_sliding_window():
    q, k, v, md, total = setup_case([1, 17], [70, 30], bs=32)
    got, want = run_both(q, k, v, md, sliding_window=24)
    check(got, want, total)


def test_kernel_sliding_window_tile_skip():
    # context far beyond the window: start-tile skip must not change results
    q, k, v, md, total = setup_case([1], [200], bs=32, nb=16, mb=8)
    got, want = run_both(q, k, v, md, sliding_window=16)
    check(got, want, total)


def test_kernel_softcap():
    q, k, v, md, total = setup_case([5, 1], [5, 22])
    got, want = run_both(q, k, v, md, logit_softcap=30.0)
    check(got, want, total)


def test_kernel_sinks():
    qh = 4
    q, k, v, md, total = setup_case([3, 1], [10, 15], qh=qh)
    sinks = jnp.asarray(np.random.default_rng(9).standard_normal(qh),
                        dtype=jnp.float32)
    got, want = run_both(q, k, v, md, sinks=sinks)
    check(got, want, total)


def test_kernel_scale_override():
    q, k, v, md, total = setup_case([4], [4])
    got, want = run_both(q, k, v, md, scale=0.05)
    check(got, want, total)


@pytest.mark.parametrize("bs", [16, 64, 128])
def test_kernel_block_sizes(bs):
    q, k, v, md, total = setup_case([1, 10], [33, 10], bs=bs, nb=16, mb=16)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


@pytest.mark.parametrize("d", [64, 96, 80])
def test_kernel_small_head_dims(d):
    """Sub-128 head dims (VERDICT r1 item 2): Mosaic pads the lane dim;
    the reference templates heads {64, 80, 96, ...}
    (pagedattention.metal:2310-2339)."""
    q, k, v, md, total = setup_case([1, 5, 1], [40, 13, 70], d=d)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


@pytest.mark.parametrize("d", [64, 96])
def test_kernel_small_head_dims_decode(d):
    q, k, v, md, total = setup_case([1, 1, 1, 1], [7, 33, 64, 100],
                                    d=d, qh=8, kvh=2)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


def test_kernel_small_head_dim_window_sinks():
    q, k, v, md, total = setup_case([1, 9], [50, 30], d=64, qh=4, kvh=4)
    sinks = jnp.asarray(np.linspace(-1, 1, 4), jnp.float32)
    got, want = run_both(q, k, v, md, sliding_window=32, sinks=sinks)
    check(got, want, total)


def test_head_dim_192():
    """1.5-lane-tile head dim (DeepSeek-V2-lite class); reference
    templates it explicitly (pagedattention.metal:2310-2339)."""
    q, k, v, md, total = setup_case([1, 7, 1], [30, 12, 60], d=192)
    got, want = run_both(q, k, v, md)
    check(got, want, total)


def test_head_dim_192_gqa_window():
    q, k, v, md, total = setup_case([5, 1], [25, 40], d=192, qh=8, kvh=2)
    got, want = run_both(q, k, v, md, sliding_window=16)
    check(got, want, total)

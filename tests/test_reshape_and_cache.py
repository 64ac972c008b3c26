# SPDX-License-Identifier: Apache-2.0
"""Aliased Pallas KV write vs the functional scatter oracle.

Reference test model: kernel-contract tests (SURVEY.md §4); oracle is
``PagedKVCache.write``'s scatter path (always used on CPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.ops.reshape_and_cache import reshape_and_cache


def scatter_oracle(kv, k_new, v_new, slots, layer, bs):
    out = np.array(kv)   # [L, NB, 2, KH, bs, D]
    for i, s in enumerate(np.array(slots)):
        if s < 0:
            continue
        out[layer, s // bs, 0, :, s % bs] = k_new[i]
        out[layer, s // bs, 1, :, s % bs] = v_new[i]
    return out


@pytest.mark.parametrize("slots", [
    [0],                                  # single decode token
    [5, 6, 7, 8, 9],                      # run crossing an 8-row tile
    [3, -1, 20, 21, -1, 22],              # pad tokens interleaved
    list(range(30, 70)),                  # run crossing a block boundary
    [47, 0, 16],                          # non-monotonic block hops
])
def test_rac_matches_scatter(slots):
    rng = np.random.default_rng(len(slots))
    L, KH, NB, BS, D = 2, 2, 5, 16, 128
    kv = jnp.asarray(rng.standard_normal((L, NB, 2, KH, BS, D)),
                     jnp.float32)
    t = len(slots)
    t_pad = -(-t // 8) * 8
    k_new = rng.standard_normal((t_pad, KH, D)).astype(np.float32)
    v_new = rng.standard_normal((t_pad, KH, D)).astype(np.float32)
    sl = np.full(t_pad, -1, np.int32)
    sl[:t] = slots
    for layer in (0, 1):
        got = reshape_and_cache(
            jnp.array(kv), jnp.asarray(k_new), jnp.asarray(v_new),
            jnp.asarray(sl), layer, block_size=BS, interpret=True)
        want = scatter_oracle(kv, k_new, v_new, sl, layer, BS)
        np.testing.assert_allclose(np.asarray(got), want, atol=0)


@pytest.mark.parametrize("d", [64, 96])
def test_rac_small_head_dim(d):
    """Sub-128 head dims ride the same aliased write (lane-padded)."""
    rng = np.random.default_rng(d)
    L, KH, NB, BS = 2, 2, 5, 16
    kv = jnp.asarray(rng.standard_normal((L, NB, 2, KH, BS, d)),
                     jnp.float32)
    slots = [3, -1, 20, 21, 22, 40]
    t_pad = 8
    k_new = rng.standard_normal((t_pad, KH, d)).astype(np.float32)
    v_new = rng.standard_normal((t_pad, KH, d)).astype(np.float32)
    sl = np.full(t_pad, -1, np.int32)
    sl[:len(slots)] = slots
    got = reshape_and_cache(
        jnp.array(kv), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(sl), 1, block_size=BS, interpret=True)
    want = scatter_oracle(kv, k_new, v_new, sl, 1, BS)
    np.testing.assert_allclose(np.asarray(got), want, atol=0)

# SPDX-License-Identifier: Apache-2.0
"""Chained-call timing of the group-dot quant matmul (one jit, N calls).

Unlike qmm_bench's lax.scan-over-stacked-layers (which measures the
stacked-indexing path), this chains N independent calls on N separate
weights — the pure kernel cost with no scan carry or dynamic layer
indexing in the way.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from vllm_metal_tpu.ops.quant_matmul import QuantLinear, _group_matmul


def make_q4(n, k, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.bits(k1, (k // 2, n), jnp.uint8)
    scales = (jax.random.uniform(k2, (k // 32, n)) * 0.01).astype(jnp.bfloat16)
    biases = (jax.random.uniform(k3, (k // 32, n)) * -0.08).astype(jnp.bfloat16)
    return QuantLinear(kind="q4", w=packed, scales=scales, biases=biases,
                       group_size=32)


def bench(name, n, k, m, L, quantized, iters=6):
    qls = [make_q4(n, k, seed=i) for i in range(L)]
    x0 = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)

    @jax.jit
    def chain(x, qls):
        out = jnp.zeros((m, n), jnp.bfloat16)
        for ql in qls:
            y = _group_matmul(x, ql, quantized=quantized)
            out = out + y
            x = x + out[:, :k] * 1e-9 if n >= k else x + jnp.pad(
                out, ((0, 0), (0, k - n))) * 1e-9
        # tiny output: through the axon tunnel block_until_ready does NOT
        # wait for device completion (measured "8 TB/s") and np.asarray of
        # MB-size buffers is D2H-bound (~10-30 MB/s) — fetch 8 lanes.
        return out[0, :8]

    np.asarray(chain(x0, qls))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(chain(x0, qls))
        best = min(best, time.perf_counter() - t0)
    wb = sum(x.size * x.dtype.itemsize for ql in qls
             for x in jax.tree.leaves(ql))
    print(f"{name:14s} [{k:6d}->{n:6d}] m={m:4d} q={int(quantized)} x{L}: "
          f"{best / L * 1e3:8.3f} ms/call  bw={wb / best / 1e9:5.0f} GB/s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    args = ap.parse_args()
    L = args.layers
    for q in (True, False):
        bench("gateup", 28672, 4096, 16, L, q)
    for m in (8, 16, 32, 64, 128):
        bench("gateup", 28672, 4096, m, L, True)
    bench("qkv", 6144, 4096, 16, L, True)
    bench("down", 4096, 14336, 16, L, True)


if __name__ == "__main__":
    main()

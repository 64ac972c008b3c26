# SPDX-License-Identifier: Apache-2.0
"""Supergroup quant-matmul sweep, robust to host-tunnel overhead.

One jit = ``repeats`` x (scan over L stacked layers); the tiny 8-lane
fetch plus a separately measured null-dispatch roundtrip bound the fixed
cost, so per-layer time comes from the slope, not a single dispatch.
(Round-4 note: the axon tunnel roundtrip grew to ~28 ms, so the older
per-call tools read pure overhead at decode shapes.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

import jax.numpy as jnp
import numpy as np

from vllm_metal_tpu.ops.quant_matmul import QuantLinear, _group_matmul


def make_q4_stacked(n, k, L, seed=0):
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def build(key):
        k1, k2, k3 = jax.random.split(key, 3)
        packed = jax.random.bits(k1, (L, k // 2, n), jnp.uint8)
        scales = (jax.random.uniform(k2, (L, k // 32, n), jnp.float32)
                  * 0.01).astype(jnp.bfloat16)
        biases = (jax.random.uniform(k3, (L, k // 32, n), jnp.float32)
                  * -0.08).astype(jnp.bfloat16)
        return QuantLinear(kind="q4", w=packed, scales=scales,
                           biases=biases, group_size=32)

    return jax.block_until_ready(build(key))


def null_roundtrip(iters=8):
    @jax.jit
    def f(x):
        return x * 2.0
    x = jnp.ones((8,), jnp.float32)
    np.asarray(f(x))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(name, n, k, m, L, repeats, quantized, sg, overhead, iters=5):
    ql = make_q4_stacked(n, k, L)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)

    @jax.jit
    def run(x, ql):
        def rep(x, _):
            def body(c, i):
                y = _group_matmul(c, ql.at_layer(i), quantized=quantized,
                                  sg=sg)
                if y.shape[1] >= c.shape[1]:
                    nxt = c + y[:, : c.shape[1]] * 1e-6
                else:
                    nxt = c + jnp.pad(
                        y, ((0, 0), (0, c.shape[1] - y.shape[1]))) * 1e-6
                return nxt.astype(c.dtype), ()
            x, _ = jax.lax.scan(body, x,
                                jnp.arange(L, dtype=jnp.int32))
            return x, ()
        x, _ = jax.lax.scan(rep, x, (), length=repeats)
        return x[0, :8]

    np.asarray(run(x0, ql))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(x0, ql))
        best = min(best, time.perf_counter() - t0)
    dev = best - overhead
    per = dev / (L * repeats)
    wb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(ql)) / L
    print(f"{name:8s} [{k:6d}->{n:6d}] m={m:4d} q={int(quantized)} "
          f"sg={sg}: {per * 1e3:7.3f} ms/call  bw={wb / per / 1e9:5.0f} "
          f"GB/s   (total {best * 1e3:6.1f} ms, ovh {overhead * 1e3:.1f})",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=16)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--sg", default="1,2,4,8")
    ap.add_argument("--shapes", default="gateup,down,qkv")
    ap.add_argument("--exact", action="store_true")
    args = ap.parse_args()
    ovh = null_roundtrip()
    print(f"null roundtrip: {ovh * 1e3:.2f} ms", flush=True)
    h, i_sz = 4096, 14336
    all_shapes = {"qkv": (6144, h), "gateup": (2 * i_sz, h),
                  "down": (h, i_sz), "wo": (h, h)}
    for s in args.shapes.split(","):
        n, k = all_shapes[s]
        for sg in [int(v) for v in args.sg.split(",")]:
            bench(s, n, k, args.m, args.layers, args.repeats,
                  not args.exact, sg, ovh)


if __name__ == "__main__":
    main()

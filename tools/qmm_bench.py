# SPDX-License-Identifier: Apache-2.0
"""Per-shape bandwidth of the fused q4 matmul under a stacked-layer scan.

Measures ONE matmul shape scanned over L stacked layers (the real decode
access pattern: every layer's weights stream from HBM exactly once per
step), reporting effective weight bandwidth per shape.  Isolates kernel
efficiency from the rest of the decode step.
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

from vllm_metal_tpu.ops.quant_matmul import QuantLinear, linear


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


def bench_shape(name, n, k, L, tokens, iters=8):
    ql = make_q4_stacked(n, k, L)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (tokens, k), jnp.bfloat16)

    @jax.jit
    def scan(x, ql):
        def body(c, i):
            y = linear(c, ql.at_layer(i))
            # fold back to input width to serialize layers
            if y.shape[1] >= c.shape[1]:
                nxt = c + y[:, : c.shape[1]] * 1e-6
            else:
                nxt = c + jnp.pad(
                    y, ((0, 0), (0, c.shape[1] - y.shape[1]))) * 1e-6
            return nxt.astype(c.dtype), ()
        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return x

    np.asarray(scan(x0, ql))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(scan(x0, ql))
        best = min(best, time.perf_counter() - t0)
    wb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(ql))
    per = best / L
    print(f"{name:24s} [{k:6d}->{n:6d}] x{L}: {per * 1e3:7.3f} ms/layer  "
          f"bw={wb / best / 1e9:5.0f} GB/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--shapes", default="qkv,wq,wk,wo,gateup,gate,down,lm")
    args = ap.parse_args()
    L, t = args.layers, args.tokens
    h, i_sz, v = 4096, 14336, 128256
    all_shapes = {
        "wq": (h, h), "wk": (1024, h), "wo": (h, h),
        "qkv": (h + 2 * 1024, h), "gate": (i_sz, h),
        "gateup": (2 * i_sz, h), "down": (h, i_sz), "lm": (v, h),
    }
    for s in args.shapes.split(","):
        n, k = all_shapes[s]
        # lm head is huge: scan only 2 copies, but note the reduced
        # amortization of fixed dispatch cost in the printed label.
        ll = 2 if s == "lm" else L
        bench_shape(s + ("(L=2)" if s == "lm" else ""), n, k, ll, t)


if __name__ == "__main__":
    main()

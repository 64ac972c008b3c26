# SPDX-License-Identifier: Apache-2.0
"""Cost of the model's stacked-weight lax.scan matmul path at 8B shapes.

The decode step scans over stacked per-layer weights; scan delivers each
layer's leaves by dynamic-slice, which XLA must MATERIALIZE (copy) before
the Pallas matmul custom-calls can read them.  This measures the full
7-matmul layer chain over 32 stacked layers to quantify that overhead
against the weight-read roofline (~140MB/layer -> ~0.17ms at 819GB/s).
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from vllm_metal_tpu.ops.quant_matmul import QuantLinear, linear


def make_q4(n, k, seed):
    """Random packed q4 built ON DEVICE (same memory traffic as real Q4_K)."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.bits(k1, (k // 2, n), jnp.uint8)
    scales = (jax.random.uniform(k2, (k // 32, n), jnp.float32) * 0.01
              ).astype(jnp.bfloat16)
    biases = (jax.random.uniform(k3, (k // 32, n), jnp.float32) * -0.08
              ).astype(jnp.bfloat16)
    return QuantLinear(kind="q4", w=packed, scales=scales, biases=biases,
                       group_size=32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--mode", choices=("slice", "indexed", "both"),
                    default="both",
                    help="slice: scan over stacked leaves (XLA dynamic-slice "
                         "materializes each layer); indexed: scan over the "
                         "layer index, kernels select the layer via a "
                         "prefetched scalar (no materialization)")
    args = ap.parse_args()
    t, L = args.tokens, args.layers
    h, i_sz = 4096, 14336
    kv = 1024

    @jax.jit
    def build():
        def one(seed):
            return dict(
                wq=make_q4(h, h, seed), wk=make_q4(kv, h, seed + 1),
                wv=make_q4(kv, h, seed + 2), wo=make_q4(h, h, seed + 3),
                gate=make_q4(i_sz, h, seed + 4), up=make_q4(i_sz, h, seed + 5),
                down=make_q4(h, i_sz, seed + 6))
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[one(7 * i) for i in range(L)])

    print("building stacked weights...", file=sys.stderr, flush=True)
    stacked = jax.block_until_ready(build())
    per_layer = sum(x.size * x.dtype.itemsize
                    for x in jax.tree.leaves(stacked)) / L
    print(f"per-layer weight bytes: {per_layer / 1e6:.1f} MB",
          file=sys.stderr, flush=True)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (t, h), jnp.bfloat16)

    def layer_body(x, lw):
        q = linear(x, lw["wq"])
        k = linear(x, lw["wk"])
        v = linear(x, lw["wv"])
        o = linear(q, lw["wo"])
        g = linear(x + o, lw["gate"])
        u = linear(x + o, lw["up"])
        d = linear((jax.nn.silu(g.astype(jnp.float32)) * u
                    ).astype(jnp.bfloat16), lw["down"])
        # keep wk/wv live (a *0 contribution would be DCE'd)
        kvc = jnp.pad(k + v, ((0, 0), (0, x.shape[1] - k.shape[1])))
        return (x + o + d + kvc * 1e-6).astype(x.dtype), None

    @jax.jit
    def scan_slice(x, stacked):
        x, _ = jax.lax.scan(lambda c, lw: layer_body(c, lw), x, stacked)
        return x

    @jax.jit
    def scan_indexed(x, stacked):
        def body(c, i):
            lw = {name: ql.at_layer(i) for name, ql in stacked.items()}
            return layer_body(c, lw)
        x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
        return x

    total_w = per_layer * L
    fns = {"slice": scan_slice, "indexed": scan_indexed}
    modes = ("slice", "indexed") if args.mode == "both" else (args.mode,)
    for mode in modes:
        fn = fns[mode]
        # np.asarray D2H fetch is the only reliable device sync on the axon
        # tunnel backend (block_until_ready returns early there).
        np.asarray(fn(x0, stacked))
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            out = fn(x0, stacked)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{L}-layer matmul scan [{mode}]: {best * 1e3:.2f} ms  "
              f"weights={total_w / 1e9:.2f} GB  "
              f"bw={total_w / best / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()

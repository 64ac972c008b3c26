# SPDX-License-Identifier: Apache-2.0
"""Raw Pallas DMA-engine microbenchmark: stream blocks HBM->VMEM.

Isolates the attention kernel's KV fetch pattern (dynamic block indices,
ring of outstanding descriptors) from all compute, to measure what the
DMA engine actually sustains.  Usage: python tools/dma_bench.py
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fn(nb, rows, d, n_fetch, nbuf, order):
    def kernel(idx_ref, pool, out, buf, sem):
        def start(i, slot):
            pltpu.make_async_copy(
                pool.at[idx_ref[i]], buf.at[slot], sem.at[slot]).start()

        def wait(i, slot):
            pltpu.make_async_copy(
                pool.at[idx_ref[i]], buf.at[slot], sem.at[slot]).wait()

        for i in range(min(nbuf, n_fetch)):
            start(i, i)

        def body(i, acc):
            slot = jax.lax.rem(i, nbuf)
            wait(i, slot)
            acc = acc + buf[slot, :8]           # touch 1 vreg (forces order)
            nxt = i + nbuf

            @pl.when(nxt < n_fetch)
            def _():
                start(nxt, slot)
            return acc

        acc = jax.lax.fori_loop(
            0, n_fetch, body, jnp.zeros((8, d), jnp.float32))
        out[...] = acc

    @jax.jit
    def fn(pool, idx):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, rows, d), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((8, d), jnp.float32),
        )(idx, pool)

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024)   # sublanes per block
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--nb", type=int, default=512)
    ap.add_argument("--nbuf", type=int, default=4)
    ap.add_argument("--mb", type=float, default=64.0)   # total MB to move
    ap.add_argument("--order", default="seq", choices=["seq", "scat"])
    args = ap.parse_args()

    import numpy as np
    blk_bytes = args.rows * args.d * 2
    n_fetch = int(args.mb * 1e6 // blk_bytes)
    pool = jax.random.normal(
        jax.random.PRNGKey(0), (args.nb, args.rows, args.d), jnp.bfloat16)
    rng = np.random.default_rng(0)
    if args.order == "seq":
        idx = np.arange(n_fetch) % args.nb
    else:
        idx = rng.integers(0, args.nb, n_fetch)
    idx = jnp.asarray(idx, jnp.int32)

    fn = make_fn(args.nb, args.rows, args.d, n_fetch, args.nbuf, args.order)
    out = fn(pool, idx)
    jax.block_until_ready(out)
    # sync EVERY call: successive async dispatches overlap device execution
    # with host dispatch AND each other, inflating apparent bandwidth past
    # the physical HBM limit (saw 2.9 TB/s on an 819 GB/s part)
    iters = 10
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(pool, idx)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    dt = best
    total = n_fetch * blk_bytes
    print(f"block={blk_bytes // 1024}KB n={n_fetch} nbuf={args.nbuf} "
          f"order={args.order}: {dt * 1e3:.3f} ms  "
          f"bw={total / dt / 1e9:.1f} GB/s")


if __name__ == "__main__":
    main()

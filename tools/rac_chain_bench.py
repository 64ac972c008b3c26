# SPDX-License-Identifier: Apache-2.0
"""Marginal on-device cost of the reshape_and_cache KV-write kernel.

Chains N serialized invocations inside one jitted program (the pool
threads through the scan carry), so the host-dispatch overhead that
poisons naive per-call timing is paid once.  Llama-3-8B decode shape:
L=32 pool, 16 tokens/step, kvh=8, d=128.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp

from vllm_metal_tpu.ops.reshape_and_cache import reshape_and_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=2048)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    t, kvh, d, bs = args.tokens, args.kvh, args.d, args.bs
    key = jax.random.PRNGKey(0)
    pool = jnp.zeros((args.layers, args.blocks, 2, kvh, bs, d),
                     jnp.bfloat16)
    k = jax.random.normal(key, (t, kvh, d), jnp.bfloat16)
    v = jax.random.normal(key, (t, kvh, d), jnp.bfloat16)
    # decode pattern: each token appends to a different sequence's block
    slots = jnp.arange(t, dtype=jnp.int32) * bs * 3 + 17

    def chain(n):
        @jax.jit
        def fn(pool, k, v):
            def body(pool, li):
                return reshape_and_cache(
                    pool, k, v, slots, li % args.layers, block_size=bs), ()
            pool, _ = jax.lax.scan(body, pool,
                                   jnp.arange(n, dtype=jnp.int32))
            return pool
        return fn

    t1 = None
    for n in (1, args.chain):
        fn = chain(n)
        out = fn(pool, k, v)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            out = fn(pool, k, v)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"chain={n}: {best * 1e3:.3f} ms total", flush=True)
        if n == 1:
            t1 = best
        else:
            marg = (best - t1) / (n - 1)
            print(f"marginal per-call: {marg * 1e3:.3f} ms "
                  f"(x{args.layers} layers = "
                  f"{marg * 1e3 * args.layers:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""Marginal per-invocation cost of the attention kernel ON DEVICE.

Chains N serialized kernel calls inside one jitted program (each call's q
depends on the previous output), so host dispatch overhead is paid once.
Compares against the single-call microbench to separate device time from
per-dispatch overhead (the axon tunnel adds ~0.25-1ms per host dispatch,
which poisons naive per-call timing).
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp

from vllm_metal_tpu.attention.metadata import build_metadata
from vllm_metal_tpu.ops.paged_attention_kernel import paged_attention


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--qh", type=int, default=32)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    b, ctx, bs = args.batch, args.ctx, args.bs
    qls, ctxs = [1] * b, [ctx] * b
    tp = max(8, -(-b // 8) * 8)
    tables, nxt = [], 1
    for cl in ctxs:
        nb = -(-(cl + 8) // bs)
        tables.append(list(range(nxt, nxt + nb)))
        nxt += nb
    md = build_metadata(query_lens=qls, context_lens=ctxs,
                        block_tables=tables, block_size=bs, token_pad=tp,
                        seq_pad=max(64, b), max_blocks_per_seq=
                        max(len(t) for t in tables) + 1)
    key = jax.random.PRNGKey(0)
    kc = jax.random.normal(key, (2, nxt + 1, 2, args.kvh, bs, args.d),
                           jnp.bfloat16)
    q0 = jax.random.normal(key, (tp, args.qh, args.d), jnp.bfloat16)

    def chain(n):
        @jax.jit
        def fn(q, kv):
            def body(q, _):
                o = paged_attention(q, kv, md, 1)
                # serialize: next q depends on this output
                return (q * 0.5 + o * 0.5).astype(q.dtype), ()
            q, _ = jax.lax.scan(body, q, None, length=n)
            return q
        return fn

    for n in (1, args.chain):
        fn = chain(n)
        out = fn(q0, kc)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(10):
            t0 = time.perf_counter()
            out = fn(q0, kc)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"chain={n}: {best * 1e3:.3f} ms total", flush=True)
        if n == 1:
            t1 = best
        else:
            marg = (best - t1) / (n - 1)
            kvb = sum(cl * args.kvh * args.d * 2 * 2 for cl in ctxs)
            print(f"marginal per-call: {marg * 1e3:.3f} ms  "
                  f"bw={kvb / marg / 1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()

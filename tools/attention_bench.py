# SPDX-License-Identifier: Apache-2.0
"""Paged-attention kernel microbenchmark (reference: tools/attention_bench_utils.py).

Usage: python tools/attention_bench.py [--batch 16] [--ctx 1024] [--heads 32]
Prints per-call latency and achieved KV bandwidth for decode and prefill
shapes.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from vllm_metal_tpu.attention.metadata import build_metadata
from vllm_metal_tpu.ops.paged_attention_kernel import paged_attention


def bench_case(name, query_lens, context_lens, qh, kvh, d, bs, iters=30):
    total = sum(query_lens)
    token_pad = max(8, -(-total // 8) * 8)
    tables, nxt = [], 1
    for cl in context_lens:
        nblk = -(-(cl + 8) // bs)
        tables.append(list(range(nxt, nxt + nblk)))
        nxt += nblk
    md = build_metadata(
        query_lens=query_lens, context_lens=context_lens,
        block_tables=tables, block_size=bs, token_pad=token_pad,
        seq_pad=max(64, len(query_lens)),
        max_blocks_per_seq=max(len(t) for t in tables) + 1)
    key = jax.random.PRNGKey(0)
    kc = jax.random.normal(key, (2, nxt + 1, 2, kvh, bs, d), jnp.bfloat16)
    q = jax.random.normal(key, (token_pad, qh, d), jnp.bfloat16)

    fn = jax.jit(lambda q, kv: paged_attention(q, kv, md, 1))
    out = fn(q, kc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q, kc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    kv_bytes = sum(cl * kvh * d * 2 * 2 for cl in context_lens)
    print(f"{name}: {dt * 1e3:.3f} ms  "
          f"kv={kv_bytes / 1e6:.1f}MB  bw={kv_bytes / dt / 1e9:.1f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--qh", type=int, default=32)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--bs", type=int, default=64)
    args = ap.parse_args()

    bench_case("decode", [1] * args.batch, [args.ctx] * args.batch,
               args.qh, args.kvh, 128, args.bs)
    bench_case("decode-long", [1] * max(1, args.batch // 4),
               [args.ctx * 4] * max(1, args.batch // 4),
               args.qh, args.kvh, 128, args.bs)
    bench_case("prefill", [args.ctx], [args.ctx],
               args.qh, args.kvh, 128, args.bs)
    bench_case("mixed", [1] * (args.batch - 1) + [256],
               [args.ctx] * (args.batch - 1) + [256],
               args.qh, args.kvh, 128, args.bs)


if __name__ == "__main__":
    main()

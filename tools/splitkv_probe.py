# SPDX-License-Identifier: Apache-2.0
"""Split-KV (flash-decoding) decision probe: batch-1 long-context decode.

The reference ships a kv-partition + reduce variant (PARTITION_SIZE=512,
``/root/reference/vllm_metal/metal/paged_ops.cpp:342``) worth -33%
latency at conc=1/8K on Metal, where a single-sequence decode leaves
most GPU cores idle.  On a v5e there is ONE sequential TensorCore — the
equivalent win would have to come from deeper DMA pipelining, which the
unified kernel already gets from its in-kernel double-buffered KV tile
loop.  This probe measures what a partitioned variant could possibly
recover: batch-1 decode attention time vs the HBM roofline for its KV
stream, across context lengths.

    python tools/splitkv_probe.py [--ctx 8192] [--heads 8] [--kvh 8]

Protocol: chained in-jit kernel calls (fori_loop with a data
dependency), tiny output fetch (docs/kernels.md measurement
discipline).
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

from vllm_metal_tpu.attention.metadata import build_metadata
from vllm_metal_tpu.ops.paged_attention_kernel import paged_attention


def probe(ctx: int, qh: int, kvh: int, d: int = 128, bs: int = 64,
          iters: int = 64):
    nblk = -(-ctx // bs)
    md = build_metadata(
        query_lens=[1], context_lens=[ctx],
        block_tables=[list(range(1, 1 + nblk))], block_size=bs,
        token_pad=8, seq_pad=4, max_blocks_per_seq=nblk + 1)
    rng = np.random.default_rng(0)
    # pool layout [L, NB, 2, KH, bs, D] (kv_cache.py:29)
    kv = jnp.asarray(rng.standard_normal(
        (1, nblk + 2, 2, kvh, bs, d)), jnp.float32).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((8, qh, d)),
                    jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def chain(q, kv):
        def body(i, acc):
            out = paged_attention(q + acc * 1e-6, kv, md, 0)
            return acc + out.astype(jnp.float32).sum() * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    chain(q, kv).block_until_ready()          # compile
    t0 = time.perf_counter()
    r = chain(q, kv)
    _ = np.asarray(r)                          # tiny fetch
    dt = (time.perf_counter() - t0) / iters
    kv_bytes = 2 * kvh * ctx * d * 2           # K+V actually streamed
    return dt, kv_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--peak-gbps", type=float, default=819.0)
    args = ap.parse_args()
    print(f"batch-1 decode attention, qh={args.heads} kvh={args.kvh} "
          f"d=128 (llama3-8b shapes)", file=sys.stderr)
    for ctx in (1024, 2048, 4096, 8192):
        dt, kv_bytes = probe(ctx, args.heads, args.kvh)
        gbps = kv_bytes / dt / 1e9
        floor = kv_bytes / (args.peak_gbps * 1e9)
        print(f"ctx={ctx:5d}: {dt*1e6:8.1f} us/call  "
              f"{gbps:6.1f} GB/s ({100*gbps/args.peak_gbps:5.1f}% of "
              f"peak; roofline floor {floor*1e6:.1f} us)")


if __name__ == "__main__":
    main()

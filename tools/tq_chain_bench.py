# SPDX-License-Identifier: Apache-2.0
"""Chained TQ-attention timing with stage knockouts (one jit, N calls).

Locates where the TQ kernel's per-visit time goes: run with
VLLM_METAL_TPU_TQ_ABLATE in {"", "nodma", "nok", "nov", "noupdate"}.
Chained inside one jit with a data dependency; fetches 8 lanes.
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
from vllm_metal_tpu.attention.quant_kv_cache import QuantPagedKVCache
from vllm_metal_tpu.config import CacheConfig, ModelConfig
from vllm_metal_tpu.ops.paged_attention_tq_kernel import tq_paged_attention


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=40)
    ap.add_argument("--ck", default="q8_0")
    ap.add_argument("--cv", default="q8_0")
    args = ap.parse_args()
    b, ctx = args.batch, args.ctx
    bs = 128
    cfg = ModelConfig(vocab_size=256, hidden_size=4096,
                      intermediate_size=128, num_layers=2, num_heads=32,
                      num_kv_heads=8, head_dim=128, max_model_len=16384)
    nblk_per = -(-(ctx + 8) // bs)
    tables, nxt = [], 1
    for _ in range(b):
        tables.append(list(range(nxt, nxt + nblk_per)))
        nxt += nblk_per
    md = build_metadata(
        query_lens=[1] * b, context_lens=[ctx] * b, block_tables=tables,
        block_size=bs, token_pad=max(8, b), seq_pad=max(8, b),
        max_blocks_per_seq=nblk_per + 1)
    cache = QuantPagedKVCache.allocate(
        cfg, CacheConfig(block_size=bs, kv_quant_k=args.ck,
                         kv_quant_v=args.cv), nxt + 1)
    # fill pools with random bytes (content irrelevant for timing)
    key = jax.random.PRNGKey(0)
    cache = cache._rebuild((
        jax.random.randint(key, cache.codes.shape, -100, 100, jnp.int8),
        (jax.random.uniform(key, cache.scales.shape) * 0.01
         ).astype(jnp.bfloat16)))
    q0 = jax.random.normal(key, (max(8, b), 32, 128), jnp.bfloat16)

    def chain(n):
        @jax.jit
        def fn(q):
            def body(q, _):
                o = tq_paged_attention(q, cache, md, 1)
                return (q * 0.5 + o * 0.5).astype(q.dtype), ()
            q, _ = jax.lax.scan(body, q, None, length=n)
            return q[0, 0, :8]
        return fn

    times = {}
    for n in (4, args.chain):
        fn = chain(n)
        np.asarray(fn(q0))
        best = float("inf")
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(q0))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
        print(f"chain={n}: {best * 1e3:.3f} ms total", flush=True)
    marg = (times[args.chain] - times[4]) / (args.chain - 4)
    visits = b * (-(-ctx // 128))
    print(f"ablate={os.environ.get('VLLM_METAL_TPU_TQ_ABLATE', '')!r} "
          f"marginal {marg * 1e3:.3f} ms/call "
          f"({marg / visits * 1e6:.2f} us/visit, {visits} visits)",
          flush=True)


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""Benchmark jax's tuned ragged_paged_attention on our decode shapes.

Control experiment for the DMA-bandwidth investigation: same shapes as
tools/attention_bench.py decode case (b16, ctx 1024, 32 qh / 8 kvh / 128 d,
page 64).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
    ragged_paged_attention,
)


def bench(name, query_lens, context_lens, qh=32, kvh=8, d=128, page=64,
          iters=30):
    ns = len(query_lens)
    total = sum(query_lens)
    cu = np.zeros(ns + 1, np.int32)
    cu[1:] = np.cumsum(query_lens)
    pages_per_seq = max(-(-cl // page) for cl in context_lens) + 1
    indices = np.zeros((ns, pages_per_seq), np.int32)
    nxt = 0
    for i, cl in enumerate(context_lens):
        npg = -(-cl // page)
        indices[i, :npg] = np.arange(nxt, nxt + npg)
        nxt += npg
    key = jax.random.PRNGKey(0)
    kv = jax.random.normal(key, (nxt + 1, page, kvh * 2, d), jnp.bfloat16)
    q = jax.random.normal(key, (total, qh, d), jnp.bfloat16)
    kv_lens = jnp.asarray(np.array(context_lens, np.int32))
    page_indices = jnp.asarray(indices)
    cu_q = jnp.asarray(cu)
    num_seqs = jnp.asarray([ns], jnp.int32)

    fn = jax.jit(lambda q, kv: ragged_paged_attention(
        q, kv, kv_lens, page_indices, cu_q, num_seqs, sm_scale=d ** -0.5,
        num_kv_pages_per_block=4, num_queries_per_block=32,
        vmem_limit_bytes=100 * 1024 * 1024))
    out = fn(q, kv)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q, kv)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    kv_bytes = sum(cl * kvh * d * 2 * 2 for cl in context_lens)
    print(f"{name}: {dt * 1e3:.3f} ms  kv={kv_bytes / 1e6:.1f}MB  "
          f"bw={kv_bytes / dt / 1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    bench("decode b16 ctx1024", [1] * 16, [1024] * 16)
    bench("decode b16 ctx4096", [1] * 16, [4096] * 16)
    bench("decode b64 ctx1024", [1] * 64, [1024] * 64)
    bench("prefill 2048", [2048], [2048])

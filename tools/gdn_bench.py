# SPDX-License-Identifier: Apache-2.0
"""GDN decode: sequential scan vs the Pallas batch-parallel kernel.

Times L chained GDN state updates (the per-step layer pattern of a
Qwen3-Next-class hybrid: Hv=32, Dv=Dk=128) at decode batch sizes.
Sync protocol: fetch 8 lanes (block_until_ready does not round-trip
through the axon tunnel; full-array fetches are D2H-bound).
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

from vllm_metal_tpu.ops.gdn import gdn_recurrent_varlen
from vllm_metal_tpu.ops.gdn_kernel import gdn_decode_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--hv", type=int, default=32)
    ap.add_argument("--dk", type=int, default=128)
    ap.add_argument("--dv", type=int, default=128)
    args = ap.parse_args()
    t = args.batch
    hv, dk, dv = args.hv, args.dk, args.dv
    hk = hv // 2
    L = args.layers
    slots = t + 1

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((t, hk, dk)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((t, hk, dk)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((t, hv, dv)), jnp.bfloat16)
    g = jnp.asarray(rng.uniform(0.5, 1.0, (t, hv)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.1, 0.9, (t, hv)), jnp.float32)
    rec = jnp.zeros((L, slots, hv, dv, dk), jnp.float32)
    tsids = jnp.arange(t, dtype=jnp.int32)
    seq_slots = jnp.arange(t, dtype=jnp.int32)
    valid = jnp.ones((t,), bool)
    tok_slots = jnp.arange(t, dtype=jnp.int32)

    state_mb = slots * hv * dv * dk * 4 / 1e6

    import functools

    @functools.partial(jax.jit, donate_argnums=(5,))
    def scan_chain(q, k, v, g, beta, rec):
        ys = 0.0
        for li in range(L):
            y, ns = gdn_recurrent_varlen(q, k, v, g, beta, rec[li],
                                         tsids, seq_slots, valid)
            rec = rec.at[li].set(ns)
            q = q + y[:, :hk, :dk].astype(q.dtype) * 1e-6
            ys = ys + y
        return ys[0, 0, :8], rec

    @functools.partial(jax.jit, donate_argnums=(5,))
    def kernel_chain(q, k, v, g, beta, rec):
        rep = hv // hk
        ys = 0.0
        for li in range(L):
            qx = jnp.repeat(q, rep, axis=1)
            kx = jnp.repeat(k, rep, axis=1)
            y, rec = gdn_decode_step(qx, kx, v, g, beta, rec, li, tok_slots)
            q = q + y[:, :hk, :dk].astype(q.dtype) * 1e-6
            ys = ys + y
        return ys[0, 0, :8], rec

    for name, fn in (("scan", scan_chain), ("kernel", kernel_chain)):
        r = jnp.zeros_like(rec)
        out, r = fn(q, k, v, g, beta, r)
        np.asarray(out)                      # compile + warm
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            out, r = fn(q, k, v, g, beta, r)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        traffic = 2 * t * hv * dv * dk * 4 * L   # state rows r+w
        print(f"{name:7s}: {best / L * 1e3:7.3f} ms/layer  "
              f"({best * 1e3:.2f} ms total, state {state_mb:.0f} MB/layer, "
              f"row-traffic bw {traffic / best / 1e9:.0f} GB/s)", flush=True)

    # ---- conv1d decode path (VERDICT r4 #7: measure or kernel) ----
    # Depthwise causal conv + SiLU over the packed qkv channels, decode
    # shapes (one token/seq), per-request carried taps — the jnp path the
    # reference covers with gdn_conv1d_decode.metal.
    from vllm_metal_tpu.ops.gdn import conv1d_varlen
    conv_k = 4
    C = 2 * hk * dk + hv * dv
    x = jnp.asarray(rng.standard_normal((t, C)), jnp.bfloat16)
    conv_w = jnp.asarray(rng.standard_normal((C, conv_k)), jnp.float32)
    conv_b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    cstate = jnp.zeros((slots, conv_k - 1, C), jnp.bfloat16)
    local_idx = jnp.zeros((t,), jnp.int32)         # decode: one new token
    qsl = jnp.arange(t + 1, dtype=jnp.int32)
    ntok = jnp.asarray(t, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def conv_chain(x, cst):
        out = 0.0
        for _ in range(L):
            y, cst = conv1d_varlen(x, conv_w, conv_b, cst, tsids,
                                   local_idx, seq_slots, qsl, ntok)
            x = x + y.astype(x.dtype) * 1e-6
            out = y
        return out[0, :8], cst

    c = cstate
    out, c = conv_chain(x, c)
    np.asarray(out)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        out, c = conv_chain(x, c)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"conv1d : {best / L * 1e3:7.3f} ms/layer  "
          f"({best * 1e3:.2f} ms total, C={C}, k={conv_k}, "
          f"batch={t})", flush=True)


if __name__ == "__main__":
    main()

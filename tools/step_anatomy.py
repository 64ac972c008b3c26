# SPDX-License-Identifier: Apache-2.0
"""Marginal on-device cost of each decode-step component (Llama-3-8B Q4).

Chains each component N times inside one jitted program (serialized via a
data dependency) so host-dispatch overhead is excluded — see
tools/attention_chain_bench.py for why naive timing lies through the
remote-dispatch tunnel.

Components at b=16 decode shapes:
  wq [16,4096]->[4096], wk/wv ->[1024], wo ->[4096],
  gate/up [16,4096]->[14336], down [16,14336]->[4096],
  lm_head [16,4096]->[128256], sampler greedy on [16,128256].
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from vllm_metal_tpu.gguf.quants import pack_affine_q4, quantize_q4_k
from vllm_metal_tpu.gguf.reader import GGMLType
from vllm_metal_tpu.ops.quant_matmul import QuantLinear, linear


def make_q4(n, k, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
    p = pack_affine_q4(quantize_q4_k(w), GGMLType.Q4_K, (n, k))
    return QuantLinear.from_packed(p)


def marginal(name, fn0, x0, extra, chain=16, iters=8):
    """fn0(x, extra) -> y with y feeding back into x somehow."""
    def build(n):
        @jax.jit
        def f(x, extra):
            def body(x, _):
                return fn0(x, extra), ()
            x, _ = jax.lax.scan(body, x, None, length=n)
            return x
        return f

    t1 = None
    for n in (1, chain):
        f = build(n)
        out = f(x0, extra)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(x0, extra)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        if n == 1:
            t1 = best
        else:
            m = (best - t1) / (n - 1)
            print(f"{name}: {m * 1e3:.4f} ms marginal", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=16)
    args = ap.parse_args()
    t = args.tokens
    h, i_sz, v = 4096, 14336, 128256
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t, h), jnp.bfloat16)
    xi = jax.random.normal(key, (t, i_sz), jnp.bfloat16)

    def lin_fb(x, ql):
        y = linear(x, ql)
        # feed back to input shape: fold output into first h columns
        return (x + y[:, : x.shape[1]] * 1e-6).astype(x.dtype) \
            if y.shape[1] >= x.shape[1] else \
            (x + jnp.pad(y, ((0, 0), (0, x.shape[1] - y.shape[1]))) * 1e-6
             ).astype(x.dtype)

    cases = [
        ("wq 4096->4096", x, make_q4(h, h, 1)),
        ("wk 1024<-4096", x, make_q4(1024, h, 2)),
        ("gate 4096->14336", x, make_q4(i_sz, h, 3)),
        ("down 14336->4096", xi, make_q4(h, i_sz, 4)),
        ("lm_head 4096->128256", x, make_q4(v, h, 5)),
    ]
    for name, x0, ql in cases:
        marginal(name, lin_fb, x0, ql)

    # greedy sampler: argmax over [t, v] logits
    logits = jax.random.normal(key, (t, v), jnp.float32)

    def samp_fb(lg, _):
        ids = jnp.argmax(lg, axis=-1)
        return lg + ids[:, None] * 1e-9

    marginal("greedy argmax [16,128256]", samp_fb, logits, jnp.zeros(()))


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""Mixture-of-Experts FFN (Mixtral / Qwen-MoE style top-k routing).

The reference rejects MoE expert-parallel dispatch outright
(``/root/reference/vllm_metal/platform.py:543-548`` — "MLX has no
all_to_all"); here the single-chip path is owned directly: top-k softmax
routing with renormalization and an expert loop of dense/quantized matmuls
with per-token weights masked in.  The expert loop is static (XLA unrolls
and overlaps); EP sharding over the mesh (all_to_all exists in JAX) is the
planned multi-chip extension.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.quant_matmul import QuantLinear, linear
from ..utils import static_dataclass


@static_dataclass(meta_fields=("top_k", "renormalize"))
class MoEWeights:
    """One MoE FFN: router + per-expert projections (+ optional shared)."""

    router: QuantLinear            # [E, H]
    gate: list                     # E x QuantLinear [I, H]
    up: list                       # E x QuantLinear [I, H]
    down: list                     # E x QuantLinear [H, I]
    shared_gate: Optional[QuantLinear] = None
    shared_up: Optional[QuantLinear] = None
    shared_down: Optional[QuantLinear] = None
    top_k: int = 2
    renormalize: bool = True


def moe_ffn(x: jax.Array, w: MoEWeights, act) -> jax.Array:
    """x [T, H] -> [T, H].

    Routing: softmax over router logits, top-k, renormalized (the
    Mixtral/Qwen convention).  Each expert computes on the full token batch
    with its per-token routing weight masked in — experts a token doesn't
    use contribute exactly zero.
    """
    t, h = x.shape
    n_exp = len(w.gate)
    logits = linear(x, w.router, out_dtype=jnp.float32)    # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, w.top_k)      # [T, K]
    if w.renormalize:
        top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)

    # per-expert per-token routing weight: [T, E]
    onehot = jax.nn.one_hot(top_idx, n_exp, dtype=jnp.float32)  # [T, K, E]
    token_w = jnp.einsum("tk,tke->te", top_vals, onehot)

    out = jnp.zeros((t, h), jnp.float32)
    for e in range(n_exp):
        g = act(linear(x, w.gate[e]).astype(jnp.float32))
        u = linear(x, w.up[e]).astype(jnp.float32)
        d = linear((g * u).astype(x.dtype), w.down[e]).astype(jnp.float32)
        out = out + d * token_w[:, e][:, None]

    if w.shared_gate is not None:
        g = act(linear(x, w.shared_gate).astype(jnp.float32))
        u = linear(x, w.shared_up).astype(jnp.float32)
        out = out + linear((g * u).astype(x.dtype),
                           w.shared_down).astype(jnp.float32)
    return out.astype(x.dtype)


def init_random_moe(key, hidden: int, inter: int, n_exp: int, top_k: int,
                    dtype=jnp.float32, shared: bool = False) -> MoEWeights:
    keys = iter(jax.random.split(key, 3 * n_exp + 6))

    def dense(shape, scale=0.05):
        return QuantLinear.dense(
            (jax.random.normal(next(keys), shape, jnp.float32)
             * scale).astype(dtype))

    return MoEWeights(
        router=dense((n_exp, hidden)),
        gate=[dense((inter, hidden)) for _ in range(n_exp)],
        up=[dense((inter, hidden)) for _ in range(n_exp)],
        down=[dense((hidden, inter)) for _ in range(n_exp)],
        shared_gate=dense((inter, hidden)) if shared else None,
        shared_up=dense((inter, hidden)) if shared else None,
        shared_down=dense((hidden, inter)) if shared else None,
        top_k=top_k,
    )

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


@static_dataclass(meta_fields=("top_k", "renormalize", "scoring",
                               "routed_scale", "n_group", "topk_group",
                               "group_sel"))
class MoEWeights:
    """One MoE FFN: router + per-expert projections (+ optional shared).

    Routing variants (reference loads these through mlx_lm's model zoo;
    here they are first-class):

    * ``scoring="softmax"`` — Mixtral/Qwen convention.
    * ``scoring="sigmoid"`` + ``score_bias`` — DeepSeek-V3: experts are
      *selected* by bias-corrected sigmoid scores but *weighted* by the
      uncorrected scores.
    * ``routed_scale`` — DeepSeek ``routed_scaling_factor`` applied to the
      combined routed output.
    * ``shared_gate_vec`` — Qwen2-MoE/Qwen3-Next per-token sigmoid gate
      ([1, H] linear) on the shared expert's output.
    """

    router: QuantLinear            # [E, H]
    gate: list                     # E x QuantLinear [I, H]
    up: list                       # E x QuantLinear [I, H]
    down: list                     # E x QuantLinear [H, I]
    shared_gate: Optional[QuantLinear] = None
    shared_up: Optional[QuantLinear] = None
    shared_down: Optional[QuantLinear] = None
    shared_gate_vec: Optional[QuantLinear] = None   # [1, H]
    score_bias: Optional[jax.Array] = None          # [E]
    top_k: int = 2
    renormalize: bool = True
    scoring: str = "softmax"
    routed_scale: float = 1.0
    # group-limited routing (DeepSeek): experts partition into n_group
    # groups; only topk_group groups stay eligible.  group_sel picks the
    # group score: "max" (V2 group_limited_greedy) | "top2sum" (V3).
    n_group: int = 1
    topk_group: int = 1
    group_sel: str = "max"


@static_dataclass(meta_fields=("top_k", "renormalize", "num_experts",
                               "scoring", "routed_scale", "n_group",
                               "topk_group", "group_sel"))
class MoEWeightsEP:
    """Expert-parallel MoE FFN: expert weights stacked [E, ...] so the
    expert dim shards over the mesh (field names ``egate/eup/edown`` are
    the sharding contract — ``parallel.shardings`` maps them to
    ``P('model')`` on dim 0).  The reference rejects EP outright
    ("MLX has no all_to_all", ``platform.py:543-548``); on TPU the
    dense-dispatch formulation needs only the layer's existing psum —
    each chip computes its local experts on the (replicated) token batch
    and the row-parallel reduction combines them.
    """

    router: QuantLinear            # [E, H] (replicated)
    egate: QuantLinear             # stacked [E, I, H]
    eup: QuantLinear
    edown: QuantLinear
    shared_gate: Optional[QuantLinear] = None
    shared_up: Optional[QuantLinear] = None
    shared_down: Optional[QuantLinear] = None
    shared_gate_vec: Optional[QuantLinear] = None
    score_bias: Optional[jax.Array] = None
    top_k: int = 2
    renormalize: bool = True
    num_experts: int = 0
    scoring: str = "softmax"
    routed_scale: float = 1.0
    n_group: int = 1
    topk_group: int = 1
    group_sel: str = "max"


def stack_experts(w: MoEWeights) -> MoEWeightsEP:
    """Per-expert QuantLinear lists -> stacked [E, ...] leaves."""
    def stack(lins: list) -> QuantLinear:
        return jax.tree.map(lambda *xs: jnp.stack(xs), *lins)

    return MoEWeightsEP(
        router=w.router, egate=stack(w.gate), eup=stack(w.up),
        edown=stack(w.down), shared_gate=w.shared_gate,
        shared_up=w.shared_up, shared_down=w.shared_down,
        shared_gate_vec=w.shared_gate_vec, score_bias=w.score_bias,
        top_k=w.top_k, renormalize=w.renormalize,
        num_experts=len(w.gate), scoring=w.scoring,
        routed_scale=w.routed_scale, n_group=w.n_group,
        topk_group=w.topk_group, group_sel=w.group_sel)


def _routing_weights(x, w) -> jax.Array:
    """[T, E] per-token weight of every expert (0 outside the top-k).

    DeepSeek-V3 (``scoring="sigmoid"`` + ``score_bias``): selection uses
    bias-corrected scores, but the combine weights come from the
    *uncorrected* sigmoid scores.
    """
    n_exp = w.num_experts if isinstance(w, MoEWeightsEP) else len(w.gate)
    logits = linear(x, w.router, out_dtype=jnp.float32)    # [T, E]
    if w.scoring == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    sel = probs
    if w.score_bias is not None:
        sel = sel + w.score_bias.astype(jnp.float32)[None, :]
    if w.n_group > 1:
        # group-limited routing: score each group, keep topk_group groups
        t = sel.shape[0]
        gs = sel.reshape(t, w.n_group, n_exp // w.n_group)
        if w.group_sel == "top2sum":       # DeepSeek-V3
            g_score = jnp.sum(jax.lax.top_k(gs, 2)[0], axis=-1)
        else:                              # DeepSeek-V2 group max
            g_score = jnp.max(gs, axis=-1)
        _, g_idx = jax.lax.top_k(g_score, w.topk_group)    # [T, Gk]
        g_mask = jnp.sum(jax.nn.one_hot(g_idx, w.n_group,
                                        dtype=jnp.float32), axis=1) > 0
        sel = jnp.where(
            jnp.repeat(g_mask, n_exp // w.n_group, axis=-1), sel, 0.0)
    if sel is probs:
        top_vals, top_idx = jax.lax.top_k(probs, w.top_k)  # [T, K]
    else:
        _, top_idx = jax.lax.top_k(sel, w.top_k)           # [T, K]
        top_vals = jnp.take_along_axis(probs, top_idx, axis=-1)
    if w.renormalize:
        top_vals = top_vals / (
            jnp.sum(top_vals, axis=-1, keepdims=True) + 1e-20)
    top_vals = top_vals * w.routed_scale
    onehot = jax.nn.one_hot(top_idx, n_exp, dtype=jnp.float32)  # [T, K, E]
    return jnp.einsum("tk,tke->te", top_vals, onehot)


def _shared_expert(x, w, act) -> jax.Array:
    g = act(linear(x, w.shared_gate).astype(jnp.float32))
    u = linear(x, w.shared_up).astype(jnp.float32)
    out = linear((g * u).astype(x.dtype),
                 w.shared_down).astype(jnp.float32)
    if w.shared_gate_vec is not None:   # qwen2moe/qwen3-next sigmoid gate
        out = out * jax.nn.sigmoid(
            linear(x, w.shared_gate_vec, out_dtype=jnp.float32))
    return out


def moe_ffn(x: jax.Array, w, act, tp=None) -> jax.Array:
    """x [T, H] -> [T, H].

    Routing: softmax over router logits, top-k, renormalized (the
    Mixtral/Qwen convention).  Each expert computes on the full token batch
    with its per-token routing weight masked in — experts a token doesn't
    use contribute exactly zero.

    With ``MoEWeightsEP`` under an active TP context, each shard holds
    E/P experts; the returned partial sum relies on the caller's
    row-parallel psum (``tp.reduce``) to combine shards, and the shared
    expert contributes from shard 0 only.
    """
    t, h = x.shape
    token_w = _routing_weights(x, w)
    out = jnp.zeros((t, h), jnp.float32)

    if isinstance(w, MoEWeightsEP):
        e_loc = jax.tree.leaves(w.egate)[0].shape[0]
        ep = tp is not None and getattr(tp, "enabled", False)
        off = tp.shard_index() * e_loc if ep else 0
        for e in range(e_loc):
            g = act(linear(x, w.egate.at_layer(e)).astype(jnp.float32))
            u = linear(x, w.eup.at_layer(e)).astype(jnp.float32)
            d = linear((g * u).astype(x.dtype),
                       w.edown.at_layer(e)).astype(jnp.float32)
            tw = jnp.take_along_axis(
                token_w, jnp.full((t, 1), off + e, jnp.int32), axis=1)
            out = out + d * tw
        if w.shared_gate is not None:
            s = _shared_expert(x, w, act)
            if ep:  # contribute once; the caller's psum sums shards
                s = jnp.where(tp.shard_index() == 0, s, 0.0)
            out = out + s
        return out.astype(x.dtype)

    for e in range(len(w.gate)):
        g = act(linear(x, w.gate[e]).astype(jnp.float32))
        u = linear(x, w.up[e]).astype(jnp.float32)
        d = linear((g * u).astype(x.dtype), w.down[e]).astype(jnp.float32)
        out = out + d * token_w[:, e][:, None]

    if w.shared_gate is not None:
        out = out + _shared_expert(x, w, act)
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

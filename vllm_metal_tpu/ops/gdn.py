# SPDX-License-Identifier: Apache-2.0
"""Gated DeltaNet (GDN) linear attention — packed-varlen jnp implementation.

Re-implements the math of the reference's GDN stack
(``/root/reference/vllm_metal/attention/impls/linear.py`` decomposition and
the ``gdn_recurrent_decode.metal`` recurrence):

  per token, per value head hv (with k/q from head hk = hv // (Hv/Hk)):
    S  *= g                       (scalar decay, g = exp(-exp(A_log) *
                                   softplus(a + dt_bias)))
    m   = S k                     (memory readout)
    d   = (v - m) * beta          (delta rule, beta = sigmoid(b))
    S  += outer(d, k)
    y   = S q

preceded by a depthwise causal conv1d (width ``conv_k``) + SiLU over the
packed q/k/v channels with per-request carried conv state, and q/k RMS
normalization with the reference's 1/sqrt(Dk) scaling
(``linear.py:288-291``).

The packed-varlen formulation runs ONE ``lax.scan`` over the token dim with
the per-request state table carried — token ``t`` updates the row
``token_seq_ids[t]`` — so mixed prefill+decode batches need no ragged
handling.  (A chunked parallel-scan kernel is the planned fast path.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def compute_g(a_log: jax.Array, a: jax.Array, dt_bias: jax.Array
              ) -> jax.Array:
    """Decay gate g in (0, 1): exp(-exp(A_log) * softplus(a + dt_bias))."""
    return jnp.exp(-jnp.exp(a_log.astype(jnp.float32))
                   * jax.nn.softplus(a.astype(jnp.float32)
                                     + dt_bias.astype(jnp.float32)))


def l2_scale_norm(x: jax.Array, scale: float, eps: float = 1e-6
                  ) -> jax.Array:
    """Weightless RMS norm * scale (reference q/k normalization)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def conv1d_varlen(
    x: jax.Array,              # [T, C] packed channels (q|k|v)
    conv_w: jax.Array,         # [C, conv_k] depthwise causal taps
    conv_b: Optional[jax.Array],
    conv_state: jax.Array,     # [slots, conv_k - 1, C]
    token_seq_ids: jax.Array,  # [T]
    local_idx: jax.Array,      # [T] index of token within its chunk... see md
    seq_slots: jax.Array,      # [S] request -> state slot
    query_start_loc: jax.Array,  # [S+1]
    num_tokens: jax.Array,     # [] valid token count
) -> tuple[jax.Array, jax.Array]:
    """Causal depthwise conv + SiLU with per-request carried state.

    Returns (activated [T, C], new_conv_state).  ``local_idx[t]`` is the
    token's 0-based index within this step's chunk for its request.
    """
    t_pad, c = x.shape
    conv_k = conv_w.shape[1]
    taps = conv_k - 1
    slots_of_token = seq_slots[token_seq_ids]          # [T]

    acc = x * conv_w[:, conv_k - 1][None, :]
    for j in range(1, conv_k):
        rolled = jnp.roll(x, j, axis=0)
        same_req = jnp.roll(token_seq_ids, j, axis=0) == token_seq_ids
        in_chunk = (local_idx >= j) & same_req
        # fall back to the carried state row (position local_idx - j, i.e.
        # state row taps - j + local_idx, valid while local_idx < j)
        srow = jnp.clip(local_idx - j + taps, 0, taps - 1)
        from_state = conv_state[slots_of_token, srow]  # [T, C]
        prev = jnp.where(in_chunk[:, None], rolled, from_state)
        acc = acc + prev * conv_w[:, conv_k - 1 - j][None, :]
    if conv_b is not None:
        acc = acc + conv_b[None, :]
    out = jax.nn.silu(acc.astype(jnp.float32)).astype(x.dtype)

    # new conv state per request: the last `taps` raw inputs of
    # (old_state ++ chunk).  Row j of the new state is absolute position
    # end - taps + j; if that predates the chunk it comes from old state
    # row qlen + j, else from chunk row qsl[i+1] - taps + j.
    qlen = query_start_loc[1:] - query_start_loc[:-1]             # [S]
    new_state = conv_state
    for j in range(taps):
        chunk_tok = jnp.clip(query_start_loc[1:] - taps + j, 0, t_pad - 1)
        from_chunk = x[chunk_tok]                                  # [S, C]
        old_row = jnp.clip(qlen + j, 0, taps - 1)
        from_old = conv_state[seq_slots, old_row]
        val = jnp.where((qlen + j >= taps)[:, None], from_chunk, from_old)
        # inactive (padding) requests keep their state untouched
        cur = conv_state[seq_slots, j]
        val = jnp.where((qlen > 0)[:, None], val, cur)
        new_state = new_state.at[seq_slots, j].set(
            val.astype(conv_state.dtype))
    return out, new_state


def gdn_recurrent_varlen(
    q: jax.Array,              # [T, Hk, Dk]  (normalized, scaled)
    k: jax.Array,              # [T, Hk, Dk]
    v: jax.Array,              # [T, Hv, Dv]
    g: jax.Array,              # [T, Hv] decay
    beta: jax.Array,           # [T, Hv]
    states: jax.Array,         # [slots, Hv, Dv, Dk] f32
    token_seq_ids: jax.Array,  # [T]
    seq_slots: jax.Array,      # [S]
    valid: jax.Array,          # [T] bool (pad rows skip state updates)
) -> tuple[jax.Array, jax.Array]:
    """Sequential delta-rule scan over the packed token dim."""
    t_pad, hk, dk = q.shape
    hv, dv = v.shape[1], v.shape[2]
    rep = hv // hk
    slots_of_token = seq_slots[token_seq_ids]

    def step(states, inp):
        qt, kt, vt, gt, bt, slot, ok = inp
        s = states[slot]                               # [Hv, Dv, Dk] f32
        qx = jnp.repeat(qt, rep, axis=0).astype(jnp.float32)  # [Hv, Dk]
        kx = jnp.repeat(kt, rep, axis=0).astype(jnp.float32)
        s = s * gt[:, None, None]
        mem = jnp.einsum("hvk,hk->hv", s, kx)          # [Hv, Dv]
        delta = (vt.astype(jnp.float32) - mem) * bt[:, None]
        s = s + delta[:, :, None] * kx[:, None, :]
        y = jnp.einsum("hvk,hk->hv", s, qx)            # [Hv, Dv]
        states = states.at[slot].set(jnp.where(ok, s, states[slot]))
        return states, y.astype(v.dtype)

    xs = (q, k, v, g.astype(jnp.float32), beta.astype(jnp.float32),
          slots_of_token, valid)
    states, ys = jax.lax.scan(step, states, xs)
    return ys, states

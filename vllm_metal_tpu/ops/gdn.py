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


def gdn_chunked_varlen(
    q: jax.Array,              # [T, Hk, Dk]  (normalized, scaled)
    k: jax.Array,              # [T, Hk, Dk]
    v: jax.Array,              # [T, Hv, Dv]
    g: jax.Array,              # [T, Hv] decay
    beta: jax.Array,           # [T, Hv]
    states: jax.Array,         # [slots, Hv, Dv, Dk] f32
    token_seq_ids: jax.Array,  # [T]
    seq_slots: jax.Array,      # [S]
    valid: jax.Array,          # [T] bool
    query_start_loc: jax.Array,  # [S+1]
    chunk: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """Chunked parallel delta rule (WY/UT transform) over the packed batch.

    NOT the production path.  Measured on v5e (T=2048, Hv=32,
    Dv=Dk=128): the plain token scan runs ~0.2ms because XLA keeps the
    recurrent carry VMEM-resident across ``lax.scan`` iterations, while
    this formulation's per-token state gathers stream the full state
    from HBM every chunk (~350ms).  Kept as the tested chunkwise
    reference (and the starting point for a Pallas kernel should a
    shape regime appear where the scan's serialization dominates).

    ``T/chunk`` sequential steps of MXU matmuls — the gated delta
    recurrence within a chunk reduces to a unit-lower-triangular solve
    for pseudo-values U:

      (I + A) U = R,   A[t,i] = beta_t (b_t/b_i)(k_t.k_i)  (i < t, same seq)
      R_t = beta_t (v_t - b_t S0 k_t),   b_t = prod in-chunk decay
      y_t = b_t S0 q_t + sum_{i<=t} (b_t/b_i)(q_t.k_i) u_i
      S_end = b_end S0 + sum_i (b_end/b_i) u_i k_i^T

    (the math of the reference's sequential ``gdn_recurrent_*.metal``
    kernels, re-derived for chunkwise execution).  Varlen packing is
    handled by same-sequence masks and per-sequence in-chunk decay
    resets; padding rows carry beta=0 / g=1 so they are inert.  Oracle:
    :func:`gdn_recurrent_varlen`.
    """
    from jax.scipy.linalg import solve_triangular

    t_pad, hk, dk = q.shape
    hv, dv = v.shape[1], v.shape[2]
    rep = hv // hk
    assert t_pad % chunk == 0, (t_pad, chunk)
    n_chunks = t_pad // chunk
    slots_max = states.shape[0]

    qx = jnp.repeat(q, rep, axis=1).astype(jnp.float32)
    kx = jnp.repeat(k, rep, axis=1).astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = jnp.where(valid[:, None], g.astype(jnp.float32), 1.0)
    bf = jnp.where(valid[:, None], beta.astype(jnp.float32), 0.0)
    slots_of_token = seq_slots[token_seq_ids]
    seg_start = query_start_loc[token_seq_ids]          # [T] global
    seg_end = query_start_loc[
        jnp.minimum(token_seq_ids + 1, query_start_loc.shape[0] - 1)]

    def rs(x):
        return x.reshape(n_chunks, chunk, *x.shape[1:])

    xs = (rs(qx), rs(kx), rs(vf), rs(gf), rs(bf), rs(token_seq_ids),
          rs(slots_of_token), rs(valid), rs(seg_start), rs(seg_end),
          jnp.arange(n_chunks, dtype=jnp.int32) * chunk)

    eye = jnp.eye(chunk, dtype=jnp.float32)
    tril_strict = jnp.tril(jnp.ones((chunk, chunk), bool), -1)
    tril_incl = jnp.tril(jnp.ones((chunk, chunk), bool))
    rows = jnp.arange(chunk)

    def body(states, inp):
        (qc, kc, vc, gc, bc, segc, slotc, validc, sstart, send, c0) = inp
        sc = jnp.clip(sstart - c0, 0, chunk - 1)         # in-chunk seg start
        ec = jnp.clip(send - 1 - c0, 0, chunk - 1)       # in-chunk seg end
        lg = jnp.log(jnp.maximum(gc, 1e-30))             # [C, Hv]
        cs = jnp.cumsum(lg, axis=0)
        lb = cs - (cs - lg)[sc]                          # [C, Hv]
        eb = jnp.exp(lb)
        same = segc[:, None] == segc[None, :]
        causal = same & tril_incl
        dl = lb[:, None, :] - lb[None, :, :]             # [C, C, Hv]
        ratio = jnp.exp(jnp.where(causal[:, :, None], dl, 0.0))

        kk = jnp.einsum("thk,ihk->tih", kc, kc)
        A = jnp.where((same & tril_strict)[:, :, None],
                      bc[:, None, :] * ratio * kk, 0.0)

        st0 = states[slotc]                              # [C, Hv, Dv, Dk]
        m0 = jnp.einsum("thdk,thk->thd", st0, kc)        # [C, Hv, Dv]
        r = bc[..., None] * (vc - eb[..., None] * m0)

        ah = jnp.moveaxis(A, -1, 0)                      # [Hv, C, C]
        rh = jnp.moveaxis(r, 1, 0)                       # [Hv, C, Dv]
        uh = solve_triangular(eye[None] + ah, rh, lower=True,
                              unit_diagonal=True)
        u = jnp.moveaxis(uh, 0, 1)                       # [C, Hv, Dv]

        qk = jnp.einsum("thk,ihk->tih", qc, kc)
        m = jnp.where(causal[:, :, None], ratio * qk, 0.0)
        y = eb[..., None] * jnp.einsum("thdk,thk->thd", st0, qc) \
            + jnp.einsum("tih,ihd->thd", m, u)

        # end-of-chunk state per present slot
        w = jnp.exp(lb[ec] - lb)                         # decay i -> seg end
        w = jnp.where(validc[:, None], w, 0.0)
        outer = (u * w[..., None])[:, :, :, None] * kc[:, :, None, :]
        upd = jax.ops.segment_sum(
            outer.reshape(chunk, -1), slotc,
            num_segments=slots_max).reshape(states.shape)
        end_row = (rows == ec) & validc                  # [C]
        decay = jax.ops.segment_sum(
            jnp.where(end_row[:, None], jnp.exp(lb), 0.0), slotc,
            num_segments=slots_max)                      # [slots, Hv]
        present = jax.ops.segment_sum(
            end_row.astype(jnp.int32), slotc, num_segments=slots_max) > 0
        new_states = jnp.where(
            present[:, None, None, None],
            decay[:, :, None, None] * states + upd, states)
        return new_states, y.astype(v.dtype)

    states, ys = jax.lax.scan(body, states, xs)
    return ys.reshape(t_pad, hv, dv), states

# SPDX-License-Identifier: Apache-2.0
"""Pallas GDN decode kernel: parallel single-token delta-rule update.

Role of the reference's ``gdn_recurrent_decode.metal`` (one threadgroup per
(seq, head), state updated in place).  The jnp ``lax.scan`` path
(:mod:`.gdn`) serializes the packed batch token-by-token — correct for
prefill (tokens of one request ARE sequential) but a waste at decode,
where every token belongs to a *different* request and the state updates
are embarrassingly parallel.  This kernel runs one grid step per token,
DMA-ing only that token's state row (scalar-prefetched slot index) and
updating it in place via input/output aliasing.

The kernel takes the FULL stacked state ``[n_gdn_layers, slots, ...]``
plus a layer index so XLA never materializes a per-layer slice/update
copy (34 MB per layer at 8B-hybrid scale) around the call.

Math per (token, value head), identical to ``gdn_recurrent_varlen``:

    S *= g;  mem = S k;  d = (v - mem) * beta;  S += outer(d, k);  y = S q

Caller contract (StepRuntime.gdn_decode_update enforces / documents):
  * every valid token's ``slot`` is DISTINCT (true for pure-decode
    batches: one token per request, one state slot per request);
  * pad tokens map to the junk row ``slots-1`` (HybridCache allocates
    one spare row above ``max_num_seqs``) and carry ``g=1, beta=0``;
    trailing pads coalesce into inert writes of the junk row only.
  * ``g``/``beta`` arrive pre-broadcast over Dk/Dv lanes so every block
    is a clean 2D (sublane, lane) tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gdn_decode_kernel(layer_ref, slots_ref, qx_ref, kx_ref, v_ref, gk_ref,
                       bv_ref, s_in_ref, s_out_ref, y_ref):
    del layer_ref, slots_ref
    s0 = s_in_ref[0, 0]                              # [HT, Dv, Dk] f32
    k = kx_ref[0].astype(jnp.float32)                # [HT, Dk]
    q = qx_ref[0].astype(jnp.float32)                # [HT, Dk]
    v = v_ref[0].astype(jnp.float32)                 # [HT, Dv]
    gk = gk_ref[0]                                   # [HT, Dk] (g per head)
    bv = bv_ref[0]                                   # [HT, Dv] (beta)
    # One pass over s0 computes both readouts (the decayed-state algebra
    # y = g*(s0 q) + beta*(v - g*(s0 k)) * (k.q) avoids re-reading the
    # updated state):
    #   mem = g * (s0 . k);  delta = (v - mem) * beta
    #   s1  = g * s0 + delta (x) k
    #   y   = s1 . q = g * (s0 . q) + (k . q) * delta
    g1 = gk[:, :1]                                   # [HT, 1] (g, per head)
    s0q = jnp.sum(s0 * q[:, None, :], axis=-1)       # [HT, Dv]
    s0k = jnp.sum(s0 * k[:, None, :], axis=-1)       # [HT, Dv]
    mem = g1 * s0k
    delta = (v - mem) * bv                           # [HT, Dv]
    kq = jnp.sum(k * q, axis=-1, keepdims=True)      # [HT, 1]
    y = g1 * s0q + kq * delta
    s_out_ref[0, 0] = s0 * gk[:, None, :] + delta[:, :, None] * k[:, None, :]
    y_ref[0] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(5,))
def gdn_decode_step(
    qx: jax.Array,             # [T, Hv, Dk] (k-heads pre-expanded)
    kx: jax.Array,             # [T, Hv, Dk]
    v: jax.Array,              # [T, Hv, Dv]
    g: jax.Array,              # [T, Hv] f32 decay   (pads = 1)
    beta: jax.Array,           # [T, Hv] f32         (pads = 0)
    rec: jax.Array,            # [L, slots, Hv, Dv, Dk] f32 (in-place)
    layer,                     # int or traced scalar: GDN layer position
    token_slots: jax.Array,    # [T] int32 state row per token (pads -> junk)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (y [T, Hv, Dv] in v.dtype, the full updated rec)."""
    t, hv, dk = qx.shape
    dv = v.shape[2]
    gk = jnp.broadcast_to(g.astype(jnp.float32)[:, :, None], (t, hv, dk))
    bv = jnp.broadcast_to(beta.astype(jnp.float32)[:, :, None], (t, hv, dv))
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    # head-tiled grid: smaller state blocks pipeline DMA in/out across
    # more grid steps (a single [Hv, Dv, Dk] block per token exposes the
    # full 2 MB load latency per step)
    ht = 8 if hv % 8 == 0 else hv
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, hv // ht),
        in_specs=[
            pl.BlockSpec((1, ht, dk), lambda i, h, l, s: (i, h, 0),
                         memory_space=pltpu.VMEM),       # qx
            pl.BlockSpec((1, ht, dk), lambda i, h, l, s: (i, h, 0),
                         memory_space=pltpu.VMEM),       # kx
            pl.BlockSpec((1, ht, dv), lambda i, h, l, s: (i, h, 0),
                         memory_space=pltpu.VMEM),       # v
            pl.BlockSpec((1, ht, dk), lambda i, h, l, s: (i, h, 0),
                         memory_space=pltpu.VMEM),       # g (broadcast)
            pl.BlockSpec((1, ht, dv), lambda i, h, l, s: (i, h, 0),
                         memory_space=pltpu.VMEM),       # beta (broadcast)
            pl.BlockSpec((1, 1, ht, dv, dk),
                         lambda i, h, l, s: (l[0], s[i], h, 0, 0),
                         memory_space=pltpu.VMEM),       # state rows (in)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ht, dv, dk),
                         lambda i, h, l, s: (l[0], s[i], h, 0, 0),
                         memory_space=pltpu.VMEM),       # state rows (out)
            pl.BlockSpec((1, ht, dv), lambda i, h, l, s: (i, h, 0),
                         memory_space=pltpu.VMEM),       # y
        ],
    )
    cost = pl.CostEstimate(
        flops=4 * t * hv * dv * dk, transcendentals=0,
        bytes_accessed=2 * t * hv * dv * dk * 4)
    rec_new, y = pl.pallas_call(
        _gdn_decode_kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(rec.shape, rec.dtype),
                   jax.ShapeDtypeStruct((t, hv, dv), v.dtype)],
        input_output_aliases={7: 0},   # rec (after 2 prefetch + 5 inputs)
        cost_estimate=cost, interpret=interpret,
    )(lidx, token_slots, qx, kx, v, gk, bv, rec)
    return y, rec_new


def gdn_decode_supported(hv: int, dv: int, dk: int) -> bool:
    """Tiling constraints: lane dim must be 128-tileable, the per-token
    state block must fit VMEM comfortably.  (Interpret mode has no
    tiling constraints — lets CPU tests exercise the routing.)"""
    from .. import envs
    if envs.PALLAS_INTERPRET:
        return True
    if dk % 128 or dv % 8:
        return False
    return hv * dv * dk * 4 <= 4 * 1024 * 1024

# SPDX-License-Identifier: Apache-2.0
"""LoRA weight containers and the per-token delta computation."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils import static_dataclass

# projections LoRA can target (llama-family naming)
TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


@static_dataclass(meta_fields=("rank", "scaling"))
class LoRAPack:
    """Stacked adapter slots for ONE projection across layers.

    a: [L, slots, r, K]   b: [L, slots, N, r]
    Slot 0 is the null adapter (zeros).
    """

    a: jax.Array
    b: jax.Array
    rank: int = 8
    scaling: float = 1.0


@static_dataclass(meta_fields=("rank", "scaling"))
class LoRAAdapter:
    """One loaded adapter: per-target, per-layer A/B (host-side)."""

    # dict target -> (a [L, r, K], b [L, N, r]); missing target = untouched
    weights: dict
    rank: int = 8
    scaling: float = 1.0


def lora_delta(x: jax.Array, pack: Optional[LoRAPack], layer_idx: int,
               token_slots: jax.Array) -> jax.Array | float:
    """x [T, K] -> delta [T, N] for per-token adapter slots.

    Computed as slot-gathered low-rank matmuls: u = x @ A[slot]^T then
    delta = u @ B[slot]^T, with the gather expressed as a masked sum over
    slots (slot count is small and static; XLA fuses the masks).  This is
    the Punica gather+BMM with a null slot, TPU-shaped.
    """
    if pack is None:
        return 0.0
    a = pack.a[layer_idx]                  # [S, r, K]
    b = pack.b[layer_idx]                  # [S, N, r]
    nslots = a.shape[0]
    xf = x.astype(jnp.float32)
    out = 0.0
    for s in range(1, nslots):             # slot 0 is null
        mask = (token_slots == s).astype(jnp.float32)[:, None]
        u = jnp.einsum("tk,rk->tr", xf, a[s].astype(jnp.float32))
        d = jnp.einsum("tr,nr->tn", u, b[s].astype(jnp.float32))
        out = out + d * mask
    return (out * pack.scaling).astype(x.dtype) if nslots > 1 else 0.0

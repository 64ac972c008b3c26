# SPDX-License-Identifier: Apache-2.0
"""Shared functional building blocks: norms, RoPE, activations, embeddings."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.quant_matmul import QuantLinear, _unpack_q4


def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm in fp32 with cast back (Gemma uses offset=1.0)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * (weight.astype(jnp.float32) + offset)).astype(dt)


def rope_frequencies(head_dim: int, theta: float,
                     rope_scaling: Optional[dict] = None) -> jax.Array:
    """Inverse frequencies [head_dim//2], with optional Llama-3 scaling."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                           / head_dim))
    if rope_scaling:
        typ = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
        if typ == "llama3":
            factor = float(rope_scaling["factor"])
            lo = float(rope_scaling.get("low_freq_factor", 1.0))
            hi = float(rope_scaling.get("high_freq_factor", 4.0))
            orig = float(rope_scaling.get(
                "original_max_position_embeddings", 8192))
            wavelen = 2.0 * jnp.pi / inv
            low_wl = orig / lo
            high_wl = orig / hi
            smooth = (orig / wavelen - lo) / (hi - lo)
            scaled = jnp.where(
                wavelen > low_wl, inv / factor,
                jnp.where(wavelen < high_wl, inv,
                          (1 - smooth) * inv / factor + smooth * inv))
            inv = scaled
        elif typ in ("linear", ""):
            if "factor" in (rope_scaling or {}):
                inv = inv / float(rope_scaling["factor"])
        elif typ == "yarn":
            # full YaRN: per-frequency interpolation ramp.  High-frequency
            # dims (short wavelengths, fully inside the original window)
            # extrapolate unchanged; low-frequency dims interpolate
            # (divide by factor); dims between beta_fast/beta_slow
            # rotations blend linearly.
            import math
            factor = float(rope_scaling.get("factor", 1.0))
            orig = float(rope_scaling.get(
                "original_max_position_embeddings", 4096))
            beta_fast = float(rope_scaling.get("beta_fast", 32.0))
            beta_slow = float(rope_scaling.get("beta_slow", 1.0))

            def corr_dim(n_rot: float) -> float:
                return (head_dim * math.log(orig / (n_rot * 2 * math.pi))
                        / (2 * math.log(theta)))

            low = math.floor(corr_dim(beta_fast))
            high = math.ceil(corr_dim(beta_slow))
            low, high = max(low, 0), min(high, head_dim // 2 - 1)
            dims = jnp.arange(head_dim // 2, dtype=jnp.float32)
            ramp = jnp.clip((dims - low) / max(high - low, 1e-3), 0.0, 1.0)
            extrapolation_mask = 1.0 - ramp
            inv = (inv / factor) * (1 - extrapolation_mask) \
                + inv * extrapolation_mask
    return inv


def yarn_attention_factor(rope_scaling: Optional[dict]) -> float:
    """Multiplier on the attention SCALE for YaRN-scaled models.

    YaRN scales cos/sin by mscale = 0.1*ln(s)+1 on both q and k, which is
    equivalent to multiplying the softmax scale by mscale**2 (the HF
    ``attention_factor`` convention squared).
    """
    if not rope_scaling:
        return 1.0
    typ = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
    if typ != "yarn":
        return 1.0
    if rope_scaling.get("attention_factor") is not None:
        return float(rope_scaling["attention_factor"]) ** 2
    import math
    s = float(rope_scaling.get("factor", 1.0))
    mscale = float(rope_scaling.get("mscale", 1.0))
    if mscale != 1.0:        # deepseek-yarn convention
        m = 0.1 * mscale * math.log(s) + 1.0
    else:
        m = 0.1 * math.log(s) + 1.0 if s > 1.0 else 1.0
    return m ** 2


def apply_rope_pairs(x: jax.Array, positions: jax.Array,
                     inv_freq: jax.Array) -> jax.Array:
    """GLM/ERNIE-style INTERLEAVED-pair RoPE (full dim, f32 compute).

    Pair (x[2i], x[2i+1]) rotates by angle pos * inv_freq[i] — the
    transformers ``Ernie4_5`` scheme: ``rotate_half`` interleaves odd/even
    lanes and cos/sin are ``repeat_interleave(freqs, 2)``.  x: [T, H, D].
    """
    dt = x.dtype
    t, h, d = x.shape
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]                 # [T, 1, d/2]
    sin = jnp.sin(angles)[:, None, :]
    xf = x.astype(jnp.float32).reshape(t, h, d // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.reshape(t, h, d).astype(dt)


def rope_cos_sin(positions: jax.Array, inv_freq: jax.Array
                 ) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) [T, rot/2] for :func:`apply_rope`.

    Positions are layer-invariant, so callers running a layer loop hoist
    this once per step instead of recomputing the transcendentals (and
    their kernel launches) 2x per layer."""
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, positions: jax.Array,
               inv_freq: jax.Array, cos_sin=None) -> jax.Array:
    """NeoX-style rotate-half RoPE.

    x: [T, heads, head_dim]; positions: [T] int32.  Matches the per-segment
    vector-offset semantics of the reference's varlen RoPE compat layer
    (``/root/reference/vllm_metal/attention/impls/varlen_rope_compat.py``):
    positions are absolute per token, so packed varlen batches just pass the
    right position vector.

    Partial rotary (Qwen3-Next ``partial_rotary_factor``): when
    ``2 * len(inv_freq) < head_dim`` only the leading ``2 * len(inv_freq)``
    dims are rotated; the tail passes through unchanged.

    ``cos_sin``: optional precomputed :func:`rope_cos_sin` pair.
    """
    dt = x.dtype
    rot = 2 * inv_freq.shape[0]
    tail = None
    if rot < x.shape[-1]:
        tail = x[..., rot:]
        x = x[..., :rot]
    if cos_sin is None:
        cos_sin = rope_cos_sin(positions, inv_freq)
    cos = cos_sin[0][:, None, :]   # [T, 1, rot/2]
    sin = cos_sin[1][:, None, :]
    xf = x.astype(jnp.float32)
    half = rot // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    out = out.astype(dt)
    if tail is not None:
        out = jnp.concatenate([out, tail], axis=-1)
    return out


def apply_mrope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array,
                sections: tuple[int, ...],
                interleaved: bool = False,
                pairs: bool = False) -> jax.Array:
    """Multimodal (3-axis) rotate-half RoPE.

    x: [T, heads, head_dim]; positions: [3, T] (t/h/w axes);
    ``sections`` partitions the ``head_dim//2`` frequencies into
    t/h/w groups.  ``interleaved=False``: HF ``mrope_section``
    contiguous layout [T..T H..H W..W] (Qwen2/2.5-VL);
    ``interleaved=True``: Qwen3-VL layout — H on dims 1,4,..,<3*sec_h,
    W on dims 2,5,..,<3*sec_w, T everywhere else (preserves frequency
    continuity; transformers ``apply_interleaved_mrope``).  With all
    three position rows equal both reduce exactly to :func:`apply_rope`.
    """
    import numpy as np
    dt = x.dtype
    assert sum(sections) == inv_freq.shape[0], (sections, inv_freq.shape)
    if interleaved:
        ids = np.zeros((inv_freq.shape[0],), np.int32)
        ids[1:3 * sections[1]:3] = 1
        ids[2:3 * sections[2]:3] = 2
        sec_id = jnp.asarray(ids)
    else:
        sec_id = jnp.repeat(jnp.arange(len(sections)),
                            jnp.asarray(sections),
                            total_repeat_length=inv_freq.shape[0])
    # [T, hd/2]: per-frequency positions chosen by section axis
    pos = positions.astype(jnp.float32)[sec_id, :].T
    angles = pos * inv_freq[None, :]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]
    xf = x.astype(jnp.float32)
    if pairs:
        # GLM/ERNIE interleaved-pair rotation with section-chosen angles
        t, h, d = x.shape
        xp = xf.reshape(t, h, d // 2, 2)
        x1, x2 = xp[..., 0], xp[..., 1]
        out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                        axis=-1).reshape(t, h, d)
        return out.astype(dt)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dt)


def activation(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "gelu":
        return jax.nn.gelu
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


def embed_lookup(table: QuantLinear, ids: jax.Array,
                 dtype=jnp.bfloat16) -> jax.Array:
    """Row gather from a (possibly quantized) embedding table [V, H].

    bf16 output is the serving precision policy (activations bf16,
    products f32-accumulated) — parity tests vs f32 torch references
    budget ~2e-3 activation-rounding noise (atol 2e-2 suite-wide)."""
    if table.kind == "dense":
        return table.w[ids].astype(dtype)
    assert table.layout == "nk", \
        "quantized embedding tables must keep the row-gather 'nk' layout"
    if table.kind == "q4":
        packed = table.w[ids]                        # [T, H//2]
        q = _unpack_q4(packed).astype(jnp.float32)
    elif table.kind == "q8":
        q = table.w[ids].astype(jnp.float32)
    else:
        raise ValueError(table.kind)
    # scales are [V, H//G] (row-major like w: a column gather over the
    # 128k-lane vocab axis measured 0.88 ms/step on v5e)
    s = jnp.repeat(table.scales[ids].astype(jnp.float32),
                   table.group_size, axis=-1)
    w = q * s
    if table.biases is not None:
        w = w + jnp.repeat(table.biases[ids].astype(jnp.float32),
                           table.group_size, axis=-1)
    return w.astype(dtype)

# SPDX-License-Identifier: Apache-2.0
"""TurboQuant KV-cache codecs (jnp, kernel-fusable).

Re-implements the math of the reference's codec
(``/root/reference/vllm_metal/attention/caches/turboquant.py``):

* K codec: asymmetric uniform quantization per 32-element block along the
  head dim — signed int8 or unsigned 8/5/4/2-bit, with per-block scale+zero
  (``turboquant.py:368``, ``QUANT_PARAMS:58``).
* V codec: FWHT rotation with a fixed sign table (seeded RNG,
  ``turboquant.py:14,92``) followed by Lloyd-Max non-uniform scalar
  quantization (precomputed 3-bit table ``:19-44``; iteratively fitted for
  other widths ``:117``), per-head-vector scale.

Like the reference (``turboquant.py:242-339`` packs 2/3/4/5-bit codes),
sub-8-bit codes are stored PACKED so the compression is real: each width
decomposes into bit planes from {4, 2, 1} (5 = 4+1, 3 = 2+1), and every
plane packs 8/w codes per int8 byte along the head dim in a STRIDED
layout — byte ``j`` of a w-bit plane holds codes ``{j, j+n, .., j+(8/w-1)n}``
(n = D*w/8), so the in-kernel unpack is 8/w static shifts plus one lane
concatenation (no cross-byte bit extraction, no vector-shift-by-vector).
Scales/zeros store as bfloat16 (encode rounds scales to bf16 first so the
stored value is exactly what dequant uses).

Supported widths (matching reference names):
  K: "q8_0" (signed int8), "q4_0" (uint4), "uint8", "uint4", "int8"
  V: "q8_0", "q5_0", "q4_0", "q3_0", "q2_0"  (Lloyd-Max levels 2^bits)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

K_BLOCK = 32                      # elements per K quant block
FWHT_SIGN_SEED = 1234             # fixed sign-table seed (codec identity)
FWHT_SUPPORTED_HEAD_DIMS = (64, 128, 256, 512)

_K_PARAMS = {
    # name: (signed, bits)
    "q8_0": (True, 8),
    "int8": (True, 8),
    "uint8": (False, 8),
    "q5_0": (False, 5),
    "q4_0": (False, 4),
    "uint4": (False, 4),
    "q2_0": (False, 2),
    "uint2": (False, 2),
}

_V_BITS = {"q8_0": 8, "q5_0": 5, "q4_0": 4, "q3_0": 3, "q2_0": 2}

# Lloyd-Max codebook for 3-bit N(0,1) (the reference's precomputed table,
# turboquant.py:19-44 — optimal 8-level Gaussian quantizer, Max 1960).
_LLOYD_3BIT = np.array(
    [-2.1519680, -1.3439092, -0.7560052, -0.2450508,
     0.2450508, 0.7560052, 1.3439092, 2.1519680], np.float32)


@functools.lru_cache(maxsize=None)
def _lloyd_codebook(bits: int) -> np.ndarray:
    """Lloyd-Max codebook for N(0,1) with 2^bits levels (iterative fit)."""
    if bits == 3:
        return _LLOYD_3BIT
    n = 1 << bits
    # Lloyd's algorithm against the standard normal via fine sampling
    xs = np.linspace(-4.5, 4.5, 20001)
    pdf = np.exp(-xs * xs / 2)
    levels = np.linspace(-2.5, 2.5, n)
    for _ in range(200):
        bounds = (levels[1:] + levels[:-1]) / 2
        idx = np.searchsorted(bounds, xs)
        new = np.array([
            (np.sum(xs[idx == i] * pdf[idx == i])
             / max(np.sum(pdf[idx == i]), 1e-12)) for i in range(n)])
        if np.allclose(new, levels, atol=1e-7):
            levels = new
            break
        levels = new
    return levels.astype(np.float32)


def plane_split(bits: int) -> tuple[int, int]:
    """(hi_width, lo_width) bit-plane decomposition; code = hi | (lo << hi_w)."""
    return {8: (8, 0), 5: (4, 1), 4: (4, 0), 3: (2, 1), 2: (2, 0)}[bits]


def packed_widths(d: int, bits: int) -> tuple[int, int]:
    """Packed byte widths (hi_plane, lo_plane) for a D-wide code row."""
    hi, lo = plane_split(bits)
    return d * hi // 8, d * lo // 8


def pack_codes(codes: jax.Array, bits: int
               ) -> tuple[jax.Array, "jax.Array | None"]:
    """codes [..., D] -> (hi [..., D*hi/8] int8, lo [..., D*lo/8] int8|None).

    Strided plane layout: piece ``s`` of a w-bit plane covers code lanes
    [s*n, (s+1)*n) at bit offset s*w (n = D*w/8)."""
    hi, lo = plane_split(bits)
    if hi == 8:
        return codes.astype(jnp.int8), None
    c = codes.astype(jnp.int32) & ((1 << bits) - 1)
    d = c.shape[-1]

    def pack_plane(vals, w):
        cpb = 8 // w
        n = d // cpb
        out = jnp.zeros(c.shape[:-1] + (n,), jnp.int32)
        for s in range(cpb):
            out = out | (vals[..., s * n:(s + 1) * n] << (s * w))
        return out.astype(jnp.int8)

    hi_arr = pack_plane(c & ((1 << hi) - 1), hi)
    lo_arr = pack_plane(c >> hi, lo) if lo else None
    return hi_arr, lo_arr


def unpack_codes(hi_arr: jax.Array, lo_arr, bits: int) -> jax.Array:
    """Inverse of pack_codes -> [..., D] int32 in [0, 2^bits).

    For 8-bit input returns the raw int32 widening (caller handles
    signedness).  Kernel-safe: static shifts + one lane concat."""
    hi, lo = plane_split(bits)
    if hi == 8:
        return hi_arr.astype(jnp.int32)

    def unpack_plane(p, w):
        cpb = 8 // w
        pi = p.astype(jnp.int32) & 0xFF
        return jnp.concatenate(
            [(pi >> (s * w)) & ((1 << w) - 1) for s in range(cpb)],
            axis=-1)

    c = unpack_plane(hi_arr, hi)
    if lo:
        c = c | (unpack_plane(lo_arr, lo) << hi)
    return c


def pack_block(codes: jax.Array, bits: int
               ) -> tuple[jax.Array, "jax.Array | None"]:
    """Block-payload packing ALONG THE TOKEN AXIS (second-minor).

    codes [..., bs, D] -> (hi [..., bs*hi/8, D] int8, lo [..., bs/8, D]
    int8 | None).  Row ``r`` of a w-bit plane holds tokens
    ``{r, r+n, .., r+(8/w-1)n}`` (n = bs*w/8) at bit offsets s*w — so the
    in-kernel unpack is 8/w static shifts + ONE SUBLANE CONCAT, and every
    plane keeps D full lanes (the 128-lane DMA alignment real-TPU Mosaic
    demands; see docs/quantization.md "Kernel status")."""
    hi, lo = plane_split(bits)
    if hi == 8:
        return codes.astype(jnp.int8), None
    c = codes.astype(jnp.int32) & ((1 << bits) - 1)
    bs = c.shape[-2]

    def plane(vals, w):
        cpb = 8 // w
        n = bs // cpb
        out = jnp.zeros(c.shape[:-2] + (n, c.shape[-1]), jnp.int32)
        for s in range(cpb):
            out = out | (vals[..., s * n:(s + 1) * n, :] << (s * w))
        return out.astype(jnp.int8)

    hi_arr = plane(c & ((1 << hi) - 1), hi)
    lo_arr = plane(c >> hi, lo) if lo else None
    return hi_arr, lo_arr


def unpack_block(hi_arr: jax.Array, lo_arr, bits: int) -> jax.Array:
    """Inverse of pack_block -> [..., bs, D] int32 codes in [0, 2^bits)
    (8-bit: raw int32 widening, caller handles signedness)."""
    hi, lo = plane_split(bits)
    if hi == 8:
        return hi_arr.astype(jnp.int32)

    def unplane(p, w):
        cpb = 8 // w
        pi = p.astype(jnp.int32) & 0xFF
        return jnp.concatenate(
            [(pi >> (s * w)) & ((1 << w) - 1) for s in range(cpb)],
            axis=-2)

    c = unplane(hi_arr, hi)
    if lo:
        c = c | (unplane(lo_arr, lo) << hi)
    return c


def block_plane_rows(bs: int, bits: int) -> tuple[int, int]:
    """Rows (hi_plane, lo_plane) of a bs-token block payload."""
    hi, lo = plane_split(bits)
    return bs * hi // 8, bs * lo // 8


def _round_bf16(x: jax.Array) -> jax.Array:
    """Round to the bf16 grid (pool storage dtype) but keep f32 compute."""
    return x.astype(jnp.bfloat16).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def fwht_signs(head_dim: int) -> np.ndarray:
    """Fixed random sign vector (+-1) — the codec's rotation randomization."""
    rng = np.random.RandomState(FWHT_SIGN_SEED)
    return np.where(rng.rand(head_dim) < 0.5, -1.0, 1.0).astype(np.float32)


def fwht(x: jax.Array) -> jax.Array:
    """Normalized fast Walsh-Hadamard transform along the last axis."""
    d = x.shape[-1]
    assert d & (d - 1) == 0, f"head_dim {d} not a power of two"
    xf = x.astype(jnp.float32)
    h = 1
    while h < d:
        shape = x.shape[:-1] + (d // (2 * h), 2, h)
        xr = xf.reshape(shape)
        a = xr[..., 0, :]
        b = xr[..., 1, :]
        xf = jnp.stack([a + b, a - b], axis=-2).reshape(x.shape)
        h *= 2
    return xf / jnp.sqrt(jnp.asarray(d, jnp.float32))


# ---------------------------------------------------------------------------
# K codec: per-32-block affine
# ---------------------------------------------------------------------------

def k_encode(k: jax.Array, codec: str) -> tuple[jax.Array, jax.Array,
                                                jax.Array]:
    """k [..., D] -> (codes int8 [..., D], scale f32 [..., D/32],
    zero f32 [..., D/32]).  Dequant: x = codes * scale + zero."""
    signed, bits = _K_PARAMS[codec]
    d = k.shape[-1]
    assert d % K_BLOCK == 0
    g = d // K_BLOCK
    kb = k.astype(jnp.float32).reshape(*k.shape[:-1], g, K_BLOCK)
    if signed:
        amax = jnp.max(jnp.abs(kb), axis=-1, keepdims=True)
        qmax = float((1 << (bits - 1)) - 1)
        scale = _round_bf16(amax / qmax)     # pool stores bf16 scales
        inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-20), 0.0)
        codes = jnp.clip(jnp.round(kb * inv), -qmax - 1, qmax)
        zero = jnp.zeros_like(scale)
    else:
        mn = jnp.min(kb, axis=-1, keepdims=True)
        mx = jnp.max(kb, axis=-1, keepdims=True)
        qmax = float((1 << bits) - 1)
        scale = _round_bf16((mx - mn) / qmax)
        zero = _round_bf16(mn)
        inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-20), 0.0)
        codes = jnp.clip(jnp.round((kb - zero) * inv), 0, qmax)
    # float->int8 in XLA saturates at 127; go via int32 (wrapping) so
    # unsigned codes 128..255 round-trip through the int8 store
    codes_i8 = codes.astype(jnp.int32).astype(jnp.int8)
    return (codes_i8.reshape(k.shape), scale[..., 0], zero[..., 0])


def k_decode(codes: jax.Array, scale: jax.Array, zero: jax.Array,
             codec: str, dtype=jnp.bfloat16) -> jax.Array:
    signed, bits = _K_PARAMS[codec]
    d = codes.shape[-1]
    g = d // K_BLOCK
    cb = codes.reshape(*codes.shape[:-1], g, K_BLOCK)
    if signed:
        x = cb.astype(jnp.float32) * scale[..., None]
    else:
        # unsigned codes stored in int8; mask to width
        u = cb.astype(jnp.int32) & ((1 << bits) - 1)
        x = u.astype(jnp.float32) * scale[..., None] + zero[..., None]
    return x.reshape(codes.shape).astype(dtype)


# ---------------------------------------------------------------------------
# V codec: FWHT + Lloyd-Max
# ---------------------------------------------------------------------------

def v_encode(v: jax.Array, codec: str) -> tuple[jax.Array, jax.Array]:
    """v [..., D] -> (codes int8 [..., D], scale f32 [...]).

    Pipeline: sign-flip, FWHT rotate, normalize per vector (rms), nearest
    Lloyd-Max level index.
    """
    bits = _V_BITS[codec]
    d = v.shape[-1]
    assert d in FWHT_SUPPORTED_HEAD_DIMS, d
    signs = jnp.asarray(fwht_signs(d))
    r = fwht(v.astype(jnp.float32) * signs)
    if bits == 8:
        # AFFINE 8-bit (r5): codes = round(r / s), s = max|r|/127.  The
        # in-kernel dequant is a bare int8 cast (the per-token scale is
        # already folded into the softmax weights) — the Lloyd-256
        # codebook this replaces needed a 256-way VPU select per element,
        # which made the "fast" codec the slowest one on TPU.
        scale = _round_bf16(
            jnp.max(jnp.abs(r), axis=-1) / 127.0 + 1e-12)
        codes = jnp.clip(jnp.round(r / scale[..., None]), -127, 127)
        return codes.astype(jnp.int8), scale
    scale = _round_bf16(jnp.sqrt(jnp.mean(r * r, axis=-1) + 1e-12))
    rn = r / scale[..., None]
    levels = jnp.asarray(_lloyd_codebook(bits))
    idx = jnp.argmin(
        jnp.abs(rn[..., None] - levels), axis=-1)
    return idx.astype(jnp.int8), scale


def v_decode(codes: jax.Array, scale: jax.Array, codec: str,
             dtype=jnp.bfloat16) -> jax.Array:
    bits = _V_BITS[codec]
    d = codes.shape[-1]
    signs = jnp.asarray(fwht_signs(d))
    if bits == 8:
        r = codes.astype(jnp.float32) * scale[..., None]
        return (fwht(r) * signs).astype(dtype)
    levels = jnp.asarray(_lloyd_codebook(bits))
    rn = levels[codes.astype(jnp.int32) & ((1 << bits) - 1)]
    r = rn * scale[..., None]
    # FWHT is its own inverse (normalized); undo signs after
    return (fwht(r) * signs).astype(dtype)


def compression_ratio(codec_k: str, codec_v: str, head_dim: int,
                      block_size: int = 0) -> float:
    """Cache compression vs bf16 for the PACKED pool layout (codes in bit
    planes, bf16 scales) — the layout ``QuantPagedKVCache`` allocates.
    ``block_size=128`` additionally accounts for the on-chip pools'
    sublane-tile row padding (int8: 32 rows, bf16: 8).  Reference
    comparison: ``/root/reference/docs/turboquant.md`` "Compression"
    (q8_0/q3_0 2.56x .. uint2/q3_0 4.92x)."""
    _, kb = _K_PARAMS[codec_k]
    vb = _V_BITS[codec_v]
    base = 2 * head_dim * 2                 # K + V rows in bf16
    if block_size == 128 and head_dim % 128 == 0:
        g = head_dim // K_BLOCK
        k_hi, k_lo = block_plane_rows(block_size, kb)
        v_hi, v_lo = block_plane_rows(block_size, vb)
        r8 = -(-(k_hi + k_lo + v_hi + v_lo) // 32) * 32
        rs = -(-(2 * g + 2) // 8) * 8
        per_tok = (r8 * head_dim + rs * block_size * 2) / block_size
        return base * 2 / per_tok * 0.5
    k_hi, k_lo = packed_widths(head_dim, kb)
    v_hi, v_lo = packed_widths(head_dim, vb)
    k_bytes = k_hi + k_lo + head_dim // K_BLOCK * 2 * 2   # + bf16 scale+zero
    v_bytes = v_hi + v_lo + 2 * 2        # + bf16 scale (and its tile-pad row)
    return base / (k_bytes + v_bytes)

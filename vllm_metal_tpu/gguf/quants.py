# SPDX-License-Identifier: Apache-2.0
"""GGML block-quant decoding (vectorized numpy) and TPU repacking.

The reference engine rejects K-quants outright
(``/root/reference/vllm_metal/gguf/loader.py:170-174``) and leans on MLX to
repack Q4_0/Q4_1/Q8_0 into an affine group-32 form
(``/root/reference/vllm_metal/gguf/mlx_native.py:4-14``).  The TPU build
implements the super-block decode itself (Q2_K..Q8_K) and repacks *exactly*
(no fp round-trip) into two runtime formats consumed by the Pallas fused
dequant-matmul kernels:

* ``q4``: packed ``uint8 [N, K//2]`` in K-half-split order — byte ``j``
  holds elem ``j`` (low nibble) and elem ``j + K/2`` (high nibble) — plus
  per-group ``scales``/``biases`` (``w = q * scale + bias``), group 32.
  The half-split layout lets the TPU kernel unpack with a lane concat
  (Mosaic has no sub-32-bit interleave), reading each byte exactly once.
* ``q8``: ``int8 [N, K]`` + per-group ``scales`` (+ optional ``biases``),
  group size 16 or 32.

Layouts follow the llama.cpp ``ggml-quants`` on-disk format.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .reader import GGMLType

QK = 32       # simple-quant block
QK_K = 256    # super-block


def _fp16(buf: np.ndarray) -> np.ndarray:
    return buf.view(np.float16).astype(np.float32)


def _blocks(raw: np.ndarray, block_bytes: int) -> np.ndarray:
    if raw.size % block_bytes:
        raise ValueError(f"raw size {raw.size} not divisible by {block_bytes}")
    return raw.reshape(-1, block_bytes)


def _nibbles(qs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (qs & 0x0F).astype(np.int8), (qs >> 4).astype(np.int8)


# ---------------------------------------------------------------------------
# Simple 32-element blocks
# ---------------------------------------------------------------------------

def _dequant_q4_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 18)
    d = _fp16(b[:, 0:2].copy())            # [nb, 1]
    lo, hi = _nibbles(b[:, 2:18])
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)  # elems 0..15, 16..31
    return (d * (q - 8.0)).reshape(-1)


def _dequant_q4_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 20)
    d = _fp16(b[:, 0:2].copy())
    m = _fp16(b[:, 2:4].copy())
    lo, hi = _nibbles(b[:, 4:20])
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return (d * q + m).reshape(-1)


def _q5_high_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """[nb, 4] uint8 -> [nb, 32] the 5th bit per element (Q5_0/Q5_1 layout)."""
    qh = (qh_bytes[:, 0].astype(np.uint32)
          | (qh_bytes[:, 1].astype(np.uint32) << 8)
          | (qh_bytes[:, 2].astype(np.uint32) << 16)
          | (qh_bytes[:, 3].astype(np.uint32) << 24))
    shifts = np.arange(32, dtype=np.uint32)
    return ((qh[:, None] >> shifts[None, :]) & 1).astype(np.int8)


def _dequant_q5_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 22)
    d = _fp16(b[:, 0:2].copy())
    hb = _q5_high_bits(b[:, 2:6])
    lo, hi = _nibbles(b[:, 6:22])
    q = np.concatenate([lo, hi], axis=1) | (hb << 4)
    return (d * (q.astype(np.float32) - 16.0)).reshape(-1)


def _dequant_q5_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 24)
    d = _fp16(b[:, 0:2].copy())
    m = _fp16(b[:, 2:4].copy())
    hb = _q5_high_bits(b[:, 4:8])
    lo, hi = _nibbles(b[:, 8:24])
    q = np.concatenate([lo, hi], axis=1) | (hb << 4)
    return (d * q.astype(np.float32) + m).reshape(-1)


def _dequant_q8_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 34)
    d = _fp16(b[:, 0:2].copy())
    q = b[:, 2:34].view(np.int8).astype(np.float32)
    return (d * q).reshape(-1)


# ---------------------------------------------------------------------------
# K-quant super-blocks (256 elements)
# ---------------------------------------------------------------------------

def _k_scale_min(scales12: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte 6-bit scale/min table of Q4_K/Q5_K.

    Returns (sc, mn) each [nb, 8] uint8, per 32-element sub-block
    (llama.cpp ``get_scale_min_k4``).
    """
    s = scales12.astype(np.uint8)
    sc = np.empty(s.shape[:-1] + (8,), dtype=np.uint8)
    mn = np.empty_like(sc)
    for j in range(4):
        sc[..., j] = s[..., j] & 63
        mn[..., j] = s[..., j + 4] & 63
    for j in range(4, 8):
        sc[..., j] = (s[..., j + 4] & 0x0F) | ((s[..., j - 4] >> 6) << 4)
        mn[..., j] = (s[..., j + 4] >> 4) | ((s[..., j] >> 6) << 4)
    return sc, mn


def _k_q4_nibbles(qs: np.ndarray) -> np.ndarray:
    """[nb, 128] nibble bytes -> [nb, 256] int8 elems (Q4_K/Q5_K layout).

    Per 64-element chunk c: byte ``qs[c*32 + l]`` holds elem ``c*64 + l``
    (low nibble) and elem ``c*64 + 32 + l`` (high nibble).
    """
    nb = qs.shape[0]
    chunks = qs.reshape(nb, 4, 32)
    lo = (chunks & 0x0F).astype(np.int8)
    hi = (chunks >> 4).astype(np.int8)
    return np.concatenate([lo, hi], axis=2).reshape(nb, 256)


def _dequant_q4_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 144)
    d = _fp16(b[:, 0:2].copy())
    dmin = _fp16(b[:, 2:4].copy())
    sc, mn = _k_scale_min(b[:, 4:16])
    q = _k_q4_nibbles(b[:, 16:144]).astype(np.float32)
    scale = (d * sc.astype(np.float32)).repeat(32, axis=1)    # [nb, 256]
    bias = (dmin * mn.astype(np.float32)).repeat(32, axis=1)
    return (scale * q - bias).reshape(-1)


def _dequant_q5_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 176)
    d = _fp16(b[:, 0:2].copy())
    dmin = _fp16(b[:, 2:4].copy())
    sc, mn = _k_scale_min(b[:, 4:16])
    qh = b[:, 16:48]                       # [nb, 32]
    qs = b[:, 48:176]                      # [nb, 128]
    nb = b.shape[0]
    q4 = _k_q4_nibbles(qs)                 # [nb, 256]
    # high bit: elem e: chunk=e//64, half=(e%64)//32, l=e%32
    # bit index in qh[l] is 2*chunk + half
    e = np.arange(256)
    bit = (2 * (e // 64) + ((e % 64) // 32)).astype(np.uint8)
    l = (e % 32)
    hb = ((qh[:, l] >> bit[None, :]) & 1).astype(np.int8)
    q = q4 + (hb << 4)
    scale = (d * sc.astype(np.float32)).repeat(32, axis=1)
    bias = (dmin * mn.astype(np.float32)).repeat(32, axis=1)
    return (scale * q.astype(np.float32) - bias).reshape(-1)


def _q6_k_elems(ql: np.ndarray, qh: np.ndarray) -> np.ndarray:
    """Q6_K 6-bit values minus 32 -> int8 [nb, 256].

    Per 128-element half h (ql half [nb,64], qh half [nb,32]):
      e in [0,32):    (ql[l] & 0xF)  | ((qh[l] >> 0 & 3) << 4)
      e in [32,64):   (ql[l+32]&0xF) | ((qh[l] >> 2 & 3) << 4)
      e in [64,96):   (ql[l] >> 4)   | ((qh[l] >> 4 & 3) << 4)
      e in [96,128):  (ql[l+32]>>4)  | ((qh[l] >> 6 & 3) << 4)
    """
    nb = ql.shape[0]
    out = np.empty((nb, 2, 128), dtype=np.int16)
    qlh = ql.reshape(nb, 2, 64)
    qhh = qh.reshape(nb, 2, 32)
    for h in range(2):
        lo1 = qlh[:, h, :32] & 0x0F
        lo2 = qlh[:, h, 32:] & 0x0F
        hi1 = qlh[:, h, :32] >> 4
        hi2 = qlh[:, h, 32:] >> 4
        hqs = qhh[:, h]
        out[:, h, 0:32] = lo1 | (((hqs >> 0) & 3) << 4)
        out[:, h, 32:64] = lo2 | (((hqs >> 2) & 3) << 4)
        out[:, h, 64:96] = hi1 | (((hqs >> 4) & 3) << 4)
        out[:, h, 96:128] = hi2 | (((hqs >> 6) & 3) << 4)
    return (out.reshape(nb, 256) - 32).astype(np.int8)


def _dequant_q6_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 210)
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    scales = b[:, 192:208].view(np.int8).astype(np.float32)   # [nb, 16]
    d = _fp16(b[:, 208:210].copy())
    q = _q6_k_elems(ql, qh).astype(np.float32)
    scale = (d * scales).repeat(16, axis=1)                    # per-16 groups
    return (scale * q).reshape(-1)


def _q3_k_scales(scales12: np.ndarray) -> np.ndarray:
    """Q3_K 12-byte -> 16 int8 scales (already minus 32)."""
    a = scales12.astype(np.uint8)
    sc = np.empty(a.shape[:-1] + (16,), dtype=np.int16)
    # low 4 bits of scales: bytes 0..7; high 2 bits from bytes 8..11
    for j in range(16):
        if j < 8:
            low = a[..., j] & 0x0F
        else:
            low = a[..., j - 8] >> 4
        hi = (a[..., 8 + j % 4] >> (2 * (j // 4))) & 3
        sc[..., j] = (low | (hi << 4)).astype(np.int16) - 32
    return sc


def _dequant_q3_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 110)
    hmask = b[:, 0:32]
    qs = b[:, 32:96]
    sc = _q3_k_scales(b[:, 96:108]).astype(np.float32)        # [nb, 16]
    d = _fp16(b[:, 108:110].copy())
    e = np.arange(256)
    n = e // 128
    j = (e % 128) // 32
    half = (e % 32) // 16
    l = e % 16
    qbyte = qs[:, n * 32 + half * 16 + l]
    q2 = ((qbyte >> (2 * j)[None, :]) & 3).astype(np.int16)
    hbyte = hmask[:, half * 16 + l]
    mbit = (n * 4 + j).astype(np.uint8)
    hset = ((hbyte >> mbit[None, :]) & 1).astype(np.int16)
    q = (q2 - np.where(hset == 0, 4, 0)).astype(np.float32)
    group = e // 16
    return (d * sc[:, group] * q).reshape(-1)


def _dequant_q2_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 84)
    scales = b[:, 0:16]
    qs = b[:, 16:80]
    d = _fp16(b[:, 80:82].copy())
    dmin = _fp16(b[:, 82:84].copy())
    e = np.arange(256)
    n = e // 128
    j = (e % 128) // 32
    half = (e % 32) // 16
    l = e % 16
    qbyte = qs[:, n * 32 + half * 16 + l]
    q = ((qbyte >> (2 * j)[None, :]) & 3).astype(np.float32)
    is_ = n * 8 + j * 2 + half
    sc = scales[:, is_]
    dl = d * (sc & 0x0F).astype(np.float32)
    ml = dmin * (sc >> 4).astype(np.float32)
    return (dl * q - ml).reshape(-1)


def _dequant_q8_k(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, 292)
    d = b[:, 0:4].copy().view(np.float32)
    q = b[:, 4:260].view(np.int8).astype(np.float32)
    return (d * q).reshape(-1)


_DEQUANT = {
    GGMLType.Q4_0: _dequant_q4_0,
    GGMLType.Q4_1: _dequant_q4_1,
    GGMLType.Q5_0: _dequant_q5_0,
    GGMLType.Q5_1: _dequant_q5_1,
    GGMLType.Q8_0: _dequant_q8_0,
    GGMLType.Q2_K: _dequant_q2_k,
    GGMLType.Q3_K: _dequant_q3_k,
    GGMLType.Q4_K: _dequant_q4_k,
    GGMLType.Q5_K: _dequant_q5_k,
    GGMLType.Q6_K: _dequant_q6_k,
    GGMLType.Q8_K: _dequant_q8_k,
}


def dequantize(raw: np.ndarray, ggml_type: GGMLType,
               shape: tuple[int, ...]) -> np.ndarray:
    """Decode raw GGUF tensor bytes to float32 with the given logical shape."""
    raw = np.ascontiguousarray(raw).view(np.uint8)
    if ggml_type == GGMLType.F32:
        return raw.view(np.float32).reshape(shape).astype(np.float32)
    if ggml_type == GGMLType.F16:
        return raw.view(np.float16).reshape(shape).astype(np.float32)
    if ggml_type == GGMLType.BF16:
        u32 = raw.view(np.uint16).astype(np.uint32) << 16
        return u32.view(np.float32).reshape(shape)
    if ggml_type in (GGMLType.I8, GGMLType.I16, GGMLType.I32, GGMLType.I64):
        dt = {GGMLType.I8: np.int8, GGMLType.I16: np.int16,
              GGMLType.I32: np.int32, GGMLType.I64: np.int64}[ggml_type]
        return raw.view(dt).reshape(shape).astype(np.float32)
    if ggml_type == GGMLType.F64:
        return raw.view(np.float64).reshape(shape).astype(np.float32)
    fn = _DEQUANT.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"dequantize: {ggml_type.name}")
    return fn(raw).reshape(shape)


# ---------------------------------------------------------------------------
# Exact repack into TPU runtime formats
# ---------------------------------------------------------------------------

@dataclass
class PackedQ4:
    """4-bit affine weights: w = q * scale + bias (group of 32 along K)."""

    packed: np.ndarray   # uint8 [N, K//2]; byte j = elem j | elem j+K/2 << 4
    scales: np.ndarray   # float32 [N, K//32]
    biases: np.ndarray   # float32 [N, K//32]
    group_size: int = 32

    @property
    def shape(self) -> tuple[int, int]:
        return (self.packed.shape[0], self.packed.shape[1] * 2)


@dataclass
class PackedQ8:
    """8-bit weights: w = q * scale (+ bias), group along K."""

    q: np.ndarray                      # int8 [N, K]
    scales: np.ndarray                 # float32 [N, K//G]
    biases: Optional[np.ndarray]       # float32 [N, K//G] or None (symmetric)
    group_size: int

    @property
    def shape(self) -> tuple[int, int]:
        return self.q.shape


def _pack_nibbles(q: np.ndarray) -> np.ndarray:
    """[N, K] (values 0..15) -> uint8 [N, K//2] half-split: byte j holds
    elem j (low) and elem j + K/2 (high)."""
    q = q.astype(np.uint8)
    half = q.shape[1] // 2
    return (q[:, :half] | (q[:, half:] << 4)).astype(np.uint8)


def pack_affine_q4(raw: np.ndarray, ggml_type: GGMLType,
                   shape: tuple[int, int]) -> PackedQ4:
    """Exactly repack a 4-bit GGUF weight into the runtime q4 format."""
    n, k = shape
    raw = np.ascontiguousarray(raw).view(np.uint8)
    if ggml_type == GGMLType.Q4_0:
        b = _blocks(raw, 18)
        d = _fp16(b[:, 0:2].copy())[:, 0]
        lo, hi = _nibbles(b[:, 2:18])
        q = np.concatenate([lo, hi], axis=1)          # [nb, 32]
        scales = d.reshape(n, k // 32)
        biases = (-8.0 * d).reshape(n, k // 32)
    elif ggml_type == GGMLType.Q4_1:
        b = _blocks(raw, 20)
        d = _fp16(b[:, 0:2].copy())[:, 0]
        m = _fp16(b[:, 2:4].copy())[:, 0]
        lo, hi = _nibbles(b[:, 4:20])
        q = np.concatenate([lo, hi], axis=1)
        scales = d.reshape(n, k // 32)
        biases = m.reshape(n, k // 32)
    elif ggml_type == GGMLType.Q4_K:
        b = _blocks(raw, 144)
        d = _fp16(b[:, 0:2].copy())[:, 0]
        dmin = _fp16(b[:, 2:4].copy())[:, 0]
        sc, mn = _k_scale_min(b[:, 4:16])
        q = _k_q4_nibbles(b[:, 16:144])               # [nb, 256]
        scales = (d[:, None] * sc.astype(np.float32)).reshape(n, k // 32)
        biases = (-dmin[:, None] * mn.astype(np.float32)).reshape(n, k // 32)
    else:
        raise NotImplementedError(f"pack_affine_q4: {ggml_type.name}")
    q = q.reshape(n, k)
    return PackedQ4(_pack_nibbles(q), scales.astype(np.float32),
                    biases.astype(np.float32))


def pack_q8(raw: np.ndarray, ggml_type: GGMLType,
            shape: tuple[int, int]) -> PackedQ8:
    """Exactly repack an 5/6/8-bit GGUF weight into the runtime q8 format."""
    n, k = shape
    raw = np.ascontiguousarray(raw).view(np.uint8)
    if ggml_type == GGMLType.Q8_0:
        b = _blocks(raw, 34)
        d = _fp16(b[:, 0:2].copy())[:, 0]
        q = b[:, 2:34].view(np.int8).reshape(n, k)
        return PackedQ8(q, d.reshape(n, k // 32).astype(np.float32), None, 32)
    if ggml_type == GGMLType.Q6_K:
        b = _blocks(raw, 210)
        scales = b[:, 192:208].view(np.int8).astype(np.float32)
        d = _fp16(b[:, 208:210].copy())[:, 0]
        q = _q6_k_elems(b[:, 0:128], b[:, 128:192]).reshape(n, k)
        s = (d[:, None] * scales).reshape(n, k // 16).astype(np.float32)
        return PackedQ8(q, s, None, 16)
    if ggml_type == GGMLType.Q5_K:
        b = _blocks(raw, 176)
        d = _fp16(b[:, 0:2].copy())[:, 0]
        dmin = _fp16(b[:, 2:4].copy())[:, 0]
        sc, mn = _k_scale_min(b[:, 4:16])
        q4 = _k_q4_nibbles(b[:, 48:176])
        e = np.arange(256)
        bit = (2 * (e // 64) + ((e % 64) // 32)).astype(np.uint8)
        l = e % 32
        hb = ((b[:, 16:48][:, l] >> bit[None, :]) & 1).astype(np.int8)
        q = (q4 + (hb << 4)).reshape(n, k)
        s = (d[:, None] * sc.astype(np.float32)).reshape(n, k // 32)
        bias = (-dmin[:, None] * mn.astype(np.float32)).reshape(n, k // 32)
        return PackedQ8(q, s.astype(np.float32), bias.astype(np.float32), 32)
    if ggml_type == GGMLType.Q5_0:
        b = _blocks(raw, 22)
        d = _fp16(b[:, 0:2].copy())[:, 0]
        hb = _q5_high_bits(b[:, 2:6])
        lo, hi = _nibbles(b[:, 6:22])
        q = ((np.concatenate([lo, hi], axis=1) | (hb << 4)) - 16).astype(np.int8)
        return PackedQ8(q.reshape(n, k),
                        d.reshape(n, k // 32).astype(np.float32), None, 32)
    raise NotImplementedError(f"pack_q8: {ggml_type.name}")


# ---------------------------------------------------------------------------
# Encoders (tests + quantizing fp checkpoints into GGUF-compatible blocks)
# ---------------------------------------------------------------------------

def quantize_q8_0(x: np.ndarray) -> np.ndarray:
    """float [.., n*32] -> Q8_0 raw bytes (llama.cpp reference algorithm)."""
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.round(x * inv[:, None]), -128, 127).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:34] = q.view(np.uint8)
    return out.reshape(-1)


def quantize_q4_0(x: np.ndarray) -> np.ndarray:
    """float [.., n*32] -> Q4_0 raw bytes."""
    x = x.reshape(-1, 32).astype(np.float32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = (maxv / -8.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.round(x * inv[:, None]) + 8, 0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:18] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def quantize_q4_k(x: np.ndarray) -> np.ndarray:
    """float [.., n*256] -> Q4_K raw bytes.

    Simplified min/max affine fit per 32-group with 6-bit super-scales (the
    llama.cpp encoder does an iterative refinement; this exact-format encoder
    is for tests and fp->gguf conversion, not bit-parity with llama.cpp).
    """
    x = x.reshape(-1, 8, 32).astype(np.float32)
    nb = x.shape[0]
    gmax = x.max(axis=2)
    gmin = x.min(axis=2)
    sub_scale = (gmax - gmin) / 15.0                     # >= 0
    sub_min = -gmin                                       # bias = -min
    d = sub_scale.max(axis=1) / 63.0                      # [nb]
    dmin = sub_min.max(axis=1) / 63.0
    inv_d = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    inv_m = np.where(dmin > 0, 1.0 / np.where(dmin == 0, 1, dmin), 0.0)
    sc = np.clip(np.round(sub_scale * inv_d[:, None]), 0, 63).astype(np.uint8)
    mn = np.clip(np.round(sub_min * inv_m[:, None]), 0, 63).astype(np.uint8)
    d16 = d.astype(np.float16)
    dmin16 = dmin.astype(np.float16)
    eff_scale = d16.astype(np.float32)[:, None] * sc
    eff_min = dmin16.astype(np.float32)[:, None] * mn
    inv_s = np.where(eff_scale > 0,
                     1.0 / np.where(eff_scale == 0, 1, eff_scale), 0.0)
    q = np.clip(np.round((x + eff_min[:, :, None]) * inv_s[:, :, None]),
                0, 15).astype(np.uint8).reshape(nb, 256)
    # pack scales (inverse of _k_scale_min)
    scales12 = np.zeros((nb, 12), dtype=np.uint8)
    for j in range(4):
        scales12[:, j] = sc[:, j] & 63
        scales12[:, j + 4] = mn[:, j] & 63
    for j in range(4, 8):
        scales12[:, j + 4] = (sc[:, j] & 0x0F) | ((mn[:, j] & 0x0F) << 4)
        scales12[:, j - 4] |= (sc[:, j] >> 4) << 6
        scales12[:, j] |= (mn[:, j] >> 4) << 6
    # pack nibbles (inverse of _k_q4_nibbles)
    qs = np.empty((nb, 4, 32), dtype=np.uint8)
    qc = q.reshape(nb, 4, 2, 32)
    qs = qc[:, :, 0, :] | (qc[:, :, 1, :] << 4)
    out = np.empty((nb, 144), dtype=np.uint8)
    out[:, 0:2] = d16[:, None].view(np.uint8)
    out[:, 2:4] = dmin16[:, None].view(np.uint8)
    out[:, 4:16] = scales12
    out[:, 16:144] = qs.reshape(nb, 128)
    return out.reshape(-1)


def quantize_q6_k(x: np.ndarray) -> np.ndarray:
    """float [.., n*256] -> Q6_K raw bytes (per-16 symmetric 6-bit)."""
    x = x.reshape(-1, 16, 16).astype(np.float32)
    nb = x.shape[0]
    idx = np.abs(x).argmax(axis=2)
    r = np.arange(nb)[:, None], np.arange(16)[None, :]
    gmax = x[r[0], r[1], idx]
    gscale = gmax / -32.0
    d = np.abs(gscale).max(axis=1) / 127.0
    d = np.where(d == 0, 1e-12, d)
    sc = np.clip(np.round(gscale / d[:, None]), -128, 127).astype(np.int8)
    d16 = d.astype(np.float16)
    eff = d16.astype(np.float32)[:, None] * sc.astype(np.float32)
    inv = np.where(eff != 0, 1.0 / np.where(eff == 0, 1, eff), 0.0)
    q = np.clip(np.round(x * inv[:, :, None]), -32, 31).astype(np.int16) + 32
    q = q.reshape(nb, 256).astype(np.uint8)               # 0..63
    # inverse of _q6_k_elems
    ql = np.empty((nb, 2, 64), dtype=np.uint8)
    qh = np.empty((nb, 2, 32), dtype=np.uint8)
    qq = q.reshape(nb, 2, 4, 32)                           # [nb, half, quarter, l]
    ql[:, :, 0:32] = (qq[:, :, 0] & 0x0F) | ((qq[:, :, 2] & 0x0F) << 4)
    ql[:, :, 32:64] = (qq[:, :, 1] & 0x0F) | ((qq[:, :, 3] & 0x0F) << 4)
    qh[:, :, :] = ((qq[:, :, 0] >> 4) | ((qq[:, :, 1] >> 4) << 2)
                   | ((qq[:, :, 2] >> 4) << 4) | ((qq[:, :, 3] >> 4) << 6))
    out = np.empty((nb, 210), dtype=np.uint8)
    out[:, 0:128] = ql.reshape(nb, 128)
    out[:, 128:192] = qh.reshape(nb, 64)
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = d16[:, None].view(np.uint8)
    return out.reshape(-1)


QUANTIZERS = {
    GGMLType.Q8_0: quantize_q8_0,
    GGMLType.Q4_0: quantize_q4_0,
    GGMLType.Q4_K: quantize_q4_k,
    GGMLType.Q6_K: quantize_q6_k,
}

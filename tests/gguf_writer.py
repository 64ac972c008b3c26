# SPDX-License-Identifier: Apache-2.0
"""Minimal GGUF writer used by tests to fabricate checkpoints."""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

from vllm_metal_tpu.gguf.reader import GGML_BLOCK_INFO, GGUF_MAGIC, GGMLType
from vllm_metal_tpu.gguf.quants import QUANTIZERS


def _w_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _w_value(v: Any) -> bytes:
    # type ids: 4 uint32, 5 int32, 6 f32, 7 bool, 8 string, 9 array, 10 u64
    if isinstance(v, bool):
        return struct.pack("<I", 7) + struct.pack("<B", int(v))
    if isinstance(v, int):
        if v < 0:
            return struct.pack("<I", 5) + struct.pack("<i", v)
        if v < 2 ** 32:
            return struct.pack("<I", 4) + struct.pack("<I", v)
        return struct.pack("<I", 10) + struct.pack("<Q", v)
    if isinstance(v, float):
        return struct.pack("<I", 6) + struct.pack("<f", v)
    if isinstance(v, str):
        return struct.pack("<I", 8) + _w_string(v)
    if isinstance(v, (list, tuple)):
        if all(isinstance(x, str) for x in v):
            body = b"".join(_w_string(x) for x in v)
            return (struct.pack("<I", 9) + struct.pack("<I", 8)
                    + struct.pack("<Q", len(v)) + body)
        if all(isinstance(x, int) for x in v):
            body = b"".join(struct.pack("<i", x) for x in v)
            return (struct.pack("<I", 9) + struct.pack("<I", 5)
                    + struct.pack("<Q", len(v)) + body)
        if all(isinstance(x, float) for x in v):
            body = b"".join(struct.pack("<f", x) for x in v)
            return (struct.pack("<I", 9) + struct.pack("<I", 6)
                    + struct.pack("<Q", len(v)) + body)
    raise TypeError(f"unsupported metadata value {v!r}")


def encode_tensor(arr: np.ndarray, ggml_type: GGMLType) -> bytes:
    if ggml_type == GGMLType.F32:
        return arr.astype(np.float32).tobytes()
    if ggml_type == GGMLType.F16:
        return arr.astype(np.float16).tobytes()
    if ggml_type == GGMLType.BF16:
        u32 = arr.astype(np.float32).view(np.uint32)
        return ((u32 >> 16).astype(np.uint16)).tobytes()
    fn = QUANTIZERS.get(ggml_type)
    if fn is None:
        raise NotImplementedError(ggml_type.name)
    return fn(np.asarray(arr)).tobytes()


def write_gguf(path: str, metadata: dict[str, Any],
               tensors: dict[str, tuple[np.ndarray, GGMLType]],
               alignment: int = 32) -> None:
    """Write a GGUF v3 file. ``tensors`` maps name -> (float array, qtype)."""
    header = struct.pack("<IIQQ", GGUF_MAGIC, 3, len(tensors),
                         len(metadata) + 1)
    kv = _w_string("general.alignment") + _w_value(alignment)
    for k, v in metadata.items():
        kv += _w_string(k) + _w_value(v)

    infos = b""
    blobs: list[bytes] = []
    offset = 0
    for name, (arr, qt) in tensors.items():
        blob = encode_tensor(arr, qt)
        be, bb = GGML_BLOCK_INFO[qt]
        assert len(blob) == arr.size // be * bb, name
        # GGUF stores dims with ne[0] = contiguous axis (reverse of numpy).
        dims = list(reversed(arr.shape))
        infos += _w_string(name) + struct.pack("<I", len(dims))
        for d in dims:
            infos += struct.pack("<Q", d)
        infos += struct.pack("<II", int(qt), 0)[:4]  # type as u32
        infos += struct.pack("<Q", offset)
        blobs.append(blob)
        offset += (len(blob) + alignment - 1) // alignment * alignment

    head = header + kv + infos
    pad = (-len(head)) % alignment
    with open(path, "wb") as f:
        f.write(head + b"\x00" * pad)
        for blob in blobs:
            f.write(blob)
            f.write(b"\x00" * ((-len(blob)) % alignment))

# SPDX-License-Identifier: Apache-2.0
"""Pure-numpy GGUF binary reader (no third-party ``gguf`` dependency).

Implements the GGUF v2/v3 container: header, typed metadata KVs, tensor
descriptors, and an aligned memory-mapped data section.  Unlike the
reference — which delegates parsing to the ``gguf`` PyPI package and MLX's
loader (``/root/reference/vllm_metal/gguf/loader.py:66``) — this reader is
self-contained so the TPU engine has no host-framework dependency.
"""

from __future__ import annotations

import enum
import struct
from dataclasses import dataclass
from typing import Any, BinaryIO

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian


class GGMLType(enum.IntEnum):
    """GGML tensor quantization types (subset we support)."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    I8 = 16
    I16 = 17
    I32 = 18
    I64 = 25
    F64 = 28
    BF16 = 30


# (block_elems, block_bytes) per type.
GGML_BLOCK_INFO: dict[GGMLType, tuple[int, int]] = {
    GGMLType.F32: (1, 4),
    GGMLType.F16: (1, 2),
    GGMLType.BF16: (1, 2),
    GGMLType.F64: (1, 8),
    GGMLType.I8: (1, 1),
    GGMLType.I16: (1, 2),
    GGMLType.I32: (1, 4),
    GGMLType.I64: (1, 8),
    GGMLType.Q4_0: (32, 18),
    GGMLType.Q4_1: (32, 20),
    GGMLType.Q5_0: (32, 22),
    GGMLType.Q5_1: (32, 24),
    GGMLType.Q8_0: (32, 34),
    GGMLType.Q8_1: (32, 36),
    GGMLType.Q2_K: (256, 84),
    GGMLType.Q3_K: (256, 110),
    GGMLType.Q4_K: (256, 144),
    GGMLType.Q5_K: (256, 176),
    GGMLType.Q6_K: (256, 210),
    GGMLType.Q8_K: (256, 292),
}


class _MetaType(enum.IntEnum):
    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


_SCALAR_FMT = {
    _MetaType.UINT8: "<B",
    _MetaType.INT8: "<b",
    _MetaType.UINT16: "<H",
    _MetaType.INT16: "<h",
    _MetaType.UINT32: "<I",
    _MetaType.INT32: "<i",
    _MetaType.FLOAT32: "<f",
    _MetaType.UINT64: "<Q",
    _MetaType.INT64: "<q",
    _MetaType.FLOAT64: "<d",
}


@dataclass(frozen=True)
class GGUFTensorInfo:
    name: str
    # Logical shape in row-major (numpy) order: shape[-1] is the contiguous
    # (fastest) axis.  GGUF stores dims reversed (ne[0] fastest); we flip at
    # parse time.
    shape: tuple[int, ...]
    ggml_type: GGMLType
    offset: int  # relative to the aligned data-section start

    @property
    def num_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def nbytes(self) -> int:
        be, bb = GGML_BLOCK_INFO[self.ggml_type]
        if self.num_elements % be:
            raise ValueError(
                f"{self.name}: {self.num_elements} elems not divisible by "
                f"block size {be} for {self.ggml_type.name}")
        return self.num_elements // be * bb


def _read_struct(f: BinaryIO, fmt: str) -> Any:
    size = struct.calcsize(fmt)
    data = f.read(size)
    if len(data) != size:
        raise EOFError("truncated GGUF file")
    out = struct.unpack(fmt, data)
    return out[0] if len(out) == 1 else out


def _read_string(f: BinaryIO) -> str:
    n = _read_struct(f, "<Q")
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f: BinaryIO, vtype: _MetaType) -> Any:
    if vtype == _MetaType.STRING:
        return _read_string(f)
    if vtype == _MetaType.BOOL:
        return bool(_read_struct(f, "<B"))
    if vtype == _MetaType.ARRAY:
        elem_type = _MetaType(_read_struct(f, "<I"))
        count = _read_struct(f, "<Q")
        return [_read_value(f, elem_type) for _ in range(count)]
    return _read_struct(f, _SCALAR_FMT[vtype])


class GGUFFile:
    """Parsed GGUF file: ``metadata`` dict + tensor infos + mmap'd raw data.

    ``tensor_data(name)`` returns the raw quantized bytes as a uint8 view into
    the memory map (zero-copy); pair with :mod:`.quants` to decode.
    """

    def __init__(self, path: str):
        self.path = path
        self.metadata: dict[str, Any] = {}
        self.tensors: dict[str, GGUFTensorInfo] = {}
        with open(path, "rb") as f:
            magic = _read_struct(f, "<I")
            if magic != GGUF_MAGIC:
                raise ValueError(f"{path}: not a GGUF file (magic {magic:#x})")
            self.version = _read_struct(f, "<I")
            if self.version not in (2, 3):
                raise ValueError(f"{path}: unsupported GGUF version {self.version}")
            n_tensors = _read_struct(f, "<Q")
            n_kv = _read_struct(f, "<Q")
            for _ in range(n_kv):
                key = _read_string(f)
                vtype = _MetaType(_read_struct(f, "<I"))
                self.metadata[key] = _read_value(f, vtype)
            infos = []
            for _ in range(n_tensors):
                name = _read_string(f)
                n_dims = _read_struct(f, "<I")
                dims = [_read_struct(f, "<Q") for _ in range(n_dims)]
                ggml_type = GGMLType(_read_struct(f, "<I"))
                offset = _read_struct(f, "<Q")
                # GGUF dims are ne[0..n) with ne[0] the contiguous axis;
                # numpy row-major wants the reverse.
                shape = tuple(reversed(dims)) if dims else (1,)
                infos.append(GGUFTensorInfo(name, shape, ggml_type, offset))
            header_end = f.tell()

        alignment = int(self.metadata.get("general.alignment", 32))
        self.data_offset = (header_end + alignment - 1) // alignment * alignment
        self._mmap = np.memmap(path, dtype=np.uint8, mode="r")
        for info in infos:
            self.tensors[info.name] = info

    @property
    def architecture(self) -> str:
        return str(self.metadata.get("general.architecture", ""))

    def tensor_data(self, name: str) -> np.ndarray:
        info = self.tensors[name]
        start = self.data_offset + info.offset
        return self._mmap[start:start + info.nbytes]

    def __contains__(self, name: str) -> bool:
        return name in self.tensors

    def keys(self):
        return self.tensors.keys()

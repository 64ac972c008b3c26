# SPDX-License-Identifier: Apache-2.0
"""ctypes bindings + JIT build for the native repack library.

The role of the reference's ``build.py`` (clang JIT with sha256 staleness
stamps, ``/root/reference/vllm_metal/metal/build.py:278-319``): compile
``native/gguf_repack.cpp`` once into a cache dir keyed by source hash, load
via ctypes, and expose fast repack entry points.  Callers fall back to the
numpy implementations in :mod:`.quants` when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / \
    "gguf_repack.cpp"
_CACHE_DIR = Path(os.environ.get(
    "VLLM_METAL_TPU_NATIVE_CACHE",
    os.path.expanduser("~/.cache/vllm_metal_tpu")))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    if not _SRC.exists():
        return None
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    out = _CACHE_DIR / f"gguf_repack_{digest}.so"
    if out.exists():
        return out
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", str(_SRC), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native repack build failed (%s); using numpy path", e)
        return None
    os.replace(tmp, out)
    logger.info("built native repack lib: %s", out)
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("VLLM_METAL_TPU_DISABLE_NATIVE") == "1":
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        assert lib.repack_abi_version() == 2
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i8p = ctypes.POINTER(ctypes.c_int8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.repack_q4k.argtypes = [u8p, i64, i64, u8p, f32p, f32p]
        lib.repack_q4_0.argtypes = [u8p, i64, i64, u8p, f32p, f32p]
        lib.repack_q4_1.argtypes = [u8p, i64, i64, u8p, f32p, f32p]
        lib.repack_q8_0.argtypes = [u8p, i64, i8p, f32p]
        lib.repack_q6k.argtypes = [u8p, i64, i8p, f32p]
        lib.dequant_f16.argtypes = [u8p, i64, f32p]
        _lib = lib
    except OSError as e:
        logger.warning("native repack load failed: %s", e)
    return _lib


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pack_affine_q4_native(raw: np.ndarray, ggml_type, shape):
    """Native-accelerated pack_affine_q4 (or None if lib unavailable)."""
    from .quants import PackedQ4
    from .reader import GGMLType

    lib = get_lib()
    if lib is None:
        return None
    n, k = shape
    raw = np.ascontiguousarray(raw).view(np.uint8)
    packed = np.empty((n, k // 2), np.uint8)
    scales = np.empty((n, k // 32), np.float32)
    biases = np.empty((n, k // 32), np.float32)
    if ggml_type == GGMLType.Q4_K:
        lib.repack_q4k(_u8(raw), n, k, _u8(packed), _f32(scales),
                       _f32(biases))
    elif ggml_type == GGMLType.Q4_0:
        lib.repack_q4_0(_u8(raw), n, k, _u8(packed), _f32(scales),
                        _f32(biases))
    elif ggml_type == GGMLType.Q4_1:
        lib.repack_q4_1(_u8(raw), n, k, _u8(packed), _f32(scales),
                        _f32(biases))
    else:
        return None
    return PackedQ4(packed, scales, biases)


def pack_q8_native(raw: np.ndarray, ggml_type, shape):
    from .quants import PackedQ8
    from .reader import GGMLType

    lib = get_lib()
    if lib is None:
        return None
    n, k = shape
    raw = np.ascontiguousarray(raw).view(np.uint8)
    q = np.empty((n, k), np.int8)
    if ggml_type == GGMLType.Q8_0:
        scales = np.empty((n, k // 32), np.float32)
        lib.repack_q8_0(_u8(raw), n * k // 32, _i8(q), _f32(scales))
        return PackedQ8(q, scales, None, 32)
    if ggml_type == GGMLType.Q6_K:
        scales = np.empty((n, k // 16), np.float32)
        lib.repack_q6k(_u8(raw), n * k // 256, _i8(q), _f32(scales))
        return PackedQ8(q, scales, None, 16)
    return None

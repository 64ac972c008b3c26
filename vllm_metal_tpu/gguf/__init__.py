# SPDX-License-Identifier: Apache-2.0
"""GGUF checkpoint support: binary reader, block dequantization (including the
K-quants the reference rejects — ``/root/reference/vllm_metal/gguf/loader.py:170``),
and repacking into TPU-friendly affine group formats."""

from .reader import GGUFFile, GGUFTensorInfo, GGMLType
from .quants import dequantize, pack_affine_q4, pack_q8

__all__ = [
    "GGUFFile",
    "GGUFTensorInfo",
    "GGMLType",
    "dequantize",
    "pack_affine_q4",
    "pack_q8",
]

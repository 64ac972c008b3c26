# SPDX-License-Identifier: Apache-2.0
"""Lazy environment-variable registry.

TPU-native analogue of the reference's env registry
(``/root/reference/vllm_metal/envs.py:34``): every tunable is a
``VLLM_METAL_TPU_*`` variable with a lazy default, readable as
``envs.NAME``.  Unlike the reference (which merges into vLLM's registry),
this registry is self-contained — there is no upstream engine to merge into.
"""

from __future__ import annotations

import os
from typing import Any, Callable


def _bool(v: str) -> bool:
    return v.lower() in ("1", "true", "yes", "on")


# name -> (parser, default factory)
_REGISTRY: dict[str, tuple[Callable[[str], Any], Callable[[], Any]]] = {
    # Fraction of per-chip HBM budgeted for model + KV cache.
    "VLLM_METAL_TPU_MEMORY_FRACTION": (float, lambda: 0.9),
    # Use the paged-attention runtime (0 falls back to dense contiguous cache).
    "VLLM_METAL_TPU_USE_PAGED_ATTENTION": (_bool, lambda: True),
    # Force the pure-jnp reference attention path instead of Pallas kernels.
    "VLLM_METAL_TPU_FORCE_REFERENCE_ATTENTION": (_bool, lambda: False),
    # Run Pallas kernels in interpreter mode (CPU debugging).
    "VLLM_METAL_TPU_PALLAS_INTERPRET": (_bool, lambda: False),
    # KV-cache quantization codec: "" (off), "q8_0", "q4_0" (K codec).
    "VLLM_METAL_TPU_KV_QUANT_K": (str, lambda: ""),
    # V codec: "" (off), "q3_0", "q2_0" (FWHT + Lloyd-Max widths).
    "VLLM_METAL_TPU_KV_QUANT_V": (str, lambda: ""),
    # Speculative verify-window mode (merge K+1 verify rows into one segment).
    "VLLM_METAL_TPU_SPEC_VERIFY_WINDOW": (_bool, lambda: False),
    # Deterministic test seed.
    "VLLM_METAL_TPU_TEST_SEED": (int, lambda: 0),
    # Max number of token-count compile buckets kept alive.
    "VLLM_METAL_TPU_MAX_COMPILE_BUCKETS": (int, lambda: 16),
    # Split-KV decode: number of KV partitions (0 = auto occupancy gate).
    "VLLM_METAL_TPU_SPLIT_KV": (int, lambda: 0),
    # W4A8 decode matmuls: quantize activations to int8 per token so the
    # group-dot kernel runs s8 x s8 on the MXU (measured 1.6x decode
    # matmul bandwidth at 8B on v5e; ~1% relative activation-quant error
    # on the centered term — the group-bias term stays exact).  Default
    # ON for decode-sized batches; set =0 for bit-exact bf16 activations.
    "VLLM_METAL_TPU_W4A8": (_bool, lambda: True),
    # Groups per MXU dot in the group-dot quant matmul (0 = auto: the
    # widest power of two with G*tm <= 128 rows).  G>1 stacks G scale
    # groups into one block-diagonal dot at full K depth (G*32) instead
    # of G separate K=32 dots — trades G x nominal MACs for ~4 x MXU
    # utilization.  Set =1 to force the legacy per-group dots.
    "VLLM_METAL_TPU_QMM_SG": (int, lambda: 0),
    # Server bind host/port defaults.
    "VLLM_METAL_TPU_HOST": (str, lambda: "0.0.0.0"),
    "VLLM_METAL_TPU_PORT": (int, lambda: 8000),
}


def __getattr__(name: str) -> Any:
    if name.startswith("VLLM_METAL_TPU_"):
        if name not in _REGISTRY:
            raise AttributeError(name)
        parser, default = _REGISTRY[name]
        raw = os.environ.get(name)
        if raw is None:
            return default()
        return parser(raw)
    # Short aliases: envs.MEMORY_FRACTION etc.
    full = "VLLM_METAL_TPU_" + name
    if full in _REGISTRY:
        return __getattr__(full)
    raise AttributeError(name)


def registry_keys() -> list[str]:
    return sorted(_REGISTRY)

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
    # (There is deliberately no USE_PAGED_ATTENTION toggle: this engine
    # is paged-only by design — XLA's static shapes favor one bucketed
    # paged program over a second dense runtime; the dense path exists
    # as the tests' oracle.  The reference's toggle guards its legacy
    # contiguous-cache fallback, vllm_metal/v1/contiguous_cache.py.)
    "VLLM_METAL_TPU_MEMORY_FRACTION": (float, lambda: 0.9),
    # Force the pure-jnp reference attention path instead of Pallas kernels.
    "VLLM_METAL_TPU_FORCE_REFERENCE_ATTENTION": (_bool, lambda: False),
    # Run Pallas kernels in interpreter mode (CPU debugging).
    "VLLM_METAL_TPU_PALLAS_INTERPRET": (_bool, lambda: False),
    # KV-cache quantization codec: "" (off), "q8_0", "q4_0" (K codec).
    "VLLM_METAL_TPU_KV_QUANT_K": (str, lambda: ""),
    # V codec: "" (off), "q3_0", "q2_0" (FWHT + Lloyd-Max widths).
    "VLLM_METAL_TPU_KV_QUANT_V": (str, lambda: ""),
    # (No SPEC_VERIFY_WINDOW toggle: verify rows ALWAYS pack as one
    # varlen segment sharing tile KV loads — the reference's opt-in
    # window mode, envs.py:69-79 there, is this engine's only layout.
    # No SPLIT_KV either: the probe (tools/splitkv_probe.py, table in
    # docs/kernels.md) shows batch-1 decode cost on v5e is FIXED
    # overhead, with marginal KV streaming already at ~peak HBM rate —
    # partitioning a sequential core's KV stream reorders work without
    # creating parallelism.)
    # Deterministic test seed.
    "VLLM_METAL_TPU_TEST_SEED": (int, lambda: 0),
    # Max compiled step/window programs kept alive (LRU-evicted beyond
    # this; each holds an XLA executable).
    "VLLM_METAL_TPU_MAX_COMPILE_BUCKETS": (int, lambda: 16),
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

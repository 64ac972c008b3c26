# SPDX-License-Identifier: Apache-2.0
"""vllm_metal_tpu — a TPU-native quantized LLM inference engine.

Built from scratch in JAX/XLA/Pallas with the capability set of the
vllm-metal reference (see SURVEY.md): GGUF weight quantization with fused
dequant-matmul kernels, a unified paged varlen attention kernel, TurboQuant
KV-cache quantization, continuous batching with prefix caching, speculative
decoding, and multi-host mesh sharding.
"""

from .version import __version__

__all__ = ["__version__"]

# SPDX-License-Identifier: Apache-2.0
"""Model implementations.

The reference imports architectures from external ``mlx_lm``/``mlx_vlm`` and
monkey-patches their attention modules
(``/root/reference/vllm_metal/attention/patching.py``).  The TPU framework
owns its models: pure-functional JAX forward passes over pytrees of
(possibly quantized) weights, with attention dependency-injected so one model
body serves the dense path, the paged runtime, and sharded execution.
"""

from .registry import get_model_class, register_model

__all__ = ["get_model_class", "register_model"]

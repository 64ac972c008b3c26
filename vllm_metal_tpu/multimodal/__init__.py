# SPDX-License-Identifier: Apache-2.0
"""Multimodal (vision) subsystem.

TPU-native counterpart of the reference's multimodal stack
(``/root/reference/vllm_metal/multimodal/``, ``v1/mm/``): the reference
adapts external mlx-vlm towers and delegates M-RoPE to upstream vLLM;
here the vision tower, image preprocessing, M-RoPE position math,
embedding splice, and encoder cache are all owned in-repo.
"""

from .mrope import mrope_positions
from .encoder_cache import EncoderCache

__all__ = ["mrope_positions", "EncoderCache"]

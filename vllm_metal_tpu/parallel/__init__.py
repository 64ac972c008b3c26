# SPDX-License-Identifier: Apache-2.0
"""Mesh parallelism.

The reference rejects TP outright (single Apple GPU,
``/root/reference/vllm_metal/platform.py:514-528``) and does PP over a TCP
ring.  On TPU, tensor parallelism over ICI is the core scaling strategy
(SURVEY.md §2.7): weights and the paged KV pool shard over a
``jax.sharding.Mesh``; the forward runs under ``shard_map`` with explicit
Megatron-style collectives (all-gathers/psums compiled onto ICI by XLA).
"""

from .mesh import make_mesh, mesh_shape_for
from .multihost import init_multihost
from .shardings import shard_weights, shard_cache, TPContext

__all__ = ["make_mesh", "mesh_shape_for", "init_multihost",
           "shard_weights", "shard_cache", "TPContext"]

# SPDX-License-Identifier: Apache-2.0
"""Multi-host SPMD initialization.

TPU-native replacement for the reference's three communication planes
(gloo control + MLX TCP ring data + Ray placement, SURVEY.md §2.7):
``jax.distributed.initialize`` coordinates over DCN, every host runs the
same shard_map program, and XLA compiles the collectives over ICI.  No
hand-rolled ring: activation movement is ``psum``/``all_gather``/
``ppermute`` inside the step.

On a pod slice launched through the TPU runtime, ``initialize()`` with
no arguments discovers the topology from the environment; explicit
coordinator settings cover manual bring-up.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed when running multi-host; returns the
    process index (0 for single-host runs, which skip initialization)."""
    explicit = coordinator_address is not None
    env = os.environ.get("VLLM_METAL_TPU_COORDINATOR")
    if env and not explicit:
        coordinator_address = env
        num_processes = int(os.environ.get("VLLM_METAL_TPU_NUM_HOSTS", "1"))
        process_id = int(os.environ.get("VLLM_METAL_TPU_HOST_ID", "0"))
        explicit = True
    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        logger.info("jax.distributed initialized: process %d / %d",
                    jax.process_index(), jax.process_count())
    else:
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        # real pod-slice runtimes export a comma-separated host list;
        # some sandboxes export warning text instead — ignore those
        multi = "," in hosts and " " not in hosts
        if multi:
            jax.distributed.initialize()
            logger.info("jax.distributed auto-initialized: "
                        "process %d / %d",
                        jax.process_index(), jax.process_count())
    return jax.process_index() if jax.process_count() > 1 else 0

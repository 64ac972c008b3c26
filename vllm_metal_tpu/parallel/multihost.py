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


class RequestFeed:
    """Per-step request-event broadcast for multi-host LOCKSTEP serving.

    The serving design (docs/distributed.md "Multi-host"): every host
    runs an IDENTICAL, deterministic ``LLMEngine`` — same scheduler
    decisions, same jitted step sequence on its addressable shards, and
    the on-device sampler is computed replicated (bitwise identical
    tokens on every chip), so the only state that must move between
    hosts is the REQUEST STREAM.  Process 0 (the only HTTP server)
    queues add/abort events; each engine-loop iteration every host calls
    :meth:`exchange`, which broadcasts the queued events to all
    processes.  The broadcast is also the lockstep barrier: followers
    block in it until the primary reaches its next iteration.

    Events are JSON (token ids + sampling params); grammar-constrained
    requests are rejected at the API layer in multi-host mode (the FSM
    object has no wire format yet).

    ``transport`` is injectable for single-process tests; the default
    broadcasts via ``jax.experimental.multihost_utils`` (two rounds:
    int32 length, then the padded payload).
    """

    def __init__(self, transport=None):
        self.transport = transport or self._jax_broadcast
        self._queue: list[dict] = []
        # True on the primary once a {"op": "stop"} event has been
        # broadcast — the engine loop must NOT run another exchange after
        # that (followers have exited; the collective would hang forever)
        self.stop_sent = False

    # -- primary side -------------------------------------------------
    def queue_add(self, request_id: str, prompt_token_ids: list[int],
                  params_dict: dict) -> None:
        self._queue.append({"op": "add", "id": request_id,
                            "prompt": list(map(int, prompt_token_ids)),
                            "params": params_dict})

    def queue_abort(self, request_id: str) -> None:
        self._queue.append({"op": "abort", "id": request_id})

    def queue_stop(self) -> None:
        self._queue.append({"op": "stop"})

    # -- every host, once per engine-loop iteration --------------------
    def exchange(self) -> list[dict]:
        import json
        if any(ev.get("op") == "stop" for ev in self._queue):
            self.stop_sent = True
        payload = json.dumps(self._queue).encode() if self._queue else b"[]"
        self._queue = []
        out = self.transport(payload)
        return json.loads(out.decode())

    @staticmethod
    def _jax_broadcast(payload: bytes) -> bytes:
        import numpy as np
        from jax.experimental import multihost_utils as mhu
        if jax.process_count() == 1:
            return payload
        n = int(mhu.broadcast_one_to_all(
            np.asarray(len(payload), np.int32)))
        if jax.process_index() == 0:
            buf = np.frombuffer(payload, np.uint8).copy()
        else:
            buf = np.zeros(n, np.uint8)
        out = mhu.broadcast_one_to_all(buf)
        return np.asarray(out).tobytes()


def apply_feed_events(engine, events: list[dict]) -> None:
    """Replay broadcast request events into a follower engine — the
    SAME engine/device calls the primary makes, so schedulers and the
    sharded device-step sequences stay in lockstep (embed/classify run
    sharded compute too and MUST be mirrored)."""
    from ..engine.sampling_params import SamplingParams
    for ev in events:
        try:
            if ev["op"] == "add":
                engine.add_request(ev["prompt"],
                                   SamplingParams(**ev["params"]),
                                   request_id=ev["id"],
                                   lora_name=ev.get("lora"))
            elif ev["op"] == "abort":
                engine.abort_request(ev["id"])
            elif ev["op"] == "embed":
                engine.embed(ev["prompt"])
            elif ev["op"] == "classify":
                engine.classify(ev["prompt"], ev["no"], ev["yes"])
            elif ev["op"] == "probe":
                engine.device_probe()
        except Exception:
            # the primary hit (and surfaced) the same deterministic
            # error; both engines skipped the state change
            logger.debug("follower event failed", exc_info=True)


def run_follower(engine, feed: RequestFeed, max_iters=None) -> int:
    """Non-primary host serving loop: replay the primary's request
    stream and execute the same engine steps.  Returns steps executed
    (the loop ends when the feed delivers {"op": "stop"})."""
    steps = 0
    it = 0
    while max_iters is None or it < max_iters:
        it += 1
        events = feed.exchange()
        if any(ev.get("op") == "stop" for ev in events):
            break
        apply_feed_events(
            engine, [e for e in events if e["op"] != "stop"])
        if engine.has_unfinished():
            # Same failure policy as the primary's _run loop (ADVICE r4):
            # a deterministic step error hits every host; the primary
            # catches it, eventually aborts the in-flight requests, and
            # BROADCASTS those aborts through the feed — so the follower
            # must swallow the error and keep exchanging (crashing here
            # would hang the primary's next collective).
            try:
                engine.step()
                steps += 1
            except Exception:
                logger.exception("follower engine step failed")
    return steps

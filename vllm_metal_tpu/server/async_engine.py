# SPDX-License-Identifier: Apache-2.0
"""Async wrapper driving the synchronous LLMEngine from an event loop.

The engine loop runs in a dedicated thread (the device step releases the
GIL inside XLA); results stream back to per-request asyncio queues.  This
preserves the reference's overlap contract (scheduler work on host
concurrent with device execution, SURVEY.md §3.2) at the server level.
"""

from __future__ import annotations

import asyncio
import logging
import queue
import threading
import uuid
from typing import AsyncIterator, Optional

from ..engine.engine import LLMEngine
from ..engine.outputs import RequestOutput
from ..engine.sampling_params import SamplingParams

logger = logging.getLogger(__name__)

_SENTINEL = object()


class AsyncEngine:
    def __init__(self, engine: LLMEngine, feed=None):
        self.engine = engine
        # multi-host lockstep serving: a parallel.multihost.RequestFeed
        # broadcasting this (primary) host's request events to follower
        # hosts each loop iteration (docs/distributed.md "Multi-host")
        self.feed = feed
        self.loop: Optional[asyncio.AbstractEventLoop] = None
        self._in: "queue.Queue" = queue.Queue()
        self._queues: dict[str, asyncio.Queue] = {}
        self._futs: dict[str, object] = {}
        self._fut_counter = 0
        self._wake = threading.Event()
        self._stop = False
        self._steps = 0
        self._wedged: Optional[str] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="engine-loop")

    def start(self, loop: asyncio.AbstractEventLoop) -> None:
        self.loop = loop
        self._thread.start()

    def shutdown(self) -> None:
        if self.feed is not None:
            self.feed.queue_stop()
        self._stop = True
        self._wake.set()

    # -- engine thread ---------------------------------------------------
    def _params_dict(self, params: SamplingParams) -> dict:
        import dataclasses
        d = dataclasses.asdict(params)
        d.pop("grammar", None)      # no wire format (API layer rejects)
        return d

    def _drain_to_feed(self) -> None:
        """Multi-host primary: turn inbox items into broadcastable feed
        events (applied identically on every host by _apply_events)."""
        while True:
            try:
                kind, payload = self._in.get_nowait()
            except queue.Empty:
                return
            if kind == "add":
                rid, ids, params, mm, lora = payload
                if mm is not None and mm:
                    self._emit(rid, ValueError(
                        "multimodal requests unsupported in multi-host "
                        "serving (features have no wire format yet)"))
                    continue
                self.feed._queue.append({
                    "op": "add", "id": rid, "prompt": list(map(int, ids)),
                    "params": self._params_dict(params), "lora": lora})
            elif kind == "abort":
                self.feed.queue_abort(payload)
            elif kind in ("embed", "classify", "probe"):
                tag = f"f{self._fut_counter}"
                self._fut_counter += 1
                self._futs[tag] = payload
                if kind == "embed":
                    self.feed._queue.append(
                        {"op": "embed", "tag": tag,
                         "prompt": list(map(int, payload[0]))})
                elif kind == "classify":
                    ids, no_id, yes_id, fut = payload
                    self.feed._queue.append(
                        {"op": "classify", "tag": tag,
                         "prompt": list(map(int, ids)),
                         "no": int(no_id), "yes": int(yes_id)})
                else:
                    self.feed._queue.append({"op": "probe", "tag": tag})

    def _apply_events(self, events: list) -> None:
        """Apply broadcast events — the SAME calls run on every host, so
        engines stay in lockstep; only the primary resolves futures."""
        for ev in events:
            op = ev.get("op")
            try:
                if op == "add":
                    self.engine.add_request(
                        ev["prompt"], SamplingParams(**ev["params"]),
                        request_id=ev["id"], lora_name=ev.get("lora"))
                elif op == "abort":
                    self.engine.abort_request(ev["id"])
                elif op == "embed":
                    vec = self.engine.embed(ev["prompt"])
                    p = self._futs.pop(ev["tag"], None)
                    if p is not None:
                        self.loop.call_soon_threadsafe(
                            p[1].set_result, vec)
                elif op == "classify":
                    score = self.engine.classify(ev["prompt"], ev["no"],
                                                 ev["yes"])
                    p = self._futs.pop(ev["tag"], None)
                    if p is not None:
                        self.loop.call_soon_threadsafe(
                            p[3].set_result, score)
                elif op == "probe":
                    self.engine.device_probe()
                    p = self._futs.pop(ev["tag"], None)
                    if p is not None:
                        self.loop.call_soon_threadsafe(
                            p.set_result, True)
            except Exception as e:
                p = self._futs.pop(ev.get("tag", ""), None)
                if p is not None:
                    fut = p if op == "probe" else p[-1]
                    self.loop.call_soon_threadsafe(fut.set_exception, e)
                elif op == "add":
                    self._emit(ev["id"], e)

    def _drain_inbox(self) -> None:
        if self.feed is not None:
            self._drain_to_feed()
            self._apply_events(self.feed.exchange())
            return
        while True:
            try:
                kind, payload = self._in.get_nowait()
            except queue.Empty:
                return
            if kind == "add":
                rid, ids, params, mm, lora = payload
                try:
                    self.engine.add_request(ids, params, request_id=rid,
                                            mm_features=mm,
                                            lora_name=lora)
                except Exception as e:  # surface validation errors
                    self._emit(rid, e)
            elif kind == "abort":
                self.engine.abort_request(payload)
            elif kind == "embed":
                ids, fut = payload
                try:
                    vec = self.engine.embed(ids)
                    self.loop.call_soon_threadsafe(fut.set_result, vec)
                except Exception as e:
                    self.loop.call_soon_threadsafe(fut.set_exception, e)
            elif kind == "classify":
                ids, no_id, yes_id, fut = payload
                try:
                    score = self.engine.classify(ids, no_id, yes_id)
                    self.loop.call_soon_threadsafe(fut.set_result, score)
                except Exception as e:
                    self.loop.call_soon_threadsafe(fut.set_exception, e)
            elif kind == "probe":
                fut = payload
                try:
                    self.engine.device_probe()
                    self.loop.call_soon_threadsafe(fut.set_result, True)
                except Exception as e:
                    self.loop.call_soon_threadsafe(fut.set_exception, e)

    def _emit(self, rid: str, item) -> None:
        q = self._queues.get(rid)
        if q is not None and self.loop is not None:
            self.loop.call_soon_threadsafe(q.put_nowait, item)

    _MAX_STEP_FAILURES = 3

    def _run(self) -> None:
        failures = 0
        while not self._stop:
            self._drain_inbox()
            if self._stop:
                break
            if not self.engine.has_unfinished():
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            try:
                outs = self.engine.step()
                failures = 0
                self._steps += 1
                self._wedged = None
            except Exception as e:
                logger.exception("engine step failed")
                failures += 1
                if failures >= self._MAX_STEP_FAILURES:
                    # the engine is wedged (e.g. device backend error):
                    # fail every in-flight request instead of hanging the
                    # clients, then drop the engine state for a clean retry
                    # (mirrors the reference's engine-death request abort,
                    # /root/reference/vllm_metal/v1/engine_core.py)
                    err = RuntimeError(f"engine step failed: {e!r}")
                    self._wedged = repr(e)
                    for rid in list(self._queues):
                        if self.feed is not None:
                            # route through the feed so followers replay
                            # the abort and stay in lockstep (ADVICE r4);
                            # applied on every host at the next exchange
                            self.feed.queue_abort(rid)
                        else:
                            try:
                                self.engine.abort_request(rid)
                            except Exception:
                                pass
                        self._emit(rid, err)
                    failures = 0
                continue
            for out in outs:
                self._emit(out.request_id, out)
        if self.feed is not None and not self.feed.stop_sent:
            # broadcast the stop so follower hosts exit their loops
            # (skipped when _drain_inbox already broadcast it — a second
            # exchange with followers gone would hang in the collective)
            self.feed.queue_stop()
            self.feed.exchange()

    # -- async API -------------------------------------------------------
    async def check_health(self, probe_timeout: float = 5.0) -> dict:
        """Worker health check (reference: one-op device eval,
        ``/root/reference/vllm_metal/v1/worker.py:349``).

        Unhealthy when the engine thread died, or the step loop wedged
        (``_MAX_STEP_FAILURES`` consecutive step errors).  When the engine
        is idle, additionally evaluates one tiny device op through the
        engine thread so a hung device backend is detected; while busy the
        advancing step counter is the liveness signal.
        """
        if self._thread.ident is not None and not self._thread.is_alive():
            return {"healthy": False, "reason": "engine thread dead"}
        if self._wedged is not None:
            return {"healthy": False,
                    "reason": f"engine wedged: {self._wedged}"}
        if not self.engine.has_unfinished() and self.loop is not None:
            fut = self.loop.create_future()
            self._in.put(("probe", fut))
            self._wake.set()
            try:
                await asyncio.wait_for(fut, probe_timeout)
            except asyncio.TimeoutError:
                return {"healthy": False, "reason": "device probe timeout"}
            except Exception as e:
                return {"healthy": False,
                        "reason": f"device probe failed: {e!r}"}
        return {"healthy": True, "steps": self._steps}

    async def generate(self, prompt_ids: list[int], params: SamplingParams,
                       request_id: Optional[str] = None,
                       mm_features: Optional[list] = None,
                       lora_name: Optional[str] = None
                       ) -> AsyncIterator[RequestOutput]:
        rid = request_id or f"req-{uuid.uuid4().hex[:16]}"
        q: asyncio.Queue = asyncio.Queue()
        self._queues[rid] = q
        self._in.put(("add", (rid, prompt_ids, params, mm_features,
                              lora_name)))
        self._wake.set()
        try:
            while True:
                item = await q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
                if item.finished:
                    return
        finally:
            self._queues.pop(rid, None)

    def abort(self, request_id: str) -> None:
        self._in.put(("abort", request_id))
        self._wake.set()

    async def embed(self, prompt_ids: list[int]):
        """Embedding computed on the engine thread (runner isn't
        concurrent-safe: the KV pool is donated through each step)."""
        import asyncio
        fut = asyncio.get_running_loop().create_future()
        self._in.put(("embed", (prompt_ids, fut)))
        self._wake.set()
        return await fut

    async def classify(self, prompt_ids: list[int], no_id: int,
                       yes_id: int) -> float:
        import asyncio
        fut = asyncio.get_running_loop().create_future()
        self._in.put(("classify", (prompt_ids, no_id, yes_id, fut)))
        self._wake.set()
        return await fut

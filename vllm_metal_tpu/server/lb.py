# SPDX-License-Identifier: Apache-2.0
"""Data-parallel serving: a front load balancer over replica processes.

TPU DP is replica-per-process (one engine per chip/slice — no cross-chip
state to share; ``docs/distributed.md``), so the missing piece is the
glue: this module is an asyncio reverse proxy that spreads OpenAI-API
traffic over replica base URLs.

Routing: least outstanding requests (continuous batching means a
replica's open-request count IS its load signal), with round-robin tie
breaking.  Health: replicas failing a request or the periodic
``/health`` probe leave the rotation until a probe passes again.
Streaming responses pass through chunk-by-chunk.  ``/metrics``
aggregates every replica's Prometheus text with a ``replica`` label.

The reference has no counterpart (single-process Metal serving); design
follows the standard vLLM-class deployment pattern (external LB over
API servers).
"""

from __future__ import annotations

import asyncio
import logging
import time
from typing import Optional

import aiohttp
from aiohttp import web

logger = logging.getLogger(__name__)

HOP_HEADERS = {"host", "content-length", "transfer-encoding", "connection"}


def merge_replica_label(line: str, lbl: str) -> str:
    """Inject ``lbl`` (e.g. replica="http://...") into a Prometheus sample
    line.  Splits on the LAST '}' — label values may legally contain
    spaces and braces-in-quotes are not produced by our exporters, so
    ``m{a="b c"} 1`` merges to ``m{a="b c",replica="..."} 1`` (ADVICE r4:
    partition(' ') corrupted such lines)."""
    if "{" in line and "}" in line:
        head, _, rest = line.rpartition("}")
        base, _, lbls = head.partition("{")
        return f'{base}{{{lbls},{lbl}}}{rest}'
    name, _, rest = line.partition(" ")
    return f'{name}{{{lbl}}} {rest}'


class Replica:
    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")
        self.outstanding = 0
        self.healthy = True
        self.last_error: Optional[str] = None

    def __repr__(self):
        return (f"Replica({self.base_url}, out={self.outstanding}, "
                f"healthy={self.healthy})")


class LoadBalancer:
    def __init__(self, backends: list[str],
                 probe_interval: float = 5.0,
                 request_timeout: float = 600.0):
        assert backends, "need at least one backend"
        self.replicas = [Replica(b) for b in backends]
        self._rr = 0
        self.probe_interval = probe_interval
        self.request_timeout = request_timeout
        self._session: Optional[aiohttp.ClientSession] = None
        self._probe_task: Optional[asyncio.Task] = None
        self.num_requests = 0
        self.num_failovers = 0

    # ------------------------------------------------------------------
    def pick(self) -> Optional[Replica]:
        """Least-outstanding among healthy replicas, round-robin ties."""
        healthy = [r for r in self.replicas if r.healthy]
        if not healthy:
            return None
        lo = min(r.outstanding for r in healthy)
        tied = [r for r in healthy if r.outstanding == lo]
        self._rr = (self._rr + 1) % len(tied)
        return tied[self._rr]

    async def _probe_loop(self):
        while True:
            await asyncio.sleep(self.probe_interval)
            for r in self.replicas:
                try:
                    async with self._session.get(
                            r.base_url + "/health",
                            timeout=aiohttp.ClientTimeout(total=5)) as resp:
                        ok = resp.status == 200
                except Exception as e:
                    ok = False
                    r.last_error = str(e)
                if ok and not r.healthy:
                    logger.info("replica %s back in rotation", r.base_url)
                r.healthy = ok

    # ------------------------------------------------------------------
    async def _proxy(self, request: web.Request) -> web.StreamResponse:
        body = await request.read()
        self.num_requests += 1
        tried: set[str] = set()
        while True:
            rep = self.pick()
            if rep is None or rep.base_url in tried:
                return web.json_response(
                    {"error": {"message": "no healthy replica",
                               "type": "service_unavailable"}},
                    status=503)
            tried.add(rep.base_url)
            rep.outstanding += 1
            started: list[web.StreamResponse] = []
            try:
                return await self._forward(request, rep, body, started)
            except (aiohttp.ClientError, asyncio.TimeoutError) as e:
                logger.warning("replica %s failed: %s", rep.base_url, e)
                rep.healthy = False
                rep.last_error = str(e)
                self.num_failovers += 1
                if started:
                    # Headers (and possibly body bytes) already reached the
                    # client: a retry or a second response would corrupt the
                    # stream.  Abort this client connection instead.
                    if request.transport is not None:
                        request.transport.close()
                    return started[0]
            finally:
                rep.outstanding -= 1

    async def _forward(self, request: web.Request, rep: Replica,
                       body: bytes,
                       started: list[web.StreamResponse]) -> web.StreamResponse:
        """Proxy one request.  Appends the response to ``started`` the moment
        ``prepare()`` runs, so the caller can tell a pre-send failure (safe to
        fail over) from a mid-stream one (client connection must be aborted)."""
        headers = {k: v for k, v in request.headers.items()
                   if k.lower() not in HOP_HEADERS}
        async with self._session.request(
                request.method, rep.base_url + request.path_qs,
                data=body if body else None, headers=headers,
                timeout=aiohttp.ClientTimeout(total=self.request_timeout),
        ) as resp:
            out = web.StreamResponse(status=resp.status)
            for k, v in resp.headers.items():
                if k.lower() not in HOP_HEADERS:
                    out.headers[k] = v
            await out.prepare(request)
            started.append(out)
            async for chunk in resp.content.iter_any():
                await out.write(chunk)
            await out.write_eof()
            return out

    # ------------------------------------------------------------------
    async def _metrics(self, request: web.Request) -> web.Response:
        parts = [
            "# TYPE vllm_metal_tpu_lb_requests_total counter",
            f"vllm_metal_tpu_lb_requests_total {self.num_requests}",
            "# TYPE vllm_metal_tpu_lb_failovers_total counter",
            f"vllm_metal_tpu_lb_failovers_total {self.num_failovers}",
        ]
        for r in self.replicas:
            lbl = f'replica="{r.base_url}"'
            parts.append(
                f"vllm_metal_tpu_lb_outstanding{{{lbl}}} {r.outstanding}")
            parts.append(
                f"vllm_metal_tpu_lb_healthy{{{lbl}}} {int(r.healthy)}")
            if r.healthy:
                try:
                    async with self._session.get(
                            r.base_url + "/metrics",
                            timeout=aiohttp.ClientTimeout(total=5)) as resp:
                        text = await resp.text()
                    for line in text.splitlines():
                        if line and not line.startswith("#"):
                            parts.append(merge_replica_label(line, lbl))
                except Exception:
                    pass
        return web.Response(text="\n".join(parts) + "\n")

    async def _health(self, request: web.Request) -> web.Response:
        n = sum(r.healthy for r in self.replicas)
        status = 200 if n else 503
        return web.json_response(
            {"status": "ok" if n else "unhealthy",
             "healthy_replicas": n, "total_replicas": len(self.replicas)},
            status=status)

    # ------------------------------------------------------------------
    def app(self) -> web.Application:
        app = web.Application(client_max_size=256 * 1024 * 1024)
        app.router.add_get("/health", self._health)
        app.router.add_get("/metrics", self._metrics)
        app.router.add_route("*", "/{tail:.*}", self._proxy)
        app.on_startup.append(self._startup)
        app.on_cleanup.append(self._cleanup)
        return app

    async def _startup(self, app):
        self._session = aiohttp.ClientSession()
        self._probe_task = asyncio.get_running_loop().create_task(
            self._probe_loop())

    async def _cleanup(self, app):
        if self._probe_task:
            self._probe_task.cancel()
        if self._session:
            await self._session.close()


def serve_lb(backends: list[str], host: str = "0.0.0.0",
             port: int = 8080) -> None:
    lb = LoadBalancer(backends)
    logger.info("load balancer on http://%s:%d -> %s", host, port, backends)
    web.run_app(lb.app(), host=host, port=port, print=None)

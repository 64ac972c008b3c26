# SPDX-License-Identifier: Apache-2.0
"""Data-parallel load balancer: 2 engine replicas behind the LB proxy.

The missing DP glue from rounds 1-2: an actual 2-replica serve test —
traffic spreads, streaming passes through, a dead replica fails over
and /metrics aggregates with replica labels.
"""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tests.test_server import gguf_path  # noqa: F401  (fixture)
from vllm_metal_tpu.engine.launcher import build_engine
from vllm_metal_tpu.server.async_engine import AsyncEngine
from vllm_metal_tpu.server.lb import LoadBalancer
from vllm_metal_tpu.server.openai_server import OpenAIServer


def _replica(gguf):
    engine, tok = build_engine(gguf, num_blocks=32, block_size=16,
                               max_num_seqs=4, max_num_batched_tokens=64,
                               use_pallas=False)
    engine.cfg.scheduler.token_buckets = (16, 32, 64)
    ae = AsyncEngine(engine)
    return ae, OpenAIServer(ae, tok, model_name="tiny")


async def _run(gguf, fn, n_replicas=2):
    aes, clients, urls = [], [], []
    for _ in range(n_replicas):
        ae, srv = _replica(gguf)
        ae.start(asyncio.get_running_loop())
        client = TestClient(TestServer(srv.app()))
        await client.start_server()
        aes.append(ae)
        clients.append(client)
        urls.append(str(client.make_url("")).rstrip("/"))
    lb = LoadBalancer(urls, probe_interval=0.2)
    lb_client = TestClient(TestServer(lb.app()))
    await lb_client.start_server()
    try:
        await fn(lb, lb_client)
    finally:
        await lb_client.close()
        for c in clients:
            await c.close()
        for ae in aes:
            ae.shutdown()


def test_lb_spreads_and_serves(gguf_path):  # noqa: F811
    async def fn(lb, client):
        payload = {"model": "tiny", "prompt": [3, 5, 7],
                   "max_tokens": 4, "temperature": 0.0,
                   "ignore_eos": True}
        outs = await asyncio.gather(*[
            client.post("/v1/completions", json=payload) for _ in range(6)])
        texts = []
        for r in outs:
            assert r.status == 200
            data = await r.json()
            assert data["usage"]["completion_tokens"] == 4
            texts.append(data["choices"][0]["text"])
        # deterministic greedy: replicas agree
        assert len(set(texts)) == 1
        assert lb.num_requests == 6

        r = await client.get("/health")
        assert (await r.json())["healthy_replicas"] == 2

        r = await client.get("/metrics")
        text = await r.text()
        assert "vllm_metal_tpu_lb_requests_total 6" in text
        assert text.count('vllm_metal_tpu_lb_healthy{') == 2
        # replica-labelled engine metrics aggregated through the proxy
        assert 'vllm_metal_tpu_generation_tokens_total{replica=' in text

    asyncio.run(_run(gguf_path, fn))


def test_lb_streaming_passthrough(gguf_path):  # noqa: F811
    async def fn(lb, client):
        payload = {"model": "tiny", "prompt": [2, 4], "max_tokens": 3,
                   "temperature": 0.0, "stream": True, "ignore_eos": True}
        r = await client.post("/v1/completions", json=payload)
        assert r.status == 200
        body = await r.text()
        chunks = [json.loads(line[6:]) for line in body.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        total = sum(len(c["choices"][0]["text"]) > 0 for c in chunks)
        assert total >= 1
        assert body.rstrip().endswith("data: [DONE]")

    asyncio.run(_run(gguf_path, fn))


def test_lb_failover(gguf_path):  # noqa: F811
    async def fn(lb, client):
        # kill replica 0 out from under the LB: requests fail over
        dead = lb.replicas[0]
        dead.base_url = "http://127.0.0.1:1"   # nothing listens here
        payload = {"model": "tiny", "prompt": [9], "max_tokens": 2,
                   "temperature": 0.0, "ignore_eos": True}
        oks = 0
        for _ in range(4):
            r = await client.post("/v1/completions", json=payload)
            if r.status == 200:
                oks += 1
        assert oks == 4                      # every request served
        assert not dead.healthy              # dead replica marked
        r = await client.get("/health")
        assert (await r.json())["healthy_replicas"] == 1

    asyncio.run(_run(gguf_path, fn))


def test_merge_replica_label_space_in_value():
    """Label values containing spaces must merge intact (ADVICE r4)."""
    from vllm_metal_tpu.server.lb import merge_replica_label
    lbl = 'replica="http://h:1"'
    assert merge_replica_label('m{a="b c"} 1', lbl) == \
        'm{a="b c",replica="http://h:1"} 1'
    assert merge_replica_label("m 2.5", lbl) == \
        'm{replica="http://h:1"} 2.5'
    assert merge_replica_label('m{x="1"} 3 1700000000', lbl) == \
        'm{x="1",replica="http://h:1"} 3 1700000000'

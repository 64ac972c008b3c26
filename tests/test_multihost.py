# SPDX-License-Identifier: Apache-2.0
"""Multi-host lockstep serving: request-feed broadcast + follower replay.

Tier 1: seam tests with an in-process wire (serialization + lockstep
semantics).  Tier 2: a REAL 2-process ``jax.distributed`` run over the
CPU backend (subprocesses; the same code path a pod slice runs).
Reference plumbing being replaced: the 3-plane bootstrap
``/root/reference/vllm_metal/v1/worker.py:38-58,144-164``.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.parallel.multihost import (
    RequestFeed, apply_feed_events, run_follower,
)

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
)


def make_engine(seed=0):
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = LlamaModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    return LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)


class Wire:
    """Loopback transport pair: primary's payload is replayed verbatim
    to the follower feed (same bytes the jax broadcast would carry)."""

    def __init__(self):
        self.log: list[bytes] = []

    def primary(self, payload: bytes) -> bytes:
        self.log.append(payload)
        return payload

    def follower(self, payload: bytes) -> bytes:
        assert payload == b"[]", "followers broadcast nothing"
        return self.log.pop(0)


def test_feed_lockstep_identical_outputs():
    wire = Wire()
    pf = RequestFeed(transport=wire.primary)
    ff = RequestFeed(transport=wire.follower)
    primary = make_engine(seed=3)
    follower = make_engine(seed=3)

    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 127, n)] for n in (5, 9)]
    pd = {"temperature": 0.0, "max_tokens": 6, "ignore_eos": True}
    for i, p in enumerate(prompts):
        pf.queue_add(f"r{i}", p, pd)

    done_p: dict[str, list[int]] = {}
    done_f: dict[str, list[int]] = {}
    for _ in range(40):
        events = pf.exchange()
        apply_feed_events(primary, events)
        if primary.has_unfinished():
            for out in primary.step():
                if out.finished:
                    done_p[out.request_id] = out.token_ids
        fev = ff.exchange()
        apply_feed_events(follower, fev)
        if follower.has_unfinished():
            for out in follower.step():
                if out.finished:
                    done_f[out.request_id] = out.token_ids
        if len(done_p) == 2 and len(done_f) == 2:
            break
    assert done_p == done_f
    assert set(done_p) == {"r0", "r1"}
    assert all(len(v) == 6 for v in done_p.values())


def test_feed_serializes_params_and_abort():
    wire = Wire()
    pf = RequestFeed(transport=wire.primary)
    ff = RequestFeed(transport=wire.follower)
    pf.queue_add("a", [1, 2, 3], {"temperature": 0.8, "top_k": 5,
                                  "max_tokens": 4, "stop": ["x"],
                                  "seed": 7})
    pf.queue_abort("a")
    events = pf.exchange()
    got = ff.exchange()
    assert got == events
    assert got[0]["op"] == "add" and got[0]["params"]["top_k"] == 5
    assert got[0]["params"]["stop"] == ["x"]
    assert got[1] == {"op": "abort", "id": "a"}


def test_run_follower_stops_on_stop_event():
    wire = Wire()
    pf = RequestFeed(transport=wire.primary)
    ff = RequestFeed(transport=wire.follower)
    eng = make_engine()
    pf._queue.append({"op": "stop"})
    pf.exchange()
    steps = run_follower(eng, ff, max_iters=10)
    assert steps == 0


_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
sys.path.insert(0, "@REPO@")
import numpy as np
import jax.numpy as jnp
from vllm_metal_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                   SchedulerConfig)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.parallel.multihost import (RequestFeed,
                                               apply_feed_events,
                                               run_follower)
CFG = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                  num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                  max_model_len=128)
cfg = EngineConfig(model=CFG, cache=CacheConfig(block_size=16),
                   scheduler=SchedulerConfig(max_num_seqs=4,
                                             max_num_batched_tokens=64,
                                             token_buckets=(16, 32, 64)))
model = LlamaModel(CFG)
weights = model.init_random(jax.random.PRNGKey(3), dtype=jnp.float32)
eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
feed = RequestFeed()
done = {}
if pid == 0:
    rng = np.random.default_rng(0)
    for i, n in enumerate((5, 9)):
        feed.queue_add(f"r{i}",
                       [int(x) for x in rng.integers(1, 127, n)],
                       {"temperature": 0.0, "max_tokens": 6,
                         "ignore_eos": True})
    for _ in range(40):
        events = feed.exchange()
        apply_feed_events(eng, events)
        if eng.has_unfinished():
            for out in eng.step():
                if out.finished:
                    done[out.request_id] = out.token_ids
        if len(done) == 2:
            break
    feed._queue.append({"op": "stop"})
    feed.exchange()
else:
    class Cap:
        def step(self):
            for out in eng.step():
                if out.finished:
                    done[out.request_id] = out.token_ids
            return []
        def __getattr__(self, k):
            return getattr(eng, k)
    run_follower(Cap(), feed)
print("RESULT", pid, sorted(done.items()), flush=True)
"""


@pytest.mark.slow
def test_two_process_jax_distributed_lockstep(tmp_path):
    """The real thing: 2 OS processes, jax.distributed over CPU, request
    feed broadcast through multihost_utils, identical outputs."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "child.py"
    script.write_text(_CHILD.replace("@REPO@", os.getcwd()))
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(tmp_path)) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]
    results = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT"):
                _, pid, rest = line.split(" ", 2)
                results[pid] = rest
    assert set(results) == {"0", "1"}
    assert results["0"] == results["1"]
    assert "r0" in results["0"] and "r1" in results["0"]

# SPDX-License-Identifier: Apache-2.0
"""Full YaRN rope scaling + classify/rerank head."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                   SchedulerConfig)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.common import (rope_frequencies,
                                          yarn_attention_factor)
from vllm_metal_tpu.models.llama import LlamaModel


class TestYarn:
    SCALING = {"rope_type": "yarn", "factor": 4.0,
               "original_max_position_embeddings": 1024,
               "beta_fast": 32, "beta_slow": 1}

    def test_ramp_between_plain_and_interpolated(self):
        hd, theta = 64, 10000.0
        base = np.asarray(rope_frequencies(hd, theta))
        yarn = np.asarray(rope_frequencies(hd, theta, self.SCALING))
        lo = base / 4.0
        # every dim lies between full interpolation and extrapolation
        assert (yarn <= base + 1e-9).all() and (yarn >= lo - 1e-9).all()
        # highest-frequency dim extrapolates (unchanged); lowest
        # interpolates (divided by factor)
        assert yarn[0] == pytest.approx(base[0], rel=1e-6)
        assert yarn[-1] == pytest.approx(lo[-1], rel=1e-6)
        # the blend is monotonic in the ramp region
        frac = (yarn - lo) / np.maximum(base - lo, 1e-30)
        assert (np.diff(frac) <= 1e-6).all()

    def test_attention_factor(self):
        assert yarn_attention_factor(None) == 1.0
        assert yarn_attention_factor({"rope_type": "linear",
                                      "factor": 2.0}) == 1.0
        f = yarn_attention_factor(self.SCALING)
        assert f == pytest.approx((0.1 * math.log(4.0) + 1.0) ** 2)
        assert yarn_attention_factor(
            {**self.SCALING, "attention_factor": 1.2}) \
            == pytest.approx(1.44)

    def test_yarn_paged_matches_dense(self):
        cfg = ModelConfig(
            vocab_size=64, hidden_size=32, intermediate_size=48,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            max_model_len=64, rope_scaling=dict(self.SCALING))
        from vllm_metal_tpu.engine.model_runner import (ModelRunner,
                                                        SeqStepInput)
        from vllm_metal_tpu.models.llama import dense_causal_attn
        ecfg = EngineConfig(
            model=cfg, cache=CacheConfig(block_size=16),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=32,
                                      token_buckets=(16, 32)))
        model = LlamaModel(cfg)
        w = model.init_random(jax.random.PRNGKey(0), dtype=jnp.float32)
        runner = ModelRunner(model, w, ecfg, num_blocks=8,
                             use_pallas=False)
        prompt = [3, 17, 42, 8, 25]
        out = runner.execute([SeqStepInput(
            query_tokens=prompt, context_len=5, block_table=[1],
            params=SamplingParams(temperature=0.0))])
        ids = jnp.asarray(prompt, jnp.int32)
        pos = jnp.arange(5, dtype=jnp.int32)
        dense = model.forward(w, ids, pos, dense_causal_attn(cfg))
        np.testing.assert_allclose(np.asarray(out.logits)[0],
                                   np.asarray(dense)[-1],
                                   atol=2e-2, rtol=2e-2)


class TestClassify:
    def _engine(self):
        cfg = ModelConfig(
            vocab_size=64, hidden_size=32, intermediate_size=48,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            max_model_len=64)
        ecfg = EngineConfig(
            model=cfg, cache=CacheConfig(block_size=16),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=32,
                                      token_buckets=(16, 32)))
        model = LlamaModel(cfg)
        w = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)
        return LLMEngine(model, w, ecfg, num_blocks=16, use_pallas=False), \
            model, w

    def test_classify_matches_logits(self):
        eng, model, w = self._engine()
        prompt = [3, 9, 27, 4]
        score = eng.classify(prompt, no_id=10, yes_id=20)
        assert 0.0 < score < 1.0
        from vllm_metal_tpu.models.llama import dense_causal_attn
        ids = jnp.asarray(prompt, jnp.int32)
        pos = jnp.arange(4, dtype=jnp.int32)
        logits = np.asarray(model.forward(w, ids, pos,
                                          dense_causal_attn(model.cfg)))[-1]
        pair = np.asarray([logits[10], logits[20]], np.float64)
        want = float(np.exp(pair[1] - pair.max())
                     / np.exp(pair - pair.max()).sum())
        assert score == pytest.approx(want, abs=2e-3)

    def test_classify_is_probability_pair(self):
        eng, _, _ = self._engine()
        s1 = eng.classify([5, 6, 7], no_id=10, yes_id=20)
        s2 = eng.classify([5, 6, 7], no_id=20, yes_id=10)
        assert s1 + s2 == pytest.approx(1.0, abs=1e-6)

    def test_rerank_endpoint(self):
        import asyncio
        from aiohttp.test_utils import TestClient, TestServer
        from vllm_metal_tpu.server.async_engine import AsyncEngine
        from vllm_metal_tpu.server.openai_server import OpenAIServer

        eng, _, _ = self._engine()

        class Tok:
            eos_token_id = None

            def convert_tokens_to_ids(self, t):
                return {"no": 10, "yes": 20}.get(t, -1)

            def encode(self, text, add_special_tokens=True):
                return [min(63, ord(c) % 64) for c in text][:30]

            def decode(self, ids):
                return "x" * len(ids)

        async def run():
            ae = AsyncEngine(eng)
            server = OpenAIServer(ae, Tok(), "reranker")
            client = TestClient(TestServer(server.app()))
            await client.start_server()
            ae.start(asyncio.get_running_loop())
            try:
                resp = await client.post("/v1/rerank", json={
                    "query": "q", "documents": ["alpha", "beta", "gamma"],
                    "top_n": 2})
                assert resp.status == 200
                body = await resp.json()
                assert len(body["results"]) == 2
                scores = [r["relevance_score"] for r in body["results"]]
                assert scores == sorted(scores, reverse=True)
                assert all(0 <= s <= 1 for s in scores)
                resp = await client.post("/v1/rerank", json={
                    "query": "q", "documents": []})
                assert resp.status == 400
            finally:
                ae.shutdown()
                await client.close()

        asyncio.run(run())

# SPDX-License-Identifier: Apache-2.0
"""MLA (latent attention) correctness.

Oracle: a dense numpy implementation that materializes full K/V from the
latents (the reference's materialized-prefill fast path, ``mla.py:218``) —
the absorbed paged path must match it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.mla import MLAModel

CFG = ModelConfig(
    vocab_size=64, hidden_size=64, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=1, head_dim=32, max_model_len=128,
    is_mla=True, kv_lora_rank=32, q_lora_rank=0,
    qk_rope_head_dim=16, qk_nope_head_dim=24, v_head_dim=20,
)

CFG_QLORA = ModelConfig(
    **{**CFG.__dict__, "q_lora_rank": 24, "extra": {}})


def make_runner(cfg=CFG, seed=0, num_blocks=16):
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = MLAModel(cfg)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    return model, weights, ModelRunner(model, weights, ecfg,
                                       num_blocks=num_blocks,
                                       use_pallas=False)


def dense_mla_logits(model, weights, prompt):
    """Materialized-KV dense forward (numpy oracle built on model pieces)."""
    cfg = model.cfg
    ids = jnp.asarray(prompt, jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)
    x = model.embed(weights, ids)
    from vllm_metal_tpu.models.common import rms_norm
    from vllm_metal_tpu.ops.quant_matmul import linear
    t = len(prompt)
    for lw in weights.layers:
        h = rms_norm(x, lw.attn_norm, cfg.rms_norm_eps)
        q_nope, q_rope = model.layer_query(lw, h, pos)
        c_kv, k_rope = model.layer_latent(lw, h, pos)
        # materialize K/V: k_nope[j,h] = W_uk[h] @ c[j]
        k_nope = jnp.einsum("hdr,tr->thd", lw.w_uk, c_kv)
        v = jnp.einsum("hrd,tr->thd", lw.w_uv, c_kv)
        scores = (jnp.einsum("thd,jhd->thj", q_nope, k_nope)
                  + jnp.einsum("thd,jd->thj", q_rope, k_rope)) * model.scale
        mask = np.tril(np.ones((t, t), bool))
        scores = jnp.where(jnp.asarray(mask)[:, None, :], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("thj,jhd->thd", p, v)
        x = x + linear(attn.reshape(t, -1), lw.wo)
        hm = rms_norm(x, lw.mlp_norm, cfg.rms_norm_eps)
        y = model.act(linear(hm, lw.gate).astype(jnp.float32)).astype(
            hm.dtype) * linear(hm, lw.up)
        x = x + linear(y, lw.down)
    x = rms_norm(x, weights.final_norm, cfg.rms_norm_eps)
    return np.asarray(model.logits(weights, x))


@pytest.mark.parametrize("cfg", [CFG, CFG_QLORA],
                         ids=["plain-q", "q-lora"])
def test_mla_paged_matches_materialized(cfg):
    model, weights, runner = make_runner(cfg)
    prompt = [3, 17, 42, 8, 25, 60]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=len(prompt), block_table=[2, 3],
        params=SamplingParams(temperature=0.0))])
    want = dense_mla_logits(model, weights, prompt)[-1]
    got = np.asarray(out.logits)[0]
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)


def test_mla_decode_steps_match():
    model, weights, runner = make_runner()
    prompt = [5, 9, 31]
    out = runner.execute([SeqStepInput(
        query_tokens=prompt, context_len=3, block_table=[1, 4],
        params=SamplingParams(temperature=0.0))])
    seq = prompt + [int(out.token_ids[0])]
    for _ in range(4):
        out = runner.execute([SeqStepInput(
            query_tokens=[seq[-1]], context_len=len(seq),
            block_table=[1, 4], params=SamplingParams(temperature=0.0))])
        want = dense_mla_logits(model, weights, seq)[-1]
        got = np.asarray(out.logits)[0]
        np.testing.assert_allclose(got, want, atol=0.03, rtol=0.03)
        seq.append(int(out.token_ids[0]))


class TestMLAKernel:
    """Pallas MLA kernel (interpret mode) vs the jnp reference oracle."""

    R, ROPE, H, BS = 128, 64, 4, 16

    def _setup(self, query_lens, context_lens, seed=0):
        from vllm_metal_tpu.attention.metadata import build_metadata
        rng = np.random.default_rng(seed)
        t = sum(query_lens)
        t_pad = max(8, -(-t // 8) * 8)
        w = self.R + self.ROPE
        nb = 16
        dn = 32
        q_nope = rng.standard_normal((t_pad, self.H, dn), np.float32) * 0.3
        q_rope = rng.standard_normal((t_pad, self.H, self.ROPE),
                                     np.float32) * 0.3
        w_uk = rng.standard_normal((self.H, dn, self.R), np.float32) * 0.1
        # pool is lane-padded (256 for W=192); ref reads the logical slice
        w_pad = -(-w // 128) * 128
        latents = rng.standard_normal((2, nb, self.BS, w_pad),
                                      np.float32) * 0.3
        blocks_needed = [-(-c // self.BS) for c in context_lens]
        bt, nxt = [], 0
        for nblk in blocks_needed:
            bt.append(list(range(nxt, nxt + nblk)))
            nxt += nblk
        md = build_metadata(
            query_lens=query_lens, context_lens=context_lens,
            block_tables=bt, block_size=self.BS, token_pad=t_pad,
            seq_pad=4, max_blocks_per_seq=8)
        return (jnp.asarray(q_nope), jnp.asarray(q_rope),
                jnp.asarray(latents), jnp.asarray(w_uk), md, t)

    def _compare(self, query_lens, context_lens, layer=1, bq=None):
        from vllm_metal_tpu.ops.mla_attention import mla_paged_attention_ref
        from vllm_metal_tpu.ops.mla_attention_kernel import \
            mla_paged_attention
        q_nope, q_rope, latents, w_uk, md, t = self._setup(
            query_lens, context_lens)
        scale = 0.1
        want = mla_paged_attention_ref(
            q_nope, q_rope, latents[layer][..., :self.R + self.ROPE],
            w_uk, md, kv_lora_rank=self.R, scale=scale)
        got = mla_paged_attention(
            q_nope, q_rope, latents, w_uk, md, layer,
            kv_lora_rank=self.R, scale=scale, interpret=True, bq=bq)
        # kernel runs q/latents in bf16: tolerances at bf16 rounding level
        np.testing.assert_allclose(np.asarray(got)[:t],
                                   np.asarray(want)[:t],
                                   atol=0.05, rtol=0.05)

    def test_decode_batch(self):
        self._compare([1, 1, 1], [7, 19, 33])

    def test_prefill_single(self):
        self._compare([24], [24])

    def test_mixed_batch(self):
        self._compare([1, 12, 1], [30, 12, 5])

    def test_chunked_continuation(self):
        # query shorter than context: continuation of a chunked prefill
        self._compare([8, 1], [40, 9])

    def test_tile_spanning_bq8(self):
        # multiple seqs share one 8-row tile
        self._compare([3, 2, 3], [10, 6, 12], bq=8)


def test_mla_engine_e2e():
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = MLAModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(2), dtype=jnp.float32)
    eng = LLMEngine(model, weights, cfg, num_blocks=32, use_pallas=False)
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 63, n)] for n in (4, 11)]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=5))
    assert len(outs) == 2
    for o in outs.values():
        assert o.finished and len(o.token_ids) == 5

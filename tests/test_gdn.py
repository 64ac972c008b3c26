# SPDX-License-Identifier: Apache-2.0
"""Hybrid GDN (Qwen3-Next-style) correctness.

Oracle: a straight per-token numpy transcription of the reference's
recurrence (gdn_recurrent_decode.metal) and causal conv — the packed-varlen
jnp implementation must match it through chunked prefill, decode, and
mixed batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.qwen3_next import Qwen3NextModel
from vllm_metal_tpu.ops.gdn import (
    compute_g, conv1d_varlen, gdn_recurrent_varlen, l2_scale_norm,
)

HK, DK, HV, DV, CONVK = 2, 16, 4, 12, 4

CFG = ModelConfig(
    vocab_size=64, hidden_size=48, intermediate_size=64, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=12, max_model_len=128,
    extra={"full_attention_interval": 4, "gdn_k_heads": HK, "gdn_k_dim": DK,
           "gdn_v_heads": HV, "gdn_v_dim": DV, "gdn_conv_k": CONVK,
           "gdn_slots": 4},
)


# ---------------------------------------------------------------------------
def oracle_recurrent(q, k, v, g, beta, s0):
    """Single sequence, per-token loop (metal kernel transcription)."""
    t = q.shape[0]
    rep = HV // HK
    s = s0.astype(np.float64).copy()         # [HV, DV, DK]
    ys = np.zeros((t, HV, DV))
    for i in range(t):
        for hv in range(HV):
            hk = hv // rep
            s[hv] *= g[i, hv]
            mem = s[hv] @ k[i, hk]           # [DV]
            delta = (v[i, hv] - mem) * beta[i, hv]
            s[hv] += np.outer(delta, k[i, hk])
            ys[i, hv] = s[hv] @ q[i, hk]
    return ys, s


def oracle_conv(x, w, b, state):
    """Single sequence causal depthwise conv + silu. state: [CONVK-1, C]."""
    full = np.concatenate([state, x], axis=0)
    t, c = x.shape
    out = np.zeros_like(x, dtype=np.float64)
    for i in range(t):
        window = full[i:i + CONVK]           # [CONVK, C]
        out[i] = (window * w.T).sum(0) + (b if b is not None else 0)
    sil = out / (1 + np.exp(-out)) * 1.0
    sil = out * (1 / (1 + np.exp(-out)))
    return sil, full[-(CONVK - 1):]


def rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape)
            * scale).astype(np.float32)


# ---------------------------------------------------------------------------
def run_varlen_recurrent(qs, ks, vs, gs, bs, states, seq_of_token, slots):
    t = len(seq_of_token)
    md_ids = jnp.asarray(seq_of_token, jnp.int32)
    y, ns = gdn_recurrent_varlen(
        jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ks)),
        jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(gs)),
        jnp.asarray(np.stack(bs)), jnp.asarray(states),
        md_ids, jnp.asarray(slots, jnp.int32),
        jnp.ones((t,), bool))
    return np.asarray(y, np.float64), np.asarray(ns, np.float64)


def test_recurrent_single_seq_matches_oracle():
    t = 12
    q = rand((t, HK, DK), 0, 0.5)
    k = rand((t, HK, DK), 1, 0.5)
    v = rand((t, HV, DV), 2)
    g = 1 / (1 + np.exp(-rand((t, HV), 3)))      # in (0,1)
    b = 1 / (1 + np.exp(-rand((t, HV), 4)))
    s0 = np.zeros((2, HV, DV, DK), np.float32)

    want_y, want_s = oracle_recurrent(q, k, v, g, b, s0[1])
    got_y, got_s = run_varlen_recurrent(
        q, k, v, g, b, s0, [1] * t, [0, 1, 2, 3])
    np.testing.assert_allclose(got_y, want_y, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got_s[1], want_s, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got_s[0], 0.0)    # other slot untouched


def test_recurrent_interleaved_requests_isolated():
    t = 8
    q = rand((t, HK, DK), 5, 0.5)
    k = rand((t, HK, DK), 6, 0.5)
    v = rand((t, HV, DV), 7)
    g = 1 / (1 + np.exp(-rand((t, HV), 8)))
    b = 1 / (1 + np.exp(-rand((t, HV), 9)))
    s0 = np.zeros((2, HV, DV, DK), np.float32)
    # tokens alternate between requests 0 and 1
    seqs = [0, 1, 0, 1, 0, 1, 0, 1]
    got_y, got_s = run_varlen_recurrent(q, k, v, g, b, s0, seqs, [0, 1])
    for r in (0, 1):
        idx = [i for i in range(t) if seqs[i] == r]
        wy, ws = oracle_recurrent(q[idx], k[idx], v[idx], g[idx], b[idx],
                                  s0[r])
        np.testing.assert_allclose(got_y[idx], wy, atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(got_s[r], ws, atol=1e-3, rtol=1e-3)


def test_conv_varlen_matches_oracle_chunked():
    c = 2 * HK * DK + HV * DV
    w = rand((c, CONVK), 10, 0.3)
    b = rand((c,), 11, 0.1)
    x_full = rand((10, c), 12)
    state0 = np.zeros((CONVK - 1, c), np.float32)

    want, st = oracle_conv(x_full[:6].astype(np.float64), w, b, state0)
    want2, st2 = oracle_conv(x_full[6:].astype(np.float64), w, b, st)

    # chunk 1: 6 tokens of request 0 (slot 2)
    conv_state = np.zeros((4, CONVK - 1, c), np.float32)
    qsl = np.zeros(5, np.int32); qsl[1:] = 6
    got, ns = conv1d_varlen(
        jnp.asarray(x_full[:6]), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(conv_state), jnp.zeros(6, jnp.int32),
        jnp.arange(6), jnp.asarray([2, 0, 1, 3], jnp.int32),
        jnp.asarray(qsl), jnp.asarray(6))
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ns)[2].astype(np.float64), st,
                               atol=1e-5)
    # chunk 2: remaining 4 tokens
    qsl2 = np.zeros(5, np.int32); qsl2[1:] = 4
    got2, ns2 = conv1d_varlen(
        jnp.asarray(x_full[6:]), jnp.asarray(w), jnp.asarray(b),
        ns, jnp.zeros(4, jnp.int32), jnp.arange(4),
        jnp.asarray([2, 0, 1, 3], jnp.int32),
        jnp.asarray(qsl2), jnp.asarray(4))
    np.testing.assert_allclose(np.asarray(got2, np.float64), want2,
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ns2)[2].astype(np.float64), st2,
                               atol=1e-5)


def test_conv_varlen_decode_step():
    c = 8
    w = rand((c, CONVK), 13, 0.3)
    x_hist = rand((5, c), 14)
    want, st = oracle_conv(x_hist.astype(np.float64), w, None,
                           np.zeros((CONVK - 1, c)))
    # replay last token as a decode step with the state of the first 4
    _, st4 = oracle_conv(x_hist[:4].astype(np.float64), w, None,
                         np.zeros((CONVK - 1, c)))
    conv_state = np.zeros((2, CONVK - 1, c), np.float32)
    conv_state[1] = st4
    qsl = np.zeros(3, np.int32); qsl[1:] = 1
    got, ns = conv1d_varlen(
        jnp.asarray(x_hist[4:5]), jnp.asarray(w), None,
        jnp.asarray(conv_state), jnp.zeros(1, jnp.int32),
        jnp.arange(1), jnp.asarray([1, 0], jnp.int32),
        jnp.asarray(qsl), jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(got, np.float64)[0], want[-1],
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ns)[1].astype(np.float64), st,
                               atol=1e-5)


# ---------------------------------------------------------------------------
def make_runner(seed=0):
    ecfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16,
                                     enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = Qwen3NextModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(seed), dtype=jnp.float32)
    return model, weights, ModelRunner(model, weights, ecfg, num_blocks=16,
                                       use_pallas=False)


def test_hybrid_model_prefill_decode_consistency():
    """Chunked prefill + decode must equal one-shot prefill logits."""
    model, weights, r1 = make_runner()
    _, _, r2 = make_runner()
    prompt = [int(x) for x in rand((14,), 20, 1)] and \
        [3, 9, 14, 27, 33, 41, 2, 8, 19, 55, 7, 21, 30, 11]
    gp = SamplingParams(temperature=0.0)

    # one-shot
    o1 = r1.execute([SeqStepInput(query_tokens=prompt, context_len=14,
                                  block_table=[1], params=gp,
                                  state_slot=0, reset_state=True)])
    # chunked: 9 + 5
    r2.execute([SeqStepInput(query_tokens=prompt[:9], context_len=9,
                             block_table=[1], params=gp, sample_needed=False,
                             state_slot=0, reset_state=True)])
    o2 = r2.execute([SeqStepInput(query_tokens=prompt[9:], context_len=14,
                                  block_table=[1], params=gp, state_slot=0)])
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=0.02, rtol=0.02)


def test_hybrid_engine_e2e():
    from vllm_metal_tpu.engine.engine import LLMEngine
    ecfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16,
                                     enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = Qwen3NextModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(1), dtype=jnp.float32)
    eng = LLMEngine(model, weights, ecfg, num_blocks=32, use_pallas=False)
    rng = np.random.default_rng(2)
    prompts = [[int(x) for x in rng.integers(1, 63, n)] for n in (5, 9)]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=4))
    assert len(outs) == 2
    for o in outs.values():
        assert o.finished and len(o.token_ids) == 4


# ---------------------------------------------------------------------------
# Chunked (UT-transform) path vs the sequential-scan oracle
# ---------------------------------------------------------------------------

def _run_chunked(query_lens, chunk=8, t_pad=None, seed=0, carry_state=False):
    """Build a packed varlen batch and run both GDN paths."""
    from vllm_metal_tpu.ops.gdn import gdn_chunked_varlen
    total = sum(query_lens)
    if t_pad is None:
        t_pad = -(-total // chunk) * chunk
    s_pad = max(4, len(query_lens))
    rng_seed = seed * 100

    q = rand((t_pad, HK, DK), rng_seed, 0.5)
    k = rand((t_pad, HK, DK), rng_seed + 1, 0.5)
    v = rand((t_pad, HV, DV), rng_seed + 2)
    g = 1 / (1 + np.exp(-rand((t_pad, HV), rng_seed + 3)))
    b = 1 / (1 + np.exp(-rand((t_pad, HV), rng_seed + 4)))
    states = (rand((s_pad, HV, DV, DK), rng_seed + 5, 0.3)
              if carry_state else np.zeros((s_pad, HV, DV, DK), np.float32))

    seq_ids = np.full((t_pad,), s_pad - 1, np.int32)
    qsl = np.zeros((s_pad + 1,), np.int32)
    t = 0
    for i, ql in enumerate(query_lens):
        seq_ids[t:t + ql] = i
        t += ql
        qsl[i + 1] = t
    qsl[len(query_lens) + 1:] = t
    valid = np.zeros((t_pad,), bool)
    valid[:total] = True
    slots = np.arange(s_pad, dtype=np.int32)

    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(g),
            jnp.asarray(b), jnp.asarray(states), jnp.asarray(seq_ids),
            jnp.asarray(slots), jnp.asarray(valid))
    y_ref, s_ref = gdn_recurrent_varlen(*args)
    y_chk, s_chk = gdn_chunked_varlen(*args, jnp.asarray(qsl), chunk=chunk)
    return (np.asarray(y_ref, np.float64)[:total],
            np.asarray(s_ref, np.float64),
            np.asarray(y_chk, np.float64)[:total],
            np.asarray(s_chk, np.float64))


@pytest.mark.parametrize("query_lens,chunk", [
    ([12], 8),            # one seq spanning chunks (+ partial tail)
    ([8], 8),             # exactly one chunk
    ([3, 5, 7], 8),       # multiple segments, chunk boundaries inside
    ([1, 1, 1, 1], 8),    # pure decode batch
    ([2, 17, 1], 4),      # mixed decode + long prefill, small chunks
], ids=["span", "exact", "multi", "decode", "mixed"])
def test_chunked_matches_recurrent(query_lens, chunk):
    y_ref, s_ref, y_chk, s_chk = _run_chunked(query_lens, chunk)
    np.testing.assert_allclose(y_chk, y_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(s_chk, s_ref, atol=2e-3, rtol=2e-3)


def test_chunked_with_carried_state():
    """Non-zero initial states (decode continuation) propagate exactly."""
    y_ref, s_ref, y_chk, s_chk = _run_chunked([5, 9], chunk=8,
                                              carry_state=True, seed=3)
    np.testing.assert_allclose(y_chk, y_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(s_chk, s_ref, atol=2e-3, rtol=2e-3)


def test_chunked_untouched_slots_preserved():
    y_ref, s_ref, y_chk, s_chk = _run_chunked([3], chunk=8,
                                              carry_state=True, seed=5)
    # slots 1..3 have no tokens: states must be bit-identical to input
    np.testing.assert_allclose(s_chk[1:], s_ref[1:], atol=0, rtol=0)


def test_hybrid_chunked_bucket_matches_small_bucket():
    """A 128-token bucket (chunked GDN path in the model) must produce the
    same logits as the 64-token bucket (sequential-scan path)."""
    ecfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16,
                                     enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=128,
                                  token_buckets=(64, 128)))
    model = Qwen3NextModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(7), dtype=jnp.float32)
    r_small = ModelRunner(model, weights, ecfg, num_blocks=32,
                          use_pallas=False)
    r_big = ModelRunner(model, weights, ecfg, num_blocks=32,
                        use_pallas=False)
    rng = np.random.default_rng(9)
    gp = SamplingParams(temperature=0.0)
    p1 = [int(x) for x in rng.integers(1, 63, 40)]
    p2 = [int(x) for x in rng.integers(1, 63, 23)]
    # 63 total tokens -> bucket 64 (scan path)
    o_small = r_small.execute([
        SeqStepInput(query_tokens=p1, context_len=40, block_table=[1, 2, 3],
                     params=gp, state_slot=0, reset_state=True),
        SeqStepInput(query_tokens=p2, context_len=23, block_table=[4, 5],
                     params=gp, state_slot=1, reset_state=True)])
    # same batch + a 3rd seq pushes it into the 128 bucket (chunked path)
    p3 = [int(x) for x in rng.integers(1, 63, 30)]
    o_big = r_big.execute([
        SeqStepInput(query_tokens=p1, context_len=40, block_table=[1, 2, 3],
                     params=gp, state_slot=0, reset_state=True),
        SeqStepInput(query_tokens=p2, context_len=23, block_table=[4, 5],
                     params=gp, state_slot=1, reset_state=True),
        SeqStepInput(query_tokens=p3, context_len=30, block_table=[6, 7],
                     params=gp, state_slot=2, reset_state=True)])
    np.testing.assert_allclose(np.asarray(o_small.logits)[:2],
                               np.asarray(o_big.logits)[:2],
                               atol=0.02, rtol=0.02)


# ---------------------------------------------------------------------------
# Pallas decode kernel (ops/gdn_kernel.py) vs the sequential-scan oracle
# ---------------------------------------------------------------------------
def test_gdn_decode_kernel_matches_scan():
    """Direct kernel parity: stacked layers, junk-row pads, untouched
    slots/layers preserved."""
    from vllm_metal_tpu.ops.gdn_kernel import gdn_decode_step

    L, slots = 3, 6            # slots includes the junk row (last)
    T, t_valid = 5, 3          # 3 live tokens + 2 pads
    dk, dv = 128, 16
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((T, HK, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, HK, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, HV, dv)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.5, 1.0, (T, HV)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.1, 0.9, (T, HV)), jnp.float32)
    rec_np = rng.standard_normal((L, slots, HV, dv, dk)).astype(np.float32)
    rec = jnp.asarray(rec_np)

    valid = jnp.asarray([1, 1, 1, 0, 0], bool)
    tsids = jnp.arange(T, dtype=jnp.int32)
    seq_slots = jnp.asarray([2, 0, 4, 1, 3], jnp.int32)

    for layer in (0, 2):
        y_ref, s_ref = gdn_recurrent_varlen(
            q, k, v, g, beta, rec[layer], tsids, seq_slots, valid)
        rep = HV // HK
        qx = jnp.repeat(q, rep, axis=1)
        kx = jnp.repeat(k, rep, axis=1)
        g2 = jnp.where(valid[:, None], g, 1.0)
        b2 = jnp.where(valid[:, None], beta, 0.0)
        tok_slots = jnp.where(valid, seq_slots[tsids],
                              slots - 1).astype(jnp.int32)
        # fresh copy per call: the kernel donates (and deletes) its input
        y_k, rec_k = gdn_decode_step(qx, kx, v, g2, b2, jnp.asarray(rec_np),
                                     layer, tok_slots, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y_k, np.float32)[:t_valid],
            np.asarray(y_ref, np.float32)[:t_valid], atol=1e-4, rtol=1e-4)
        # updated rows match the scan; untouched rows preserved (the scan
        # with valid-masking leaves them alone too, so full-table compare
        # works, junk row excluded)
        np.testing.assert_allclose(
            np.asarray(rec_k[layer, :slots - 1]),
            np.asarray(s_ref[:slots - 1]), atol=1e-4, rtol=1e-4)
        # other layers byte-identical
        for other in range(L):
            if other != layer:
                np.testing.assert_array_equal(
                    np.asarray(rec_k[other]), rec_np[other])


def test_hybrid_decode_kernel_path_matches_scan(monkeypatch):
    """Full-model routing: a pure-decode step through the Pallas GDN
    kernel (interpret) must match the use_pallas=False scan path."""
    monkeypatch.setenv("VLLM_METAL_TPU_PALLAS_INTERPRET", "1")
    ecfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16,
                                     enable_prefix_caching=False),
        scheduler=SchedulerConfig(max_num_seqs=4, max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = Qwen3NextModel(CFG)
    weights = model.init_random(jax.random.PRNGKey(3), dtype=jnp.float32)
    r_kern = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=True)
    r_scan = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    rng = np.random.default_rng(5)
    gp = SamplingParams(temperature=0.0)
    prompts = [[int(x) for x in rng.integers(1, 63, n)] for n in (7, 11)]

    outs = []
    for r in (r_kern, r_scan):
        # prefill both (prefill is the scan path in both runners)
        r.execute([
            SeqStepInput(query_tokens=prompts[0], context_len=7,
                         block_table=[1], params=gp, state_slot=0,
                         reset_state=True),
            SeqStepInput(query_tokens=prompts[1], context_len=11,
                         block_table=[2], params=gp, state_slot=1,
                         reset_state=True)])
        # two pure-decode steps (kernel path on r_kern)
        o = r.execute([
            SeqStepInput(query_tokens=[9], context_len=8, block_table=[1],
                         params=gp, state_slot=0),
            SeqStepInput(query_tokens=[4], context_len=12, block_table=[2],
                         params=gp, state_slot=1)])
        o = r.execute([
            SeqStepInput(query_tokens=[17], context_len=9, block_table=[1],
                         params=gp, state_slot=0),
            SeqStepInput(query_tokens=[6], context_len=13, block_table=[2],
                         params=gp, state_slot=1)])
        outs.append(np.asarray(o.logits))
    np.testing.assert_allclose(outs[0], outs[1], atol=0.02, rtol=0.02)

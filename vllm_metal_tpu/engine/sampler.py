# SPDX-License-Identifier: Apache-2.0
"""On-device sampler.

The reference bridges MLX logits to torch and reuses vLLM's CPU/MPS sampler
(``/root/reference/vllm_metal/v1/sampling_batch.py``).  On TPU a host
round-trip per step would stall the decode loop, so sampling runs inside the
jitted step: temperature / top-k / top-p / min-p masking + Gumbel argmax with
per-request seeded keys, penalties applied from a bounded recent-token
buffer.  Only the sampled token ids (and optional logprobs) cross to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from typing import Optional

from ..utils import static_dataclass

GREEDY_EPS = 1e-5  # mirrors reference GREEDY_TEMPERATURE_EPS semantics

# top-k logprob alternatives returned when a request asks for logprobs
# (OpenAI caps: 5 for completions, 20 for chat top_logprobs); one fixed
# width keeps the compile-cache key binary (on/off), the API layer slices
TOPK_LOGPROBS = 20


@static_dataclass(meta_fields=("use_topk", "use_topp", "use_minp",
                               "use_penalties", "all_greedy", "need_topk"))
class SamplingTensors:
    """Per-sequence device tensors, padded to [S].

    The use_* flags are static (jit cache key): batches that don't use a
    feature skip its compute entirely — greedy-only decode batches avoid
    the full-vocab sorts on both compile and run time.
    """

    temperature: jax.Array    # f32 [S]; < GREEDY_EPS -> greedy
    top_p: jax.Array          # f32 [S]; 1.0 -> off
    top_k: jax.Array          # i32 [S]; 0 -> off
    min_p: jax.Array          # f32 [S]; 0.0 -> off
    seeds: jax.Array          # u32 [S] per-request seed (folded with step)
    # penalties
    repetition_penalty: jax.Array   # f32 [S]; 1.0 -> off
    presence_penalty: jax.Array     # f32 [S]; 0.0 -> off
    frequency_penalty: jax.Array    # f32 [S]; 0.0 -> off
    # [S, W] recent output token ids (-1 pad) for penalty window W
    recent_tokens: jax.Array
    # packed uint32 allowed-token bitmask [S, ceil(V/32)] (all-ones = free);
    # None disables the grammar path entirely (static pytree structure)
    token_bitmask: Optional[jax.Array] = None
    use_topk: bool = True
    use_topp: bool = True
    use_minp: bool = True
    use_penalties: bool = True
    all_greedy: bool = False
    # any request in the batch wants top-k logprob alternatives: the
    # sampler adds a lax.top_k over the logprob rows (off batches skip it)
    need_topk: bool = False

    @classmethod
    def from_lists(cls, params: list, seq_pad: int,
                   recent_tokens=None, window: int = 64,
                   token_bitmask=None) -> "SamplingTensors":
        import numpy as np
        s = len(params)
        t = np.ones(seq_pad, np.float32)
        tp = np.ones(seq_pad, np.float32)
        tk = np.zeros(seq_pad, np.int32)
        mp = np.zeros(seq_pad, np.float32)
        sd = np.zeros(seq_pad, np.uint32)
        rp = np.ones(seq_pad, np.float32)
        pp = np.zeros(seq_pad, np.float32)
        fp = np.zeros(seq_pad, np.float32)
        for i, p in enumerate(params):
            t[i] = p.temperature
            tp[i] = p.top_p
            tk[i] = p.top_k
            mp[i] = p.min_p
            sd[i] = np.uint32(p.seed if p.seed is not None else i + 1)
            rp[i] = p.repetition_penalty
            pp[i] = p.presence_penalty
            fp[i] = p.frequency_penalty
        if recent_tokens is None:
            recent_tokens = np.full((seq_pad, window), -1, np.int32)
        use_topk = any(p.top_k > 0 for p in params)
        use_topp = any(p.top_p < 1.0 for p in params)
        use_minp = any(p.min_p > 0.0 for p in params)
        use_penalties = any(
            p.repetition_penalty != 1.0 or p.presence_penalty != 0.0
            or p.frequency_penalty != 0.0 for p in params)
        all_greedy = all(p.greedy for p in params)
        return cls(
            temperature=jnp.asarray(t), top_p=jnp.asarray(tp),
            top_k=jnp.asarray(tk), min_p=jnp.asarray(mp),
            seeds=jnp.asarray(sd),
            repetition_penalty=jnp.asarray(rp),
            presence_penalty=jnp.asarray(pp),
            frequency_penalty=jnp.asarray(fp),
            recent_tokens=jnp.asarray(recent_tokens),
            token_bitmask=None if token_bitmask is None
            else jnp.asarray(token_bitmask),
            use_topk=use_topk, use_topp=use_topp, use_minp=use_minp,
            use_penalties=use_penalties, all_greedy=all_greedy,
            need_topk=any(p.logprobs is not None and p.logprobs > 0
                          for p in params))


def _apply_penalties(logits: jax.Array, st: SamplingTensors) -> jax.Array:
    """Repetition / presence / frequency penalties over the recent window."""
    s, v = logits.shape
    onehot_counts = jnp.zeros((s, v), jnp.float32)
    ids = jnp.clip(st.recent_tokens, 0, v - 1)
    valid = (st.recent_tokens >= 0).astype(jnp.float32)
    onehot_counts = jnp.zeros((s, v), jnp.float32).at[
        jnp.arange(s)[:, None], ids].add(valid)
    present = (onehot_counts > 0).astype(jnp.float32)

    rp = st.repetition_penalty[:, None]
    logits = jnp.where(
        present > 0,
        jnp.where(logits > 0, logits / rp, logits * rp),
        logits)
    logits = logits - st.frequency_penalty[:, None] * onehot_counts
    logits = logits - st.presence_penalty[:, None] * present
    return logits


def _mask_top_k(logits: jax.Array, top_k: jax.Array) -> jax.Array:
    v = logits.shape[-1]
    sorted_desc = -jnp.sort(-logits, axis=-1)
    k = jnp.clip(top_k, 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    keep = (logits >= kth) | (top_k == 0)[:, None]
    return jnp.where(keep, logits, -jnp.inf)


def _mask_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    order = jnp.argsort(-logits, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p
    keep_sorted = (cum - sorted_probs) < top_p[:, None]
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order].set(keep_sorted)
    return jnp.where(keep, logits, -jnp.inf)


def _mask_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = probs.max(axis=-1, keepdims=True)
    keep = (probs >= min_p[:, None] * pmax) | (min_p == 0.0)[:, None]
    return jnp.where(keep, logits, -jnp.inf)


def _apply_bitmask(logits: jax.Array, words: jax.Array) -> jax.Array:
    """Grammar mask: words [S, W] uint32, bit t%32 of word t//32 = allowed
    (the xgrammar wire format the reference consumes)."""
    s, v = logits.shape
    bits = (words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    allowed = bits.reshape(s, -1)[:, :v] != 0
    return jnp.where(allowed, logits, -jnp.inf)


def sample(logits: jax.Array, st: SamplingTensors,
           step: jax.Array
           ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """logits [S, V] f32 -> (token_ids [S] i32, logprobs [S] f32,
    topk_logprobs [S, K] f32, topk_ids [S, K] i32).

    K = TOPK_LOGPROBS when ``st.need_topk`` else 0 (zero-width arrays
    keep the output pytree shape static per compiled program).

    Deterministic per (seed, step): every request draws from its own folded
    key, so identical requests reproduce across runs and batch compositions.
    """
    logits = logits.astype(jnp.float32)
    s, v = logits.shape
    if st.token_bitmask is not None:
        logits = _apply_bitmask(logits, st.token_bitmask)
    if st.use_penalties:
        logits = _apply_penalties(logits, st)

    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if st.all_greedy:
        tokens = greedy_tokens
    else:
        temp = jnp.maximum(st.temperature, GREEDY_EPS)[:, None]
        scaled = logits / temp
        if st.use_topk:
            scaled = _mask_top_k(scaled, st.top_k)
        if st.use_topp:
            scaled = _mask_top_p(scaled, st.top_p)
        if st.use_minp:
            scaled = _mask_min_p(scaled, st.min_p)

        def row_gumbel(seed):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
            key = jax.random.fold_in(key, step)
            return jax.random.gumbel(key, (v,), jnp.float32)

        gumbel = jax.vmap(row_gumbel)(st.seeds)
        sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
        tokens = jnp.where(st.temperature < GREEDY_EPS, greedy_tokens,
                           sampled)
    logprobs_all = jax.nn.log_softmax(logits, axis=-1)
    chosen_logprob = jnp.take_along_axis(
        logprobs_all, tokens[:, None], axis=-1)[:, 0]
    if st.need_topk:
        topk_vals, topk_ids = jax.lax.top_k(logprobs_all, TOPK_LOGPROBS)
        topk_ids = topk_ids.astype(jnp.int32)
    else:
        topk_vals = jnp.zeros((s, 0), jnp.float32)
        topk_ids = jnp.zeros((s, 0), jnp.int32)
    return tokens, chosen_logprob, topk_vals, topk_ids

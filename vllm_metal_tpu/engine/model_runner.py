# SPDX-License-Identifier: Apache-2.0
"""Model runner: jitted forward+sample step over bucketed batches.

Role of the reference's ``MetalModelRunner``
(``/root/reference/vllm_metal/v1/model_runner.py:266``), redesigned for XLA:
instead of a shape-flexible lazy graph, batches are padded to (token, seq)
buckets and one compiled program per bucket is cached.  KV pools are donated
through the step so updates are in-place in HBM; sampling runs on device and
only the sampled ids / logprobs cross to host (the async analogue of the
reference's ``execute_model``/``sample_tokens`` split, SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..attention.backend import PagedAttentionBackend
from ..attention.kv_cache import PagedKVCache
from ..attention.metadata import AttentionMetadata, build_metadata
from ..config import EngineConfig
from .sampler import SamplingTensors, sample
from .sampling_params import SamplingParams

logger = logging.getLogger(__name__)


@dataclass
class SeqStepInput:
    """One sequence's slice of a step (host side)."""

    query_tokens: list[int]          # new tokens this step
    context_len: int                 # total KV len incl. these tokens
    block_table: list[int]
    params: SamplingParams
    recent_tokens: list[int] = field(default_factory=list)
    sample_needed: bool = True       # False for incomplete prefill chunks
    num_draft_tokens: int = 0        # trailing speculative tokens to verify
    # packed uint32 allowed-token mask for this step (None = unconstrained)
    token_bitmask: Any = None
    lora_slot: int = 0               # 0 = no adapter
    state_slot: int = -1             # GDN state slot (-1 = use seq index)
    reset_state: bool = False        # zero the slot before this step
    # multimodal: vision embeds [n, H] (np) for this chunk's placeholder
    # rows, their row indices within the chunk, and 3-axis M-RoPE
    # positions [3, len(query_tokens)] (None = linear positions)
    mm_embeds: Any = None
    mm_rows: Optional[list[int]] = None
    mrope_positions: Any = None


@dataclass
class StepOutput:
    token_ids: np.ndarray            # [num_seqs] sampled ids (valid where
    logprobs: np.ndarray             # sample_needed)
    # [num_seqs, K] top-K logprob alternatives (K=0 unless a request in
    # the batch asked for logprobs — sampler.TOPK_LOGPROBS)
    topk_vals: Any = None
    topk_ids: Any = None
    logits: Any = None               # [num_seqs, V] device array (lazy)
    # [num_seqs, spec_window+1] greedy argmax of each seq's last rows
    # (row j of seq i = target's next token after query token
    #  qlen_i-1-spec_window+j) — consumed by spec verify
    verify_tokens: Any = None
    # [num_seqs, H] LAST-pooled L2-normalized hidden states (embeddings)
    pooled: Any = None
    # [num_seqs, H] raw final hidden states at the last row (MTP input)
    hidden: Any = None


class ModelRunner:
    def __init__(self, model: Any, weights: Any, cfg: EngineConfig,
                 cache: Optional[PagedKVCache] = None,
                 num_blocks: Optional[int] = None,
                 use_pallas: Optional[bool] = None,
                 mesh: Optional[Any] = None,
                 lora_manager: Optional[Any] = None):
        self.model = model
        self.lora_manager = lora_manager
        self.cfg = cfg
        self.mesh = mesh
        self.backend = PagedAttentionBackend(cfg.model, use_pallas=use_pallas)
        if mesh is None and hasattr(model, "fuse_projections") \
                and isinstance(getattr(weights, "layers", None), list):
            # qkv / gate-up projection fusion: 7 -> 4 kernel calls per
            # layer (each Pallas call costs ~50-100us fixed on v5e).
            # Runs before cache allocation — the concat transiently
            # doubles weight memory; callers should drop their reference
            # to the pre-fusion tree after construction.
            weights = model.fuse_projections(weights)
        if cache is None:
            assert num_blocks is not None
            dtype = jnp.bfloat16 if cfg.cache.cache_dtype == "bfloat16" \
                else jnp.float32
            if cfg.model.extra.get("full_attention_interval"):
                from ..attention.gdn_cache import HybridCache
                cfg.model.extra.setdefault(
                    "gdn_slots", cfg.scheduler.max_num_seqs)
                cache = HybridCache.allocate(
                    cfg.model, cfg.cache, num_blocks, dtype=dtype)
            elif cfg.model.is_mla:
                from ..attention.mla_cache import MLAPagedLatentCache
                cache = MLAPagedLatentCache.allocate(
                    cfg.model, cfg.cache, num_blocks, dtype=dtype)
            elif cfg.cache.kv_quant_k:
                from ..attention.quant_kv_cache import QuantPagedKVCache
                cache = QuantPagedKVCache.allocate(
                    cfg.model, cfg.cache, num_blocks, dtype=dtype)
            else:
                cache = PagedKVCache.allocate(
                    cfg.model, cfg.cache, num_blocks, dtype=dtype)
        if mesh is not None:
            from ..parallel.shardings import (
                TPContext, shard_cache, shard_weights)
            tp = mesh.shape[cfg.parallel.tp_axis]
            mc = cfg.model
            if mc.is_mla:
                # MLA-TP: q heads + absorbed w_uk/w_uv shard; the latent
                # pool replicates (every chip computes/writes the same
                # latent), so only num_heads must divide
                if mc.num_heads % tp:
                    raise ValueError(
                        f"num_heads ({mc.num_heads}) must divide tp={tp}")
            elif mc.num_heads % tp or mc.num_kv_heads % tp:
                raise ValueError(
                    f"heads ({mc.num_heads}/{mc.num_kv_heads}) must divide "
                    f"tp={tp}")
            if not getattr(model.tp, "enabled", False):
                model.tp = TPContext(cfg.parallel.tp_axis, tp)
            if cfg.parallel.expert_parallel:
                from ..models.mixtral import MixtralModel
                weights = MixtralModel.stack_expert_weights(weights)
            weights = shard_weights(weights, mesh)
            cache = shard_cache(cache, mesh)
        scan = cfg.model.scan_layers
        if scan is None:
            scan = (cfg.model.num_layers >= 4
                    and not cfg.model.is_mla
                    and not cfg.cache.kv_quant_k
                    and not cfg.model.extra.get("full_attention_interval")
                    and not cfg.model.extra.get("num_kv_shared_layers")
                    and cfg.model.sliding_window_pattern is None
                    and mesh is None
                    and hasattr(model, "stack_layers")
                    and isinstance(getattr(weights, "layers", None), list))
        if scan and isinstance(getattr(weights, "layers", None), list):
            logger.info("stacking %d layers for lax.scan forward",
                        cfg.model.num_layers)
            weights = model.stack_layers(weights)
        self.weights = weights
        self.cache = cache
        self.max_blocks_per_seq = max(
            1, cfg.model.max_model_len // cfg.cache.block_size)
        # distinct per-layer sliding windows: the metadata builder emits
        # one kernel work list per window (tile skip for windowed layers)
        self._windows = tuple(dict.fromkeys(
            [None] + [cfg.model.layer_sliding_window(i)
                      for i in range(cfg.model.num_layers)]))
        self.spec_window = cfg.spec.num_speculative_tokens \
            if cfg.spec.method else 0
        # VL models take the mm step variant (M-RoPE positions + splice)
        self._is_mm = getattr(model, "mrope_sections", None) is not None
        self.step_counter = 0
        from collections import OrderedDict
        # LRU of compiled window programs (each pins an XLA executable);
        # capacity = VLLM_METAL_TPU_MAX_COMPILE_BUCKETS
        self._compiled: "OrderedDict[tuple, Any]" = OrderedDict()

    # ------------------------------------------------------------------
    def _token_bucket(self, n: int) -> int:
        for b in self.cfg.scheduler.token_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"{n} tokens exceeds the largest bucket "
            f"{self.cfg.scheduler.token_buckets[-1]}")

    def _yoco_fast_active(self) -> bool:
        """YOCO reduced-query fast prefill applies when the model has
        KV-shared trailing layers and nothing needs full-width trailing
        rows (spec verify reads the last W+1 rows; LoRA routes per
        token; mm keeps 3-axis positions per row)."""
        return (getattr(self.model, "num_shared", 0) > 0
                and self.spec_window == 0
                and not self._is_mm
                and self.lora_manager is None)

    def _step_fn(self):
        """The jitted device step (cached per runner).

        Under TP the whole step runs inside shard_map: each chip holds its
        weight/KV shards, the model's TPContext inserts the Megatron
        collectives, and sampling is computed replicated (bitwise identical
        on every chip, so the host can read from any shard).
        """

        spec_w = self.spec_window
        use_lora = self.lora_manager is not None
        is_mm = self._is_mm
        yoco_fast = self._yoco_fast_active()

        def step(weights, cache: PagedKVCache, token_ids: jax.Array,
                 md: AttentionMetadata, st: SamplingTensors,
                 step_idx: jax.Array, *extras):
            i = 0
            lora_packs = token_slots = None
            mm_embeds = mm_rows = pos3 = None
            if use_lora:
                lora_packs, token_slots = extras[0], extras[1]
                i = 2
            if is_mm:
                mm_embeds, mm_rows, pos3 = extras[i:i + 3]
            sinks = None
            layers = getattr(weights, "layers", None)
            if isinstance(layers, (list, tuple)) and layers \
                    and getattr(layers[0], "sinks", None) is not None:
                sinks = [lw.sinks for lw in layers]
            # (stacked layers carry sinks inside the scan body instead)
            shared_md = shared_rows = None
            if yoco_fast:
                # YOCO reduced-query fast prefill: shared trailing
                # layers compute only each sequence's last row (padded
                # to the shared metadata's token rows)
                shared_md = extras[-1]
                rows = jnp.clip(md.query_start_loc[1:] - 1, 0,
                                token_ids.shape[0] - 1)
                shared_rows = jnp.pad(
                    rows, (0, shared_md.positions.shape[0]
                           - rows.shape[0]))
            attn_fn, get_cache = self.backend.make_attn_fn(
                cache, md, sinks_per_layer=sinks,
                shared_md=shared_md, shared_rows=shared_rows)
            lora_fn = None
            if use_lora:
                from ..lora.layers import lora_delta

                def lora_fn(i):
                    return lambda name, x: lora_delta(
                        x, lora_packs.get(name), i, token_slots)
            hidden = self.model.forward_hidden(
                weights, token_ids,
                pos3 if pos3 is not None else md.positions, attn_fn,
                lora_fn=lora_fn, mm_embeds=mm_embeds, mm_rows=mm_rows)
            if yoco_fast:
                # hidden is already one row per sequence (sliced at the
                # KV-shared boundary); spec_w == 0 by the gate
                hidden = hidden[:md.query_start_loc.shape[0] - 1]
                logits = self.model.logits(weights, hidden)
                ph = hidden.astype(jnp.float32)
                pooled = ph / jnp.linalg.norm(ph, axis=-1, keepdims=True)
                tokens, logprobs, topk_vals, topk_ids = sample(
                    logits, st, step_idx)
                return tokens, logprobs, topk_vals, topk_ids, logits, \
                    None, pooled, hidden, get_cache()
            last = md.query_start_loc[1:] - 1          # [S]
            if spec_w:
                # last (spec_w + 1) rows per seq for draft verification
                offs = jnp.arange(-spec_w, 1)
                rows = jnp.clip(last[:, None] + offs[None, :], 0,
                                hidden.shape[0] - 1)   # [S, W+1]
                s_pad, w1 = rows.shape
                logits_all = self.model.logits(
                    weights, hidden[rows.reshape(-1)])
                logits_all = logits_all.reshape(s_pad, w1, -1)
                verify = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
                logits = logits_all[:, -1]
            else:
                rows = jnp.clip(last, 0, hidden.shape[0] - 1)
                logits = self.model.logits(weights, hidden[rows])
                verify = None
            tokens, logprobs, topk_vals, topk_ids = sample(
                logits, st, step_idx)
            # LAST-pooled, L2-normalized hidden per seq (embeddings API;
            # reference: v1/pooling.py LAST pooling + normalize)
            pooled_rows = jnp.clip(last, 0, hidden.shape[0] - 1)
            hrows = hidden[pooled_rows]
            ph = hrows.astype(jnp.float32)
            pooled = ph / jnp.linalg.norm(ph, axis=-1, keepdims=True)
            return tokens, logprobs, topk_vals, topk_ids, logits, \
                verify, pooled, hrows, get_cache()

        if self.mesh is None:
            return functools.partial(jax.jit, donate_argnums=(1,))(step)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ..parallel.shardings import cache_pspecs, weight_pspecs

        w_specs = weight_pspecs(self.weights)
        c_specs = cache_pspecs(self.cache)
        n_extra = (2 if use_lora else 0) + (3 if is_mm else 0) \
            + (1 if yoco_fast else 0)
        # P() prefixes broadcast over the md / sampling pytrees (replicated)
        sharded = shard_map(
            step, mesh=self.mesh,
            in_specs=(w_specs, c_specs, P(), P(), P(), P())
            + (P(),) * n_extra,
            out_specs=(P(), P(), P(), P(), P(), P(), P(), P(), c_specs),
            check_vma=False)
        return functools.partial(jax.jit, donate_argnums=(1,))(sharded)

    # ------------------------------------------------------------------
    def _seq_bucket(self, n: int) -> int:
        """Live-seq row bucket: the window program's matmul row count.

        Padding to max_num_seqs made every decode-window matmul pay for
        64 rows at batch 16 (~2x step time at 8B, measured v5e — the
        group-dot kernel's cost grows with m); compile one program per
        power-of-two bucket instead."""
        b = 8
        while b < n:
            b *= 2
        return min(b, max(self.cfg.scheduler.max_num_seqs, n))

    def _window_fn(self, n_steps: int, s_pad: Optional[int] = None,
                   sampled: bool = False):
        """Jitted n-step pure-decode loop: sampled tokens feed back and
        metadata advances on device — one dispatch per window (multi-step
        scheduling; amortizes host/dispatch latency across steps).

        ``sampled=False`` compiles the greedy-argmax program;
        ``sampled=True`` runs the full on-device sampler per step
        (temperature/top-k/top-p/min-p/penalties) with the recent-token
        penalty ring maintained on device, so non-greedy traffic keeps
        multi-step scheduling (the reference's MPS sampler forces a host
        round-trip per step; ours doesn't — SamplingTensors' static
        ``use_*`` flags keep plain-temperature batches sort-free)."""
        import dataclasses
        if s_pad is None:
            s_pad = self.cfg.scheduler.max_num_seqs
        key = ("window", n_steps, s_pad, sampled)
        if key in self._compiled:
            self._compiled.move_to_end(key)
            return self._compiled[key]
        bs = self.cfg.cache.block_size
        model = self.model
        backend = self.backend

        def one_step(weights, cache, tokens, ctx_lens, md0, active):
            pos = ctx_lens - 1
            blk = jnp.take_along_axis(
                md0.block_tables, jnp.clip(pos, 0, None)[:, None] // bs,
                axis=1)[:, 0]
            slots = jnp.where(active, blk * bs + pos % bs, -1)
            md = dataclasses.replace(
                md0, slot_mapping=slots,
                context_lens=jnp.where(active, ctx_lens, 0),
                positions=jnp.where(active, pos, 0),
                token_kv_lens=jnp.where(active, ctx_lens, 0),
                token_seq_ids=jnp.arange(s_pad, dtype=jnp.int32),
                query_start_loc=jnp.minimum(
                    jnp.arange(s_pad + 1, dtype=jnp.int32),
                    md0.num_seqs).astype(jnp.int32))
            sinks = None
            layers = getattr(weights, "layers", None)
            if isinstance(layers, (list, tuple)) and layers \
                    and getattr(layers[0], "sinks", None) is not None:
                sinks = [lw.sinks for lw in layers]
            attn_fn, get_cache = backend.make_attn_fn(
                cache, md, sinks_per_layer=sinks)
            hidden = model.forward_hidden(weights, tokens, md.positions,
                                          attn_fn)
            rows = jnp.clip(md.query_start_loc[1:] - 1, 0,
                            hidden.shape[0] - 1)
            logits = model.logits(weights, hidden[rows])
            return get_cache(), logits, ctx_lens + 1

        if not sampled:
            def window(weights, cache, tokens, ctx_lens, md0):
                active = jnp.arange(s_pad) < md0.num_seqs
                # statically unrolled: a scan-of-layer-scan program
                # compiles pathologically slowly in this toolchain;
                # unrolled steps share one set of Mosaic kernels so
                # compile cost stays ~one step
                outs = []
                for _ in range(n_steps):
                    cache, logits, ctx_lens = one_step(
                        weights, cache, tokens, ctx_lens, md0, active)
                    tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    outs.append(tokens)
                # zero logprobs/ring (greedy): real arrays keep the
                # output pytree uniform for the shard_map out_specs
                return cache, jnp.stack(outs), \
                    jnp.zeros((n_steps, s_pad), jnp.float32), \
                    jnp.zeros((s_pad, 1), jnp.int32)
        else:
            def window(weights, cache, tokens, ctx_lens, md0, st,
                       base_lens, step0):
                active = jnp.arange(s_pad) < md0.num_seqs
                ring = st.recent_tokens.shape[1]
                outs, lps = [], []
                for i in range(n_steps):
                    cache, logits, ctx_lens = one_step(
                        weights, cache, tokens, ctx_lens, md0, active)
                    tokens, lp, _, _ = sample(logits, st, step0 + i)
                    tokens = tokens.astype(jnp.int32)
                    # append to the penalty ring (order-insensitive
                    # multiset of the last `ring` outputs, same contract
                    # as the host-built buffer in execute())
                    wpos = (base_lens + i) % ring
                    recent = st.recent_tokens.at[
                        jnp.arange(s_pad), wpos].set(
                        jnp.where(active, tokens, -1))
                    st = dataclasses.replace(st, recent_tokens=recent)
                    outs.append(tokens)
                    lps.append(lp)
                # the final ring feeds a CHAINED next window (device-side
                # penalty-state handoff, no host round trip)
                return (cache, jnp.stack(outs), jnp.stack(lps),
                        st.recent_tokens)

        if self.mesh is not None:
            # same seams as _step_fn: sharded weights + kv-head-sharded
            # cache in, everything else replicated (the sampler and token
            # feedback run identically on every chip)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            from ..parallel.shardings import cache_pspecs, weight_pspecs
            w_specs = weight_pspecs(self.weights)
            c_specs = cache_pspecs(self.cache)
            n_in = 3 if not sampled else 6
            window = shard_map(
                window, mesh=self.mesh,
                in_specs=(w_specs, c_specs) + (P(),) * n_in,
                out_specs=(c_specs, P(), P(), P()),
                check_vma=False)
        window = functools.partial(jax.jit, donate_argnums=(1,))(window)

        self._compiled[key] = window
        from .. import envs
        while len(self._compiled) > max(1, envs.MAX_COMPILE_BUCKETS):
            old_key, fn = self._compiled.popitem(last=False)
            logger.info("evicting compiled window program %s "
                        "(MAX_COMPILE_BUCKETS=%d)", old_key,
                        envs.MAX_COMPILE_BUCKETS)
        return window

    def execute_decode_window(
            self, seqs: list[SeqStepInput], n_steps: int,
            feed: Optional[dict] = None, sync: bool = True):
        """Run n pure-decode steps in one dispatch.

        Every seq must be decode-ready (query = its last committed token)
        with block tables covering context + n_steps slots.  With
        ``sync=True`` returns (sampled ids [n_steps, num_seqs], logprobs
        or None for the all-greedy program).

        ``sync=False`` returns a HANDLE (device arrays unfetched) whose
        ``"feed"`` entry lets the NEXT window dispatch immediately with
        device-resident token/penalty-ring state — window chaining: the
        host consumes window N's tokens while window N+1 executes (the
        engine's materialization of the reference's async
        execute_model/sample_tokens split, at window granularity).
        Fetch handles with :func:`fetch_windows`.  A chained call passes
        the previous handle's ``feed``; its SeqStepInput context_lens
        must already account for the previous window's tokens."""
        assert all(len(s.query_tokens) == 1 for s in seqs)
        s_pad = self._seq_bucket(len(seqs))
        md = build_metadata(
            query_lens=[1] * len(seqs),
            context_lens=[s.context_len for s in seqs],
            block_tables=[s.block_table for s in seqs],
            block_size=self.cfg.cache.block_size,
            token_pad=s_pad, seq_pad=s_pad,
            max_blocks_per_seq=self.max_blocks_per_seq,
            state_slots=[s.state_slot if s.state_slot >= 0 else i
                         for i, s in enumerate(seqs)],
            sliding_windows=self._windows,
            work_context_slack=n_steps - 1,
        )
        tokens = np.zeros((s_pad,), np.int32)
        ctx = np.zeros((s_pad,), np.int32)
        for i, s in enumerate(seqs):
            tokens[i] = s.query_tokens[0]
            ctx[i] = s.context_len
        tok_in = (feed["tokens"] if feed is not None
                  else jnp.asarray(tokens))
        greedy = all(s.params.greedy for s in seqs)
        base = None
        if greedy:
            window = self._window_fn(n_steps, s_pad)
            self.cache, outs, lps, ring = window(
                self.weights, self.cache, tok_in, jnp.asarray(ctx), md)
            lps = None
        else:
            rw = 64
            if feed is not None and feed.get("ring") is not None:
                recent = feed["ring"]
                base = feed["base"]
            else:
                recent = np.full((s_pad, rw), -1, np.int32)
                base = np.zeros((s_pad,), np.int32)
                for i, s in enumerate(seqs):
                    r = s.recent_tokens[-rw:]
                    if r:
                        recent[i, :len(r)] = r
                    base[i] = len(r)
            st = SamplingTensors.from_lists(
                [s.params for s in seqs], s_pad, recent_tokens=recent)
            window = self._window_fn(n_steps, s_pad, sampled=True)
            self.cache, outs, lps, ring = window(
                self.weights, self.cache, tok_in, jnp.asarray(ctx), md,
                st, jnp.asarray(base),
                jnp.asarray(self.step_counter, jnp.int32))
        self.step_counter += n_steps
        if not sync:
            return {
                "outs": outs, "lps": None if greedy else lps,
                "n": len(seqs),
                "feed": {"tokens": outs[n_steps - 1],
                         "ring": None if greedy else ring,
                         "base": None if greedy else base + n_steps},
            }
        outs_lps = None if greedy else np.asarray(lps)[:, :len(seqs)]
        return np.asarray(outs)[:, :len(seqs)], outs_lps

    @staticmethod
    def fetch_windows(handles: list) -> list:
        """One batched D2H for a chain of window handles ->
        [(outs [n_steps, n], lps or None), ...]."""
        fetch = [(h["outs"],) + (() if h["lps"] is None else (h["lps"],))
                 for h in handles]
        host = jax.device_get(fetch)
        res = []
        for h, parts in zip(handles, host):
            outs = parts[0][:, :h["n"]]
            lps = parts[1][:, :h["n"]] if h["lps"] is not None else None
            res.append((outs, lps))
        return res

    # ------------------------------------------------------------------
    def _mm_extras(self, seqs: list[SeqStepInput], t_pad: int):
        """(mm_embeds [M_pad, H], mm_rows [M_pad], pos3 [3, t_pad]).

        Placeholder rows across the packed batch, bucketed to powers of
        two; rows == -1 scatter-drop.  pos3 defaults to the linear
        positions (all three M-RoPE axes equal == plain RoPE) and is
        overridden per chunk where a request supplies 3-axis positions.
        """
        h = self.cfg.model.hidden_size
        rows: list[int] = []
        chunks: list[np.ndarray] = []
        pos3 = np.zeros((3, t_pad), np.int32)
        t0 = 0
        depth = 0                # 1 + K when any DeepStack chunk present
        for s in seqs:
            ql = len(s.query_tokens)
            if s.mm_rows:
                emb = np.asarray(s.mm_embeds, np.float32)
                assert emb.shape[-2] == len(s.mm_rows)
                if emb.ndim == 3:
                    depth = max(depth, emb.shape[0])
                chunks.append(emb)
                rows.extend(t0 + r for r in s.mm_rows)
            if s.mrope_positions is not None:
                pos3[:, t0:t0 + ql] = s.mrope_positions
            else:
                start = s.context_len - ql
                pos3[:, t0:t0 + ql] = np.arange(start, s.context_len,
                                                dtype=np.int32)[None]
            t0 += ql
        n = len(rows)
        m_pad = 8
        while m_pad < n:
            m_pad *= 2
        shape = (depth, m_pad, h) if depth else (m_pad, h)
        flat = np.zeros(shape, np.float32)
        row_arr = np.full((m_pad,), -1, np.int32)
        if n:
            if depth:
                # a 2-D chunk in a DeepStack batch contributes zero
                # injection rows (splice row only)
                chunks = [c if c.ndim == 3 else np.concatenate(
                    [c[None], np.zeros((depth - 1,) + c.shape,
                                       np.float32)])
                    for c in chunks]
                flat[:, :n] = np.concatenate(chunks, axis=-2)
            else:
                flat[:n] = np.concatenate(chunks, axis=0)
            row_arr[:n] = rows
        return (jnp.asarray(flat), jnp.asarray(row_arr),
                jnp.asarray(pos3))

    # ------------------------------------------------------------------
    def execute(self, seqs: list[SeqStepInput],
                sync: bool = True,
                fetch_outputs: bool = True) -> Optional[StepOutput]:
        """Run one engine step for the given packed batch.

        ``sync=False`` leaves outputs as device arrays without blocking —
        callers that don't feed sampled tokens back (benchmarks, spec-free
        pipelining) can enqueue the next step immediately; XLA dispatch is
        async, so host-side RPC latency overlaps device execution (the
        reference's execute_model/sample_tokens split, SURVEY.md §3.2).

        ``fetch_outputs=False`` (with ``sync=False``) returns None and
        skips even the output-slicing device ops — the pure-prefill-chunk
        path: nothing of the step's output is consumed, so the engine can
        prepare and dispatch the next chunk while this one executes."""
        assert seqs, "empty step"
        s_pad = self.cfg.scheduler.max_num_seqs
        total_tokens = sum(len(s.query_tokens) for s in seqs)
        t_pad = self._token_bucket(total_tokens)

        state_slots = [s.state_slot if s.state_slot >= 0 else i
                       for i, s in enumerate(seqs)]
        md = build_metadata(
            query_lens=[len(s.query_tokens) for s in seqs],
            context_lens=[s.context_len for s in seqs],
            block_tables=[s.block_table for s in seqs],
            block_size=self.cfg.cache.block_size,
            token_pad=t_pad,
            seq_pad=s_pad,
            max_blocks_per_seq=self.max_blocks_per_seq,
            state_slots=state_slots,
            sliding_windows=self._windows,
        )
        reset = [st for s, st in zip(seqs, state_slots) if s.reset_state]
        if reset and hasattr(self.cache, "reset_slots"):
            self.cache = self.cache.reset_slots(
                jnp.asarray(reset, jnp.int32))
        flat_tokens = np.zeros((t_pad,), np.int32)
        t = 0
        for s in seqs:
            flat_tokens[t:t + len(s.query_tokens)] = s.query_tokens
            t += len(s.query_tokens)

        window = 64
        recent = np.full((s_pad, window), -1, np.int32)
        for i, s in enumerate(seqs):
            r = s.recent_tokens[-window:]
            if r:
                recent[i, :len(r)] = r
        bitmask = None
        if any(s.token_bitmask is not None for s in seqs):
            nwords = (self.cfg.model.vocab_size + 31) // 32
            bitmask = np.full((s_pad, nwords), 0xFFFFFFFF, np.uint32)
            for i, s in enumerate(seqs):
                if s.token_bitmask is not None:
                    bitmask[i] = s.token_bitmask
        st = SamplingTensors.from_lists(
            [s.params for s in seqs], s_pad, recent_tokens=recent,
            token_bitmask=bitmask)

        if not hasattr(self, "_step"):
            self._step = self._step_fn()
        extra = ()
        if self.lora_manager is not None:
            slots = np.zeros((t_pad,), np.int32)
            t0 = 0
            for s in seqs:
                slots[t0:t0 + len(s.query_tokens)] = s.lora_slot
                t0 += len(s.query_tokens)
            extra = (self.lora_manager.packs, jnp.asarray(slots))
        if self._is_mm:
            extra = extra + self._mm_extras(seqs, t_pad)
        if self._yoco_fast_active():
            md_shared = build_metadata(
                query_lens=[1] * len(seqs),
                context_lens=[s.context_len for s in seqs],
                block_tables=[s.block_table for s in seqs],
                block_size=self.cfg.cache.block_size,
                token_pad=max(8, s_pad), seq_pad=s_pad,
                max_blocks_per_seq=self.max_blocks_per_seq,
                state_slots=state_slots,
                sliding_windows=self._windows)
            extra = extra + (md_shared,)
        tokens, logprobs, tkv, tki, logits, verify, pooled, hrows, \
            self.cache = self._step(
            self.weights, self.cache, jnp.asarray(flat_tokens), md, st,
            jnp.asarray(self.step_counter, jnp.int32), *extra)
        self.step_counter += 1
        if not sync and not fetch_outputs:
            return None
        n = len(seqs)
        has_topk = tkv.shape[-1] > 0
        if not sync:
            return StepOutput(token_ids=tokens[:n], logprobs=logprobs[:n],
                              topk_vals=tkv[:n] if has_topk else None,
                              topk_ids=tki[:n] if has_topk else None,
                              logits=logits[:n], verify_tokens=verify,
                              pooled=pooled[:n], hidden=hrows[:n])
        # one batched D2H round trip (each separate np.asarray costs a
        # full host<->device RPC — ~0.25-1 ms through the tunnel)
        fetch = (tokens, logprobs) + ((tkv, tki) if has_topk else ()) \
            + (() if verify is None else (verify,))
        host = jax.device_get(fetch)
        k = 2 + (2 if has_topk else 0)
        return StepOutput(token_ids=host[0][:n],
                          logprobs=host[1][:n],
                          topk_vals=host[2][:n] if has_topk else None,
                          topk_ids=host[3][:n] if has_topk else None,
                          logits=logits[:n],
                          verify_tokens=None if verify is None
                          else host[k][:n],
                          pooled=pooled[:n], hidden=hrows[:n])

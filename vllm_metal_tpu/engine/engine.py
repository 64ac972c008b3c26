# SPDX-License-Identifier: Apache-2.0
"""LLMEngine: the synchronous engine loop tying scheduler -> runner -> state.

Covers what the reference delegates to vLLM's EngineCore plus its own worker
glue (SURVEY.md §3.2): schedule, execute the packed batch, sample, advance
request state, honor prefix-cache hits, free finished requests.
"""

from __future__ import annotations

import itertools
import logging
import time
from typing import Any, Iterable, Optional

from ..config import EngineConfig
from .block_manager import BlockManager
from .model_runner import ModelRunner, SeqStepInput
from .outputs import RequestOutput
from .request import Request, RequestStatus
from .sampling_params import SamplingParams
from .scheduler import Scheduler

logger = logging.getLogger(__name__)

_FINISH_REASON = {
    RequestStatus.FINISHED_STOPPED: "stop",
    RequestStatus.FINISHED_LENGTH: "length",
    RequestStatus.FINISHED_ABORTED: "abort",
}


class LLMEngine:
    def __init__(self, model: Any, weights: Any, cfg: EngineConfig,
                 num_blocks: int, tokenizer: Any = None,
                 eos_token_id: Optional[int] = None,
                 use_pallas: Optional[bool] = None,
                 runner: Optional[ModelRunner] = None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        if eos_token_id is None and tokenizer is not None:
            eos_token_id = getattr(tokenizer, "eos_token_id", None)
        self.eos_token_id = eos_token_id
        self.runner = runner or ModelRunner(
            model, weights, cfg, num_blocks=num_blocks, use_pallas=use_pallas)
        self.bm = BlockManager(num_blocks, cfg.cache.block_size,
                               cfg.cache.enable_prefix_caching)
        self.scheduler = Scheduler(cfg.scheduler, self.bm,
                                   cfg.model.max_model_len)
        self.requests: dict[str, Request] = {}
        self._id_counter = itertools.count()
        self.proposer = None
        if cfg.spec.method == "ngram":
            from ..spec.ngram import NgramProposer
            self.proposer = NgramProposer(
                ngram_min=cfg.spec.ngram_min, ngram_max=cfg.spec.ngram_max,
                num_tokens=cfg.spec.num_speculative_tokens)
        elif cfg.spec.method in ("draft_model", "mtp"):
            # caller installs via set_draft_model() / set_mtp_head()
            pass
        elif cfg.spec.method:
            raise NotImplementedError(
                f"speculative method {cfg.spec.method!r}")
        self._drafts: dict[str, list[int]] = {}
        # stable recurrent-state slots for hybrid (GDN) models
        self._is_hybrid = hasattr(self.runner.cache, "reset_slots")
        self._state_slots: dict[str, int] = {}
        self._free_slots = list(range(cfg.scheduler.max_num_seqs))
        if self._is_hybrid and cfg.cache.enable_prefix_caching:
            # recurrent state cannot be rebuilt from KV blocks
            # (reference guard: platform.py:487-495)
            self.bm.enable_prefix_caching = False
        # multimodal: encoder cache + placeholder id (VL models)
        self._is_mm = getattr(self.runner.model, "mrope_sections",
                              None) is not None
        self.encoder_cache = None
        if self._is_mm:
            from ..multimodal.encoder_cache import EncoderCache
            self.encoder_cache = EncoderCache()
        # metrics
        self.num_prompt_tokens = 0
        self.num_generated_tokens = 0
        self.num_preemptions = 0
        self.num_cached_prompt_tokens = 0
        self.num_accepted_drafts = 0
        self.num_proposed_drafts = 0
        self.num_window_steps = 0      # engine steps served by the fused
        self.num_single_steps = 0      # multi-step decode window vs 1-step
        # decode-window tokens computed past a stop/EOS and discarded
        # (bounded overshoot the window path accepts; /metrics exposes it
        # so operators can see the waste)
        self.num_overshoot_tokens = 0
        # TTFT histogram (seconds, cumulative Prometheus buckets)
        self.ttft_bucket_bounds = (0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)
        self.ttft_bucket_counts = [0] * (len(self.ttft_bucket_bounds) + 1)
        self.ttft_sum = 0.0
        self.ttft_count = 0

    def set_mtp_head(self, head_weights) -> None:
        """Install an MTP draft head (spec.method == 'mtp')."""
        from ..spec.mtp import MTPProposer
        self.proposer = MTPProposer(self.runner.model, head_weights,
                                    self.runner)

    def set_draft_model(self, draft_model, draft_weights,
                        num_blocks: int = 128,
                        use_pallas=None) -> None:
        """Install a draft-model proposer (spec.method == 'draft_model')."""
        from ..spec.draft_model import DraftModelProposer
        import dataclasses
        dcfg = dataclasses.replace(self.cfg, model=draft_model.cfg)
        self.proposer = DraftModelProposer(
            draft_model, draft_weights, dcfg,
            num_tokens=self.cfg.spec.num_speculative_tokens,
            num_blocks=num_blocks, use_pallas=use_pallas)

    # ------------------------------------------------------------------
    def add_request(self, prompt_token_ids: list[int],
                    params: Optional[SamplingParams] = None,
                    request_id: Optional[str] = None,
                    lora_name: Optional[str] = None,
                    mm_features: Optional[list] = None) -> str:
        if request_id is None:
            request_id = f"req-{next(self._id_counter)}"
        if not prompt_token_ids:
            raise ValueError("empty prompt")
        max_len = self.cfg.model.max_model_len
        if len(prompt_token_ids) >= max_len:
            raise ValueError(
                f"prompt length {len(prompt_token_ids)} exceeds "
                f"max_model_len {max_len}")
        req = Request(
            request_id=request_id,
            prompt_token_ids=list(prompt_token_ids),
            params=params or SamplingParams(),
            eos_token_id=self.eos_token_id,
            lora_name=lora_name,
        )
        if req.params.stop:
            if self.tokenizer is None:
                raise ValueError(
                    "stop strings require the engine to have a tokenizer")
            from .detokenizer import IncrementalDetokenizer
            req.detok = IncrementalDetokenizer(
                self.tokenizer, req.params.stop,
                include_stop=req.params.include_stop_str_in_output)
        if mm_features:
            if not self._is_mm:
                raise ValueError("model has no multimodal path")
            self._admit_mm(req, mm_features)
        if lora_name and self.runner.lora_manager is None:
            raise ValueError("engine has no LoRA manager configured")
        self.requests[request_id] = req
        self.scheduler.add_request(req)
        self.num_prompt_tokens += len(prompt_token_ids)
        return request_id

    def _admit_mm(self, req: Request, features: list) -> None:
        """Encode, position, and attach multimodal features to a request.

        Covers the reference runner's mm admission: encoder dispatch with
        hash caching (``/root/reference/vllm_metal/v1/model_runner.py:2299``
        + ``v1/mm/encoder_cache.py``) and M-RoPE position computation.
        Feature offsets < 0 are derived by scanning the prompt for the
        model's image-placeholder runs.
        """
        import numpy as np
        from ..multimodal.encoder_cache import feature_hash
        from ..multimodal.mrope import mrope_positions

        model = self.runner.model
        merge = getattr(model, "vision_cfg", None)
        merge = merge.spatial_merge_size if merge is not None else 2
        image_token = getattr(model, "image_token_id", -1)
        ids = req.prompt_token_ids
        cursor = 0
        for f in sorted(features, key=lambda f: f.offset):
            n = f.num_tokens(merge)
            if f.offset < 0:
                # find the next placeholder run of length n
                while cursor < len(ids):
                    if ids[cursor] == image_token and \
                            ids[cursor:cursor + n] == [image_token] * n:
                        f.offset = cursor
                        cursor += n
                        break
                    cursor += 1
                if f.offset < 0:
                    raise ValueError(
                        f"no placeholder run of {n} image tokens found")
            if f.offset + n > len(ids):
                raise ValueError("image placeholders exceed prompt length")
            if f.embeds is None:
                if f.pixel_patches is None:
                    raise ValueError(
                        "feature needs pixel_patches or embeds")
                key = f.identifier or feature_hash(f.pixel_patches,
                                                   f.grid_thw)
                f.embeds = self.encoder_cache.get_or_encode(
                    key, lambda f=f: np.asarray(
                        model.encode_image(f.pixel_patches, f.grid_thw),
                        np.float32))
            if np.asarray(f.embeds).shape[-2] != n:
                raise ValueError(
                    f"feature embeds rows "
                    f"{np.asarray(f.embeds).shape[-2]} "
                    f"!= grid tokens {n}")
        req.mm_features = sorted(features, key=lambda f: f.offset)
        req.mrope_positions, req.mrope_delta = mrope_positions(
            len(ids), req.mm_features, merge)

    def abort_request(self, request_id: str) -> bool:
        ok = self.scheduler.abort_request(request_id)
        self.requests.pop(request_id, None)
        return ok

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished()

    def device_probe(self) -> None:
        """Evaluate one tiny device op end-to-end (health check; the
        reference's worker health check evaluates a single MLX op,
        ``/root/reference/vllm_metal/v1/worker.py:349``)."""
        import jax
        import jax.numpy as jnp
        jax.block_until_ready(jnp.zeros((8,), jnp.float32) + 1.0)

    # ------------------------------------------------------------------
    def _propose_drafts(self) -> dict[str, int]:
        """Ask the proposer for drafts for every decode-ready request.

        Proposers exposing ``propose_batch`` get ONE call covering the
        whole decode-ready set (one jitted device dispatch for MTP /
        one runner step per draft position for the draft model) instead
        of a host loop with a device call per request."""
        counts: dict[str, int] = {}
        if self.proposer is None:
            return counts
        # A spec round emits at most 1 + K tokens/seq per dispatch and
        # forces the single-step path; if the fused decode window would
        # fire at >= that size for this batch, drafting can only LOSE
        # throughput (r4 measured 0.82x at conc=8) — let the window run.
        # Spec keeps its win where windows can't go: grammar/logprobs
        # batches, mid-prefill mixes, or window-disabled configs.
        if self._window_would_fire() >= self.cfg.spec.num_speculative_tokens + 1:
            return counts
        w = self.cfg.spec.num_speculative_tokens
        ready = []
        for req in self.scheduler.running:
            if not req.params.greedy:
                continue  # greedy-only, like the reference
            if req.params.logprobs is not None:
                continue  # verify rows carry no logprobs; keep them exact
            if req.num_computed_tokens != req.num_tokens - 1:
                continue  # still prefilling
            ready.append(req)
        if not ready:
            return counts
        from ..spec.mtp import MTPProposer
        if isinstance(self.proposer, MTPProposer):
            reqs = [r for r in ready
                    if self.proposer.has_hidden(r.request_id)]
            if reqs:
                results = self.proposer.propose_batch(
                    [(r.request_id, r.all_token_ids,
                      self.bm.get_block_table(r.request_id))
                     for r in reqs])
            else:
                results = {}
        elif hasattr(self.proposer, "propose_batch"):
            results = self.proposer.propose_batch(
                [(r.request_id, r.all_token_ids) for r in ready])
        else:
            results = {r.request_id: self.proposer.propose(
                r.request_id, r.all_token_ids) for r in ready}
        for rid, drafts in results.items():
            drafts = drafts[:w]
            if drafts:
                self._drafts[rid] = drafts
                counts[rid] = len(drafts)
        return counts

    def _window_would_fire(self) -> int:
        """Decode-window size the NEXT step would run at if no drafts are
        scheduled (0 = window path unavailable).  Mirrors
        :meth:`_window_size`'s gates against the running set."""
        w = self.cfg.scheduler.decode_window
        if w <= 1 or not self.scheduler.running:
            return 0
        for req in self.scheduler.running:
            if (req.params.grammar is not None
                    or req.params.logprobs is not None
                    or req.lora_name is not None
                    or req.num_computed_tokens != req.num_tokens - 1
                    or req.mrope_delta != 0):
                return 0
            w = min(w, req.params.max_tokens - len(req.output_token_ids),
                    self.cfg.model.max_model_len - req.num_tokens)
        if self.scheduler.waiting and \
                len(self.scheduler.running) < self.cfg.scheduler.max_num_seqs:
            w = min(w, 4)
        if w < 1:
            return 0
        return 1 << (w.bit_length() - 1)

    def _state_slot_for(self, req) -> tuple[int, bool]:
        """(slot, is_fresh) — stable per-request GDN state slot."""
        rid = req.request_id
        if rid in self._state_slots:
            return self._state_slots[rid], False
        slot = self._free_slots.pop(0)
        self._state_slots[rid] = slot
        return slot, True

    def _release_state_slot(self, rid: str) -> None:
        slot = self._state_slots.pop(rid, None)
        if slot is not None:
            self._free_slots.append(slot)

    def step(self) -> list[RequestOutput]:
        draft_counts = self._propose_drafts()
        sched = self.scheduler.schedule(num_draft_tokens=draft_counts)
        self.num_cached_prompt_tokens = self.scheduler.cached_prompt_tokens
        self.num_preemptions += len(sched.preempted)
        if self._is_hybrid:
            for victim in sched.preempted:
                self._release_state_slot(victim.request_id)
        # admission-aborted requests (can never fit the pool) must still
        # produce a finished output or async clients hang forever
        abort_outs = [self._finish_aborted(req) for req in sched.aborted]
        if not sched.scheduled:
            return abort_outs

        window = self._window_size(sched)
        if window > 1:
            self.num_window_steps += 1
            return abort_outs + self._step_window(sched, window)
        self.num_single_steps += 1

        inputs: list[SeqStepInput] = []
        for s in sched.scheduled:
            req = s.request
            all_ids = req.all_token_ids
            start = req.num_computed_tokens
            if s.num_draft_tokens:
                drafts = self._drafts[req.request_id][:s.num_draft_tokens]
                chunk = all_ids[start:start + 1] + drafts
            else:
                chunk = all_ids[start:start + s.num_new_tokens]
            bitmask = None
            if req.params.grammar is not None:
                bitmask = req.params.grammar.next_allowed(
                    req.output_token_ids)
            lora_slot = 0
            if self.runner.lora_manager is not None:
                lora_slot = self.runner.lora_manager.slot_for(req.lora_name)
            state_slot, fresh = (-1, False)
            if self._is_hybrid:
                state_slot, fresh = self._state_slot_for(req)
            mm_embeds = mm_rows = mrope_pos = None
            if self._is_mm:
                mm_embeds, mm_rows, mrope_pos = self._mm_chunk(
                    req, start, len(chunk))
            inputs.append(SeqStepInput(
                query_tokens=chunk,
                context_len=start + len(chunk),
                block_table=self.bm.get_block_table(req.request_id),
                params=req.params,
                recent_tokens=req.output_token_ids,
                sample_needed=(start + s.num_new_tokens >= req.num_tokens
                               or s.num_draft_tokens > 0),
                num_draft_tokens=s.num_draft_tokens,
                token_bitmask=bitmask,
                lora_slot=lora_slot,
                state_slot=state_slot,
                reset_state=fresh,
                mm_embeds=mm_embeds,
                mm_rows=mm_rows,
                mrope_positions=mrope_pos,
            ))

        if not any(s.sample_needed for s in inputs):
            # pure prefill-chunk step: no output is consumed, so dispatch
            # async and return — the engine overlaps the NEXT chunk's
            # host-side prep (metadata, chunking) with device execution
            # (the reference's execute_model/sample_tokens split;
            # r4 weak: this path was fully synchronous)
            self.runner.execute(inputs, sync=False, fetch_outputs=False)
            for i, s in enumerate(sched.scheduled):
                req = s.request
                req.num_computed_tokens += s.num_new_tokens
                self.bm.commit_full_blocks(
                    req.request_id, req.all_token_ids,
                    req.num_computed_tokens)
            return abort_outs

        out = self.runner.execute(inputs)

        if self.proposer is not None and out.hidden is not None:
            from ..spec.mtp import MTPProposer
            if isinstance(self.proposer, MTPProposer):
                # stash the batch's last-hidden rows in the proposer's
                # DEVICE buffer (async scatter — no [S, H] D2H; through
                # the tunnel that fetch cost tens of ms per step)
                rows = [i for i, s in enumerate(inputs) if s.sample_needed]
                self.proposer.stash_hidden(
                    [sched.scheduled[i].request.request_id for i in rows],
                    out.hidden, rows)
        results: list[RequestOutput] = []
        now = time.monotonic()
        for i, s in enumerate(sched.scheduled):
            req = s.request
            if s.num_draft_tokens:
                new_tokens, accepted = self._verify(req, s, out, i)
            else:
                req.num_computed_tokens += s.num_new_tokens
                new_tokens, accepted = None, 0
            if not inputs[i].sample_needed:
                self.bm.commit_full_blocks(
                    req.request_id, req.all_token_ids,
                    req.num_computed_tokens)
                continue
            if new_tokens is None:
                new_tokens = [int(out.token_ids[i])]
                logprobs = [float(out.logprobs[i])]
            else:
                logprobs = [0.0] * len(new_tokens)
            emitted: list[int] = []
            stop = None
            for tok, lp in zip(new_tokens, logprobs):
                req.output_token_ids.append(tok)
                req.logprobs.append(lp)
                if req.params.logprobs is not None \
                        and out.topk_ids is not None:
                    # non-spec path: one sampled token per step, so the
                    # step's top-k row belongs to this token
                    req.top_logprobs.append(list(zip(
                        (int(t) for t in out.topk_ids[i]),
                        (float(v) for v in out.topk_vals[i]))))
                emitted.append(tok)
                self.num_generated_tokens += 1
                stop = req.check_stop(self.cfg.model.max_model_len)
                if stop is not None:
                    break
            if req.first_token_time is None:
                req.first_token_time = now
                self._record_ttft(now - req.arrival_time)
            # commit after appending so block hashes cover real tokens
            # (spec-accepted tokens only exist in all_token_ids now); clamp
            # to num_tokens — a stop can truncate below the KV watermark
            self.bm.commit_full_blocks(
                req.request_id, req.all_token_ids,
                min(req.num_computed_tokens, req.num_tokens))
            finished = stop is not None
            if finished:
                self.scheduler.finish_request(req, stop)
                self.requests.pop(req.request_id, None)
                self._drafts.pop(req.request_id, None)
                self._release_state_slot(req.request_id)
                if self.proposer is not None:
                    self.proposer.release(req.request_id)
            results.append(self._make_output(req, emitted, stop))
        return abort_outs + results

    def _record_ttft(self, ttft_s: float) -> None:
        for i, b in enumerate(self.ttft_bucket_bounds):
            if ttft_s <= b:
                self.ttft_bucket_counts[i] += 1
                break
        else:
            self.ttft_bucket_counts[-1] += 1
        self.ttft_sum += ttft_s
        self.ttft_count += 1

    def _finish_aborted(self, req) -> RequestOutput:
        """Clean up and emit the final output for an admission-aborted
        request (ADVICE r4: without this the HTTP client hangs)."""
        self.requests.pop(req.request_id, None)
        self._drafts.pop(req.request_id, None)
        self._release_state_slot(req.request_id)
        if self.proposer is not None:
            self.proposer.release(req.request_id)
        return self._make_output(req, [], RequestStatus.FINISHED_ABORTED)

    def _make_output(self, req, emitted: list[int], stop) -> RequestOutput:
        finished = stop is not None
        text = stop_reason = None
        if req.detok is not None:
            text = req.detok.text if finished else req.detok.safe_text
            stop_reason = req.detok.stop_reason
        return RequestOutput(
            request_id=req.request_id,
            new_token_ids=emitted,
            finished=finished,
            finish_reason=_FINISH_REASON.get(stop),
            token_ids=list(req.output_token_ids),
            logprobs=list(req.logprobs),
            top_logprobs=(list(req.top_logprobs)
                          if req.params.logprobs is not None else None),
            text=text,
            stop_reason=stop_reason,
            num_prompt_tokens=req.num_prompt_tokens,
        )

    def _mm_chunk(self, req, start: int, qlen: int):
        """Chunk-local mm splice rows/embeds + 3-axis positions.

        Prefix-cache hits and chunked prefill just slice the feature's
        embedding rows by the chunk window (the reference's
        ``start_pos``/``num_computed_tokens`` honoring, SURVEY.md §3.2).
        """
        import numpy as np
        rows: list[int] = []
        embeds = []
        end = start + qlen
        for f in req.mm_features:
            e = np.asarray(f.embeds)
            n = e.shape[-2]      # [n, H] or [1+K, n, H] (DeepStack)
            s0 = max(start, f.offset)
            e0 = min(end, f.offset + n)
            if s0 < e0:
                embeds.append(e[..., s0 - f.offset:e0 - f.offset, :])
                rows.extend(range(s0 - start, e0 - start))
        pos = np.empty((3, qlen), np.int32)
        p_len = req.num_prompt_tokens
        for j in range(qlen):
            idx = start + j
            if req.mrope_positions is not None and idx < p_len:
                pos[:, j] = req.mrope_positions[:, idx]
            else:
                pos[:, j] = idx + req.mrope_delta
        emb = np.concatenate(embeds, axis=-2) if embeds else None
        return emb, rows or None, pos

    def _window_size(self, sched) -> int:
        """Multi-step decode eligibility: a full batch of decodes with no
        drafts/grammar/active-LoRA.  Non-greedy sampling is fine — the
        window program runs the full on-device sampler (penalty ring
        maintained on device); only grammar (host FSM advance per token)
        forces per-step execution.  A merely *loaded* LoRA manager
        doesn't gate the window — only a request in this batch that
        actually routes to an adapter does (the window program has no
        lora seam).  An *installed* proposer doesn't gate it either —
        only actual drafts in this batch do (per-request check below);
        under continuous arrivals a waiting queue BOUNDS the window
        (admission latency <= 4 decode steps) instead of disabling it,
        so serving keeps the dispatch amortization mid-flight."""
        w = self.cfg.scheduler.decode_window
        if w <= 1:
            return 1
        if not sched.scheduled:
            return 1
        if self.scheduler.waiting:
            if len(sched.scheduled) < self.cfg.scheduler.max_num_seqs:
                # an admission attempt could succeed next step: cap the
                # dispatch so waiting requests aren't starved
                w = min(w, 4)
            # full batch: nothing could be admitted anyway; keep w
        for s in sched.scheduled:
            req = s.request
            if (s.num_new_tokens != 1 or s.num_draft_tokens
                    or req.params.grammar is not None
                    or req.params.logprobs is not None
                    or req.lora_name is not None
                    or req.num_computed_tokens != req.num_tokens - 1
                    or req.mrope_delta != 0):
                return 1
            w = min(w, req.params.max_tokens - len(req.output_token_ids))
            w = min(w, self.cfg.model.max_model_len - req.num_tokens)
        if w < 1:
            return 1
        # round DOWN to a power of two: every (n_steps, s_pad) pair is a
        # separate compiled program, so arbitrary remainders (e.g. the
        # last 15 steps of a 96-token request) would each compile ~10s
        # on first sight; pow2 bounds the program set to log2(window)
        return 1 << (w.bit_length() - 1)

    def _step_window(self, sched, window: int) -> list[RequestOutput]:
        import dataclasses as _dc

        import numpy as np
        reqs = [s.request for s in sched.scheduled]
        # chain two windows when every request has the headroom: window 2
        # dispatches immediately with device-resident token/ring feedback,
        # overlapping this host loop with device execution (stop-token
        # overshoot wastes at most one window of compute, same class as
        # the in-window overshoot the window path already accepts)
        chain = 1
        if window == self.cfg.scheduler.decode_window and all(
                (req.params.max_tokens - len(req.output_token_ids)
                 >= 2 * window)
                and (self.cfg.model.max_model_len - req.num_tokens
                     >= 2 * window)
                for req in reqs):
            chain = 2
        for req in reqs:
            if not self.bm.append_slots(req.request_id,
                                        req.num_tokens + chain * window):
                window, chain = 1, 1
                break
        inputs = []
        for req in reqs:
            state_slot, fresh = (-1, False)
            if self._is_hybrid:
                state_slot, fresh = self._state_slot_for(req)
            inputs.append(SeqStepInput(
                query_tokens=[req.all_token_ids[-1]],
                context_len=req.num_tokens,
                block_table=self.bm.get_block_table(req.request_id),
                params=req.params, state_slot=state_slot,
                reset_state=fresh,
                recent_tokens=req.output_token_ids))
        def batches():
            """Token batches to consume; chained mode fetches window 1
            while window 2 still executes (the host token loop below
            overlaps device time — the reference's async
            execute_model/sample_tokens split, at window granularity)."""
            if chain == 1:
                yield self.runner.execute_decode_window(inputs, window)
                return
            h1 = self.runner.execute_decode_window(inputs, window,
                                                   sync=False)
            inputs2 = [_dc.replace(s,
                                   context_len=s.context_len + window,
                                   reset_state=False) for s in inputs]
            h2 = self.runner.execute_decode_window(
                inputs2, window, feed=h1["feed"], sync=False)
            (o1, l1), = self.runner.fetch_windows([h1])
            yield o1, l1
            (o2, l2), = self.runner.fetch_windows([h2])
            yield o2, l2

        emitted: list[list[int]] = [[] for _ in reqs]
        stops = [None] * len(reqs)
        for outs, lps in batches():
            for i, req in enumerate(reqs):
                if stops[i] is not None:
                    continue
                for j in range(outs.shape[0]):
                    tok = int(outs[j, i])
                    req.output_token_ids.append(tok)
                    req.logprobs.append(
                        0.0 if lps is None else float(lps[j, i]))
                    emitted[i].append(tok)
                    self.num_generated_tokens += 1
                    stops[i] = req.check_stop(self.cfg.model.max_model_len)
                    if stops[i] is not None:
                        break

        results: list[RequestOutput] = []
        now = time.monotonic()
        total_rows = chain * window
        for i, req in enumerate(reqs):
            req.num_computed_tokens += len(emitted[i])
            self.num_overshoot_tokens += total_rows - len(emitted[i])
            if req.first_token_time is None:
                req.first_token_time = now
                self._record_ttft(now - req.arrival_time)
            self.bm.commit_full_blocks(
                req.request_id, req.all_token_ids,
                min(req.num_computed_tokens, req.num_tokens))
            finished = stops[i] is not None
            if finished:
                self.scheduler.finish_request(req, stops[i])
                self.requests.pop(req.request_id, None)
                self._release_state_slot(req.request_id)
            results.append(self._make_output(req, emitted[i], stops[i]))
        return results

    def _verify(self, req, s, out, i):
        """Greedy-verify drafts for scheduled seq i; advance KV state."""
        from ..spec.controller import verify_greedy
        w = self.cfg.spec.num_speculative_tokens
        k = s.num_draft_tokens
        drafts = self._drafts.pop(req.request_id)[:k]
        vt = out.verify_tokens[i]                 # [w + 1]
        target_next = [int(x) for x in vt[w - k:]]
        accepted, new_tokens = verify_greedy(target_next, drafts)
        start = req.num_computed_tokens
        req.num_computed_tokens = start + 1 + accepted
        req.num_accepted_drafts += accepted
        self.num_accepted_drafts += accepted
        self.num_proposed_drafts += k
        if self.proposer is not None:
            self.proposer.record_result(req.request_id, accepted, k)
        return new_tokens, accepted

    # ------------------------------------------------------------------
    def embed(self, prompt_token_ids: list[int]):
        """Prefill-only embedding: LAST pooling + L2 norm (the reference's
        text-embedding path, ``/root/reference/vllm_metal/v1/pooling.py``).

        Runs outside the scheduler on temporary blocks."""
        import numpy as np
        from .model_runner import SeqStepInput
        n = len(prompt_token_ids)
        if n == 0:
            raise ValueError("empty prompt")
        rid = f"embed-{next(self._id_counter)}"
        if not self.bm.allocate(rid, prompt_token_ids):
            raise RuntimeError("no KV blocks free for embedding request")
        try:
            out = self.runner.execute([SeqStepInput(
                query_tokens=list(prompt_token_ids), context_len=n,
                block_table=self.bm.get_block_table(rid),
                params=SamplingParams(max_tokens=1),
                sample_needed=False)])
            return np.asarray(out.pooled)[0]
        finally:
            self.bm.free(rid)

    # ------------------------------------------------------------------
    def classify(self, prompt_token_ids: list[int], no_id: int,
                 yes_id: int) -> float:
        """Qwen3-reranker-style classify: P(yes) from the last-token
        logits' (no, yes) pair (the reference's classify pooling,
        ``/root/reference/vllm_metal/v1/pooling.py:20,303``)."""
        import numpy as np
        from .model_runner import SeqStepInput
        n = len(prompt_token_ids)
        if n == 0:
            raise ValueError("empty prompt")
        rid = f"classify-{next(self._id_counter)}"
        if not self.bm.allocate(rid, prompt_token_ids):
            raise RuntimeError("no KV blocks free for classify request")
        try:
            out = self.runner.execute([SeqStepInput(
                query_tokens=list(prompt_token_ids), context_len=n,
                block_table=self.bm.get_block_table(rid),
                params=SamplingParams(max_tokens=1))])
            logits = np.asarray(out.logits)[0]
            pair = np.asarray([logits[no_id], logits[yes_id]], np.float64)
            pair -= pair.max()
            e = np.exp(pair)
            return float(e[1] / e.sum())
        finally:
            self.bm.free(rid)

    # ------------------------------------------------------------------
    def generate(self, prompts: Iterable[list[int]],
                 params: Optional[SamplingParams] = None,
                 max_steps: int = 100_000,
                 mm_features: Optional[list] = None
                 ) -> dict[str, RequestOutput]:
        """Offline batch API: run all prompts to completion.

        ``mm_features``: optional per-prompt lists of MMFeature."""
        prompts = list(prompts)
        mm = mm_features or [None] * len(prompts)
        ids = [self.add_request(p, params, mm_features=f)
               for p, f in zip(prompts, mm)]
        final: dict[str, RequestOutput] = {}
        for _ in range(max_steps):
            if not self.has_unfinished():
                break
            for out in self.step():
                if out.finished:
                    final[out.request_id] = out
        missing = [r for r in ids if r not in final]
        if missing:
            raise RuntimeError(f"requests did not finish: {missing}")
        return final

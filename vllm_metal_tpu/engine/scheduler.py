# SPDX-License-Identifier: Apache-2.0
"""Continuous-batching scheduler (vLLM-v1-style token budget).

The reference runs on upstream vLLM's scheduler (SURVEY.md §0); this is the
in-repo TPU design: one token budget shared by decodes and (chunked)
prefills, packed decode-then-prefill into a single flat batch — the same
batch shape the reference's ``prepare_grouped`` produces
(``/root/reference/vllm_metal/attention/context.py:156``).  Preemption is
recompute-style: blocks are freed and the request re-prefills on resume
(matching ``/root/reference/vllm_metal/v1/model_runner.py:1982-1994``).
"""

from __future__ import annotations

import logging
from collections import deque
from dataclasses import dataclass, field

from ..config import SchedulerConfig
from .block_manager import BlockManager
from .request import Request, RequestStatus

logger = logging.getLogger(__name__)


@dataclass
class ScheduledSeq:
    request: Request
    num_new_tokens: int
    # number of draft tokens included in num_new_tokens (spec decode)
    num_draft_tokens: int = 0


@dataclass
class SchedulerOutput:
    scheduled: list[ScheduledSeq]
    preempted: list[Request]
    # requests rejected at admission (can never fit the KV pool); the
    # engine must emit a finished RequestOutput for these or the client
    # awaits forever
    aborted: list[Request] = field(default_factory=list)

    @property
    def num_tokens(self) -> int:
        return sum(s.num_new_tokens for s in self.scheduled)


class Scheduler:
    def __init__(self, cfg: SchedulerConfig, block_manager: BlockManager,
                 max_model_len: int):
        self.cfg = cfg
        self.bm = block_manager
        self.max_model_len = max_model_len
        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        # prompt tokens served from the prefix cache (admission-time hits)
        self.cached_prompt_tokens = 0

    # ------------------------------------------------------------------
    def add_request(self, req: Request) -> None:
        req.status = RequestStatus.WAITING
        self.waiting.append(req)

    def abort_request(self, request_id: str) -> bool:
        for q in (self.waiting,):
            for r in list(q):
                if r.request_id == request_id:
                    q.remove(r)
                    r.status = RequestStatus.FINISHED_ABORTED
                    return True
        for r in self.running:
            if r.request_id == request_id:
                self.running.remove(r)
                self.bm.free(r.request_id)
                r.status = RequestStatus.FINISHED_ABORTED
                return True
        return False

    def finish_request(self, req: Request, status: RequestStatus) -> None:
        req.status = status
        if req in self.running:
            self.running.remove(req)
        self.bm.free(req.request_id)

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    # ------------------------------------------------------------------
    def _preempt_one(self) -> Request | None:
        """Evict the lowest-priority (latest-arrived) running request."""
        if not self.running:
            return None
        victim = self.running.pop()
        self.bm.free(victim.request_id)
        victim.status = RequestStatus.PREEMPTED
        victim.num_computed_tokens = 0
        victim.block_ids = []
        self.waiting.appendleft(victim)
        logger.debug("preempted %s", victim.request_id)
        return victim

    def schedule(self, num_draft_tokens: dict[str, int] | None = None
                 ) -> SchedulerOutput:
        """One step's worth of work.  ``num_draft_tokens`` maps request_id ->
        count of speculative draft tokens to verify alongside the decode."""
        num_draft_tokens = num_draft_tokens or {}
        budget = self.cfg.max_num_batched_tokens
        scheduled: list[ScheduledSeq] = []
        preempted: list[Request] = []
        aborted: list[Request] = []

        # 1. running requests: decodes (+ drafts) and prefill continuations
        for req in list(self.running):
            if budget <= 0 or len(scheduled) >= self.cfg.max_num_seqs:
                break
            if req.status is not RequestStatus.RUNNING:
                continue  # preempted earlier in this same pass
            target = req.num_tokens
            if req.num_computed_tokens < target - 1:
                # prefill (or resume) continuation
                remaining = target - req.num_computed_tokens
                n = min(remaining, budget)
                drafts = 0
            else:
                drafts = min(num_draft_tokens.get(req.request_id, 0),
                             max(0, budget - 1))
                n = 1 + drafts
            new_total = req.num_computed_tokens + n
            ok = self.bm.append_slots(req.request_id, new_total)
            while not ok:
                victim = self._preempt_one()
                if victim is None:
                    n = 0
                    break
                preempted.append(victim)
                if victim is req:
                    n = 0
                    break
                ok = self.bm.append_slots(req.request_id, new_total)
            if n <= 0 or req.status is RequestStatus.PREEMPTED:
                continue
            budget -= n
            scheduled.append(ScheduledSeq(req, n, drafts))

        # 2. admit waiting requests (chunked prefill).  Never admit in a step
        # that preempted — re-admitting the victim immediately would thrash.
        while (not preempted and self.waiting and budget > 0
               and len(scheduled) < self.cfg.max_num_seqs
               and len(self.running) < self.cfg.max_num_seqs):
            req = self.waiting[0]
            all_ids = req.all_token_ids
            computed_blocks, cached_tokens = \
                self.bm.get_computed_blocks(all_ids)
            remaining = len(all_ids) - cached_tokens
            n = remaining if self.cfg.enable_chunked_prefill is False \
                else min(remaining, budget)
            if n > budget:
                break
            # allocate up to the KV coverage of this chunk
            cover = cached_tokens + n
            if not self.bm.allocate(req.request_id, all_ids[:cover],
                                    computed_blocks):
                # Can't fit: STALL admission until decode growth or
                # finishes free blocks.  Never preempt here — part 1
                # already scheduled every running request this step, so
                # an admission-path victim would be executed with freed
                # blocks and rolled-back state while re-entering the
                # waiting queue AHEAD of the request being admitted
                # (observed corrupting greedy exactness:
                # tests/test_contract.py::test_preempt_under_spec_exact).
                if not self.running and not scheduled:
                    # nothing running to free blocks: the request can
                    # never fit this pool — fail it instead of spinning
                    self.waiting.popleft()
                    req.status = RequestStatus.FINISHED_ABORTED
                    aborted.append(req)
                    logger.warning(
                        "request %s needs more KV blocks than the pool "
                        "can ever free; aborting", req.request_id)
                break
            self.waiting.popleft()
            req.status = RequestStatus.RUNNING
            req.num_computed_tokens = cached_tokens
            self.cached_prompt_tokens += cached_tokens
            self.running.append(req)
            budget -= n
            scheduled.append(ScheduledSeq(req, n))

        # pack decode-first (the reference's grouped layout)
        scheduled.sort(key=lambda s: s.num_new_tokens)
        return SchedulerOutput(scheduled=scheduled, preempted=preempted,
                               aborted=aborted)

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
from .scheduler import Scheduler, SchedulerOutput

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
        # metrics
        self.num_prompt_tokens = 0
        self.num_generated_tokens = 0
        self.num_preemptions = 0
        self.num_cached_prompt_tokens = 0

    # ------------------------------------------------------------------
    def add_request(self, prompt_token_ids: list[int],
                    params: Optional[SamplingParams] = None,
                    request_id: Optional[str] = None) -> str:
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
        )
        self.requests[request_id] = req
        self.scheduler.add_request(req)
        self.num_prompt_tokens += len(prompt_token_ids)
        return request_id

    def abort_request(self, request_id: str) -> bool:
        ok = self.scheduler.abort_request(request_id)
        self.requests.pop(request_id, None)
        return ok

    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished()

    # ------------------------------------------------------------------
    def step(self) -> list[RequestOutput]:
        sched = self.scheduler.schedule()
        self.num_preemptions += len(sched.preempted)
        if not sched.scheduled:
            return []

        inputs: list[SeqStepInput] = []
        for s in sched.scheduled:
            req = s.request
            all_ids = req.all_token_ids
            start = req.num_computed_tokens
            chunk = all_ids[start:start + s.num_new_tokens]
            inputs.append(SeqStepInput(
                query_tokens=chunk,
                context_len=start + s.num_new_tokens,
                block_table=self.bm.get_block_table(req.request_id),
                params=req.params,
                recent_tokens=req.output_token_ids,
                sample_needed=(start + s.num_new_tokens >= req.num_tokens),
            ))

        out = self.runner.execute(inputs)

        results: list[RequestOutput] = []
        now = time.monotonic()
        for i, s in enumerate(sched.scheduled):
            req = s.request
            req.num_computed_tokens += s.num_new_tokens
            self.bm.commit_full_blocks(
                req.request_id, req.all_token_ids, req.num_computed_tokens)
            if not inputs[i].sample_needed:
                continue
            token = int(out.token_ids[i])
            req.output_token_ids.append(token)
            req.logprobs.append(float(out.logprobs[i]))
            if req.first_token_time is None:
                req.first_token_time = now
            self.num_generated_tokens += 1
            stop = req.check_stop(self.cfg.model.max_model_len)
            finished = stop is not None
            if finished:
                self.scheduler.finish_request(req, stop)
                self.requests.pop(req.request_id, None)
            results.append(RequestOutput(
                request_id=req.request_id,
                new_token_ids=[token],
                finished=finished,
                finish_reason=_FINISH_REASON.get(stop),
                token_ids=list(req.output_token_ids),
                logprobs=list(req.logprobs),
                num_prompt_tokens=req.num_prompt_tokens,
            ))
        return results

    # ------------------------------------------------------------------
    def generate(self, prompts: Iterable[list[int]],
                 params: Optional[SamplingParams] = None,
                 max_steps: int = 100_000) -> dict[str, RequestOutput]:
        """Offline batch API: run all prompts to completion."""
        ids = [self.add_request(p, params) for p in prompts]
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

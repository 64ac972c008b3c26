# SPDX-License-Identifier: Apache-2.0
"""Request lifecycle state (the engine-side analogue of the reference's
``RequestState``, ``/root/reference/vllm_metal/v1/model_runner.py:151``)."""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Optional

from .sampling_params import SamplingParams


class RequestStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    PREEMPTED = "preempted"
    FINISHED_STOPPED = "finished_stopped"      # stop token / stop string
    FINISHED_LENGTH = "finished_length"        # max_tokens / max_model_len
    FINISHED_ABORTED = "finished_aborted"

    @property
    def finished(self) -> bool:
        return self.name.startswith("FINISHED")


@dataclass
class Request:
    request_id: str
    prompt_token_ids: list[int]
    params: SamplingParams
    eos_token_id: Optional[int] = None
    arrival_time: float = field(default_factory=time.monotonic)

    lora_name: Optional[str] = None
    status: RequestStatus = RequestStatus.WAITING
    output_token_ids: list[int] = field(default_factory=list)
    # KV tokens whose cache entries are valid (prefix-cache hits + computed).
    num_computed_tokens: int = 0
    block_ids: list[int] = field(default_factory=list)
    # accumulated per-token logprobs (parallel to output_token_ids)
    logprobs: list[float] = field(default_factory=list)
    # per-token top-k alternatives [(token_id, logprob), ...] when the
    # request asked for logprobs (parallel to output_token_ids)
    top_logprobs: list[list[tuple[int, float]]] = field(default_factory=list)
    # incremental detokenizer (installed by the engine when the request
    # has stop strings and a tokenizer is available); owns output text
    detok: Optional[object] = None
    # number of draft tokens accepted last step (spec decode metrics)
    num_accepted_drafts: int = 0
    first_token_time: Optional[float] = None
    # multimodal: attached images (MMFeature list, embeds filled at
    # admission), 3-axis M-RoPE prompt positions [3, P] + decode delta
    mm_features: list = field(default_factory=list)
    mrope_positions: Optional[object] = None
    mrope_delta: int = 0

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def prompt_fully_computed(self) -> bool:
        return self.num_computed_tokens >= self.num_prompt_tokens

    def check_stop(self, max_model_len: int) -> Optional[RequestStatus]:
        """Stop conditions after appending a new output token."""
        if not self.output_token_ids:
            return None
        last = self.output_token_ids[-1]
        p = self.params
        if not p.ignore_eos and self.eos_token_id is not None \
                and last == self.eos_token_id:
            return RequestStatus.FINISHED_STOPPED
        if last in p.stop_token_ids:
            return RequestStatus.FINISHED_STOPPED
        if self.detok is not None and self.detok.append(last):
            # stop string completed: generation terminates NOW (not just
            # post-hoc text truncation) — detok.text is already truncated
            return RequestStatus.FINISHED_STOPPED
        if len(self.output_token_ids) >= p.max_tokens:
            return RequestStatus.FINISHED_LENGTH
        if self.num_tokens >= max_model_len:
            return RequestStatus.FINISHED_LENGTH
        return None

# SPDX-License-Identifier: Apache-2.0
"""Engine step outputs delivered to callers (server / offline API)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class RequestOutput:
    request_id: str
    new_token_ids: list[int]
    finished: bool
    finish_reason: Optional[str] = None      # "stop" | "length" | "abort"
    token_ids: list[int] = field(default_factory=list)  # all output tokens
    logprobs: Optional[list[float]] = None
    # per-token top-k alternatives [(token_id, logprob), ...] — only
    # populated when the request asked for logprobs
    top_logprobs: Optional[list[list[tuple[int, float]]]] = None
    # detokenized output text, stop-string truncated; while unfinished
    # this is the STREAM-SAFE prefix (holds back partial stop strings).
    # None when the engine has no detokenizer for this request.
    text: Optional[str] = None
    # the matched stop string (finish_reason == "stop" via stop list)
    stop_reason: Optional[str] = None
    num_prompt_tokens: int = 0
    num_cached_tokens: int = 0

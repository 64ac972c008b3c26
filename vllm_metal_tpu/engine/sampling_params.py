# SPDX-License-Identifier: Apache-2.0
"""Per-request sampling parameters (vLLM-style surface, reduced to what the
engine supports end-to-end)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class SamplingParams:
    max_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0                   # 0 = disabled
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    stop: list[str] = field(default_factory=list)
    stop_token_ids: list[int] = field(default_factory=list)
    seed: Optional[int] = None
    # None = no logprobs in the response; k >= 0 = return the sampled
    # token's logprob plus its k most likely alternatives per position
    logprobs: Optional[int] = None
    include_stop_str_in_output: bool = False
    ignore_eos: bool = False
    # structured output: object with next_allowed(output_tokens) -> packed
    # uint32 bitmask (see engine/structured_output.py)
    grammar: Optional[Any] = None

    @property
    def greedy(self) -> bool:
        return self.temperature < 1e-5

    def __post_init__(self) -> None:
        if not 0.0 <= self.top_p <= 1.0:
            raise ValueError(f"top_p must be in [0, 1], got {self.top_p}")
        if self.top_k < 0:
            raise ValueError(f"top_k must be >= 0, got {self.top_k}")
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")

# SPDX-License-Identifier: Apache-2.0
"""Draft-model speculative proposer.

Re-implements the reference's ``DraftModelProposer`` behavior
(``/root/reference/vllm_metal/v1/draft_model_proposer.py:1-40``): a separate
small model with its OWN paged cache and block allocator (the draft runs
ahead of the committed length, so it cannot share the target's block
tables).  Per round: ingest the committed suffix it hasn't seen, then run K
greedy decode steps to produce K draft tokens.  Rejected drafts need no
rollback — their cache slots are rewritten by position on the next ingest.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

from ..config import EngineConfig
from ..engine.block_manager import BlockManager
from ..engine.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class DraftModelProposer:
    def __init__(self, model: Any, weights: Any, cfg: EngineConfig,
                 num_tokens: int, num_blocks: int = 256,
                 use_pallas: Optional[bool] = None):
        from ..engine.model_runner import ModelRunner

        self.cfg = cfg
        self.num_tokens = num_tokens
        self.runner = ModelRunner(model, weights, cfg,
                                  num_blocks=num_blocks,
                                  use_pallas=use_pallas)
        self.bm = BlockManager(num_blocks, cfg.cache.block_size,
                               enable_prefix_caching=False)
        # tokens of the request already in the draft cache
        self._ingested: dict[str, int] = {}
        self._greedy = SamplingParams(temperature=0.0)

    def release(self, request_id: str) -> None:
        if request_id in self._ingested:
            self.bm.free(request_id)
            self._ingested.pop(request_id, None)

    def record_result(self, request_id: str, num_accepted: int,
                      num_proposed: int) -> None:
        pass  # no cooldown policy for model drafting

    def propose(self, request_id: str, token_ids: list[int]) -> list[int]:
        """token_ids: the target's committed tokens; returns <= K drafts."""
        from ..engine.model_runner import SeqStepInput

        n = len(token_ids)
        max_total = n + self.num_tokens + 1
        if request_id not in self._ingested:
            if not self.bm.allocate(request_id, token_ids):
                return []
            self._ingested[request_id] = 0
        if not self.bm.append_slots(request_id, max_total):
            return []

        start = self._ingested[request_id]
        # the draft may have speculated past tokens that were rejected;
        # re-ingest from the last committed point it agrees with
        start = min(start, n - 1)
        drafts: list[int] = []
        seq = list(token_ids)
        # one step ingests the un-seen suffix and yields the first draft,
        # then K-1 single-token decode steps extend it
        for step in range(self.num_tokens):
            chunk = seq[start:]
            out = self.runner.execute([SeqStepInput(
                query_tokens=chunk,
                context_len=len(seq),
                block_table=self.bm.get_block_table(request_id),
                params=self._greedy)])
            tok = int(out.token_ids[0])
            drafts.append(tok)
            start = len(seq)
            seq.append(tok)
            if not self.bm.append_slots(request_id, len(seq) + 1):
                break
        self._ingested[request_id] = n  # committed prefix only
        return drafts

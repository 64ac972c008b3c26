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
        """Single-request entry point (batched path below)."""
        return self.propose_batch([(request_id, token_ids)]).get(
            request_id, [])

    def propose_batch(self, reqs: list) -> dict[str, list[int]]:
        """reqs: [(request_id, committed_token_ids), ...] -> drafts.

        K runner steps total for the WHOLE batch (step 0 ingests each
        request's unseen suffix as a varlen chunk and yields the first
        draft; K-1 batched single-token decode steps extend) — the r3
        shape was a host loop costing B*K device calls."""
        from ..engine.model_runner import SeqStepInput

        live: list[tuple[str, list[int], int]] = []   # (rid, seq, start)
        for request_id, token_ids in reqs:
            n = len(token_ids)
            if request_id not in self._ingested:
                if not self.bm.allocate(request_id, token_ids):
                    continue
                self._ingested[request_id] = 0
            if not self.bm.append_slots(request_id,
                                        n + self.num_tokens + 1):
                continue
            # the draft may have speculated past tokens that were
            # rejected; re-ingest from the last committed agreeing point
            start = min(self._ingested[request_id], n - 1)
            live.append((request_id, list(token_ids), start))
            self._ingested[request_id] = n  # committed prefix only
        drafts: dict[str, list[int]] = {rid: [] for rid, _, _ in live}
        for step in range(self.num_tokens):
            if not live:
                break
            out = self.runner.execute([SeqStepInput(
                query_tokens=seq[start:],
                context_len=len(seq),
                block_table=self.bm.get_block_table(rid),
                params=self._greedy) for rid, seq, start in live])
            nxt = []
            for i, (rid, seq, start) in enumerate(live):
                tok = int(out.token_ids[i])
                drafts[rid].append(tok)
                seq.append(tok)
                if self.bm.append_slots(rid, len(seq) + 1):
                    nxt.append((rid, seq, len(seq) - 1))
            live = nxt
        return drafts

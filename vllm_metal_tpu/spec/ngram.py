# SPDX-License-Identifier: Apache-2.0
"""N-gram (prompt-lookup) draft proposer.

Re-implements the behavior of the reference's ``NgramProposer``
(``/root/reference/vllm_metal/v1/proposer.py`` wrapping vLLM's KMP prompt
lookup, plus the per-request miss-streak cooldown described in
``ngram_proposer.py:1-33``): find the longest recent n-gram that occurred
earlier in the sequence and propose the tokens that followed it.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class _ReqState:
    miss_streak: int = 0
    cooldown: int = 0


class NgramProposer:
    def __init__(self, ngram_min: int = 1, ngram_max: int = 4,
                 num_tokens: int = 4, cooldown_base: int = 4,
                 max_cooldown: int = 32):
        self.ngram_min = ngram_min
        self.ngram_max = ngram_max
        self.num_tokens = num_tokens
        self.cooldown_base = cooldown_base
        self.max_cooldown = max_cooldown
        self._state: dict[str, _ReqState] = {}

    def release(self, request_id: str) -> None:
        self._state.pop(request_id, None)

    def propose(self, request_id: str, token_ids: list[int]) -> list[int]:
        st = self._state.setdefault(request_id, _ReqState())
        if st.cooldown > 0:
            st.cooldown -= 1
            return []
        drafts = self._lookup(token_ids)
        if not drafts:
            st.miss_streak += 1
            st.cooldown = min(self.cooldown_base * st.miss_streak,
                              self.max_cooldown)
        return drafts

    def record_result(self, request_id: str, num_accepted: int,
                      num_proposed: int) -> None:
        st = self._state.setdefault(request_id, _ReqState())
        if num_proposed == 0:
            return
        if num_accepted > 0:
            st.miss_streak = 0
            st.cooldown = 0
        else:
            st.miss_streak += 1
            st.cooldown = min(self.cooldown_base * st.miss_streak,
                              self.max_cooldown)

    def _lookup(self, ids: list[int]) -> list[int]:
        n = len(ids)
        if n < self.ngram_min + 1:
            return []
        for size in range(min(self.ngram_max, n - 1), self.ngram_min - 1, -1):
            pattern = ids[n - size:]
            # search latest earlier occurrence (rightmost, excluding the
            # trailing pattern itself)
            for start in range(n - size - 1, -1, -1):
                if ids[start:start + size] == pattern:
                    follow = ids[start + size:start + size + self.num_tokens]
                    if follow:
                        return list(follow)
        return []

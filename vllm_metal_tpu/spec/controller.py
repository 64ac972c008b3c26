# SPDX-License-Identifier: Apache-2.0
"""Greedy verification of speculative drafts.

The reference's shared verify half (``spec_decode.py:243`` ``verify_greedy``):
the target model runs the decode segment ``[last_token, d1..dK]`` in one
packed forward; row j's greedy argmax is the target's next token after
position j.  Draft ``d_{j+1}`` is accepted iff every earlier draft was
accepted and ``target_next[j] == d_{j+1}``; the final emitted token is the
target's own token at the first rejected (or last) row — so output equals
exactly what non-speculative greedy decoding would produce.
"""

from __future__ import annotations


def verify_greedy(target_next: list[int],
                  drafts: list[int]) -> tuple[int, list[int]]:
    """Returns (num_accepted, new_tokens).

    ``target_next``: greedy tokens for rows [last, d1..dK] (length K+1).
    ``new_tokens`` = accepted drafts + the bonus/replacement token.
    """
    k = len(drafts)
    assert len(target_next) >= k + 1
    accepted = 0
    for j in range(k):
        if target_next[j] == drafts[j]:
            accepted += 1
        else:
            break
    new_tokens = drafts[:accepted] + [target_next[accepted]]
    return accepted, new_tokens

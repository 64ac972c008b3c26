# SPDX-License-Identifier: Apache-2.0
"""Constrained decoding (structured output).

The reference applies xgrammar token bitmasks onto paged logits rows
(``/root/reference/vllm_metal/v1/structured_output.py`` —
``MetalStructuredOutputApplier``).  Here the same contract is engine-native:
a grammar object attached to SamplingParams emits a packed uint32 token
bitmask per step; the mask ships to the device (V/32 words per row, the
xgrammar wire format) and is applied inside the jitted sampler.  Any
xgrammar-compatible producer can plug in; a token-trie grammar is provided
in-repo for forced-choice / exact-sequence outputs.
"""

from __future__ import annotations

from typing import Optional, Protocol, Sequence

import numpy as np


class Grammar(Protocol):
    """Per-request grammar: called with the tokens generated so far."""

    def next_allowed(self, output_tokens: list[int]
                     ) -> Optional[np.ndarray]:
        """Packed uint32 bitmask [ceil(V/32)] of allowed next tokens, or
        None for 'unconstrained this step'."""
        ...


def pack_bitmask(allowed_ids: Sequence[int], vocab_size: int) -> np.ndarray:
    words = np.zeros(((vocab_size + 31) // 32,), np.uint32)
    for t in allowed_ids:
        if 0 <= t < vocab_size:
            words[t // 32] |= np.uint32(1) << np.uint32(t % 32)
    return words


class TokenTrieGrammar:
    """Constrains output to one of N token sequences (forced choice).

    After a full sequence is emitted, only ``eos_token_id`` is allowed.
    """

    def __init__(self, choices: Sequence[Sequence[int]], vocab_size: int,
                 eos_token_id: Optional[int] = None):
        self.vocab_size = vocab_size
        self.eos = eos_token_id
        self.trie: dict = {}
        for seq in choices:
            node = self.trie
            for t in seq:
                node = node.setdefault(int(t), {})
            node[None] = True  # terminal

    def next_allowed(self, output_tokens: list[int]) -> Optional[np.ndarray]:
        node = self.trie
        for t in output_tokens:
            nxt = node.get(int(t))
            if nxt is None:
                # fell off the trie (terminal reached): only EOS
                allowed = [self.eos] if self.eos is not None else []
                return pack_bitmask(allowed, self.vocab_size)
            node = nxt
        allowed = [t for t in node if t is not None]
        if None in node and self.eos is not None:
            allowed.append(self.eos)
        return pack_bitmask(allowed, self.vocab_size)

# SPDX-License-Identifier: Apache-2.0
"""Incremental detokenization with stop-string termination.

The reference inherits stop-string handling from upstream vLLM's engine
(SURVEY.md §0 — everything above the worker boundary lives upstream); this
engine owns it natively.  Semantics match the OpenAI API / vLLM defaults:
generation TERMINATES at the first occurrence of any stop string, and the
returned text excludes the stop string itself unless
``include_stop_str_in_output`` is set.

The incremental algorithm is the standard two-offset scheme: decode from a
stable ``prefix_offset`` so byte-level/sentencepiece context is preserved,
advance only when the decoded suffix contains no dangling UTF-8
replacement character, and diff against the previously decoded prefix.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence


class IncrementalDetokenizer:
    """Feeds output tokens one at a time; owns the request's text state.

    ``append`` returns True the moment a stop string completes, at which
    point ``text`` is already truncated (or includes the stop string when
    configured) and ``stop_reason`` names the matched stop string.
    """

    def __init__(self, tokenizer: Any, stop: Sequence[str] = (),
                 include_stop: bool = False):
        self.tok = tokenizer
        self.stop = [s for s in stop if s]
        self.include_stop = include_stop
        self.ids: list[int] = []
        self.prefix_offset = 0
        self.read_offset = 0
        self.text = ""
        self.stopped = False
        self.stop_reason: Optional[str] = None
        # a stop string may span a token boundary: rescan this many chars
        # of already-seen text on every new delta
        self._span = max((len(s) for s in self.stop), default=1) - 1

    def append(self, token_id: int) -> bool:
        if self.stopped:
            return True
        self.ids.append(int(token_id))
        prefix = self.tok.decode(self.ids[self.prefix_offset:
                                          self.read_offset])
        full = self.tok.decode(self.ids[self.prefix_offset:])
        if full.endswith("�"):
            # dangling multi-byte sequence: hold until completed
            return False
        delta = full[len(prefix):]
        self.prefix_offset = self.read_offset
        self.read_offset = len(self.ids)
        if not delta:
            return False
        scan_from = max(0, len(self.text) - self._span)
        self.text += delta
        if self.stop:
            window = self.text[scan_from:]
            first: Optional[tuple[int, str]] = None
            for s in self.stop:
                i = window.find(s)
                if i != -1 and (first is None or i < first[0]):
                    first = (i, s)
            if first is not None:
                i, s = first
                end = scan_from + i + (len(s) if self.include_stop else 0)
                self.text = self.text[:end]
                self.stopped = True
                self.stop_reason = s
                return True
        return False

    @property
    def safe_text(self) -> str:
        """Text safe to stream now: holds back any suffix that is a
        proper prefix of a stop string (so a stop never partially leaks
        into the stream).  Monotone non-decreasing across appends."""
        if self.stopped or not self.stop:
            return self.text
        hold = 0
        for s in self.stop:
            for k in range(min(len(s) - 1, len(self.text)), hold, -1):
                if self.text.endswith(s[:k]):
                    hold = k
                    break
        return self.text[:len(self.text) - hold] if hold else self.text

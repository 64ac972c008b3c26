# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding: proposers + greedy verification.

Mirrors the reference's method set (``/root/reference/vllm_metal/v1/spec_decode.py``):
greedy-only verify of drafts scheduled as extra decode tokens; proposers are
polymorphic (ngram now; draft-model / MTP follow the same seam).
"""

from .ngram import NgramProposer
from .controller import verify_greedy

__all__ = ["NgramProposer", "verify_greedy"]

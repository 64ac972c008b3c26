# SPDX-License-Identifier: Apache-2.0
"""Transcription result types (reference:
``/root/reference/vllm_metal/stt/protocol.py``)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TranscriptionSegment:
    id: int
    seek: int
    start: float
    end: float
    text: str
    tokens: list[int]


@dataclass
class TranscriptionResult:
    text: str
    language: str | None = None
    segments: list[TranscriptionSegment] = field(default_factory=list)
    duration: float = 0.0

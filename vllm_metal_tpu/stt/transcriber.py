# SPDX-License-Identifier: Apache-2.0
"""Whisper transcription policy: chunking, decoder prompts, segments.

Behavioral parity with the reference transcriber
(``/root/reference/vllm_metal/stt/whisper/transcriber.py``): same chunk
policy, decoder-prompt construction, timestamp-segment extraction, and
language/task validation.  The decode itself is the one-dispatch
``lax.while_loop`` in :mod:`.whisper`.
"""

from __future__ import annotations

import logging
import re
from typing import Any

import numpy as np

from . import audio as A
from .protocol import TranscriptionResult, TranscriptionSegment
from .whisper import (WHISPER_MAX_DECODE_TOKENS, WhisperConfig, WhisperW,
                      encode, greedy_decode)

logger = logging.getLogger(__name__)

SEEK_MULTIPLIER = 100
DEFAULT_SEGMENT_DURATION = 30.0
MAX_PROMPT_TOKENS = 224
TIMESTAMP_RE = re.compile(r"<\|(\d+\.\d+)\|>")
WHISPER_TASKS = frozenset({"transcribe", "translate"})


class WhisperTranscriber:
    """One-shot greedy transcription over energy-split 30 s chunks."""

    def __init__(self, cfg: WhisperConfig, weights: WhisperW,
                 tokenizer: Any, max_audio_clip_s: float | None = 30.0,
                 overlap_s: float = 1.0,
                 split_window_size: int | None = 1600):
        self.cfg = cfg
        self.weights = weights
        self.tokenizer = tokenizer
        self.max_audio_clip_s = max_audio_clip_s
        self.overlap_s = overlap_s
        self.split_window_size = split_window_size

    # -- option validation --------------------------------------------------
    def validate_language(self, code: str | None) -> str | None:
        if code is None:
            return None
        code = code.strip().lower()
        try:
            from transformers.models.whisper.tokenization_whisper import (
                LANGUAGES, TO_LANGUAGE_CODE)
            code = TO_LANGUAGE_CODE.get(code, code)
            if code not in LANGUAGES:
                raise ValueError(
                    f"Unsupported language: {code!r}. Use a valid Whisper "
                    "language code or name.")
        except ImportError:
            pass
        return code

    def _resolve_options(self, language: str | None, task: str):
        task = task.strip().lower()
        if task not in WHISPER_TASKS:
            raise ValueError(
                f"Unsupported STT task: {task!r}. Must be one of "
                f"{', '.join(sorted(WHISPER_TASKS))}.")
        language = self.validate_language(language)
        if not self.cfg.is_multilingual:
            if task == "translate":
                raise ValueError("English-only Whisper models do not "
                                 "support translation.")
            if language not in (None, "en"):
                raise ValueError("English-only Whisper models only support "
                                 "English transcription.")
        return language, task

    # -- token helpers ------------------------------------------------------
    def _tid(self, token: str) -> int:
        return int(self.tokenizer.convert_tokens_to_ids(token))

    def _encode_prompt(self, prompt: str | None) -> list[int]:
        if not prompt:
            return []
        ids = [int(t) for t in self.tokenizer.get_prompt_ids(prompt)]
        if len(ids) <= MAX_PROMPT_TOKENS + 1:
            return ids
        return [ids[0], *ids[-MAX_PROMPT_TOKENS:]]

    def _decoder_prompt(self, language: str | None, task: str,
                        with_timestamps: bool) -> list[int]:
        multilingual = self.cfg.is_multilingual
        forced = self.tokenizer.get_decoder_prompt_ids(
            language=language if multilingual else None,
            task=task if multilingual else None,
            no_timestamps=not with_timestamps)
        return [self._tid("<|startoftranscript|>"),
                *(tid for _, tid in forced)]

    # -- main entry ---------------------------------------------------------
    def transcribe(self, audio: str | np.ndarray, language: str | None = None,
                   task: str = "transcribe", prompt: str | None = None,
                   with_timestamps: bool = False) -> TranscriptionResult:
        language, task = self._resolve_options(language, task)
        if isinstance(audio, str):
            audio = A.load_audio(audio)
        audio = np.asarray(audio, np.float32)
        duration = A.audio_duration(audio)

        chunks = self._prepare_chunks(audio)
        eot = self._tid("<|endoftext|>")
        prefix = self._encode_prompt(prompt)
        prefix += self._decoder_prompt(language, task, with_timestamps)
        max_tokens = (WHISPER_MAX_DECODE_TOKENS if with_timestamps
                      else MAX_PROMPT_TOKENS)

        segments: list[TranscriptionSegment] = []
        parts: list[str] = []
        seg_off = 0
        for chunk, start_s in chunks:
            feats = self._encode_chunk(chunk)
            out = greedy_decode(self.cfg, self.weights, feats, prefix, eot,
                                max_tokens)
            if with_timestamps:
                segs = self._extract_segments(out, start_s, seg_off)
                for s in segs:
                    segments.append(s)
                    parts.append(s.text)
                seg_off += len(segs)
                if not segs:
                    text = self.tokenizer.decode(out,
                                                 skip_special_tokens=True)
                    if text.strip():
                        parts.append(text.strip())
            else:
                text = self.tokenizer.decode(out, skip_special_tokens=True)
                if text.strip():
                    parts.append(text.strip())
        return TranscriptionResult(
            text=" ".join(parts).strip(), language=language,
            segments=segments if with_timestamps else [],
            duration=duration)

    # -- internals ----------------------------------------------------------
    def _prepare_chunks(self, audio: np.ndarray):
        if self.max_audio_clip_s is None or self.split_window_size is None:
            if audio.shape[0] > A.N_SAMPLES:
                raise ValueError(
                    "Audio chunking is disabled, but input exceeds "
                    "Whisper's 30s encoder window.")
            return [(audio, 0.0)]
        if self.max_audio_clip_s > DEFAULT_SEGMENT_DURATION:
            raise ValueError(
                f"max_audio_clip_s={self.max_audio_clip_s} exceeds "
                "Whisper's 30s encoder window.")
        return A.split_audio(audio, max_clip_s=self.max_audio_clip_s,
                             overlap_s=self.overlap_s,
                             window_size=self.split_window_size)

    def _encode_chunk(self, chunk: np.ndarray):
        mel = A.log_mel_spectrogram(chunk, n_mels=self.cfg.n_mels)
        # stride-2 conv halves the frame count: 2*n_audio_ctx frames in
        # (== N_FRAMES for real Whisper configs)
        mel = A.pad_or_trim(mel, 2 * self.cfg.n_audio_ctx, axis=-1)
        import jax.numpy as jnp
        return encode(self.cfg, self.weights, jnp.asarray(mel.T))

    def _extract_segments(self, token_ids: list[int], time_offset: float,
                          seg_id_offset: int) -> list[TranscriptionSegment]:
        raw = [self.tokenizer.convert_ids_to_tokens(t) for t in token_ids]
        segments: list[TranscriptionSegment] = []
        seg_start = None
        seg_tokens: list[int] = []
        seg_id = seg_id_offset

        def flush(start, end, toks):
            nonlocal seg_id
            text = self.tokenizer.decode(toks, skip_special_tokens=True)
            if text.strip():
                segments.append(TranscriptionSegment(
                    id=seg_id,
                    seek=int((start + time_offset) * SEEK_MULTIPLIER),
                    start=round(start + time_offset, 2),
                    end=round(end + time_offset, 2),
                    text=text, tokens=list(toks)))
                seg_id += 1

        for tid, tok in zip(token_ids, raw):
            m = TIMESTAMP_RE.match(tok) if isinstance(tok, str) else None
            if m:
                ts = float(m.group(1))
                if seg_start is None:
                    seg_start, seg_tokens = ts, []
                else:
                    flush(seg_start, ts, seg_tokens)
                    seg_start, seg_tokens = None, []
            else:
                seg_tokens.append(tid)
        if seg_start is not None and seg_tokens:
            flush(seg_start, seg_start + DEFAULT_SEGMENT_DURATION,
                  seg_tokens)
        return segments


def load_transcriber(model_path: str, dtype=None) -> WhisperTranscriber:
    """Load a HF Whisper checkpoint dir into a ready transcriber."""
    import jax.numpy as jnp

    from .whisper import load_whisper
    cfg, w = load_whisper(model_path,
                          dtype=dtype if dtype is not None else jnp.bfloat16)
    from transformers import WhisperTokenizer
    tok = WhisperTokenizer.from_pretrained(model_path)
    return WhisperTranscriber(cfg, w, tok)

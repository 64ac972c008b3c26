# SPDX-License-Identifier: Apache-2.0
"""Audio frontend for STT: loading, log-mel spectrograms, energy splitting.

Pure numpy on the host — the spectrogram is cheap preprocessing next to the
encoder forward, and keeping it off-device avoids shipping tiny FFTs through
XLA.  Behavioral parity with the reference frontend
(``/root/reference/vllm_metal/stt/audio.py``) with two deliberate upgrades:

* WAV decoding uses the stdlib ``wave`` module first (no librosa/ffmpeg
  dependency; ffmpeg remains the fallback for compressed formats).
* The mel filterbank uses the Slaney mel scale (librosa default) — the
  scale Whisper checkpoints were trained with — rather than the
  reference's HTK-formula integer-bin approximation
  (``stt/audio.py:229-247``).
"""

from __future__ import annotations

import math
import shutil
import subprocess
from functools import lru_cache

import numpy as np

# Whisper audio constants (OpenAI spec).
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE
N_FRAMES = N_SAMPLES // HOP_LENGTH
N_MELS_DEFAULT = 80  # 128 for large-v3

# Log-mel normalisation: floor before log10, 80 dB dynamic range, then
# (x + 4) / 4 as in the Whisper paper's preprocessing.
_LOG_FLOOR = 1e-10
_LOG_DYNAMIC_RANGE = 8.0
_LOG_OFFSET = 4.0
_LOG_SCALE = 4.0

_SPLIT_SEARCH_MULTIPLIER = 4
_FFMPEG_TIMEOUT_S = 300


# ---------------------------------------------------------------------------
# I/O
# ---------------------------------------------------------------------------

def load_audio(file_path: str, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Load an audio file as mono float32 samples at ``sample_rate`` Hz."""
    try:
        return load_wav_bytes(open(file_path, "rb").read(), sample_rate)
    except (EOFError, ValueError, OSError):
        pass
    return _load_audio_ffmpeg(file_path, sample_rate)


def load_wav_bytes(data: bytes, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Decode PCM WAV bytes (8/16/32-bit int) to mono float32 samples.

    Raises ``wave.Error``/``EOFError``/``ValueError`` for non-WAV input.
    """
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    if rate != sample_rate:
        x = resample(x, rate, sample_rate)
    return x


def resample(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resampling (adequate for speech frontends)."""
    if src_rate == dst_rate or x.size == 0:
        return x
    n_out = int(round(x.shape[0] * dst_rate / src_rate))
    src_t = np.arange(x.shape[0], dtype=np.float64)
    dst_t = np.linspace(0.0, x.shape[0] - 1, n_out)
    return np.interp(dst_t, src_t, x).astype(np.float32)


def _load_audio_ffmpeg(file_path: str, sample_rate: int,
                       timeout_s: float = _FFMPEG_TIMEOUT_S) -> np.ndarray:
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"cannot decode {file_path!r}: not a PCM WAV file and ffmpeg "
            "is not installed")
    cmd = ["ffmpeg", "-nostdin", "-i", file_path, "-ac", "1",
           "-ar", str(sample_rate), "-f", "f32le",
           "-hide_banner", "-loglevel", "error", "pipe:1"]
    result = subprocess.run(cmd, capture_output=True, timeout=timeout_s)
    if result.returncode != 0:
        raise RuntimeError(f"ffmpeg error: {result.stderr.decode()}")
    return np.frombuffer(result.stdout, np.float32).copy()


def pad_or_trim(array: np.ndarray, length: int = N_SAMPLES,
                axis: int = -1) -> np.ndarray:
    """Zero-pad or trim ``array`` to exactly ``length`` along ``axis``."""
    if array.shape[axis] > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        array = array[tuple(sl)]
    if array.shape[axis] < length:
        widths = [(0, 0)] * array.ndim
        widths[axis] = (0, length - array.shape[axis])
        array = np.pad(array, widths)
    return array


# ---------------------------------------------------------------------------
# Spectrogram
# ---------------------------------------------------------------------------

def _hann(size: int) -> np.ndarray:
    n = np.arange(size, dtype=np.float32)
    return (0.5 - 0.5 * np.cos(2 * math.pi * n / size)).astype(np.float32)


def _stft_power(audio: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """|STFT|^2 with reflect padding, [n_fft//2+1, frames]."""
    pad = n_fft // 2
    audio = np.pad(audio.astype(np.float32), (pad, pad), mode="reflect")
    n_frames = (audio.shape[0] - n_fft) // hop + 1
    frames = np.lib.stride_tricks.as_strided(
        audio, shape=(n_frames, n_fft),
        strides=(audio.strides[0] * hop, audio.strides[0]))
    spec = np.fft.rfft(frames * _hann(n_fft), axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).T.astype(np.float32)


def _hz_to_mel_slaney(hz: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = math.log(6.4) / 27.0
    mel = hz / f_sp
    above = hz >= min_log_hz
    mel = np.where(above,
                   min_log_hz / f_sp + np.log(np.maximum(hz, 1e-10)
                                              / min_log_hz) / logstep,
                   mel)
    return mel


def _mel_to_hz_slaney(mel: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3
    min_log_mel = 1000.0 / f_sp
    logstep = math.log(6.4) / 27.0
    hz = mel * f_sp
    above = mel >= min_log_mel
    return np.where(above, 1000.0 * np.exp(logstep * (mel - min_log_mel)), hz)


@lru_cache(maxsize=4)
def mel_filters(sample_rate: int = SAMPLE_RATE, n_fft: int = N_FFT,
                n_mels: int = N_MELS_DEFAULT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]."""
    fft_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(0.0,
                          float(_hz_to_mel_slaney(
                              np.array([sample_rate / 2.0]))[0]),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray | str,
                        n_mels: int = N_MELS_DEFAULT) -> np.ndarray:
    """Raw audio -> Whisper log-mel spectrogram [n_mels, frames]."""
    if isinstance(audio, str):
        audio = load_audio(audio)
    power = _stft_power(np.asarray(audio, np.float32), N_FFT, HOP_LENGTH)
    mel = mel_filters(SAMPLE_RATE, N_FFT, n_mels) @ power
    log_spec = np.log10(np.maximum(mel, _LOG_FLOOR))
    log_spec = np.maximum(log_spec, log_spec.max() - _LOG_DYNAMIC_RANGE)
    return ((log_spec + _LOG_OFFSET) / _LOG_SCALE).astype(np.float32)


# ---------------------------------------------------------------------------
# Duration & splitting
# ---------------------------------------------------------------------------

def audio_duration(audio: np.ndarray,
                   sample_rate: int = SAMPLE_RATE) -> float:
    return audio.shape[0] / sample_rate


def _rms_energy(audio: np.ndarray, window_size: int) -> np.ndarray:
    n = audio.shape[0]
    if n == 0:
        return np.array([], np.float32)
    n_windows = math.ceil(n / window_size)
    pad = n_windows * window_size - n
    if pad:
        audio = np.pad(audio, (0, pad))
    windows = audio.reshape(n_windows, window_size)
    counts = np.full(n_windows, float(window_size), np.float32)
    if pad:
        counts[-1] = float(n - (n_windows - 1) * window_size)
    return np.sqrt((windows * windows).sum(axis=1) / counts)


def _find_split_point(audio: np.ndarray, center: int, window_size: int,
                      search_radius: int | None = None) -> int:
    """Sample index of the quietest RMS window near ``center``."""
    if search_radius is None:
        search_radius = window_size * _SPLIT_SEARCH_MULTIPLIER
    lo = max(0, center - search_radius)
    hi = min(audio.shape[0], center + search_radius)
    energies = _rms_energy(audio[lo:hi], window_size)
    return lo + int(np.argmin(energies)) * window_size


def split_audio(audio: np.ndarray, max_clip_s: float = CHUNK_LENGTH,
                overlap_s: float = 1.0, window_size: int = 1600,
                sample_rate: int = SAMPLE_RATE
                ) -> list[tuple[np.ndarray, float]]:
    """Split long audio at low-energy points into ``(chunk, start_s)``."""
    max_samples = int(max_clip_s * sample_rate)
    overlap = int(overlap_s * sample_rate)
    n = audio.shape[0]
    if n <= max_samples:
        return [(audio, 0.0)]
    chunks: list[tuple[np.ndarray, float]] = []
    pos = 0
    while pos < n:
        end = pos + max_samples
        if end >= n:
            chunks.append((audio[pos:], pos / sample_rate))
            break
        split = _find_split_point(audio, end, window_size)
        split = end if split <= pos else min(split, end)
        chunks.append((audio[pos:split], pos / sample_rate))
        pos = max(split - overlap, pos + 1)
    return chunks

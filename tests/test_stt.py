# SPDX-License-Identifier: Apache-2.0
"""STT subsystem tests: audio frontend, JAX Whisper, transcriber, server.

Mirrors the reference's STT suites (``/root/reference/tests/
test_whisper.py``, ``test_stt_serve.py``) at tier-1/2 scale: synthetic
audio, tiny random-weight models, fake tokenizers — no checkpoints.
"""

import io
import math
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metal_tpu.stt import audio as A
from vllm_metal_tpu.stt import whisper as W
from vllm_metal_tpu.stt.detection import is_stt_model
from vllm_metal_tpu.stt.transcriber import WhisperTranscriber


def _wav_bytes(samples: np.ndarray, rate: int = 16000,
               n_ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        pcm = np.clip(samples * 32767.0, -32768, 32767).astype(np.int16)
        if n_ch > 1:
            pcm = np.repeat(pcm[:, None], n_ch, axis=1)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Audio frontend
# ---------------------------------------------------------------------------

class TestAudio:
    def test_wav_roundtrip(self):
        t = np.arange(16000) / 16000.0
        x = (0.5 * np.sin(2 * math.pi * 440 * t)).astype(np.float32)
        y = A.load_wav_bytes(_wav_bytes(x))
        assert y.shape == x.shape
        assert np.abs(y - x).max() < 1e-3

    def test_wav_stereo_downmix_and_resample(self):
        x = np.linspace(-0.5, 0.5, 8000).astype(np.float32)
        y = A.load_wav_bytes(_wav_bytes(x, rate=8000, n_ch=2))
        # 8 kHz -> 16 kHz doubles the sample count
        assert abs(y.shape[0] - 16000) <= 2

    def test_mel_shape_and_range(self):
        x = np.random.randn(A.N_SAMPLES).astype(np.float32) * 0.1
        mel = A.log_mel_spectrogram(x)
        assert mel.shape[0] == A.N_MELS_DEFAULT
        assert abs(mel.shape[1] - A.N_FRAMES) <= 1
        # (log10 + 4) / 4 normalization bounds
        assert mel.max() <= 2.5 and mel.min() >= mel.max() - 2.0 - 1e-6

    def test_mel_tone_peak_bin_monotonic(self):
        """Higher-frequency tones peak in higher mel bins."""
        def peak_bin(freq):
            t = np.arange(A.N_SAMPLES) / A.SAMPLE_RATE
            x = np.sin(2 * math.pi * freq * t).astype(np.float32)
            mel = A.log_mel_spectrogram(x)
            return int(np.argmax(mel.mean(axis=1)))

        bins = [peak_bin(f) for f in (200, 800, 2000, 6000)]
        assert bins == sorted(bins)
        assert bins[0] < bins[-1]

    def test_mel_filterbank_rows_normalized(self):
        fb = A.mel_filters()
        assert fb.shape == (80, A.N_FFT // 2 + 1)
        assert (fb >= 0).all()
        assert (fb.sum(axis=1) > 0).all()

    def test_pad_or_trim(self):
        x = np.ones(10, np.float32)
        assert A.pad_or_trim(x, 4).shape == (4,)
        y = A.pad_or_trim(x, 20)
        assert y.shape == (20,) and y[10:].sum() == 0

    def test_split_audio_short_passthrough(self):
        x = np.zeros(1000, np.float32)
        chunks = A.split_audio(x)
        assert len(chunks) == 1 and chunks[0][1] == 0.0

    def test_split_audio_long_bounded_and_at_quiet_point(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(A.SAMPLE_RATE * 70).astype(np.float32)
        # quiet gap at 29.7-30.0 s (inside the +-0.4 s split search radius)
        x[int(29.7 * A.SAMPLE_RATE):30 * A.SAMPLE_RATE] = 0.0
        chunks = A.split_audio(x)
        assert len(chunks) >= 3
        for c, start in chunks:
            assert c.shape[0] <= A.N_SAMPLES
        # first split lands inside the quiet gap
        first_len = chunks[0][0].shape[0]
        assert 29.6 * A.SAMPLE_RATE <= first_len <= 30.0 * A.SAMPLE_RATE


# ---------------------------------------------------------------------------
# Whisper model
# ---------------------------------------------------------------------------

TINY = W.WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                       n_audio_head=4, n_audio_layer=2, n_vocab=64,
                       n_text_ctx=24, n_text_state=32, n_text_head=4,
                       n_text_layer=2)


@pytest.fixture(scope="module")
def tiny_whisper():
    w = W.init_random(TINY, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (32, TINY.n_mels),
                            jnp.float32)
    return w, mel


def _dense_reference_decode(cfg, w, feats, prompt, steps):
    """No-cache teacher-forced argmax decode, one full forward per token."""
    import numpy as onp

    def full_forward(tokens):
        T = len(tokens)
        x = w.tok_emb[jnp.asarray(tokens)] + w.dec_pos[:T]
        blocks = [jax.tree.map(lambda a, i=i: a[i], w.dec_blocks)
                  for i in range(cfg.n_text_layer)]
        mask = jnp.tril(jnp.ones((T, T), bool))[None]
        for bw in blocks:
            h = W._ln(x, bw.attn_ln_w, bw.attn_ln_b)
            q = h @ bw.attn.wq.T + bw.attn.bq
            k = h @ bw.attn.wk.T
            v = h @ bw.attn.wv.T + bw.attn.bv
            x = x + W._attend(q, k, v, cfg.n_text_head, mask) \
                @ bw.attn.wo.T + bw.attn.bo
            h = W._ln(x, bw.cross_ln_w, bw.cross_ln_b)
            qx = h @ bw.cross.wq.T + bw.cross.bq
            ck = feats @ bw.cross.wk.T
            cv = feats @ bw.cross.wv.T + bw.cross.bv
            x = x + W._attend(qx, ck, cv, cfg.n_text_head) \
                @ bw.cross.wo.T + bw.cross.bo
            h = W._ln(x, bw.mlp_ln_w, bw.mlp_ln_b)
            x = x + jax.nn.gelu(h @ bw.mlp1_w.T + bw.mlp1_b) \
                @ bw.mlp2_w.T + bw.mlp2_b
        x = W._ln(x, w.dec_ln_w, w.dec_ln_b)
        return x[-1].astype(jnp.float32) @ w.tok_emb.T.astype(jnp.float32)

    toks = list(prompt)
    out = []
    for _ in range(steps):
        nxt = int(onp.argmax(onp.asarray(full_forward(toks))))
        out.append(nxt)
        toks.append(nxt)
    return out


class TestWhisperModel:
    def test_encode_shape(self, tiny_whisper):
        w, mel = tiny_whisper
        feats = W.encode(TINY, w, mel)
        assert feats.shape == (TINY.n_audio_ctx, TINY.n_audio_state)
        assert np.isfinite(np.asarray(feats, np.float32)).all()

    def test_cached_decode_matches_dense_reference(self, tiny_whisper):
        """KV-cached while_loop decode == per-token full re-forward."""
        w, mel = tiny_whisper
        feats = W.encode(TINY, w, mel)
        prompt = [1, 5, 9]
        # eot that random weights won't hit; run a fixed number of steps
        got = W.greedy_decode(TINY, w, feats, prompt, eot_id=63,
                              max_tokens=8)
        want = _dense_reference_decode(TINY, w, feats, prompt, 8)
        if 63 in want:
            want = want[:want.index(63)]
        assert got == want[:len(got)] and len(got) >= min(4, len(want))

    def test_decode_stops_at_eot(self, tiny_whisper):
        w, mel = tiny_whisper
        feats = W.encode(TINY, w, mel)
        ref = _dense_reference_decode(TINY, w, feats, [1, 5, 9], 3)
        eot = ref[1]  # force the 2nd generated token to be "eot"
        got = W.greedy_decode(TINY, w, feats, [1, 5, 9],
                              eot_id=eot, max_tokens=8)
        assert got == ref[:1]

    def test_decode_respects_max_tokens(self, tiny_whisper):
        w, mel = tiny_whisper
        feats = W.encode(TINY, w, mel)
        got = W.greedy_decode(TINY, w, feats, [1], eot_id=63, max_tokens=3)
        assert len(got) <= 3

    def test_empty_prompt(self, tiny_whisper):
        w, mel = tiny_whisper
        feats = W.encode(TINY, w, mel)
        assert W.greedy_decode(TINY, w, feats, [], eot_id=63) == []

    def test_config_from_hf_dict(self):
        cfg = W.WhisperConfig.from_dict({
            "d_model": 384, "encoder_layers": 4, "decoder_layers": 4,
            "encoder_attention_heads": 6, "decoder_attention_heads": 6,
            "num_mel_bins": 80, "max_source_positions": 1500,
            "max_target_positions": 448, "vocab_size": 51865})
        assert cfg.n_audio_state == 384 and cfg.n_text_layer == 4
        assert cfg.is_multilingual


# ---------------------------------------------------------------------------
# Transcriber policy
# ---------------------------------------------------------------------------

class FakeTokenizer:
    """Minimal Whisper-tokenizer stand-in for policy tests."""

    SPECIALS = {"<|startoftranscript|>": 50, "<|endoftext|>": 51,
                "<|en|>": 52, "<|transcribe|>": 53, "<|notimestamps|>": 54}

    def convert_tokens_to_ids(self, tok):
        return self.SPECIALS.get(tok, 0)

    def convert_ids_to_tokens(self, tid):
        if tid >= 100:  # timestamp tokens: 100 + centiseconds/2
            return f"<|{(tid - 100) * 0.02:.2f}|>"
        for k, v in self.SPECIALS.items():
            if v == tid:
                return k
        return f"tok{tid}"

    def get_decoder_prompt_ids(self, language=None, task=None,
                               no_timestamps=True):
        out = []
        if language:
            out.append((1, self.SPECIALS[f"<|{language}|>"]))
        if task:
            out.append((2, self.SPECIALS[f"<|{task}|>"]))
        if no_timestamps:
            out.append((3, self.SPECIALS["<|notimestamps|>"]))
        return out

    def get_prompt_ids(self, text):
        return [40 + (ord(c) % 5) for c in text[:6]]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"tok{t}" for t in ids
                        if not (skip_special_tokens and
                                (t in self.SPECIALS.values() or t >= 100)))


def _make_transcriber(monkeypatch=None):
    w = W.init_random(TINY, jax.random.PRNGKey(0))
    return WhisperTranscriber(TINY, w, FakeTokenizer())


class TestTranscriber:
    def test_task_validation(self):
        tr = _make_transcriber()
        with pytest.raises(ValueError, match="Unsupported STT task"):
            tr._resolve_options(None, "summarize")

    def test_english_only_rejects_translate(self):
        cfg = W.WhisperConfig(n_vocab=51864)  # < 51865 => english-only
        tr = WhisperTranscriber(cfg, None, FakeTokenizer())
        with pytest.raises(ValueError, match="English-only"):
            tr._resolve_options(None, "translate")
        with pytest.raises(ValueError, match="English-only"):
            tr._resolve_options("fr", "transcribe")

    def test_decoder_prompt_order(self):
        cfg = W.WhisperConfig(n_vocab=51865)  # multilingual
        tr = WhisperTranscriber(cfg, None, FakeTokenizer())
        ids = tr._decoder_prompt("en", "transcribe", with_timestamps=False)
        assert ids == [50, 52, 53, 54]

    def test_decoder_prompt_english_only(self):
        tr = _make_transcriber()  # TINY vocab 64 -> english-only
        ids = tr._decoder_prompt("en", "transcribe", with_timestamps=False)
        assert ids == [50, 54]

    def test_chunking_disabled_rejects_long_audio(self):
        tr = _make_transcriber()
        tr.max_audio_clip_s = None
        with pytest.raises(ValueError, match="chunking is disabled"):
            tr._prepare_chunks(np.zeros(A.N_SAMPLES + 1, np.float32))

    def test_max_clip_over_window_rejected(self):
        tr = _make_transcriber()
        tr.max_audio_clip_s = 31.0
        with pytest.raises(ValueError, match="encoder window"):
            tr._prepare_chunks(np.zeros(10, np.float32))

    def test_segment_extraction(self):
        tr = _make_transcriber()
        # <|0.00|> tok5 tok6 <|1.00|> <|2.00|> tok7 <|3.00|>
        ids = [100, 5, 6, 150, 200, 7, 250]
        segs = tr._extract_segments(ids, time_offset=10.0, seg_id_offset=3)
        assert len(segs) == 2
        assert segs[0].id == 3 and segs[0].start == 10.0
        assert segs[0].end == 11.0 and segs[0].tokens == [5, 6]
        assert segs[1].start == 12.0 and segs[1].end == 13.0
        assert segs[1].tokens == [7]

    def test_segment_extraction_unterminated(self):
        tr = _make_transcriber()
        segs = tr._extract_segments([100, 5], 0.0, 0)
        assert len(segs) == 1 and segs[0].end == 30.0

    def test_transcribe_end_to_end_tiny(self):
        """Full pipeline on random weights: runs, returns text, no crash."""
        tr = _make_transcriber()
        x = np.random.randn(A.SAMPLE_RATE).astype(np.float32) * 0.05
        res = tr.transcribe(x, language="en")
        assert isinstance(res.text, str)
        assert res.duration == pytest.approx(1.0)
        assert res.language == "en"


# ---------------------------------------------------------------------------
# Detection + server
# ---------------------------------------------------------------------------

class TestDetectionAndServer:
    def test_is_stt_model(self, tmp_path):
        assert not is_stt_model(str(tmp_path))
        (tmp_path / "config.json").write_text('{"model_type": "whisper"}')
        assert is_stt_model(str(tmp_path))
        (tmp_path / "config.json").write_text('{"model_type": "llama"}')
        assert not is_stt_model(str(tmp_path))
        (tmp_path / "config.json").write_text('not json')
        assert not is_stt_model(str(tmp_path))

    def test_transcription_endpoint(self):
        """Drive the aiohttp handler with aiohttp's test utilities."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from vllm_metal_tpu.server.stt_server import STTServer

        tr = _make_transcriber()
        server = STTServer(tr, model_name="tiny")

        async def run():
            client = TestClient(TestServer(server.app()))
            await client.start_server()
            try:
                t = np.arange(A.SAMPLE_RATE) / A.SAMPLE_RATE
                x = (0.1 * np.sin(2 * math.pi * 440 * t)).astype(np.float32)
                from aiohttp import FormData
                form = FormData()
                form.add_field("file", _wav_bytes(x), filename="a.wav",
                               content_type="audio/wav")
                form.add_field("language", "en")
                resp = await client.post("/v1/audio/transcriptions",
                                         data=form)
                assert resp.status == 200
                body = await resp.json()
                assert "text" in body

                # missing file -> 400
                form2 = FormData()
                form2.add_field("language", "en")
                resp = await client.post("/v1/audio/transcriptions",
                                         data=form2)
                assert resp.status == 400

                # bad task via translations on english-only is covered by
                # transcriber tests; here check text format
                form3 = FormData()
                form3.add_field("file", _wav_bytes(x), filename="a.wav")
                form3.add_field("response_format", "text")
                resp = await client.post("/v1/audio/transcriptions",
                                         data=form3)
                assert resp.status == 200
                assert resp.content_type == "text/plain"
            finally:
                await client.close()

        asyncio.run(run())

# SPDX-License-Identifier: Apache-2.0
"""Qwen3-ASR: audio encoder + engine-backed transcription.

Mirrors the reference's qwen3_asr suites at tier-1/2 scale: tiny random
encoder + LLM, no checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                   SchedulerConfig)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.models.llama import LlamaModel
from vllm_metal_tpu.stt import qwen3_asr as Q

TINY = Q.ASRAudioConfig(
    num_mel_bins=16, d_model=32, encoder_layers=2,
    encoder_attention_heads=4, encoder_ffn_dim=48,
    downsample_hidden_size=8, output_dim=48, max_source_positions=64,
    n_window=8, n_window_infer=64)


class TestAudioConfig:
    def test_cnn_output_length(self):
        # 3x (l-1)//2+1
        assert Q.ASRAudioConfig.cnn_output_length(16) == 2
        assert Q.ASRAudioConfig.cnn_output_length(100) == 13
        assert Q.ASRAudioConfig.cnn_output_length(1) == 1

    def test_feat_extract_length(self):
        cfg = TINY  # chunk 16
        assert cfg.feat_extract_output_length(16) == 2
        assert cfg.feat_extract_output_length(32) == 4
        assert cfg.feat_extract_output_length(20) == \
            2 + Q.ASRAudioConfig.cnn_output_length(4)


class TestEncoder:
    def test_shapes_and_finite(self):
        w = Q.init_random_encoder(TINY, jax.random.PRNGKey(0))
        mel = np.random.default_rng(0).standard_normal(
            (TINY.num_mel_bins, 40)).astype(np.float32)
        out = np.asarray(Q.encode_audio(TINY, w, mel), np.float32)
        assert out.shape == (TINY.feat_extract_output_length(40),
                             TINY.output_dim)
        assert np.isfinite(out).all()

    def test_partial_chunk_masking(self):
        """A partial last chunk must not be affected by its zero padding
        differently than the same audio padded to a full chunk."""
        w = Q.init_random_encoder(TINY, jax.random.PRNGKey(1))
        rng = np.random.default_rng(2)
        mel20 = rng.standard_normal((TINY.num_mel_bins, 20)
                                    ).astype(np.float32)
        out = np.asarray(Q.encode_audio(TINY, w, mel20), np.float32)
        # first full chunk's frames must match the full-chunks-only run
        out16 = np.asarray(Q.encode_audio(TINY, w, mel20[:, :16]),
                           np.float32)
        n16 = TINY.feat_extract_output_length(16)
        np.testing.assert_allclose(out[:n16], out16, atol=1e-4, rtol=1e-4)

    def test_empty_audio(self):
        w = Q.init_random_encoder(TINY, jax.random.PRNGKey(0))
        out = Q.encode_audio(TINY, w,
                             np.zeros((TINY.num_mel_bins, 0), np.float32))
        assert out.shape[0] == 0


AUDIO_TOK = 120


def _asr_engine():
    cfg = ModelConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
        qk_norm=True,
        extra={"mrope_section": [8, 0, 0], "image_token_id": AUDIO_TOK})
    model = LlamaModel(cfg)
    model.image_token_id = AUDIO_TOK
    weights = model.init_random(jax.random.PRNGKey(3), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    eng = LLMEngine(model, weights, ecfg, num_blocks=32, use_pallas=False)
    return eng, model, weights, cfg


class FakeTok:
    def encode(self, s, add_special_tokens=False):
        return [min(100, ord(c) % 100) for c in s][:12]

    def decode(self, ids):
        return "x<asr_text>hello world<|im_end|>" if ids else ""


class TestTranscriber:
    def test_post_process(self):
        assert Q.post_process_output(
            "junk<asr_text> hi there <|im_end|>rest") == "hi there"
        assert Q.post_process_output("no tag here") == "no tag here"
        assert Q.post_process_output("") == ""

    def test_linear_mrope_equivalence(self):
        """With sections [hd/2,0,0] and a (n, m, m) grid, audio + text
        positions are exactly linear — identical to plain rope."""
        from vllm_metal_tpu.multimodal.mrope import MMFeature, \
            mrope_positions
        feats = [MMFeature(offset=2, grid_thw=(4, 2, 2))]
        pos, delta = mrope_positions(9, feats, 2)
        assert pos[0].tolist() == list(range(9))
        assert delta == 0

    def test_engine_transcribe_splices_audio(self):
        """End-to-end: audio embeds flow through the engine splice and
        change the generated tokens vs a zeroed-audio run."""
        from vllm_metal_tpu.engine.sampling_params import SamplingParams
        from vllm_metal_tpu.multimodal.mrope import MMFeature

        eng, model, weights, cfg = _asr_engine()
        rng = np.random.default_rng(5)
        n = 6
        emb = rng.standard_normal((n, cfg.hidden_size)).astype(np.float32)
        prompt = [3, 7] + [AUDIO_TOK] * n + [9, 11]
        sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
        out1 = eng.generate([prompt], sp, mm_features=[
            [MMFeature(offset=-1, grid_thw=(n, 2, 2), embeds=emb)]])
        eng2, _, _, _ = _asr_engine()
        out2 = eng2.generate([prompt], sp, mm_features=[
            [MMFeature(offset=-1, grid_thw=(n, 2, 2),
                       embeds=np.zeros_like(emb))]])
        (o1,), (o2,) = out1.values(), out2.values()
        assert o1.token_ids != o2.token_ids

    def test_transcribe_end_to_end_tiny(self):
        eng, model, weights, cfg = _asr_engine()
        enc_w = Q.init_random_encoder(TINY, jax.random.PRNGKey(6))
        # tiny encoder output dim must match LLM hidden: rebuild proj2
        import dataclasses
        enc_w = dataclasses.replace(
            enc_w,
            proj2_w=jax.random.normal(jax.random.PRNGKey(7),
                                      (cfg.hidden_size, TINY.d_model),
                                      jnp.float32) * 0.02,
            proj2_b=jnp.zeros((cfg.hidden_size,), jnp.float32))
        tr = Q.Qwen3ASRTranscriber(TINY, enc_w, eng, FakeTok(), AUDIO_TOK)
        audio = np.random.default_rng(8).standard_normal(8000
                                                         ).astype(np.float32)
        res = tr.transcribe(audio)
        assert res.text == "hello world"
        assert res.duration == pytest.approx(0.5)

# SPDX-License-Identifier: Apache-2.0
"""Qwen3-VL (DeepStack) parity vs torch transformers on tiny checkpoints.

Covers the round-2 gap 'VL adapter breadth': vision tower output parity
(main + DeepStack taps), interleaved M-RoPE, and end-to-end logits with
an image through our engine runner vs HF forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

V = 128
IMG_TOK = 120


def _tiny_hf():
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLTextConfig, Qwen3VLVisionConfig)
    vc = Qwen3VLVisionConfig(
        depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        num_position_embeddings=16, deepstack_visual_indexes=[0, 1],
        out_hidden_size=48)
    tc = Qwen3VLTextConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=V, max_position_embeddings=256,
        rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                      "mrope_interleaved": True})
    cfg = Qwen3VLConfig(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_token_id=IMG_TOK, video_token_id=121,
        vision_start_token_id=119, vision_end_token_id=122,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    return Qwen3VLForConditionalGeneration(cfg).float().eval()


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    hf = _tiny_hf()
    path = str(tmp_path_factory.mktemp("q3vl") / "ckpt")
    hf.save_pretrained(path, safe_serialization=True)
    return hf, path


def test_vision_tower_parity(saved):
    """Main embeds + DeepStack taps match transformers' visual tower."""
    hf, path = saved
    from vllm_metal_tpu.models.qwen3_vl_mm import load_hf_qwen3vl_model
    model, weights, cfg = load_hf_qwen3vl_model(path, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    grid = (1, 4, 4)
    patches = rng.standard_normal((16, 96)).astype(np.float32)
    with torch.no_grad():
        want_main, want_taps = hf.model.visual(
            torch.tensor(patches), torch.tensor([list(grid)]))
    got = np.asarray(model.encode_image(patches, grid))  # [1+K, 4, 48]
    np.testing.assert_allclose(got[0], want_main.numpy(),
                               atol=2e-4, rtol=2e-4)
    assert len(want_taps) == 2
    for k, wt in enumerate(want_taps):
        np.testing.assert_allclose(got[1 + k], wt.numpy(),
                                   atol=2e-4, rtol=2e-4)


def test_e2e_logits_with_image(saved):
    """Full forward with an image: our engine runner vs HF forward."""
    hf, path = saved
    from vllm_metal_tpu.models.qwen3_vl_mm import load_hf_qwen3vl_model
    from vllm_metal_tpu.multimodal.mrope import MMFeature, mrope_positions

    model, weights, mcfg = load_hf_qwen3vl_model(path, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    grid = (1, 4, 4)
    patches = rng.standard_normal((16, 96)).astype(np.float32)
    n_img = 4
    prefix = [3, 7, 119]             # text + vision_start
    suffix = [122, 9, 11, 4]         # vision_end + text
    ids = prefix + [IMG_TOK] * n_img + suffix

    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(patches),
                 image_grid_thw=torch.tensor([list(grid)]))
    want = out.logits[0].float().numpy()

    feats = [MMFeature(offset=len(prefix), grid_thw=grid,
                       pixel_patches=patches)]
    embeds = np.asarray(model.encode_image(patches, grid), np.float32)
    feats[0].embeds = embeds
    pos, delta = mrope_positions(len(ids), feats, 2)

    cfg = EngineConfig(
        model=mcfg, cache=CacheConfig(block_size=16, cache_dtype="float32"),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    runner = ModelRunner(model, weights, cfg, num_blocks=16,
                         use_pallas=False)
    out2 = runner.execute([SeqStepInput(
        query_tokens=ids, context_len=len(ids), block_table=[1],
        params=SamplingParams(temperature=0.0),
        mm_embeds=embeds, mm_rows=list(range(len(prefix),
                                             len(prefix) + n_img)),
        mrope_positions=pos)])
    got_last = np.asarray(out2.logits)[0]
    # bf16 activation policy bounds parity at ~2e-3 noise (suite-wide
    # convention: atol 2e-2, see tests/test_hf_parity.py::_compare)
    np.testing.assert_allclose(got_last, want[-1], atol=2e-2, rtol=2e-2)


def test_engine_mm_request_e2e(saved):
    """Through LLMEngine.add_request: encode, DeepStack splice, decode."""
    hf, path = saved
    from vllm_metal_tpu.engine.engine import LLMEngine
    from vllm_metal_tpu.models.qwen3_vl_mm import load_hf_qwen3vl_model
    from vllm_metal_tpu.multimodal.mrope import MMFeature

    model, weights, mcfg = load_hf_qwen3vl_model(path, dtype=jnp.float32)
    cfg = EngineConfig(
        model=mcfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    eng = LLMEngine(model, weights, cfg, num_blocks=16, use_pallas=False)
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((16, 96)).astype(np.float32)
    ids = [5, 119] + [IMG_TOK] * 4 + [122, 8]
    rid = eng.add_request(
        ids, SamplingParams(temperature=0.0, max_tokens=4,
                            ignore_eos=True),
        mm_features=[MMFeature(offset=2, grid_thw=(1, 4, 4),
                               pixel_patches=patches)])
    done = None
    for _ in range(30):
        for out in eng.step():
            if out.finished:
                done = out
        if done:
            break
    assert done is not None and len(done.token_ids) == 4

    # greedy tokens match HF generate on the same inputs
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
            max_new_tokens=4, do_sample=False)
    assert done.token_ids == hf_out[0, len(ids):].tolist()

# SPDX-License-Identifier: Apache-2.0
"""PaddleOCR-VL family: NaViT tower invariants + composite loader/engine.

The reference's adapter tests mock the tower
(``/root/reference/tests/multimodal/test_paddleocr_vl.py`` — glue spec
only); here the tower math is in-repo, so we test its invariants, the
ERNIE-composite loader against the torch ERNIE backbone, and an engine
generate with image splice.  Real-checkpoint activation parity is
environment-blocked (docs/validation.md protocol).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_metal_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
)
from vllm_metal_tpu.engine.engine import LLMEngine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.models.paddle_vl import PaddleOCRVLModel
from vllm_metal_tpu.multimodal import paddle_vision as PV
from vllm_metal_tpu.multimodal.mrope import MMFeature
from vllm_metal_tpu.multimodal.vision import patch_positions

TINY_V = PV.PaddleVisionConfig(
    depth=2, embed_dim=32, num_heads=4, intermediate_size=64,
    patch_size=4, spatial_merge_size=2, hidden_size=48, num_pos=16)

IMG_TOK = 120
CFG = ModelConfig(
    vocab_size=128, hidden_size=48, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=128,
    architecture="paddleocr_vl",
    extra={"mrope_section": [2, 3, 3], "image_token_id": IMG_TOK,
           "vision_cfg": TINY_V, "rope_interleaved_pairs": True},
)


def test_tower_shapes_merge_and_finite():
    w = PV.init_random(TINY_V, jax.random.PRNGKey(0))
    grid = (1, 4, 6)
    n = 4 * 6
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.standard_normal((n, TINY_V.patch_dim)),
                          jnp.float32)
    pos = jnp.asarray(patch_positions(grid, TINY_V.spatial_merge_size))
    out = PV.paddle_vision_forward(TINY_V, w, patches, pos, (4, 6))
    assert out.shape == (n // 4, TINY_V.hidden_size)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_pos_embed_interpolation_identity_at_native_grid():
    """At the native grid the bilinear interp must return the table."""
    w = PV.init_random(TINY_V, jax.random.PRNGKey(1))
    pe = PV.interp_pos_embed(w.pos_embed, 4, 4)     # num_pos=16 -> 4x4
    np.testing.assert_allclose(
        np.asarray(pe), np.asarray(w.pos_embed, np.float32), atol=1e-5)


def test_pos_embed_interpolation_resizes():
    w = PV.init_random(TINY_V, jax.random.PRNGKey(2))
    pe = PV.interp_pos_embed(w.pos_embed, 6, 8)
    assert pe.shape == (48, TINY_V.embed_dim)
    assert np.isfinite(np.asarray(pe)).all()


def test_engine_generate_with_image():
    """Image features splice through the engine path; the image must
    change the generated tokens vs a same-shape zero image."""
    cfg = EngineConfig(
        model=CFG, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    model = PaddleOCRVLModel(CFG)
    model.set_vision(TINY_V, PV.init_random(TINY_V, jax.random.PRNGKey(7)))
    weights = model.init_random(jax.random.PRNGKey(3), dtype=jnp.float32)

    def run(seed):
        eng = LLMEngine(model, weights, cfg, num_blocks=32,
                        use_pallas=False)
        rng = np.random.default_rng(seed)
        grid = (1, 4, 4)
        patches = rng.standard_normal(
            (16, TINY_V.patch_dim)).astype(np.float32) * (seed + 1)
        feat = MMFeature(offset=-1, grid_thw=grid, pixel_patches=patches)
        prompt = [3, 7] + [IMG_TOK] * 4 + [9, 11]
        outs = eng.generate([prompt],
                            SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True),
                            mm_features=[[feat]])
        return list(outs.values())[0].token_ids

    t1, t2 = run(1), run(5)
    assert len(t1) == 6 and len(t2) == 6
    assert t1 != t2          # the image content reaches the LM


def _write_paddle_checkpoint(tmp_path, hf_text):
    """ERNIE torch weights + synthetic tower -> paddle-named checkpoint."""
    from safetensors.numpy import save_file
    tensors = {}
    sd = hf_text.state_dict()
    for k, v in sd.items():
        tensors[k] = v.float().numpy()
    # tiny tower with the HF paddle names
    rng = np.random.default_rng(0)
    d, i_, np_, pd = 32, 64, 16, 48          # embed, mlp, pos, patch_dim
    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)
    tensors["visual.embeddings.patch_embedding.weight"] = t(d, 3, 4, 4)
    tensors["visual.embeddings.patch_embedding.bias"] = np.zeros(
        (d,), np.float32)
    tensors["visual.embeddings.position_embedding.weight"] = t(np_, d)
    for i in range(2):
        p = f"visual.encoder.layers.{i}."
        tensors[p + "layer_norm1.weight"] = np.ones((d,), np.float32)
        tensors[p + "layer_norm1.bias"] = np.zeros((d,), np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            tensors[p + f"self_attn.{nm}.weight"] = t(d, d)
            tensors[p + f"self_attn.{nm}.bias"] = np.zeros((d,), np.float32)
        tensors[p + "layer_norm2.weight"] = np.ones((d,), np.float32)
        tensors[p + "layer_norm2.bias"] = np.zeros((d,), np.float32)
        tensors[p + "mlp.fc1.weight"] = t(i_, d)
        tensors[p + "mlp.fc1.bias"] = np.zeros((i_,), np.float32)
        tensors[p + "mlp.fc2.weight"] = t(d, i_)
        tensors[p + "mlp.fc2.bias"] = np.zeros((d,), np.float32)
    tensors["visual.post_layernorm.weight"] = np.ones((d,), np.float32)
    tensors["visual.post_layernorm.bias"] = np.zeros((d,), np.float32)
    md = 4 * d
    tensors["mlp_AR.pre_norm.weight"] = np.ones((md,), np.float32)
    tensors["mlp_AR.pre_norm.bias"] = np.zeros((md,), np.float32)
    tensors["mlp_AR.linear_1.weight"] = t(64, md)
    tensors["mlp_AR.linear_1.bias"] = np.zeros((64,), np.float32)
    tensors["mlp_AR.linear_2.weight"] = t(64, 64)
    tensors["mlp_AR.linear_2.bias"] = np.zeros((64,), np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))
    config = {
        "architectures": ["PaddleOCRVLForConditionalGeneration"],
        "vocab_size": 96, "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "max_position_embeddings": 128, "rope_theta": 500000.0,
        "tie_word_embeddings": True, "use_bias": False,
        "image_token_id": 90,
        "vision_config": {
            "num_hidden_layers": 2, "hidden_size": 32,
            "num_attention_heads": 4, "intermediate_size": 64,
            "patch_size": 4, "spatial_merge_size": 2,
            "num_position_embeddings": 16,
        },
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(config, f)
    return str(tmp_path)


def test_loader_text_parity_vs_torch_ernie(tmp_path):
    """The composite loader's text side must match transformers' ERNIE
    forward exactly (weights rooted at model., tied lm head)."""
    torch = pytest.importorskip("torch")
    from transformers.models.ernie4_5 import (Ernie4_5Config,
                                              Ernie4_5ForCausalLM)
    tcfg = Ernie4_5Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        use_bias=False, tie_word_embeddings=True, rope_theta=500000.0)
    torch.manual_seed(0)
    hf = Ernie4_5ForCausalLM(tcfg).float().eval()
    path = _write_paddle_checkpoint(tmp_path, hf)

    from vllm_metal_tpu.models.paddle_vl import load_hf_paddle_vl_model
    model, weights, mcfg = load_hf_paddle_vl_model(path, dtype=jnp.float32)
    assert mcfg.architecture == "paddleocr_vl"
    assert model.vision_weights is not None

    rng = np.random.default_rng(0)
    ids = [int(x) for x in rng.integers(1, 95, 11)]
    with torch.no_grad():
        want = hf(torch.tensor([ids], dtype=torch.long)
                  ).logits[0, -1].float().numpy()

    ecfg = EngineConfig(
        model=mcfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
    runner = ModelRunner(model, weights, ecfg, num_blocks=16,
                         use_pallas=False)
    out = runner.execute([SeqStepInput(
        query_tokens=ids, context_len=len(ids), block_table=[1],
        params=SamplingParams(temperature=0.0))])
    got = np.asarray(out.logits)[0]
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_launcher_routes_paddle_arch(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers.models.ernie4_5 import (Ernie4_5Config,
                                              Ernie4_5ForCausalLM)
    tcfg = Ernie4_5Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        use_bias=False, tie_word_embeddings=True)
    torch.manual_seed(1)
    path = _write_paddle_checkpoint(tmp_path, Ernie4_5ForCausalLM(tcfg))
    from vllm_metal_tpu.models.hf_loader import PADDLE_ARCHS
    with open(tmp_path / "config.json") as f:
        arch = json.load(f)["architectures"][0]
    assert arch in PADDLE_ARCHS

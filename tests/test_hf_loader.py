# SPDX-License-Identifier: Apache-2.0
"""HF safetensors checkpoint loading e2e (fabricated tiny checkpoint)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.models.hf_loader import config_from_hf, load_hf_model
from vllm_metal_tpu.models.llama import dense_causal_attn

V, H, L, NH, NKV, HD, I = 64, 32, 2, 4, 2, 8, 48


def write_hf_checkpoint(path, arch="Qwen2ForCausalLM", seed=0):
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.15):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    cfg = {
        "architectures": [arch],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": NKV, "head_dim": HD,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
        "max_position_embeddings": 128, "tie_word_embeddings": False,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)

    tensors = {"model.embed_tokens.weight": w(V, H),
               "model.norm.weight": 1 + 0.05 * w(H),
               "lm_head.weight": w(V, H)}
    for i in range(L):
        p = f"model.layers.{i}."
        tensors.update({
            p + "input_layernorm.weight": 1 + 0.05 * w(H),
            p + "self_attn.q_proj.weight": w(NH * HD, H),
            p + "self_attn.k_proj.weight": w(NKV * HD, H),
            p + "self_attn.v_proj.weight": w(NKV * HD, H),
            p + "self_attn.q_proj.bias": w(NH * HD),
            p + "self_attn.k_proj.bias": w(NKV * HD),
            p + "self_attn.v_proj.bias": w(NKV * HD),
            p + "self_attn.o_proj.weight": w(H, NH * HD),
            p + "post_attention_layernorm.weight": 1 + 0.05 * w(H),
            p + "mlp.gate_proj.weight": w(I, H),
            p + "mlp.up_proj.weight": w(I, H),
            p + "mlp.down_proj.weight": w(H, I),
        })
    # split across two shards to exercise the sharded reader
    keys = sorted(tensors)
    half = len(keys) // 2
    save_file({k: tensors[k] for k in keys[:half]},
              os.path.join(path, "model-00001-of-00002.safetensors"))
    save_file({k: tensors[k] for k in keys[half:]},
              os.path.join(path, "model-00002-of-00002.safetensors"))
    return tensors


def test_hf_config_parse(tmp_path):
    path = str(tmp_path / "ckpt")
    write_hf_checkpoint(path)
    cfg = config_from_hf(path)
    assert cfg.architecture == "qwen2"
    assert cfg.num_layers == L and cfg.head_dim == HD
    assert cfg.num_kv_heads == NKV


def test_hf_load_and_forward(tmp_path):
    path = str(tmp_path / "ckpt")
    raw = write_hf_checkpoint(path, seed=1)
    model, weights, cfg = load_hf_model(path, dtype=jnp.float32)
    # qwen2 biases present
    assert weights.layers[0].bq is not None
    ids = jnp.asarray([3, 14, 15, 9], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    logits = model.forward(weights, ids, pos, dense_causal_attn(cfg))
    assert logits.shape == (4, V)
    assert np.isfinite(np.asarray(logits)).all()
    # embedding row matches the checkpoint
    np.testing.assert_allclose(
        np.asarray(weights.embedding.w[3]), raw["model.embed_tokens.weight"][3],
        rtol=1e-6)

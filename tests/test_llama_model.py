# SPDX-License-Identifier: Apache-2.0
"""Model forward vs an independent numpy reference (tier-3-style golden math).

A tiny f32 Llama checkpoint is fabricated as GGUF, loaded through the real
loader, and the packed-varlen forward is checked against a from-scratch numpy
transformer implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.gguf_writer import write_gguf
from vllm_metal_tpu.gguf.loader import load_model
from vllm_metal_tpu.gguf.reader import GGMLType
from vllm_metal_tpu.models.llama import dense_causal_attn

V, H, L, NH, NKV, HD, I = 64, 32, 2, 4, 2, 8, 48


def tiny_gguf(path, seed=0, qt=GGMLType.F32):
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.25):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors = {"token_embd.weight": (w(V, H), qt)}
    for i in range(L):
        p = f"blk.{i}."
        tensors.update({
            p + "attn_norm.weight": (1 + 0.1 * w(H), GGMLType.F32),
            p + "attn_q.weight": (w(NH * HD, H), qt),
            p + "attn_k.weight": (w(NKV * HD, H), qt),
            p + "attn_v.weight": (w(NKV * HD, H), qt),
            p + "attn_output.weight": (w(H, NH * HD), qt),
            p + "ffn_norm.weight": (1 + 0.1 * w(H), GGMLType.F32),
            p + "ffn_gate.weight": (w(I, H), qt),
            p + "ffn_up.weight": (w(I, H), qt),
            p + "ffn_down.weight": (w(H, I), qt),
        })
    tensors["output_norm.weight"] = (1 + 0.1 * w(H), GGMLType.F32)
    tensors["output.weight"] = (w(V, H), qt)

    meta = {
        "general.architecture": "llama",
        "llama.block_count": L,
        "llama.embedding_length": H,
        "llama.attention.head_count": NH,
        "llama.attention.head_count_kv": NKV,
        "llama.attention.key_length": HD,
        "llama.feed_forward_length": I,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "llama.rope.freq_base": 10000.0,
        "llama.context_length": 128,
        "llama.vocab_size": V,
    }
    write_gguf(path, meta, tensors)
    return {k: v[0] for k, v in tensors.items()}


def np_rms(x, w, eps=1e-5):
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * w


def np_rope(x, pos, theta=10000.0):
    t, h, d = x.shape
    inv = 1.0 / theta ** (np.arange(0, d, 2) / d)
    ang = pos[:, None] * inv[None, :]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def np_forward(wts, ids):
    x = wts["token_embd.weight"][ids]
    t = len(ids)
    pos = np.arange(t, dtype=np.float64)
    for i in range(L):
        p = f"blk.{i}."
        h = np_rms(x, wts[p + "attn_norm.weight"])
        q = (h @ wts[p + "attn_q.weight"].T).reshape(t, NH, HD)
        k = (h @ wts[p + "attn_k.weight"].T).reshape(t, NKV, HD)
        v = (h @ wts[p + "attn_v.weight"].T).reshape(t, NKV, HD)
        q, k = np_rope(q, pos), np_rope(k, pos)
        k = np.repeat(k, NH // NKV, axis=1)
        v = np.repeat(v, NH // NKV, axis=1)
        logits = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(HD)
        mask = np.tril(np.ones((t, t), bool))
        logits = np.where(mask[None], logits, -np.inf)
        pr = np.exp(logits - logits.max(-1, keepdims=True))
        pr = pr / pr.sum(-1, keepdims=True)
        attn = np.einsum("hqk,khd->qhd", pr, v).reshape(t, NH * HD)
        x = x + attn @ wts[p + "attn_output.weight"].T
        h = np_rms(x, wts[p + "ffn_norm.weight"])
        g = h @ wts[p + "ffn_gate.weight"].T
        u = h @ wts[p + "ffn_up.weight"].T
        x = x + (g / (1 + np.exp(-g)) * u) @ wts[p + "ffn_down.weight"].T
    x = np_rms(x, wts["output_norm.weight"])
    return x @ wts["output.weight"].T


def test_forward_matches_numpy(tmp_path):
    path = str(tmp_path / "tiny.gguf")
    raw = tiny_gguf(path)
    model, weights, cfg = load_model(path, dtype=jnp.float32)
    assert cfg.num_layers == L and cfg.num_kv_heads == NKV
    assert cfg.head_dim == HD
    ids = np.array([1, 5, 9, 20, 33, 2], dtype=np.int32)
    pos = np.arange(len(ids), dtype=np.int32)
    got = model.forward(weights, jnp.asarray(ids), jnp.asarray(pos),
                        dense_causal_attn(cfg))
    want = np_forward(raw, ids)
    got = np.asarray(got, dtype=np.float64)
    # bf16 matmuls inside the jax path -> loose tolerance, plus argmax parity
    assert np.abs(got - want).max() < 0.25, np.abs(got - want).max()
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_forward_quantized_close_to_dense(tmp_path):
    dense_path = str(tmp_path / "f32.gguf")
    q_path = str(tmp_path / "q4k.gguf")
    tiny_gguf(dense_path, seed=7, qt=GGMLType.F32)
    tiny_gguf(q_path, seed=7, qt=GGMLType.Q4_K)
    # Q4_K requires K % 256 == 0 for packing; here K=H=32 so the loader must
    # densify — this test covers the densify fallback path.
    m1, w1, cfg1 = load_model(dense_path, dtype=jnp.float32)
    m2, w2, cfg2 = load_model(q_path, dtype=jnp.float32)
    ids = jnp.asarray([3, 14, 15, 9], dtype=jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)
    l1 = np.asarray(m1.forward(w1, ids, pos, dense_causal_attn(cfg1)))
    l2 = np.asarray(m2.forward(w2, ids, pos, dense_causal_attn(cfg2)))
    # same seed -> quantized forward tracks dense forward loosely
    assert np.abs(l1 - l2).mean() < 0.5


def test_tied_embeddings(tmp_path):
    path = str(tmp_path / "tied.gguf")
    raw = tiny_gguf(path)
    # remove output.weight -> tied
    import os
    tensors = {k: (v, GGMLType.F32) for k, v in raw.items()
               if k != "output.weight"}
    meta = {
        "general.architecture": "llama",
        "llama.block_count": L,
        "llama.embedding_length": H,
        "llama.attention.head_count": NH,
        "llama.attention.head_count_kv": NKV,
        "llama.attention.key_length": HD,
        "llama.feed_forward_length": I,
        "llama.vocab_size": V,
    }
    write_gguf(path, meta, tensors)
    model, weights, cfg = load_model(path, dtype=jnp.float32)
    assert cfg.tie_word_embeddings
    assert weights.lm_head is None
    out = model.forward(weights, jnp.asarray([1, 2]), jnp.arange(2),
                        dense_causal_attn(cfg))
    assert out.shape == (2, V)

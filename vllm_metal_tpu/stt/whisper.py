# SPDX-License-Identifier: Apache-2.0
"""Functional JAX Whisper encoder-decoder.

Parity target: ``/root/reference/vllm_metal/stt/whisper/model.py`` (MLX
module classes).  TPU-first differences:

* weights are a plain pytree; encoder/decoder are pure functions under
  ``jit`` with static shapes,
* decoder layers run under ``lax.scan`` over stacked layer weights (one
  compiled layer body),
* the whole greedy transcription decode — prompt ingestion AND token
  generation — is ONE ``lax.while_loop`` dispatch with a donated,
  fixed-size KV cache.  The reference dispatches the decoder and syncs
  to the host once per token (``stt/whisper/transcriber.py:221-228``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import static_dataclass

WHISPER_MAX_DECODE_TOKENS = 448


@static_dataclass(meta_fields=["n_mels", "n_audio_ctx", "n_audio_state",
                               "n_audio_head", "n_audio_layer", "n_vocab",
                               "n_text_ctx", "n_text_state", "n_text_head",
                               "n_text_layer"], frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 512
    n_audio_head: int = 8
    n_audio_layer: int = 6
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 512
    n_text_head: int = 8
    n_text_layer: int = 6

    @classmethod
    def from_dict(cls, c: dict) -> "WhisperConfig":
        if "d_model" in c or "encoder_layers" in c:  # HF format
            return cls(
                n_mels=c.get("num_mel_bins", 80),
                n_audio_ctx=c.get("max_source_positions", 1500),
                n_audio_state=c.get("d_model", 512),
                n_audio_head=c.get("encoder_attention_heads", 8),
                n_audio_layer=c.get("encoder_layers", 6),
                n_vocab=c.get("vocab_size", 51865),
                n_text_ctx=c.get("max_target_positions", 448),
                n_text_state=c.get("d_model", 512),
                n_text_head=c.get("decoder_attention_heads", 8),
                n_text_layer=c.get("decoder_layers", 6))
        return cls(**{k: v for k, v in c.items()
                      if k in cls.__dataclass_fields__})

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865


@static_dataclass()
class AttnW:
    wq: jax.Array
    bq: jax.Array
    wk: jax.Array            # no bias on key (Whisper convention)
    wv: jax.Array
    bv: jax.Array
    wo: jax.Array
    bo: jax.Array


@static_dataclass()
class BlockW:
    attn_ln_w: jax.Array
    attn_ln_b: jax.Array
    attn: AttnW
    mlp_ln_w: jax.Array
    mlp_ln_b: jax.Array
    mlp1_w: jax.Array
    mlp1_b: jax.Array
    mlp2_w: jax.Array
    mlp2_b: jax.Array
    cross_ln_w: Optional[jax.Array] = None
    cross_ln_b: Optional[jax.Array] = None
    cross: Optional[AttnW] = None


@static_dataclass()
class WhisperW:
    conv1_w: jax.Array       # [3, n_mels, S]  (W, I, O)
    conv1_b: jax.Array
    conv2_w: jax.Array       # [3, S, S]
    conv2_b: jax.Array
    enc_blocks: BlockW       # stacked leaves [L_enc, ...]
    enc_ln_w: jax.Array
    enc_ln_b: jax.Array
    tok_emb: jax.Array       # [V, S]
    dec_pos: jax.Array       # [n_text_ctx, S]
    dec_blocks: BlockW       # stacked leaves [L_dec, ...] with cross-attn
    dec_ln_w: jax.Array
    dec_ln_b: jax.Array


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _ln(x: jax.Array, w: jax.Array, b: jax.Array,
        eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * w.astype(x.dtype) + b.astype(x.dtype)


def _heads(x: jax.Array, n_head: int) -> jax.Array:
    return x.reshape(*x.shape[:-1], n_head, x.shape[-1] // n_head)


def _attend(q: jax.Array, k: jax.Array, v: jax.Array, n_head: int,
            mask: Optional[jax.Array] = None) -> jax.Array:
    """q [Tq, S], k/v [Tk, S] -> [Tq, S]; fp32 softmax, Whisper scaling."""
    d = q.shape[-1] // n_head
    scale = d ** -0.25
    qh = _heads(q, n_head).astype(jnp.float32) * scale
    kh = _heads(k, n_head).astype(jnp.float32) * scale
    vh = _heads(v, n_head).astype(jnp.float32)
    logits = jnp.einsum("qhd,khd->hqk", qh, kh)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", w, vh)
    return out.reshape(q.shape).astype(q.dtype)


def _mha(aw: AttnW, x: jax.Array, kv_src: jax.Array, n_head: int,
         mask: Optional[jax.Array] = None) -> jax.Array:
    q = x @ aw.wq.T + aw.bq
    k = kv_src @ aw.wk.T
    v = kv_src @ aw.wv.T + aw.bv
    return _attend(q, k, v, n_head, mask) @ aw.wo.T + aw.bo


def sinusoids(length: int, channels: int,
              max_timescale: int = 10000) -> np.ndarray:
    inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array,
            stride: int) -> jax.Array:
    """x [T, C_in], w [K, C_in, C_out] -> [T', C_out] (padding=1)."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out[0] + b


@partial(jax.jit, static_argnums=0)
def encode(cfg: WhisperConfig, w: WhisperW, mel: jax.Array) -> jax.Array:
    """mel [n_frames, n_mels] -> audio features [n_audio_ctx, S]."""
    x = jax.nn.gelu(_conv1d(mel, w.conv1_w, w.conv1_b, 1))
    x = jax.nn.gelu(_conv1d(x, w.conv2_w, w.conv2_b, 2))
    pos = jnp.asarray(sinusoids(cfg.n_audio_ctx, cfg.n_audio_state),
                      x.dtype)
    x = x + pos

    def body(x, bw: BlockW):
        x = x + _mha(bw.attn, _ln(x, bw.attn_ln_w, bw.attn_ln_b), x,
                     cfg.n_audio_head)
        h = _ln(x, bw.mlp_ln_w, bw.mlp_ln_b)
        x = x + jax.nn.gelu(h @ bw.mlp1_w.T + bw.mlp1_b) @ bw.mlp2_w.T \
            + bw.mlp2_b
        return x, None

    x, _ = jax.lax.scan(body, x, w.enc_blocks)
    return _ln(x, w.enc_ln_w, w.enc_ln_b)


# ---------------------------------------------------------------------------
# Decoder: one-dispatch greedy transcription
# ---------------------------------------------------------------------------

def _decoder_step(cfg: WhisperConfig, w: WhisperW, tok: jax.Array,
                  pos_idx: jax.Array, kc: jax.Array, vc: jax.Array,
                  ck: jax.Array, cv: jax.Array):
    """One decoder token step against a fixed-size self-KV cache.

    tok scalar i32, pos_idx scalar; kc/vc [L, n_text_ctx, S] caches;
    ck/cv [L, n_audio_ctx, S] precomputed cross K/V.
    Returns (logits [V], kc, vc).
    """
    S, H = cfg.n_text_state, cfg.n_text_head
    x = w.tok_emb[tok].astype(kc.dtype) + \
        jax.lax.dynamic_index_in_dim(w.dec_pos, pos_idx, 0,
                                     keepdims=False).astype(kc.dtype)
    x = x[None]  # [1, S]
    valid = (jnp.arange(cfg.n_text_ctx) <= pos_idx)[None, None, :]

    def body(carry, xs):
        x, kc, vc = carry
        bw, ckl, cvl, l = xs
        h = _ln(x, bw.attn_ln_w, bw.attn_ln_b)
        q = h @ bw.attn.wq.T + bw.attn.bq
        k = h @ bw.attn.wk.T
        v = h @ bw.attn.wv.T + bw.attn.bv
        kc = jax.lax.dynamic_update_slice(kc, k[None], (l, pos_idx, 0))
        vc = jax.lax.dynamic_update_slice(vc, v[None], (l, pos_idx, 0))
        out = _attend(q, kc[l], vc[l], H, valid)
        x = x + out @ bw.attn.wo.T + bw.attn.bo
        # cross attention (no mask: all audio positions valid)
        h = _ln(x, bw.cross_ln_w, bw.cross_ln_b)
        qx = h @ bw.cross.wq.T + bw.cross.bq
        x = x + _attend(qx, ckl, cvl, H) @ bw.cross.wo.T + bw.cross.bo
        h = _ln(x, bw.mlp_ln_w, bw.mlp_ln_b)
        x = x + jax.nn.gelu(h @ bw.mlp1_w.T + bw.mlp1_b) @ bw.mlp2_w.T \
            + bw.mlp2_b
        return (x, kc, vc), None

    (x, kc, vc), _ = jax.lax.scan(
        body, (x, kc, vc),
        (w.dec_blocks, ck, cv,
         jnp.arange(cfg.n_text_layer, dtype=jnp.int32)))
    x = _ln(x, w.dec_ln_w, w.dec_ln_b)
    logits = (x[0].astype(jnp.float32) @
              w.tok_emb.T.astype(jnp.float32))
    return logits, kc, vc


@partial(jax.jit, static_argnums=0)
def cross_kv(cfg: WhisperConfig, w: WhisperW, feats: jax.Array):
    """Precompute per-layer cross-attention K/V from audio features."""
    def body(_, bw: BlockW):
        k = feats @ bw.cross.wk.T
        v = feats @ bw.cross.wv.T + bw.cross.bv
        return None, (k, v)

    _, (ck, cv) = jax.lax.scan(body, None, w.dec_blocks)
    return ck, cv


@partial(jax.jit, static_argnums=(0, 5), donate_argnums=(3,))
def greedy_decode_jit(cfg: WhisperConfig, w: WhisperW, feats: jax.Array,
                      tokens: jax.Array, prompt_len: jax.Array,
                      eot_id: int, max_len: jax.Array):
    """Teacher-force the prompt then generate greedily, all on device.

    tokens: [n_text_ctx] i32, first ``prompt_len`` entries are the prompt.
    Returns (tokens, final_len).  Generation stops at ``eot_id`` (the eot
    is written into the buffer) or at ``max_len`` total positions.
    """
    S = cfg.n_text_state
    dt = feats.dtype
    kc = jnp.zeros((cfg.n_text_layer, cfg.n_text_ctx, S), dt)
    vc = jnp.zeros_like(kc)
    ck, cv = cross_kv(cfg, w, feats)

    def cond(c):
        tokens, i, kc, vc, done = c
        return (~done) & (i < max_len - 1)

    def body(c):
        tokens, i, kc, vc, done = c
        logits, kc, vc = _decoder_step(cfg, w, tokens[i], i, kc, vc, ck, cv)
        nxt = jnp.argmax(logits).astype(jnp.int32)
        in_prompt = (i + 1) < prompt_len
        new_tok = jnp.where(in_prompt, tokens[i + 1], nxt)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, new_tok,
                                                     i + 1, 0)
        done = (~in_prompt) & (new_tok == eot_id)
        return tokens, i + 1, kc, vc, done

    tokens, n, _, _, _ = jax.lax.while_loop(
        cond, body, (tokens, jnp.int32(0), kc, vc, jnp.bool_(False)))
    return tokens, n + 1


def greedy_decode(cfg: WhisperConfig, w: WhisperW, feats: jax.Array,
                  prompt_ids: list[int], eot_id: int,
                  max_tokens: int | None = None) -> list[int]:
    """Returns generated token ids (prompt and eot excluded)."""
    if not prompt_ids:
        return []
    if max_tokens is None:
        max_tokens = WHISPER_MAX_DECODE_TOKENS
    max_len = min(cfg.n_text_ctx, len(prompt_ids) + max_tokens)
    if len(prompt_ids) >= max_len:
        return []
    buf = np.zeros((cfg.n_text_ctx,), np.int32)
    buf[:len(prompt_ids)] = prompt_ids
    tokens, n = greedy_decode_jit(cfg, w, feats, jnp.asarray(buf),
                                  jnp.int32(len(prompt_ids)), int(eot_id),
                                  jnp.int32(max_len))
    out = np.asarray(tokens)[:int(n)].tolist()[len(prompt_ids):]
    if out and out[-1] == eot_id:
        out = out[:-1]
    return out


# ---------------------------------------------------------------------------
# Init / loading
# ---------------------------------------------------------------------------

def init_random(cfg: WhisperConfig, key: jax.Array,
                dtype=jnp.float32) -> WhisperW:
    keys = iter(jax.random.split(key, 64))

    def r(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    def attn(s):
        return AttnW(wq=r(s, s), bq=jnp.zeros((s,), dtype), wk=r(s, s),
                     wv=r(s, s), bv=jnp.zeros((s,), dtype), wo=r(s, s),
                     bo=jnp.zeros((s,), dtype))

    def block(s, cross):
        return BlockW(
            attn_ln_w=jnp.ones((s,), dtype), attn_ln_b=jnp.zeros((s,), dtype),
            attn=attn(s),
            mlp_ln_w=jnp.ones((s,), dtype), mlp_ln_b=jnp.zeros((s,), dtype),
            mlp1_w=r(4 * s, s), mlp1_b=jnp.zeros((4 * s,), dtype),
            mlp2_w=r(s, 4 * s), mlp2_b=jnp.zeros((s,), dtype),
            cross_ln_w=jnp.ones((s,), dtype) if cross else None,
            cross_ln_b=jnp.zeros((s,), dtype) if cross else None,
            cross=attn(s) if cross else None)

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    s, st = cfg.n_audio_state, cfg.n_text_state
    return WhisperW(
        conv1_w=r(3, cfg.n_mels, s), conv1_b=jnp.zeros((s,), dtype),
        conv2_w=r(3, s, s), conv2_b=jnp.zeros((s,), dtype),
        enc_blocks=stack([block(s, False)
                          for _ in range(cfg.n_audio_layer)]),
        enc_ln_w=jnp.ones((s,), dtype), enc_ln_b=jnp.zeros((s,), dtype),
        tok_emb=r(cfg.n_vocab, st),
        dec_pos=r(cfg.n_text_ctx, st),
        dec_blocks=stack([block(st, True)
                          for _ in range(cfg.n_text_layer)]),
        dec_ln_w=jnp.ones((st,), dtype), dec_ln_b=jnp.zeros((st,), dtype))


def load_whisper(path: str, dtype=jnp.bfloat16):
    """HF Whisper checkpoint dir -> (cfg, weights)."""
    import json
    import os

    from ..models.hf_loader import _ShardedReader

    with open(os.path.join(path, "config.json")) as f:
        cfg = WhisperConfig.from_dict(json.load(f))
    reader = _ShardedReader(path)

    def arr(key):
        a = reader.get(key)
        if a.dtype == np.uint16:
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def attn(p):
        return AttnW(wq=arr(p + "q_proj.weight"), bq=arr(p + "q_proj.bias"),
                     wk=arr(p + "k_proj.weight"),
                     wv=arr(p + "v_proj.weight"), bv=arr(p + "v_proj.bias"),
                     wo=arr(p + "out_proj.weight"),
                     bo=arr(p + "out_proj.bias"))

    def block(p, cross):
        return BlockW(
            attn_ln_w=arr(p + "self_attn_layer_norm.weight"),
            attn_ln_b=arr(p + "self_attn_layer_norm.bias"),
            attn=attn(p + "self_attn."),
            mlp_ln_w=arr(p + "final_layer_norm.weight"),
            mlp_ln_b=arr(p + "final_layer_norm.bias"),
            mlp1_w=arr(p + "fc1.weight"), mlp1_b=arr(p + "fc1.bias"),
            mlp2_w=arr(p + "fc2.weight"), mlp2_b=arr(p + "fc2.bias"),
            cross_ln_w=arr(p + "encoder_attn_layer_norm.weight")
            if cross else None,
            cross_ln_b=arr(p + "encoder_attn_layer_norm.bias")
            if cross else None,
            cross=attn(p + "encoder_attn.") if cross else None)

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    def conv(key):
        # HF conv1d weight [out, in, K] -> lax (W, I, O)
        return jnp.transpose(arr(key), (2, 1, 0))

    w = WhisperW(
        conv1_w=conv("model.encoder.conv1.weight"),
        conv1_b=arr("model.encoder.conv1.bias"),
        conv2_w=conv("model.encoder.conv2.weight"),
        conv2_b=arr("model.encoder.conv2.bias"),
        enc_blocks=stack([block(f"model.encoder.layers.{i}.", False)
                          for i in range(cfg.n_audio_layer)]),
        enc_ln_w=arr("model.encoder.layer_norm.weight"),
        enc_ln_b=arr("model.encoder.layer_norm.bias"),
        tok_emb=arr("model.decoder.embed_tokens.weight"),
        dec_pos=arr("model.decoder.embed_positions.weight"),
        dec_blocks=stack([block(f"model.decoder.layers.{i}.", True)
                          for i in range(cfg.n_text_layer)]),
        dec_ln_w=arr("model.decoder.layer_norm.weight"),
        dec_ln_b=arr("model.decoder.layer_norm.bias"))
    return cfg, w

# SPDX-License-Identifier: Apache-2.0
"""Qwen3-ASR: conv2d audio encoder + Qwen3 LM decoder.

Parity target: ``/root/reference/vllm_metal/stt/qwen3_asr/model.py``.
TPU-first structure: the audio encoder is a functional jit (chunked
conv2d downsampling, per-window full-attention transformer, output
projection), and the DECODER is not a bespoke loop at all — it is the
engine's own Qwen3 model fed through the multimodal embedding-splice
path (audio embeddings are a "linear" MMFeature with grid (n, m, m), so
M-RoPE positions advance linearly over the audio span, matching the
reference's identical t/h/w position streams for ASR).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import static_dataclass

QWEN3_ASR_MAX_DECODE_TOKENS = 448
ASR_TEXT_TAG = "<asr_text>"


@static_dataclass(meta_fields=["num_mel_bins", "d_model", "encoder_layers",
                               "encoder_attention_heads", "encoder_ffn_dim",
                               "downsample_hidden_size", "output_dim",
                               "max_source_positions", "n_window",
                               "n_window_infer"], frozen=True)
class ASRAudioConfig:
    num_mel_bins: int = 128
    d_model: int = 896
    encoder_layers: int = 18
    encoder_attention_heads: int = 14
    encoder_ffn_dim: int = 3584
    downsample_hidden_size: int = 480
    output_dim: int = 1024
    max_source_positions: int = 1500
    n_window: int = 50
    n_window_infer: int = 800

    @property
    def chunk_size(self) -> int:
        return self.n_window * 2

    @staticmethod
    def cnn_output_length(num_frames: int) -> int:
        """Time length after 3x conv2d(stride=2, pad=1, k=3)."""
        length = num_frames
        for _ in range(3):
            length = (length - 1) // 2 + 1
        return int(length)

    def feat_extract_output_length(self, num_mel_frames: int) -> int:
        """Audio tokens produced from a mel with N time frames."""
        full, rem = divmod(num_mel_frames, self.chunk_size)
        n = full * self.cnn_output_length(self.chunk_size)
        if rem:
            n += self.cnn_output_length(rem)
        return int(n)

    @classmethod
    def from_dict(cls, c: dict) -> "ASRAudioConfig":
        return cls(**{k: v for k, v in c.items()
                      if k in cls.__dataclass_fields__})


@static_dataclass()
class ASREncLayerW:
    ln1_w: jax.Array
    ln1_b: jax.Array
    wq: jax.Array
    bq: jax.Array
    wk: jax.Array
    bk: jax.Array
    wv: jax.Array
    bv: jax.Array
    wo: jax.Array
    bo: jax.Array
    ln2_w: jax.Array
    ln2_b: jax.Array
    fc1_w: jax.Array
    fc1_b: jax.Array
    fc2_w: jax.Array
    fc2_b: jax.Array


@static_dataclass()
class ASREncoderW:
    conv1_w: jax.Array           # [3, 3, in, out] (HWIO)
    conv1_b: jax.Array
    conv2_w: jax.Array
    conv2_b: jax.Array
    conv3_w: jax.Array
    conv3_b: jax.Array
    conv_out_w: jax.Array        # [d_model, c*f]
    layers: ASREncLayerW         # stacked [L, ...]
    ln_post_w: jax.Array
    ln_post_b: jax.Array
    proj1_w: jax.Array
    proj1_b: jax.Array
    proj2_w: jax.Array
    proj2_b: jax.Array


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * w.astype(x.dtype) + b.astype(x.dtype)


def _sinusoid_pos(max_len: int, d_model: int) -> np.ndarray:
    half = d_model // 2
    inv = np.exp(-math.log(10000.0) / (half - 1) * np.arange(half))
    pos = np.arange(max_len)[:, None] * inv[None, :]
    return np.concatenate([np.sin(pos), np.cos(pos)], axis=1
                          ).astype(np.float32)


@partial(jax.jit, static_argnums=0)
def _encode_chunks(cfg: ASRAudioConfig, w: ASREncoderW, chunks: jax.Array,
                   frame_valid: jax.Array) -> jax.Array:
    """chunks [n, n_mels, chunk_size] -> frames [n, fpc, output_dim].

    ``frame_valid`` [n, fpc] masks invalid tail frames of a partial last
    chunk out of the window attention (the reference trims them before
    the transformer, ``model.py:200``).
    """
    n = chunks.shape[0]
    fpc = cfg.cnn_output_length(cfg.chunk_size)

    # conv2d stack (NHWC, stride 2, pad 1): input [n, n_mels, T, 1]
    x = chunks[..., None]
    for cw, cb in ((w.conv1_w, w.conv1_b), (w.conv2_w, w.conv2_b),
                   (w.conv3_w, w.conv3_b)):
        x = jax.lax.conv_general_dilated(
            x, cw, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.gelu(x + cb)
    # [n, f, t, c] -> [n, t, c*f] (torch permute(0,3,1,2).view order)
    b, f, t, c = x.shape
    x = x.transpose(0, 2, 3, 1).reshape(b, t, c * f)
    x = x @ w.conv_out_w.T                              # [n, fpc, d_model]
    pos = jnp.asarray(_sinusoid_pos(cfg.max_source_positions,
                                    cfg.d_model))[:t]
    x = x + pos[None].astype(x.dtype)

    # per-window transformer: group chunks_per_window chunks' frames
    cpw = max(1, cfg.n_window_infer // cfg.chunk_size)
    n_win = -(-n // cpw)
    pad_c = n_win * cpw - n
    if pad_c:
        x = jnp.pad(x, ((0, pad_c), (0, 0), (0, 0)))
        frame_valid = jnp.pad(frame_valid, ((0, pad_c), (0, 0)))
    wf = cpw * fpc
    xw = x.reshape(n_win, wf, cfg.d_model)
    mw = frame_valid.reshape(n_win, wf)
    h = cfg.encoder_attention_heads
    hd = cfg.d_model // h

    def block(x, lw: ASREncLayerW):
        r = _ln(x, lw.ln1_w, lw.ln1_b)
        q = (r @ lw.wq.T + lw.bq).reshape(n_win, wf, h, hd)
        k = (r @ lw.wk.T + lw.bk).reshape(n_win, wf, h, hd)
        v = (r @ lw.wv.T + lw.bv).reshape(n_win, wf, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (hd ** -0.5)
        logits = jnp.where(mw[:, None, None, :], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
        o = o.reshape(n_win, wf, cfg.d_model).astype(x.dtype)
        x = x + (o @ lw.wo.T + lw.bo)
        r = _ln(x, lw.ln2_w, lw.ln2_b)
        x = x + jax.nn.gelu(r @ lw.fc1_w.T + lw.fc1_b) @ lw.fc2_w.T \
            + lw.fc2_b
        return x, None

    xw, _ = jax.lax.scan(block, xw, w.layers)
    xw = _ln(xw, w.ln_post_w, w.ln_post_b)
    xw = jax.nn.gelu(xw @ w.proj1_w.T + w.proj1_b)
    xw = xw @ w.proj2_w.T + w.proj2_b                   # [n_win, wf, out]
    return xw.reshape(n_win * cpw, fpc, -1)[:n]


def encode_audio(cfg: ASRAudioConfig, w: ASREncoderW,
                 mel: np.ndarray) -> jax.Array:
    """mel [n_mels, T] -> audio embeddings [num_tokens, output_dim]."""
    t = mel.shape[1]
    cs = cfg.chunk_size
    n = -(-t // cs)
    if n == 0:
        return jnp.zeros((0, cfg.output_dim))
    padded = np.zeros((n, cfg.num_mel_bins, cs), np.float32)
    fpc = cfg.cnn_output_length(cs)
    valid = np.zeros((n, fpc), bool)
    out_lens = []
    for i in range(n):
        chunk = mel[:, i * cs:(i + 1) * cs]
        padded[i, :, :chunk.shape[1]] = chunk
        cl = cfg.cnn_output_length(chunk.shape[1])
        valid[i, :cl] = True
        out_lens.append(cl)
    frames = _encode_chunks(cfg, w, jnp.asarray(padded), jnp.asarray(valid))
    return jnp.concatenate(
        [frames[i, :out_lens[i]] for i in range(n)], axis=0)


def init_random_encoder(cfg: ASRAudioConfig, key: jax.Array,
                        dtype=jnp.float32) -> ASREncoderW:
    keys = iter(jax.random.split(key, 16 + 16 * cfg.encoder_layers))

    def r(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    d, ffn = cfg.d_model, cfg.encoder_ffn_dim
    ds = cfg.downsample_hidden_size
    f_out = cfg.num_mel_bins
    for _ in range(3):
        f_out = (f_out + 2 - 3) // 2 + 1

    def layer():
        z = lambda n: jnp.zeros((n,), dtype)  # noqa: E731
        return ASREncLayerW(
            ln1_w=jnp.ones((d,), dtype), ln1_b=z(d),
            wq=r(d, d), bq=z(d), wk=r(d, d), bk=z(d),
            wv=r(d, d), bv=z(d), wo=r(d, d), bo=z(d),
            ln2_w=jnp.ones((d,), dtype), ln2_b=z(d),
            fc1_w=r(ffn, d), fc1_b=z(ffn), fc2_w=r(d, ffn), fc2_b=z(d))

    layers = [layer() for _ in range(cfg.encoder_layers)]
    return ASREncoderW(
        conv1_w=r(3, 3, 1, ds), conv1_b=jnp.zeros((ds,), dtype),
        conv2_w=r(3, 3, ds, ds), conv2_b=jnp.zeros((ds,), dtype),
        conv3_w=r(3, 3, ds, ds), conv3_b=jnp.zeros((ds,), dtype),
        conv_out_w=r(d, ds * f_out),
        layers=jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        ln_post_w=jnp.ones((d,), dtype), ln_post_b=jnp.zeros((d,), dtype),
        proj1_w=r(d, d), proj1_b=jnp.zeros((d,), dtype),
        proj2_w=r(cfg.output_dim, d),
        proj2_b=jnp.zeros((cfg.output_dim,), dtype))


# ---------------------------------------------------------------------------
# Transcriber: engine-backed decode with audio embedding splice
# ---------------------------------------------------------------------------

class Qwen3ASRTranscriber:
    """Audio -> mel(128) -> encoder -> LLM generation via the engine's
    multimodal splice (the reference drives a bespoke per-token decode
    loop, ``qwen3_asr/transcriber.py:39``)."""

    def __init__(self, audio_cfg: ASRAudioConfig, encoder_w: ASREncoderW,
                 engine: Any, tokenizer: Any, audio_token_id: int):
        self.audio_cfg = audio_cfg
        self.encoder_w = encoder_w
        self.engine = engine
        self.tokenizer = tokenizer
        self.audio_token_id = audio_token_id

    def build_prompt_ids(self, num_audio_tokens: int,
                         context: str = "") -> list[int]:
        """ChatML prompt with the audio placeholder run."""
        enc = lambda s: self.tokenizer.encode(  # noqa: E731
            s, add_special_tokens=False)
        ids = enc(f"<|im_start|>system\n{context}<|im_end|>\n"
                  "<|im_start|>user\n<|audio_start|>")
        ids += [self.audio_token_id] * num_audio_tokens
        ids += enc("<|audio_end|><|im_end|>\n<|im_start|>assistant\n")
        return ids

    def transcribe(self, audio, language: Optional[str] = None,
                   task: str = "transcribe", prompt: Optional[str] = None,
                   with_timestamps: bool = False):
        from ..engine.sampling_params import SamplingParams
        from ..multimodal.mrope import MMFeature
        from .audio import load_audio, log_mel_spectrogram
        from .protocol import TranscriptionResult

        if isinstance(audio, str):
            audio = load_audio(audio)
        audio = np.asarray(audio, np.float32)
        mel = log_mel_spectrogram(audio,
                                  n_mels=self.audio_cfg.num_mel_bins)
        embeds = np.asarray(
            encode_audio(self.audio_cfg, self.encoder_w, mel), np.float32)
        n = embeds.shape[0]
        # "linear" feature: grid (n, m, m) -> n tokens with linearly
        # advancing t-axis positions (ASR position streams are identical)
        merge = 2
        feat = MMFeature(offset=-1, grid_thw=(n, merge, merge),
                         embeds=embeds)
        ids = self.build_prompt_ids(n, context=prompt or "")
        out = self.engine.generate(
            [ids], SamplingParams(temperature=0.0,
                                  max_tokens=QWEN3_ASR_MAX_DECODE_TOKENS),
            mm_features=[[feat]])
        (res,) = out.values()
        text = self.tokenizer.decode(res.token_ids)
        return TranscriptionResult(
            text=post_process_output(text), language=language,
            duration=audio.shape[0] / 16000.0)


def post_process_output(text: str) -> str:
    """Strip the <asr_text> tag and chat markers (reference:
    ``qwen3_asr/transcriber.py:75``)."""
    if not text:
        return ""
    if ASR_TEXT_TAG in text:
        _, text = text.rsplit(ASR_TEXT_TAG, 1)
    for marker in ("<|im_end|>", "<|im_start|>", "<|endoftext|>"):
        idx = text.find(marker)
        if idx >= 0:
            text = text[:idx]
    return text.strip()


def load_asr_transcriber(path: str, dtype=jnp.bfloat16,
                         num_blocks: int = 512,
                         max_num_seqs: int = 8) -> Qwen3ASRTranscriber:
    """HF Qwen3-ASR checkpoint dir -> engine-backed transcriber."""
    import json
    import os

    from ..config import (CacheConfig, EngineConfig, ModelConfig,
                          SchedulerConfig)
    from ..engine.engine import LLMEngine
    from ..models.hf_loader import load_hf_model

    acfg, enc_w, meta = load_asr_encoder(path, dtype)
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    text = hf.get("thinker_config", hf).get("text_config", {})
    n_heads = int(text["num_attention_heads"])
    hidden = int(text["hidden_size"])
    head_dim = int(text.get("head_dim", hidden // n_heads))
    cfg = ModelConfig(
        model=path, architecture="qwen3",
        vocab_size=int(text["vocab_size"]),
        hidden_size=hidden,
        intermediate_size=int(text["intermediate_size"]),
        num_layers=int(text["num_hidden_layers"]),
        num_heads=n_heads,
        num_kv_heads=int(text.get("num_key_value_heads", n_heads)),
        head_dim=head_dim,
        rms_norm_eps=float(text.get("rms_norm_eps", 1e-6)),
        rope_theta=float(text.get("rope_theta", 1e6)),
        max_model_len=int(text.get("max_position_embeddings", 32768)),
        tie_word_embeddings=bool(text.get("tie_word_embeddings", False)),
        qk_norm=True,
        # "linear" M-RoPE: all frequencies on the t axis, so audio and
        # text positions advance identically (the reference's equal
        # t/h/w streams, qwen3_asr/model.py:254)
        extra={"mrope_section": [head_dim // 2, 0, 0],
               "image_token_id": int(meta["audio_token_id"])},
    )
    model, weights, _ = load_hf_model(path, dtype, root="thinker.model.",
                                      cfg=cfg)
    model.image_token_id = int(meta["audio_token_id"])
    ecfg = EngineConfig(
        model=cfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=max_num_seqs,
                                  max_num_batched_tokens=2048,
                                  token_buckets=(64, 256, 1024, 2048)))
    engine = LLMEngine(model, weights, ecfg, num_blocks=num_blocks,
                       eos_token_id=int(meta["eos_token_id"]))
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(path, trust_remote_code=True)
    return Qwen3ASRTranscriber(acfg, enc_w, engine, tok,
                               int(meta["audio_token_id"]))


def load_asr_encoder(path: str, dtype=jnp.bfloat16):
    """HF Qwen3-ASR checkpoint -> (audio_cfg, encoder weights, meta).

    Weight roots: ``thinker.audio_tower.*`` (or bare ``audio_tower.*``);
    conv2d weights arrive OIHW and transpose to HWIO.
    """
    import json
    import os

    from ..models.hf_loader import _ShardedReader

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    thinker = hf.get("thinker_config", hf)
    acfg = ASRAudioConfig.from_dict(thinker.get("audio_config", {}))
    meta = {
        "audio_token_id": thinker.get("audio_token_id", 151676),
        "eos_token_id": thinker.get("text_config", {}).get(
            "eos_token_id", hf.get("eos_token_id", 151643)),
    }
    reader = _ShardedReader(path)
    prefix = "thinker.audio_tower." \
        if "thinker.audio_tower.conv2d1.weight" in reader \
        else "audio_tower."

    def arr(key):
        a = reader.get(prefix + key)
        if a.dtype == np.uint16:
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def conv(key):
        return jnp.transpose(arr(key), (2, 3, 1, 0))    # OIHW -> HWIO

    def layer(i):
        p = f"layers.{i}."
        return ASREncLayerW(
            ln1_w=arr(p + "self_attn_layer_norm.weight"),
            ln1_b=arr(p + "self_attn_layer_norm.bias"),
            wq=arr(p + "self_attn.q_proj.weight"),
            bq=arr(p + "self_attn.q_proj.bias"),
            wk=arr(p + "self_attn.k_proj.weight"),
            bk=arr(p + "self_attn.k_proj.bias"),
            wv=arr(p + "self_attn.v_proj.weight"),
            bv=arr(p + "self_attn.v_proj.bias"),
            wo=arr(p + "self_attn.out_proj.weight"),
            bo=arr(p + "self_attn.out_proj.bias"),
            ln2_w=arr(p + "final_layer_norm.weight"),
            ln2_b=arr(p + "final_layer_norm.bias"),
            fc1_w=arr(p + "fc1.weight"), fc1_b=arr(p + "fc1.bias"),
            fc2_w=arr(p + "fc2.weight"), fc2_b=arr(p + "fc2.bias"))

    w = ASREncoderW(
        conv1_w=conv("conv2d1.weight"), conv1_b=arr("conv2d1.bias"),
        conv2_w=conv("conv2d2.weight"), conv2_b=arr("conv2d2.bias"),
        conv3_w=conv("conv2d3.weight"), conv3_b=arr("conv2d3.bias"),
        conv_out_w=arr("conv_out.weight"),
        layers=jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[layer(i) for i in range(acfg.encoder_layers)]),
        ln_post_w=arr("ln_post.weight"), ln_post_b=arr("ln_post.bias"),
        proj1_w=arr("proj1.weight"), proj1_b=arr("proj1.bias"),
        proj2_w=arr("proj2.weight"), proj2_b=arr("proj2.bias"))
    return acfg, w, meta

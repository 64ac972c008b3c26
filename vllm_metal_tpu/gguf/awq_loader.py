# SPDX-License-Identifier: Apache-2.0
"""AWQ (AutoAWQ GEMM) checkpoint loading.

Counterpart of the reference's AWQ path
(``/root/reference/vllm_metal/quant/awq_loader.py``): accepts 4-bit
group-128 zero-point GEMM checkpoints, rejects the same variants the
reference rejects (gemv kernels, bits != 4, group != 128, no zero point),
and repacks into the engine's q4 runtime format (group-32 scales are
replicated from the 128-wide AWQ groups — exact).

AWQ tensor layout (per linear):
  qweight int32 [K, N/8]   8 nibbles per word, AWQ interleaved order
  qzeros  int32 [K/G, N/8] zero points, same packing
  scales  fp16  [K/G, N]
  dequant: w[k, n] = (q[k, n] - z[k//G, n]) * s[k//G, n]
"""

from __future__ import annotations

import json
import logging
import os

import jax.numpy as jnp
import numpy as np

from ..ops.quant_matmul import QuantLinear

logger = logging.getLogger(__name__)

AWQ_GROUP = 128
# physical nibble j of a word holds logical column AWQ_REVERSE[j]
AWQ_REVERSE = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def unpack_awq_words(words: np.ndarray) -> np.ndarray:
    """int32 [..., W] -> uint8 [..., W*8] logical column order."""
    w = words.astype(np.uint32)
    nibbles = np.stack([(w >> (4 * j)) & 0xF for j in range(8)], axis=-1)
    out = np.empty_like(nibbles)
    out[..., AWQ_REVERSE] = nibbles
    return out.reshape(*words.shape[:-1], words.shape[-1] * 8).astype(np.uint8)


def pack_awq_words(cols: np.ndarray) -> np.ndarray:
    """uint8 [..., N] logical -> int32 [..., N/8] AWQ packing (tests)."""
    n = cols.shape[-1]
    c = cols.reshape(*cols.shape[:-1], n // 8, 8).astype(np.uint32)
    phys = c[..., AWQ_REVERSE]
    words = np.zeros(phys.shape[:-1], np.uint32)
    for j in range(8):
        words |= phys[..., j] << (4 * j)
    return words.astype(np.int32)


def validate_awq_config(qcfg: dict) -> None:
    """The reference's entry preflight (awq_loader.py alias/variant rules)."""
    norm = {k.lower(): v for k, v in qcfg.items()}
    bits = norm.get("w_bit", norm.get("bits"))
    group = norm.get("q_group_size", norm.get("group_size"))
    version = str(norm.get("version", "gemm")).lower()
    zero_point = norm.get("zero_point", True)
    if bits != 4:
        raise ValueError(f"AWQ: only 4-bit supported, got bits={bits}")
    if group != AWQ_GROUP:
        raise ValueError(f"AWQ: only group_size=128 supported, got {group}")
    if version != "gemm":
        raise ValueError(f"AWQ: only GEMM kernels supported, got {version!r}")
    if not zero_point:
        raise ValueError("AWQ: zero_point=False checkpoints unsupported")


def awq_to_quant_linear(qweight: np.ndarray, qzeros: np.ndarray,
                        scales: np.ndarray) -> QuantLinear:
    """Exact repack into the engine q4 format ([N, K/2] half-split)."""
    k, n8 = qweight.shape
    n = n8 * 8
    q = unpack_awq_words(qweight)                     # [K, N]
    z = unpack_awq_words(qzeros)                      # [K/G, N]
    s = np.asarray(scales, np.float32)                # [K/G, N]

    # half-split nibble packing into the transposed "kn" layout
    # (byte row r = elem r | elem r+K/2 << 4)
    half = k // 2
    packed = (q[:half, :] | (q[half:, :] << 4)).astype(np.uint8)
    # replicate 128-wide groups to the kernel's group-32 granularity
    rep = AWQ_GROUP // 32
    s32 = np.repeat(s, rep, axis=0)                   # [K/32, N]
    b32 = np.repeat(-z.astype(np.float32) * s, rep, axis=0)
    return QuantLinear(
        kind="q4", w=jnp.asarray(packed),
        scales=jnp.asarray(s32.astype(np.float32), jnp.bfloat16),
        biases=jnp.asarray(b32.astype(np.float32), jnp.bfloat16),
        group_size=32)


def load_awq_model(path: str, dtype=jnp.bfloat16):
    """HF AutoAWQ checkpoint dir -> (model, weights, cfg)."""
    from ..models.hf_loader import config_from_hf, _ShardedReader
    from ..models.llama import LlamaLayerWeights, LlamaWeights
    from ..models.registry import get_model_class

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    qcfg = hf.get("quantization_config", {})
    validate_awq_config(qcfg)
    cfg = config_from_hf(path)
    reader = _ShardedReader(path)

    def arr(key):
        a = reader.get(key)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def awq_lin(prefix: str) -> QuantLinear:
        return awq_to_quant_linear(
            np.asarray(reader.get(prefix + ".qweight")),
            np.asarray(reader.get(prefix + ".qzeros")),
            np.asarray(reader.get(prefix + ".scales")))

    def opt(key, fn):
        return fn(key) if key in reader else None

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append(LlamaLayerWeights(
            attn_norm=arr(p + "input_layernorm.weight"),
            wq=awq_lin(p + "self_attn.q_proj"),
            wk=awq_lin(p + "self_attn.k_proj"),
            wv=awq_lin(p + "self_attn.v_proj"),
            wo=awq_lin(p + "self_attn.o_proj"),
            mlp_norm=arr(p + "post_attention_layernorm.weight"),
            gate=awq_lin(p + "mlp.gate_proj"),
            up=awq_lin(p + "mlp.up_proj"),
            down=awq_lin(p + "mlp.down_proj"),
            q_norm=opt(p + "self_attn.q_norm.weight", arr),
            k_norm=opt(p + "self_attn.k_norm.weight", arr),
            bq=opt(p + "self_attn.q_proj.bias", arr),
            bk=opt(p + "self_attn.k_proj.bias", arr),
            bv=opt(p + "self_attn.v_proj.bias", arr),
        ))

    weights = LlamaWeights(
        embedding=QuantLinear.dense(arr("model.embed_tokens.weight")),
        layers=layers,
        final_norm=arr("model.norm.weight"),
        lm_head=opt("lm_head.weight",
                    lambda k: QuantLinear.dense(arr(k))),
    )
    model = get_model_class(cfg.architecture)(cfg)
    return model, weights, cfg

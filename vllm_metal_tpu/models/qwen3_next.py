# SPDX-License-Identifier: Apache-2.0
"""Qwen3-Next-style hybrid transformer: GDN linear-attention layers
interleaved with full-attention layers (every ``full_attention_interval``-th
layer is full attention, the reference's layer classification —
``/root/reference/vllm_metal/attention/runtime/hybrid.py:122-128``).

Attention layers are Llama-shaped plus the Qwen3-Next output gate
(``out = o_proj(attn * sigmoid(gate(h)))``); GDN layers follow the
decomposition in ``ops/gdn.py``.  FFN is dense (the MoE variant plugs into
the same layer skeleton; tracked follow-up).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.gdn import (compute_g, conv1d_varlen, gdn_recurrent_varlen,
                       l2_scale_norm)
from ..ops.quant_matmul import QuantLinear, linear
from ..utils import static_dataclass
from .common import activation, apply_rope, embed_lookup, rms_norm, \
    rope_frequencies
from .llama import LlamaLayerWeights
from .registry import register_model


@static_dataclass()
class Q3NAttnLayerWeights(LlamaLayerWeights):
    wg: Optional[QuantLinear] = None       # output gate projection
    moe: Optional[Any] = None              # MoE FFN (None = dense)


@static_dataclass()
class GDNLayerWeights:
    norm: jax.Array
    in_qkv: QuantLinear                    # [2*Hk*Dk + Hv*Dv, H]
    in_z: QuantLinear                      # [Hv*Dv, H]
    in_a: QuantLinear                      # [Hv, H]
    in_b: QuantLinear                      # [Hv, H]
    conv_w: jax.Array                      # [conv_dim, conv_k]
    conv_b: Optional[jax.Array]
    a_log: jax.Array                       # [Hv]
    dt_bias: jax.Array                     # [Hv]
    out_norm: jax.Array                    # [Dv] gated-RMSNorm weight
    out_proj: QuantLinear                  # [H, Hv*Dv]
    mlp_norm: jax.Array
    gate: Optional[QuantLinear]
    up: Optional[QuantLinear]
    down: Optional[QuantLinear]
    moe: Optional[Any] = None              # MoE FFN (None = dense)


@static_dataclass()
class Q3NWeights:
    embedding: QuantLinear
    layers: list
    final_norm: jax.Array
    lm_head: Optional[QuantLinear]


@register_model("qwen3_next", "qwen3next")
class Qwen3NextModel:
    def __init__(self, cfg: ModelConfig, tp: Any = None):
        from ..parallel.shardings import TPContext
        self.cfg = cfg
        self.tp = tp or TPContext()
        x = cfg.extra
        self.interval = x["full_attention_interval"]
        self.hk = x["gdn_k_heads"]
        self.dk = x["gdn_k_dim"]
        self.hv = x["gdn_v_heads"]
        self.dv = x["gdn_v_dim"]
        self.conv_k = x.get("gdn_conv_k", 4)
        self.conv_dim = 2 * self.hk * self.dk + self.hv * self.dv
        # Qwen3-Next ropes only the leading partial_rotary_factor of the
        # head dim (HF modeling_qwen3_next.py apply_rotary_pos_emb)
        rot_dim = int(cfg.head_dim * x.get("partial_rotary_factor", 1.0))
        self.inv_freq = rope_frequencies(
            rot_dim, cfg.rope_theta, cfg.rope_scaling)
        self.act = activation(cfg.hidden_act)

    def is_attention_layer(self, i: int) -> bool:
        return (i + 1) % self.interval == 0

    # ------------------------------------------------------------------
    def init_random(self, key: jax.Array, dtype=jnp.float32) -> Q3NWeights:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 24 * cfg.num_layers + 8))

        def dense(shape, scale=0.02):
            return QuantLinear.dense(
                (jax.random.normal(next(keys), shape, jnp.float32)
                 * scale).astype(dtype))

        def arr(shape, scale=0.02):
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * scale).astype(dtype)

        h = cfg.hidden_size
        layers = []
        for i in range(cfg.num_layers):
            if self.is_attention_layer(i):
                layers.append(Q3NAttnLayerWeights(
                    attn_norm=jnp.ones((h,), dtype),
                    wq=dense((cfg.q_dim, h)),
                    wk=dense((cfg.kv_dim, h)),
                    wv=dense((cfg.kv_dim, h)),
                    wo=dense((h, cfg.q_dim)),
                    mlp_norm=jnp.ones((h,), dtype),
                    gate=dense((cfg.intermediate_size, h)),
                    up=dense((cfg.intermediate_size, h)),
                    down=dense((h, cfg.intermediate_size)),
                    q_norm=jnp.ones((cfg.head_dim,), dtype),
                    k_norm=jnp.ones((cfg.head_dim,), dtype),
                    wg=dense((cfg.q_dim, h)),
                ))
            else:
                layers.append(GDNLayerWeights(
                    norm=jnp.ones((h,), dtype),
                    in_qkv=dense((self.conv_dim, h)),
                    in_z=dense((self.hv * self.dv, h)),
                    in_a=dense((self.hv, h)),
                    in_b=dense((self.hv, h)),
                    conv_w=arr((self.conv_dim, self.conv_k), 0.3),
                    conv_b=arr((self.conv_dim,), 0.05),
                    a_log=arr((self.hv,), 0.5),
                    dt_bias=arr((self.hv,), 0.5),
                    out_norm=jnp.ones((self.dv,), dtype),
                    out_proj=dense((h, self.hv * self.dv)),
                    mlp_norm=jnp.ones((h,), dtype),
                    gate=dense((cfg.intermediate_size, h)),
                    up=dense((cfg.intermediate_size, h)),
                    down=dense((h, cfg.intermediate_size)),
                ))
        return Q3NWeights(
            embedding=dense((cfg.vocab_size, h)),
            layers=layers,
            final_norm=jnp.ones((h,), dtype),
            lm_head=dense((cfg.vocab_size, h)),
        )

    # ------------------------------------------------------------------
    def embed(self, weights, ids):
        return self.tp.embed(weights.embedding, ids, embed_lookup,
                             self.cfg.vocab_size)

    def _attn_layer(self, lw, x, positions, runtime, attn_pos):
        cfg = self.cfg
        t = x.shape[0]
        h = rms_norm(x, lw.attn_norm, cfg.rms_norm_eps)
        q = linear(h, lw.wq).reshape(t, -1, cfg.head_dim)
        k = linear(h, lw.wk).reshape(t, -1, cfg.head_dim)
        v = linear(h, lw.wv).reshape(t, -1, cfg.head_dim)
        if lw.q_norm is not None:
            q = rms_norm(q, lw.q_norm, cfg.rms_norm_eps)
            k = rms_norm(k, lw.k_norm, cfg.rms_norm_eps)
        q = apply_rope(q, positions, self.inv_freq)
        k = apply_rope(k, positions, self.inv_freq)
        out = runtime.attend_hybrid(attn_pos, q, k, v)
        out = out.reshape(t, -1)
        if lw.wg is not None:
            out = out * jax.nn.sigmoid(
                linear(h, lw.wg).astype(jnp.float32)).astype(out.dtype)
        x = x + self.tp.reduce(linear(out, lw.wo))
        return self._mlp(lw, x)

    def _gdn_layer(self, lw: GDNLayerWeights, x, runtime, gdn_pos):
        cfg = self.cfg
        t = x.shape[0]
        md = runtime.md
        h = rms_norm(x, lw.norm, cfg.rms_norm_eps)
        qkv = linear(h, lw.in_qkv)                     # [T, conv_dim]
        z = linear(h, lw.in_z)                         # [T, Hv*Dv]
        a = linear(h, lw.in_a, out_dtype=jnp.float32)  # [T, Hv]
        b = linear(h, lw.in_b, out_dtype=jnp.float32)

        conv_state, rec_state = runtime.gdn_state(gdn_pos)
        seq_slots = md.seq_state_slots
        local_idx = jnp.arange(t) - md.query_start_loc[md.token_seq_ids]
        valid = md.slot_mapping >= 0

        conv_out, new_conv = conv1d_varlen(
            qkv, lw.conv_w, lw.conv_b, conv_state, md.token_seq_ids,
            local_idx, seq_slots, md.query_start_loc, md.num_tokens)

        kd = self.hk * self.dk
        q = conv_out[:, :kd].reshape(t, self.hk, self.dk)
        k = conv_out[:, kd:2 * kd].reshape(t, self.hk, self.dk)
        v = conv_out[:, 2 * kd:].reshape(t, self.hv, self.dv)
        inv_scale = self.dk ** -0.5
        q = l2_scale_norm(q, inv_scale ** 2)
        k = l2_scale_norm(k, inv_scale)

        g = compute_g(lw.a_log, a, lw.dt_bias)
        beta = jax.nn.sigmoid(b)

        from ..ops.gdn_kernel import gdn_decode_supported
        if md.pure_decode and runtime.backend.use_pallas \
                and gdn_decode_supported(self.hv, self.dv, self.dk):
            # decode: every token is a different request, so the state
            # updates are batch-parallel — one Pallas grid step per token
            # updates that request's state row in place (the role of the
            # reference's gdn_recurrent_decode.metal).
            rep = self.hv // self.hk
            qx = jnp.repeat(q, rep, axis=1)
            kx = jnp.repeat(k, rep, axis=1)
            runtime.set_gdn_conv(gdn_pos, new_conv)
            y = runtime.gdn_decode_update(gdn_pos, qx, kx, v, g, beta)
        else:
            # Prefill: the token-sequential scan is the fast path on
            # TPU — XLA keeps the recurrent carry VMEM-resident across
            # lax.scan iterations, so 2048 prefill tokens cost ~0.2ms
            # (measured v5e, Hv=32 Dv=Dk=128) — 700x faster than the
            # chunked UT-transform (ops/gdn.py::gdn_chunked_varlen),
            # whose per-token state gathers stream ~400MB/chunk from
            # HBM.  The reference needed custom sequential Metal
            # kernels for the same effect (gdn_recurrent_*.metal).
            y, new_rec = gdn_recurrent_varlen(
                q, k, v, g, beta, rec_state, md.token_seq_ids, seq_slots,
                valid)
            runtime.set_gdn_state(gdn_pos, new_conv, new_rec)

        yh = y.reshape(t, self.hv, self.dv)
        zh = z.reshape(t, self.hv, self.dv)
        out = rms_norm(yh, lw.out_norm, cfg.rms_norm_eps) \
            * jax.nn.silu(zh.astype(jnp.float32)).astype(yh.dtype)
        x = x + self.tp.reduce(linear(out.reshape(t, -1), lw.out_proj))
        return self._mlp(lw, x)

    def _mlp(self, lw, x):
        h = rms_norm(x, lw.mlp_norm, self.cfg.rms_norm_eps)
        if getattr(lw, "moe", None) is not None:
            from .moe import moe_ffn
            return x + self.tp.reduce(moe_ffn(h, lw.moe, self.act,
                                              tp=self.tp))
        y = self.act(linear(h, lw.gate).astype(jnp.float32)).astype(h.dtype) \
            * linear(h, lw.up)
        return x + self.tp.reduce(linear(y, lw.down))

    def forward_hidden(self, weights, token_ids, positions, runtime,
                       lora_fn=None, mm_embeds=None, mm_rows=None):
        assert mm_embeds is None, "hybrid GDN models have no mm path"
        x = self.embed(weights, token_ids)
        attn_pos = 0
        gdn_pos = 0
        for i, lw in enumerate(weights.layers):
            if self.is_attention_layer(i):
                x = self._attn_layer(lw, x, positions, runtime, attn_pos)
                attn_pos += 1
            else:
                x = self._gdn_layer(lw, x, runtime, gdn_pos)
                gdn_pos += 1
        return rms_norm(x, weights.final_norm, self.cfg.rms_norm_eps)

    def logits(self, weights, hidden):
        head = weights.lm_head if weights.lm_head is not None \
            else weights.embedding
        return self.tp.gather_logits(
            linear(hidden, head, out_dtype=jnp.float32))

    def forward(self, weights, token_ids, positions, runtime):
        return self.logits(
            weights,
            self.forward_hidden(weights, token_ids, positions, runtime))

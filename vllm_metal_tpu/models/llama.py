# SPDX-License-Identifier: Apache-2.0
"""Llama-family transformer (Llama 1-3, Qwen2/2.5, Qwen3, Mistral).

Pure-functional forward over a pytree of (quantized) weights.  Attention is
dependency-injected: the model computes projected/roped q, k, v for each
layer and calls ``attn_fn(layer_idx, q, k, v)``, which may run dense causal
attention (tests, prefill-only) or the paged runtime.  This replaces the
reference's monkey-patching of mlx_lm attention modules
(``/root/reference/vllm_metal/attention/impls/sdpa_wrapper.py:185``) with an
explicit functional seam.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.quant_matmul import QuantLinear, linear
from ..parallel.shardings import TPContext
from ..utils import static_dataclass
from .common import activation, apply_rope, embed_lookup, rms_norm, \
    rope_frequencies
from .registry import register_model

# attn_fn(layer_idx, q[T,Hq,D], k[T,Hk,D], v[T,Hk,D]) -> [T,Hq,D]
AttnFn = Callable[[int, jax.Array, jax.Array, jax.Array], jax.Array]


@static_dataclass()
class LlamaLayerWeights:
    attn_norm: jax.Array
    wq: QuantLinear
    wk: QuantLinear
    wv: QuantLinear
    wo: QuantLinear
    mlp_norm: jax.Array
    gate: QuantLinear
    up: QuantLinear
    down: QuantLinear
    q_norm: Optional[jax.Array] = None     # qwen3 per-head RMSNorm [head_dim]
    k_norm: Optional[jax.Array] = None
    bq: Optional[jax.Array] = None         # qwen2 attention biases
    bk: Optional[jax.Array] = None
    bv: Optional[jax.Array] = None
    # per-head attention sink logits (GPT-OSS style), [num_heads]
    sinks: Optional[jax.Array] = None
    # fused projections (single-chip fast path): each Pallas matmul call
    # carries ~50-100us fixed overhead on v5e, so wq|wk|wv and gate|up
    # concatenate along N (7 -> 4 kernel calls per layer).  Built by
    # fuse_projections(); mutually exclusive with the split fields.
    wqkv: Optional[QuantLinear] = None
    wgu: Optional[QuantLinear] = None


@static_dataclass()
class LlamaWeights:
    embedding: QuantLinear                 # [V, H]
    layers: list[LlamaLayerWeights]
    final_norm: jax.Array
    lm_head: Optional[QuantLinear]         # None = tied to embedding


@register_model("llama", "llama2", "llama3", "mistral", "qwen2", "qwen3",
                "ernie4_5")
class LlamaModel:
    """Stateless model: all state (weights, KV) is passed explicitly."""

    def __init__(self, cfg: ModelConfig, tp: Optional[TPContext] = None):
        self.cfg = cfg
        self.tp = tp or TPContext()
        self.inv_freq = rope_frequencies(
            cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
        self.act = activation(cfg.hidden_act)
        # multimodal 3-axis rope (Qwen-VL family); None = plain rope
        sec = cfg.extra.get("mrope_section")
        self.mrope_sections = tuple(sec) if sec else None
        self.mrope_interleaved = bool(cfg.extra.get("mrope_interleaved"))
        # GLM/ERNIE-style interleaved-PAIR rotation (full dim, f32)
        self.rope_pairs = bool(cfg.extra.get("rope_interleaved_pairs"))

    # -- weight init (tests) ------------------------------------------------
    def init_random(self, key: jax.Array, dtype=jnp.bfloat16) -> LlamaWeights:
        cfg = self.cfg
        keys = iter(jax.random.split(key, 4 + 16 * cfg.num_layers))

        def dense(shape, scale=0.02):
            return QuantLinear.dense(
                (jax.random.normal(next(keys), shape, jnp.float32)
                 * scale).astype(dtype))

        layers = []
        h, q_dim, kv_dim = cfg.hidden_size, cfg.q_dim, cfg.kv_dim
        for _ in range(cfg.num_layers):
            layers.append(LlamaLayerWeights(
                attn_norm=jnp.ones((h,), dtype),
                wq=dense((q_dim, h)),
                wk=dense((kv_dim, h)),
                wv=dense((kv_dim, h)),
                wo=dense((h, q_dim)),
                mlp_norm=jnp.ones((h,), dtype),
                gate=dense((cfg.intermediate_size, h)),
                up=dense((cfg.intermediate_size, h)),
                down=dense((h, cfg.intermediate_size)),
                q_norm=jnp.ones((cfg.head_dim,), dtype) if cfg.qk_norm else None,
                k_norm=jnp.ones((cfg.head_dim,), dtype) if cfg.qk_norm else None,
            ))
        return LlamaWeights(
            embedding=dense((cfg.vocab_size, h)),
            layers=layers,
            final_norm=jnp.ones((h,), dtype),
            lm_head=None if cfg.tie_word_embeddings else dense((cfg.vocab_size, h)),
        )

    # -- forward ------------------------------------------------------------
    def embed(self, weights: LlamaWeights, token_ids: jax.Array) -> jax.Array:
        x = self.tp.embed(weights.embedding, token_ids, embed_lookup,
                          self.cfg.vocab_size)
        if self.cfg.scale_embeddings:
            x = x * jnp.asarray(self.cfg.hidden_size ** 0.5, x.dtype)
        return x

    def layer_qkv(self, lw: LlamaLayerWeights, x: jax.Array,
                  positions: jax.Array, lora=None, rope_cs=None):
        """Project + norm + rope one layer's q, k, v from hidden x [T, H].

        ``lora``: optional callable (target_name, x) -> delta (multi-LoRA).
        ``rope_cs``: optional hoisted :func:`rope_cos_sin` pair (positions
        are layer-invariant; the forward loop computes it once).
        """
        cfg = self.cfg
        t = x.shape[0]
        if lw.wqkv is not None and lora is None:
            # single-chip fused path: attn_norm runs as the matmul
            # kernel's prologue (no standalone norm kernel/round-trip)
            qkv = linear(x, lw.wqkv,
                         prep=("rms", lw.attn_norm, cfg.rms_norm_eps))
            nq, nkv = cfg.q_dim, cfg.kv_dim
            q = qkv[:, :nq]
            k = qkv[:, nq:nq + nkv]
            v = qkv[:, nq + nkv:]
        else:
            h = rms_norm(x, lw.attn_norm, cfg.rms_norm_eps)
            if lw.wqkv is not None:
                qkv = linear(h, lw.wqkv)
                nq, nkv = cfg.q_dim, cfg.kv_dim
                q = qkv[:, :nq]
                k = qkv[:, nq:nq + nkv]
                v = qkv[:, nq + nkv:]
            else:
                q = linear(h, lw.wq)
                k = linear(h, lw.wk)
                v = linear(h, lw.wv)
            if lora is not None:
                q = q + lora("wq", h)
                k = k + lora("wk", h)
                v = v + lora("wv", h)
        if lw.bq is not None:
            q = q + lw.bq.astype(q.dtype)
            k = k + lw.bk.astype(k.dtype)
            v = v + lw.bv.astype(v.dtype)
        # -1: head counts are per-shard under tensor parallelism
        q = q.reshape(t, -1, cfg.head_dim)
        k = k.reshape(t, -1, cfg.head_dim)
        v = v.reshape(t, -1, cfg.head_dim)
        if lw.q_norm is not None:
            q = rms_norm(q, lw.q_norm, cfg.rms_norm_eps)
            k = rms_norm(k, lw.k_norm, cfg.rms_norm_eps)
        if positions.ndim == 2:     # [3, T] multimodal axes
            from .common import apply_mrope
            assert self.mrope_sections is not None, \
                "2-D positions need cfg.extra['mrope_section']"
            q = apply_mrope(q, positions, self.inv_freq,
                            self.mrope_sections, self.mrope_interleaved,
                            pairs=self.rope_pairs)
            k = apply_mrope(k, positions, self.inv_freq,
                            self.mrope_sections, self.mrope_interleaved,
                            pairs=self.rope_pairs)
        elif self.rope_pairs:
            from .common import apply_rope_pairs
            q = apply_rope_pairs(q, positions, self.inv_freq)
            k = apply_rope_pairs(k, positions, self.inv_freq)
        else:
            q = apply_rope(q, positions, self.inv_freq, cos_sin=rope_cs)
            k = apply_rope(k, positions, self.inv_freq, cos_sin=rope_cs)
        return q, k, v

    def layer_post_attn(self, lw: LlamaLayerWeights, x: jax.Array,
                        attn_out: jax.Array, lora=None) -> jax.Array:
        """Residual add + MLP for one layer. attn_out: [T, Hq, D]."""
        t = x.shape[0]
        ao = attn_out.reshape(t, -1)
        if lw.wgu is not None and lora is None and not self.tp.enabled:
            # single-chip fused chain: residual adds ride the matmul
            # epilogues, mlp_norm and swiglu the prologues — three
            # matmul kernels cover the whole post-attention half
            x = linear(ao, lw.wo, res=x)
            gu = linear(x, lw.wgu,
                        prep=("rms", lw.mlp_norm, self.cfg.rms_norm_eps))
            return linear(gu, lw.down,
                          prep=("swiglu", self.cfg.hidden_act), res=x)
        o = linear(ao, lw.wo)
        if lora is not None:
            o = o + lora("wo", ao)
        x = x + self.tp.reduce(o)
        h = rms_norm(x, lw.mlp_norm, self.cfg.rms_norm_eps)
        if lw.wgu is not None:         # single-chip fused path
            gu = linear(h, lw.wgu)
            half = gu.shape[-1] // 2
            gate, up = gu[:, :half], gu[:, half:]
        else:
            gate = linear(h, lw.gate)
            up = linear(h, lw.up)
        if lora is not None:
            gate = gate + lora("gate", h)
            up = up + lora("up", h)
        y = self.act(gate.astype(jnp.float32)).astype(h.dtype) * up
        down = linear(y, lw.down)
        if lora is not None:
            down = down + lora("down", y)
        return x + self.tp.reduce(down)

    @staticmethod
    def splice_mm(x: jax.Array, mm_embeds: jax.Array,
                  mm_rows: jax.Array) -> jax.Array:
        """Write vision embeddings into placeholder rows of x [T, H].

        ``mm_rows`` [M] int32 (-1 = pad); pad rows scatter out of bounds
        and are dropped (the reference's splice raises on count mismatch,
        ``/root/reference/vllm_metal/multimodal/embeddings.py:39``; here
        padding is first-class because batches are bucketed).
        """
        rows = jnp.where(mm_rows >= 0, mm_rows, x.shape[0])
        return x.at[rows].set(mm_embeds.astype(x.dtype), mode="drop")

    def forward_hidden(self, weights: LlamaWeights, token_ids: jax.Array,
                       positions: jax.Array, attn_fn: AttnFn,
                       lora_fn=None, mm_embeds=None,
                       mm_rows=None) -> jax.Array:
        """token_ids [T] -> final hidden states [T, H] (pre-norm applied).

        ``lora_fn``: optional callable layer_idx -> (name, x) -> delta.
        ``mm_embeds``/``mm_rows``: optional vision-embedding splice
        (placeholder rows replaced after token embedding).
        When ``weights.layers`` is a stacked LlamaLayerWeights (leaves
        [L, ...]) the layers run under lax.scan — one compiled layer body
        instead of an unrolled graph (the net-new compile-time design the
        reference never needed, SURVEY.md §7 "hard parts").
        """
        if not isinstance(weights.layers, (list, tuple)):
            return self._forward_scan(weights, token_ids, positions,
                                      attn_fn, lora_fn,
                                      mm_embeds=mm_embeds, mm_rows=mm_rows)
        x = self.embed(weights, token_ids)
        if mm_embeds is not None:
            x = self.splice_mm(x, mm_embeds, mm_rows)
        rope_cs = self._rope_cs(positions)
        for i, lw in enumerate(weights.layers):
            lora = lora_fn(i) if lora_fn is not None else None
            q, k, v = self.layer_qkv(lw, x, positions, lora=lora,
                                     rope_cs=rope_cs)
            attn_out = attn_fn(i, q, k, v)
            x = self.layer_post_attn(lw, x, attn_out, lora=lora)
        return rms_norm(x, weights.final_norm, self.cfg.rms_norm_eps)

    def _rope_cs(self, positions):
        """Hoisted per-step rope tables (None for mrope/pairs variants,
        which compute their own)."""
        if positions.ndim != 1 or self.rope_pairs:
            return None
        from .common import rope_cos_sin
        return rope_cos_sin(positions, self.inv_freq)

    def _forward_scan(self, weights, token_ids, positions, runtime,
                      lora_fn=None, mm_embeds=None, mm_rows=None
                      ) -> jax.Array:
        """lax.scan over the layer INDEX; stacked weights stay closure-
        captured scan constants.  QuantLinear leaves are selected lazily via
        ``at_layer(i)`` — the Pallas matmul kernels index the stacked [L,...]
        arrays with a prefetched scalar, so per-layer weights are DMA'd
        tile-by-tile from HBM instead of being materialized by scan's
        dynamic-slice (which costs a full weight-size HBM copy per layer).
        Small leaves (norms, biases, sinks) are dynamic-indexed normally.
        The KV cache rides the carry so updates stay in-place across
        iterations (XLA while-loop aliasing).  Requires a uniform per-layer
        config (no alternating windows) and the StepRuntime attention seam
        (not a bare attn_fn)."""
        cfg = self.cfg
        assert cfg.sliding_window_pattern is None, \
            "scan path needs a uniform sliding-window config"
        backend = runtime.backend
        md = runtime.md
        x = self.embed(weights, token_ids)
        if mm_embeds is not None:
            x = self.splice_mm(x, mm_embeds, mm_rows)
        cache0 = runtime.final_cache()
        stacked = weights.layers
        is_ql = lambda leaf: isinstance(leaf, QuantLinear)  # noqa: E731

        def select_layer(i):
            def sel(leaf):
                if isinstance(leaf, QuantLinear):
                    return leaf.at_layer(i)
                return jax.lax.dynamic_index_in_dim(leaf, i, 0,
                                                    keepdims=False)
            return jax.tree.map(sel, stacked, is_leaf=is_ql)

        rope_cs = self._rope_cs(positions)

        def body(carry, i):
            x, cache = carry
            lw = select_layer(i)
            lora = lora_fn(i) if lora_fn is not None else None
            q, k, v = self.layer_qkv(lw, x, positions, lora=lora,
                                     rope_cs=rope_cs)
            sinks = getattr(lw, "sinks", None)
            out, cache = runtime.attend_carry(i, q, k, v, cache, sinks)
            x = self.layer_post_attn(lw, x, out, lora=lora)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(
            body, (x, cache0), jnp.arange(cfg.num_layers, dtype=jnp.int32))
        runtime._cell[0] = cache
        return rms_norm(x, weights.final_norm, cfg.rms_norm_eps)

    @classmethod
    def fuse_projections(cls, weights: LlamaWeights) -> LlamaWeights:
        """Concat wq|wk|wv and gate|up along N (single-chip fast path).

        Only valid when this class's layer_qkv / layer_post_attn run
        (subclasses that override them keep split weights), and not
        under TP (a contiguous column shard would slice across the
        q/k/v boundary).  The runner applies this automatically.
        """
        import dataclasses

        def cat(lins):
            if any(li is None for li in lins):
                return None
            kinds = {li.kind for li in lins}
            layouts = {li.layout for li in lins}
            if len(kinds) != 1 or (layouts != {"kn"}
                                   and kinds != {"dense"}):
                return None
            if len({str(jax.tree.structure(li)) for li in lins}) != 1:
                return None    # e.g. mixed biased/unbiased quant groups

            def catleaf(*xs):
                axis = 0 if lins[0].kind == "dense" else -1
                return jnp.concatenate(xs, axis=axis)

            return jax.tree.map(catleaf, *lins)

        fuse_qkv = cls.layer_qkv is LlamaModel.layer_qkv
        fuse_gu = cls.layer_post_attn is LlamaModel.layer_post_attn
        layers = []
        for lw in weights.layers:
            wqkv = cat([lw.wq, lw.wk, lw.wv]) if fuse_qkv \
                and lw.bq is None and lw.wqkv is None else lw.wqkv
            wgu = cat([lw.gate, lw.up]) if fuse_gu \
                and lw.wgu is None else lw.wgu
            layers.append(dataclasses.replace(
                lw,
                wqkv=wqkv, wgu=wgu,
                wq=None if wqkv is not None else lw.wq,
                wk=None if wqkv is not None else lw.wk,
                wv=None if wqkv is not None else lw.wv,
                gate=None if wgu is not None else lw.gate,
                up=None if wgu is not None else lw.up,
            ))
        return dataclasses.replace(weights, layers=layers)

    @staticmethod
    def stack_layers(weights: LlamaWeights) -> LlamaWeights:
        """Stack per-layer weight trees into leading-[L] leaves (scan)."""
        import dataclasses
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *weights.layers)
        return dataclasses.replace(weights, layers=stacked)

    def logits(self, weights: LlamaWeights, hidden: jax.Array) -> jax.Array:
        head = weights.lm_head if weights.lm_head is not None \
            else weights.embedding
        out = self.tp.gather_logits(linear(hidden, head, out_dtype=jnp.float32))
        if self.cfg.logit_softcap:
            c = self.cfg.logit_softcap
            out = jnp.tanh(out / c) * c
        return out

    def forward(self, weights: LlamaWeights, token_ids: jax.Array,
                positions: jax.Array, attn_fn: AttnFn) -> jax.Array:
        """token_ids [T] -> logits [T, V]."""
        return self.logits(
            weights, self.forward_hidden(weights, token_ids, positions, attn_fn))


def dense_causal_attn(cfg: ModelConfig) -> AttnFn:
    """Simple full causal attention for tests / no-cache prefill.

    Assumes a single contiguous sequence (positions 0..T-1).
    """

    def attn(layer_idx: int, q: jax.Array, k: jax.Array,
             v: jax.Array) -> jax.Array:
        from .common import yarn_attention_factor
        t, hq, d = q.shape
        hk = k.shape[1]
        rep = hq // hk
        kx = jnp.repeat(k, rep, axis=1)
        vx = jnp.repeat(v, rep, axis=1)
        scale = cfg.extra.get("attn_scale", d ** -0.5) \
            * yarn_attention_factor(cfg.rope_scaling)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            kx.astype(jnp.float32)) * scale
        if cfg.attn_logit_softcap:
            c = cfg.attn_logit_softcap
            logits = jnp.tanh(logits / c) * c
        mask = jnp.tril(jnp.ones((t, t), bool))
        w = cfg.layer_sliding_window(layer_idx)
        if w is not None:
            rows = jnp.arange(t)[:, None]
            cols = jnp.arange(t)[None, :]
            mask = mask & (cols > rows - w)
        logits = jnp.where(mask[None], logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,khd->qhd", p, vx.astype(jnp.float32))
        return out.astype(q.dtype)

    return attn

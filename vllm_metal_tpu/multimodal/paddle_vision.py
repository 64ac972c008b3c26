# SPDX-License-Identifier: Apache-2.0
"""PaddleOCR-VL NaViT vision tower (functional JAX).

The reference adapts mlx-vlm's PaddleOCR-VL composite
(``/root/reference/vllm_metal/multimodal/paddleocr_vl/adapter.py`` — pure
glue; the tower math lives in the external package).  Here the tower is
owned in-repo, per the published architecture: a SigLIP-so400m-shaped
encoder (patch conv, LEARNED position embeddings bilinearly interpolated
to each image's patch grid, pre-LN blocks with biased qkv/out and
gelu-tanh MLP) extended NaViT-style with dynamic resolution + 2-D rotary
positions, followed by a spatial-merge projector into the language
model's hidden size.

Validation status: layer math follows the published architecture and is
covered by shape/packing/pos-interp invariant tests; real-checkpoint
activation parity is environment-blocked (zero egress — no public
checkpoint on disk) and queued behind the protocol in
``docs/validation.md``, like the GGUF golden tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import static_dataclass


@static_dataclass(meta_fields=["depth", "embed_dim", "num_heads",
                               "intermediate_size", "patch_size",
                               "spatial_merge_size", "in_channels",
                               "hidden_size", "num_pos", "ln_eps"],
                  frozen=True)
class PaddleVisionConfig:
    depth: int = 27
    embed_dim: int = 1152
    num_heads: int = 16
    intermediate_size: int = 4304
    patch_size: int = 14
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_size: int = 1024            # language-model hidden size
    num_pos: int = 729                 # learned positions (27x27 grid)
    ln_eps: float = 1e-6
    # keep the engine's mm admission happy (vision.py parity)
    temporal_patch_size: int = 1

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size ** 2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @classmethod
    def from_hf(cls, vc: dict, hidden_size: int) -> "PaddleVisionConfig":
        return cls(
            depth=int(vc.get("num_hidden_layers", 27)),
            embed_dim=int(vc.get("hidden_size", 1152)),
            num_heads=int(vc.get("num_attention_heads", 16)),
            intermediate_size=int(vc.get("intermediate_size", 4304)),
            patch_size=int(vc.get("patch_size", 14)),
            spatial_merge_size=int(vc.get("spatial_merge_size", 2)),
            hidden_size=hidden_size,
            num_pos=int(vc.get("num_position_embeddings",
                               vc.get("num_positions", 729))),
            ln_eps=float(vc.get("layer_norm_eps", 1e-6)),
        )


@static_dataclass()
class PaddleVisionBlockW:
    ln1_w: jax.Array
    ln1_b: jax.Array
    wq: jax.Array                     # [D, D] (+ bias)
    bq: jax.Array
    wk: jax.Array
    bk: jax.Array
    wv: jax.Array
    bv: jax.Array
    wo: jax.Array
    bo: jax.Array
    ln2_w: jax.Array
    ln2_b: jax.Array
    fc1_w: jax.Array                  # [I, D]
    fc1_b: jax.Array
    fc2_w: jax.Array                  # [D, I]
    fc2_b: jax.Array


@static_dataclass()
class PaddleVisionW:
    patch_w: jax.Array                # [D, patch_dim] (conv flattened)
    patch_b: jax.Array
    pos_embed: jax.Array              # [num_pos, D]
    blocks: list
    post_ln_w: jax.Array
    post_ln_b: jax.Array
    # projector: LN over merged (m*m*D) -> fc1 -> gelu -> fc2 -> H_lm
    proj_ln_w: jax.Array
    proj_ln_b: jax.Array
    proj1_w: jax.Array                # [H_lm, m*m*D]
    proj1_b: jax.Array
    proj2_w: jax.Array                # [H_lm, H_lm]
    proj2_b: jax.Array


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def interp_pos_embed(pos_embed: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinearly interpolate the learned [S*S, D] grid to [h*w, D]."""
    s = int(round(float(np.sqrt(pos_embed.shape[0]))))
    grid = pos_embed.reshape(s, s, -1).astype(jnp.float32)
    out = jax.image.resize(grid, (h, w, grid.shape[-1]), method="bilinear")
    return out.reshape(h * w, -1)


def _rope_2d(x: jax.Array, pos_hw: jax.Array, head_dim: int) -> jax.Array:
    """Rotate-half rope with per-axis frequency halves: first hd/4
    frequencies keyed by row position, next hd/4 by column (the NaViT
    2-D extension; same layout as ..vision._rope_2d).  x [N, H, hd];
    pos_hw [N, 2]."""
    quarter = head_dim // 4
    inv = 1.0 / (10000.0 ** (jnp.arange(quarter, dtype=jnp.float32)
                             / quarter))
    hang = pos_hw[:, 0].astype(jnp.float32)[:, None] * inv[None, :]
    wang = pos_hw[:, 1].astype(jnp.float32)[:, None] * inv[None, :]
    angles = jnp.concatenate([hang, wang], axis=-1)   # [N, hd/2]
    cos = jnp.cos(angles)[:, None, :]
    sin = jnp.sin(angles)[:, None, :]
    xf = x.astype(jnp.float32)
    half = head_dim // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1)
    return out.astype(x.dtype)


def paddle_vision_forward(cfg: PaddleVisionConfig, w: PaddleVisionW,
                          patches: jax.Array, pos_hw: jax.Array,
                          grid_hw: tuple) -> jax.Array:
    """patches [N, patch_dim] (merge-block order, ..processor contract),
    pos_hw [N, 2] (row, col), grid_hw static (h, w)
    -> [N/m^2, hidden_size] LLM embeddings."""
    m = cfg.spatial_merge_size
    gh, gw = int(grid_hw[0]), int(grid_hw[1])
    x = (patches.astype(jnp.float32) @ w.patch_w.astype(jnp.float32).T
         + w.patch_b).astype(jnp.bfloat16)

    # learned positions interpolated to this image's grid, gathered in
    # the packed (merge-block) patch order
    pe = interp_pos_embed(w.pos_embed, gh, gw)          # [h*w, D]
    idx = pos_hw[:, 0] * gw + pos_hw[:, 1]
    x = x + pe[idx].astype(x.dtype)

    nh, hd = cfg.num_heads, cfg.head_dim

    for bw in w.blocks:
        hdd = _ln(x, bw.ln1_w, bw.ln1_b, cfg.ln_eps)
        f32 = jnp.float32
        q = (hdd.astype(f32) @ bw.wq.astype(f32).T + bw.bq).reshape(
            -1, nh, hd)
        k = (hdd.astype(f32) @ bw.wk.astype(f32).T + bw.bk).reshape(
            -1, nh, hd)
        v = (hdd.astype(f32) @ bw.wv.astype(f32).T + bw.bv).reshape(
            -1, nh, hd)
        q = _rope_2d(q.astype(jnp.bfloat16), pos_hw, hd)
        k = _rope_2d(k.astype(jnp.bfloat16), pos_hw, hd)
        attn = jax.nn.softmax(
            jnp.einsum("qhd,khd->hqk", q.astype(f32), k.astype(f32))
            * hd ** -0.5, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", attn, v).reshape(x.shape[0], -1)
        o = o @ bw.wo.astype(f32).T + bw.bo
        x = x + o.astype(x.dtype)
        hdd = _ln(x, bw.ln2_w, bw.ln2_b, cfg.ln_eps)
        y = jax.nn.gelu(hdd.astype(f32) @ bw.fc1_w.astype(f32).T
                        + bw.fc1_b, approximate=True)
        y = y @ bw.fc2_w.astype(f32).T + bw.fc2_b
        x = x + y.astype(x.dtype)

    x = _ln(x, w.post_ln_w, w.post_ln_b, cfg.ln_eps)

    # spatial merge + projector (patches arrive in merge-block order, so
    # the reshape groups one m*m block per output row)
    d = cfg.embed_dim
    merged = x.reshape(-1, m * m * d)
    merged = _ln(merged, w.proj_ln_w, w.proj_ln_b, cfg.ln_eps)
    f32 = jnp.float32
    y = jax.nn.gelu(
        merged.astype(f32) @ w.proj1_w.astype(f32).T + w.proj1_b,
        approximate=True)
    y = y @ w.proj2_w.astype(f32).T + w.proj2_b
    return y.astype(jnp.bfloat16)


def init_random(cfg: PaddleVisionConfig, key: jax.Array,
                dtype=jnp.bfloat16) -> PaddleVisionW:
    keys = iter(jax.random.split(key, 20 + 20 * cfg.depth))

    def r(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    d, i_ = cfg.embed_dim, cfg.intermediate_size
    m = cfg.spatial_merge_size
    blocks = [PaddleVisionBlockW(
        ln1_w=jnp.ones((d,), dtype), ln1_b=jnp.zeros((d,), dtype),
        wq=r(d, d), bq=jnp.zeros((d,), dtype),
        wk=r(d, d), bk=jnp.zeros((d,), dtype),
        wv=r(d, d), bv=jnp.zeros((d,), dtype),
        wo=r(d, d), bo=jnp.zeros((d,), dtype),
        ln2_w=jnp.ones((d,), dtype), ln2_b=jnp.zeros((d,), dtype),
        fc1_w=r(i_, d), fc1_b=jnp.zeros((i_,), dtype),
        fc2_w=r(d, i_), fc2_b=jnp.zeros((d,), dtype),
    ) for _ in range(cfg.depth)]
    return PaddleVisionW(
        patch_w=r(d, cfg.patch_dim), patch_b=jnp.zeros((d,), dtype),
        pos_embed=r(cfg.num_pos, d),
        blocks=blocks,
        post_ln_w=jnp.ones((d,), dtype), post_ln_b=jnp.zeros((d,), dtype),
        proj_ln_w=jnp.ones((m * m * d,), dtype),
        proj_ln_b=jnp.zeros((m * m * d,), dtype),
        proj1_w=r(cfg.hidden_size, m * m * d),
        proj1_b=jnp.zeros((cfg.hidden_size,), dtype),
        proj2_w=r(cfg.hidden_size, cfg.hidden_size),
        proj2_b=jnp.zeros((cfg.hidden_size,), dtype),
    )


def load_paddle_vision(reader, cfg: PaddleVisionConfig,
                       dtype=jnp.bfloat16,
                       prefix: str = "visual.") -> PaddleVisionW:
    """HF checkpoint tensors -> PaddleVisionW.

    Name map (mlx-vlm / HF PaddleOCR-VL layout):
      {p}embeddings.patch_embedding.{weight,bias}   conv [D, 3, ps, ps]
      {p}embeddings.position_embedding.weight       [num_pos, D]
      {p}encoder.layers.N.layer_norm1.{weight,bias}
      {p}encoder.layers.N.self_attn.{q,k,v,out}_proj.{weight,bias}
      {p}encoder.layers.N.layer_norm2.{weight,bias}
      {p}encoder.layers.N.mlp.fc{1,2}.{weight,bias}
      {p}post_layernorm.{weight,bias}
      mlp_AR.* projector (ln + 2 linears)
    """
    import numpy as np

    def arr(key):
        a = reader.get(key)
        if a.dtype == np.uint16:
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def first(*keys):
        for k in keys:
            if k in reader:
                return arr(k)
        raise KeyError(f"none of {keys} in checkpoint")

    p = prefix
    patch = first(p + "embeddings.patch_embedding.weight",
                  p + "patch_embed.proj.weight")
    patch = patch.reshape(patch.shape[0], -1)          # conv -> matmul

    def block(i):
        q = f"{p}encoder.layers.{i}."
        return PaddleVisionBlockW(
            ln1_w=arr(q + "layer_norm1.weight"),
            ln1_b=arr(q + "layer_norm1.bias"),
            wq=arr(q + "self_attn.q_proj.weight"),
            bq=arr(q + "self_attn.q_proj.bias"),
            wk=arr(q + "self_attn.k_proj.weight"),
            bk=arr(q + "self_attn.k_proj.bias"),
            wv=arr(q + "self_attn.v_proj.weight"),
            bv=arr(q + "self_attn.v_proj.bias"),
            wo=first(q + "self_attn.out_proj.weight",
                     q + "self_attn.o_proj.weight"),
            bo=first(q + "self_attn.out_proj.bias",
                     q + "self_attn.o_proj.bias"),
            ln2_w=arr(q + "layer_norm2.weight"),
            ln2_b=arr(q + "layer_norm2.bias"),
            fc1_w=arr(q + "mlp.fc1.weight"),
            fc1_b=arr(q + "mlp.fc1.bias"),
            fc2_w=arr(q + "mlp.fc2.weight"),
            fc2_b=arr(q + "mlp.fc2.bias"),
        )

    return PaddleVisionW(
        patch_w=patch,
        patch_b=first(p + "embeddings.patch_embedding.bias",
                      p + "patch_embed.proj.bias"),
        pos_embed=first(p + "embeddings.position_embedding.weight",
                        p + "pos_embed.weight"),
        blocks=[block(i) for i in range(cfg.depth)],
        post_ln_w=arr(p + "post_layernorm.weight"),
        post_ln_b=arr(p + "post_layernorm.bias"),
        proj_ln_w=first("mlp_AR.pre_norm.weight", "mlp_AR.0.weight",
                        "projector.pre_norm.weight"),
        proj_ln_b=first("mlp_AR.pre_norm.bias", "mlp_AR.0.bias",
                        "projector.pre_norm.bias"),
        proj1_w=first("mlp_AR.linear_1.weight", "mlp_AR.1.weight",
                      "projector.linear_1.weight"),
        proj1_b=first("mlp_AR.linear_1.bias", "mlp_AR.1.bias",
                      "projector.linear_1.bias"),
        proj2_w=first("mlp_AR.linear_2.weight", "mlp_AR.3.weight",
                      "projector.linear_2.weight"),
        proj2_b=first("mlp_AR.linear_2.bias", "mlp_AR.3.bias",
                      "projector.linear_2.bias"),
    )

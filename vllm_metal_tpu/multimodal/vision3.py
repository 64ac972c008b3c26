# SPDX-License-Identifier: Apache-2.0
"""Qwen3-VL vision tower: ViT + DeepStack feature taps in functional JAX.

Counterpart of the reference's Qwen3-VL adapter over mlx-vlm's tower
(``/root/reference/vllm_metal/multimodal/qwen3_vl/adapter.py:28`` —
``Qwen3VLVisionEncodeResult(hidden_states, deepstack_visual_embeds)``);
here the tower is owned in-repo (transformers
``modeling_qwen3_vl.Qwen3VLVisionModel`` semantics):

* Conv3d patch embed (flattened linear) + **bilinearly interpolated
  learned position embeddings** over a square ``num_position_embeddings``
  grid, permuted to merge-block patch order,
* the same 2-D rotary as Qwen2-VL (h/w frequency halves),
* full-attention blocks with ``linear_fc1/fc2`` MLPs,
* a main spatial merger (pre-shuffle LayerNorm) **plus one DeepStack
  merger per tapped block** (post-shuffle LayerNorm) — the tapped
  features are later ADDED into the language model's first K layers at
  visual token rows (DeepStack, arXiv:2406.04334).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import static_dataclass
from .vision import _act, _ln, _rope_2d


@static_dataclass(meta_fields=["depth", "embed_dim", "num_heads",
                               "intermediate_size", "patch_size",
                               "temporal_patch_size", "spatial_merge_size",
                               "in_channels", "hidden_size", "hidden_act",
                               "num_position_embeddings",
                               "deepstack_indexes"],
                  frozen=True)
class Vision3Config:
    depth: int = 27
    embed_dim: int = 1152
    num_heads: int = 16
    intermediate_size: int = 4304
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_size: int = 2048              # LM hidden (out_hidden_size)
    hidden_act: str = "gelu_pytorch_tanh"
    num_position_embeddings: int = 2304
    deepstack_indexes: tuple = (8, 16, 24)

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @classmethod
    def from_hf(cls, vc: dict, hidden_size: int) -> "Vision3Config":
        return cls(
            depth=vc.get("depth", 27),
            embed_dim=vc.get("hidden_size", 1152),
            num_heads=vc.get("num_heads", 16),
            intermediate_size=vc.get("intermediate_size", 4304),
            patch_size=vc.get("patch_size", 16),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            in_channels=vc.get("in_channels", 3),
            hidden_size=vc.get("out_hidden_size", hidden_size),
            hidden_act=vc.get("hidden_act", "gelu_pytorch_tanh"),
            num_position_embeddings=vc.get("num_position_embeddings", 2304),
            deepstack_indexes=tuple(vc.get("deepstack_visual_indexes",
                                           (8, 16, 24))))


@static_dataclass()
class MergerW:
    norm_w: jax.Array
    norm_b: jax.Array
    fc1_w: jax.Array             # [m2*D, m2*D]
    fc1_b: jax.Array
    fc2_w: jax.Array             # [hidden, m2*D]
    fc2_b: jax.Array


@static_dataclass()
class Vision3W:
    patch_w: jax.Array           # [D, patch_dim]
    patch_b: jax.Array
    pos_embed: jax.Array         # [num_position_embeddings, D]
    blocks: object               # stacked VisionBlockW (vision.py layout)
    merger: MergerW              # pre-shuffle norm ([D])
    deepstack: list[MergerW]     # post-shuffle norm ([m2*D]) per tap


def pos_embed_weights(grid_thw: tuple[int, int, int], side: int,
                      merge: int) -> tuple[np.ndarray, np.ndarray]:
    """Bilinear pos-embed gather plan in merge-block patch order.

    Returns (idx [N, 4] int32 rows into pos_embed, w [N, 4] f32) where
    N = t*h*w — transformers' ``fast_pos_embed_interpolate`` evaluated
    host-side for one grid.
    """
    t, h, w = grid_thw
    h_idx = np.linspace(0, side - 1, h)
    w_idx = np.linspace(0, side - 1, w)
    hf = h_idx.astype(np.int32)
    wf = w_idx.astype(np.int32)
    hc = np.clip(hf + 1, None, side - 1)
    wc = np.clip(wf + 1, None, side - 1)
    dh = (h_idx - hf)[:, None]
    dw = (w_idx - wf)[None, :]
    idx = np.stack([
        (hf[:, None] * side + wf[None, :]),
        (hf[:, None] * side + wc[None, :]),
        (hc[:, None] * side + wf[None, :]),
        (hc[:, None] * side + wc[None, :]),
    ], axis=-1).reshape(h * w, 4)
    wgt = np.stack([
        (1 - dh) * (1 - dw), (1 - dh) * dw, dh * (1 - dw), dh * dw,
    ], axis=-1).reshape(h * w, 4)
    # row-major (h, w) -> merge-block patch order, repeated per frame
    m = merge
    perm = (np.arange(h * w).reshape(h // m, m, w // m, m)
            .transpose(0, 2, 1, 3).reshape(-1))
    idx = np.tile(idx[perm], (t, 1))
    wgt = np.tile(wgt[perm], (t, 1))
    return idx.astype(np.int32), wgt.astype(np.float32)


def _merge(x: jax.Array, mw: MergerW, m2d: int,
           post_shuffle: bool) -> jax.Array:
    """Spatial merge: [N, D] -> [N/m2, out] (exact-erf GELU, HF
    ``nn.GELU()``)."""
    if post_shuffle:
        x = _ln(x.reshape(-1, m2d), mw.norm_w, mw.norm_b)
    else:
        x = _ln(x, mw.norm_w, mw.norm_b).reshape(-1, m2d)
    x = jax.nn.gelu(x @ mw.fc1_w.T + mw.fc1_b, approximate=False)
    return x @ mw.fc2_w.T + mw.fc2_b


@partial(jax.jit, static_argnums=0)
def vision3_forward(cfg: Vision3Config, w: Vision3W, patches: jax.Array,
                    pos_hw: jax.Array, pe_idx: jax.Array,
                    pe_w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """patches [N, patch_dim] -> (embeds [N/m2, hidden],
    deepstack [K, N/m2, hidden])."""
    D, H, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    act = _act(cfg.hidden_act)
    m2d = cfg.spatial_merge_size ** 2 * D
    x = patches.astype(w.patch_w.dtype) @ w.patch_w.T + w.patch_b
    pe = jnp.sum(w.pos_embed[pe_idx].astype(jnp.float32)
                 * pe_w[:, :, None], axis=1)
    x = x + pe.astype(x.dtype)

    taps = []
    xs = x
    # python loop over blocks (not scan): DeepStack taps K intermediate
    # layers; K is small and depth is static
    n = x.shape[0]
    for i in range(cfg.depth):
        bw = jax.tree.map(lambda leaf: leaf[i], w.blocks)
        h = _ln(xs, bw.ln1_w, bw.ln1_b)
        qkv = h @ bw.qkv_w.T + bw.qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rope_2d(q.reshape(n, H, hd), pos_hw, hd)
        k = _rope_2d(k.reshape(n, H, hd), pos_hw, hd)
        v = v.reshape(n, H, hd)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (hd ** -0.5)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", p, v.astype(jnp.float32))
        xs = xs + o.reshape(n, D).astype(xs.dtype) @ bw.proj_w.T + bw.proj_b
        h = _ln(xs, bw.ln2_w, bw.ln2_b)
        xs = xs + act(h @ bw.fc1_w.T + bw.fc1_b) @ bw.fc2_w.T + bw.fc2_b
        if i in cfg.deepstack_indexes:
            k_tap = cfg.deepstack_indexes.index(i)
            taps.append(_merge(xs, w.deepstack[k_tap], m2d,
                               post_shuffle=True))
    main = _merge(xs, w.merger, m2d, post_shuffle=False)
    return main, jnp.stack(taps) if taps else jnp.zeros((0,) + main.shape)


def encode_image3(cfg: Vision3Config, w: Vision3W, pixel_patches,
                  grid_thw: tuple[int, int, int]) -> jax.Array:
    """One image -> [1 + K, num_llm_tokens, hidden]: row 0 = main
    embeddings, rows 1..K = DeepStack features for LM layers 0..K-1."""
    from .vision import patch_positions
    pos = patch_positions(grid_thw, cfg.spatial_merge_size)
    side = int(cfg.num_position_embeddings ** 0.5)
    pe_idx, pe_w = pos_embed_weights(grid_thw, side,
                                     cfg.spatial_merge_size)
    main, taps = vision3_forward(
        cfg, w, jnp.asarray(pixel_patches), jnp.asarray(pos),
        jnp.asarray(pe_idx), jnp.asarray(pe_w))
    return jnp.concatenate([main[None], taps], axis=0)


def load_vision3(reader, cfg: Vision3Config, dtype=jnp.bfloat16,
                 prefix: str = "model.visual.") -> Vision3W:
    from .vision import VisionBlockW

    def arr(key):
        a = reader.get(key)
        if a.dtype == np.uint16:
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def block(i):
        p = f"{prefix}blocks.{i}."
        return VisionBlockW(
            ln1_w=arr(p + "norm1.weight"), ln1_b=arr(p + "norm1.bias"),
            qkv_w=arr(p + "attn.qkv.weight"),
            qkv_b=arr(p + "attn.qkv.bias"),
            proj_w=arr(p + "attn.proj.weight"),
            proj_b=arr(p + "attn.proj.bias"),
            ln2_w=arr(p + "norm2.weight"), ln2_b=arr(p + "norm2.bias"),
            fc1_w=arr(p + "mlp.linear_fc1.weight"),
            fc1_b=arr(p + "mlp.linear_fc1.bias"),
            fc2_w=arr(p + "mlp.linear_fc2.weight"),
            fc2_b=arr(p + "mlp.linear_fc2.bias"))

    def merger(p):
        return MergerW(
            norm_w=arr(p + "norm.weight"), norm_b=arr(p + "norm.bias"),
            fc1_w=arr(p + "linear_fc1.weight"),
            fc1_b=arr(p + "linear_fc1.bias"),
            fc2_w=arr(p + "linear_fc2.weight"),
            fc2_b=arr(p + "linear_fc2.bias"))

    patch = arr(prefix + "patch_embed.proj.weight")
    return Vision3W(
        patch_w=patch.reshape(cfg.embed_dim, -1),
        patch_b=arr(prefix + "patch_embed.proj.bias"),
        pos_embed=arr(prefix + "pos_embed.weight"),
        blocks=jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[block(i) for i in range(cfg.depth)]),
        merger=merger(prefix + "merger."),
        deepstack=[merger(f"{prefix}deepstack_merger_list.{k}.")
                   for k in range(len(cfg.deepstack_indexes))])


def init_random3(cfg: Vision3Config, key: jax.Array,
                 dtype=jnp.float32) -> Vision3W:
    from .vision import VisionBlockW

    keys = iter(jax.random.split(key, 64 + 12 * cfg.depth))

    def r(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    D = cfg.embed_dim
    mlp = cfg.intermediate_size
    m2d = cfg.spatial_merge_size ** 2 * D

    def block():
        return VisionBlockW(
            ln1_w=jnp.ones((D,), dtype), ln1_b=jnp.zeros((D,), dtype),
            qkv_w=r(3 * D, D), qkv_b=jnp.zeros((3 * D,), dtype),
            proj_w=r(D, D), proj_b=jnp.zeros((D,), dtype),
            ln2_w=jnp.ones((D,), dtype), ln2_b=jnp.zeros((D,), dtype),
            fc1_w=r(mlp, D), fc1_b=jnp.zeros((mlp,), dtype),
            fc2_w=r(D, mlp), fc2_b=jnp.zeros((D,), dtype))

    def merger(norm_dim):
        return MergerW(
            norm_w=jnp.ones((norm_dim,), dtype),
            norm_b=jnp.zeros((norm_dim,), dtype),
            fc1_w=r(m2d, m2d), fc1_b=jnp.zeros((m2d,), dtype),
            fc2_w=r(cfg.hidden_size, m2d),
            fc2_b=jnp.zeros((cfg.hidden_size,), dtype))

    return Vision3W(
        patch_w=r(D, cfg.patch_dim), patch_b=jnp.zeros((D,), dtype),
        pos_embed=r(cfg.num_position_embeddings, D),
        blocks=jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[block() for _ in range(cfg.depth)]),
        merger=merger(D),
        deepstack=[merger(m2d) for _ in cfg.deepstack_indexes])

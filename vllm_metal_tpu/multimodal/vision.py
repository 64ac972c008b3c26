# SPDX-License-Identifier: Apache-2.0
"""Qwen2-VL-family vision tower in functional JAX.

The reference loads its towers from external mlx-vlm and only adapts them
(``/root/reference/vllm_metal/multimodal/qwen3_vl/adapter.py:178``); here
the ViT is owned in-repo: patch-embed linear, 2-D rotary positions over
the patch grid, full-attention blocks under ``lax.scan``, and a
spatial-merge MLP projecting into the language model's hidden size.

Patch ordering contract (shared with :mod:`.processor`): patches arrive
in merge-block order — (row-block, col-block, sub-row, sub-col) — so the
merger's ``[-1, m*m*D]`` reshape groups exactly one spatial merge block
per output row, and (hpos, wpos) for rotary follow the same order.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import static_dataclass


@static_dataclass(meta_fields=["depth", "embed_dim", "num_heads",
                               "mlp_ratio", "patch_size",
                               "temporal_patch_size", "spatial_merge_size",
                               "in_channels", "hidden_size", "hidden_act"],
                  frozen=True)
class VisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_size: int = 3584      # language-model hidden size
    hidden_act: str = "quick_gelu"

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @classmethod
    def from_hf(cls, vc: dict, hidden_size: int) -> "VisionConfig":
        return cls(
            depth=vc.get("depth", 32),
            embed_dim=vc.get("embed_dim", vc.get("hidden_size", 1280)),
            num_heads=vc.get("num_heads", vc.get("num_attention_heads", 16)),
            mlp_ratio=float(vc.get("mlp_ratio", 4.0)),
            patch_size=vc.get("patch_size", 14),
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            in_channels=vc.get("in_channels", vc.get("in_chans", 3)),
            hidden_size=hidden_size,
            hidden_act=vc.get("hidden_act", "quick_gelu"))


@static_dataclass()
class VisionBlockW:
    ln1_w: jax.Array
    ln1_b: jax.Array
    qkv_w: jax.Array             # [3*D, D]
    qkv_b: jax.Array
    proj_w: jax.Array            # [D, D]
    proj_b: jax.Array
    ln2_w: jax.Array
    ln2_b: jax.Array
    fc1_w: jax.Array             # [mlp, D]
    fc1_b: jax.Array
    fc2_w: jax.Array             # [D, mlp]
    fc2_b: jax.Array


@static_dataclass()
class VisionW:
    patch_w: jax.Array           # [D, patch_dim]
    patch_b: Optional[jax.Array]
    blocks: VisionBlockW         # stacked [depth, ...]
    merge_ln_w: jax.Array
    merge_ln_b: jax.Array
    merge_fc1_w: jax.Array       # [m*m*D, m*m*D]
    merge_fc1_b: jax.Array
    merge_fc2_w: jax.Array       # [hidden, m*m*D]
    merge_fc2_b: jax.Array


def _ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * w.astype(x.dtype) + b.astype(x.dtype)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_pytorch_tanh"):
        return partial(jax.nn.gelu, approximate=True)
    if name == "silu":
        return jax.nn.silu
    raise ValueError(f"unknown vision activation {name}")


def patch_positions(grid_thw: tuple[int, int, int],
                    merge: int) -> np.ndarray:
    """(hpos, wpos) [N, 2] for merge-block patch ordering."""
    t, h, w = grid_thw
    m = merge
    hb, wb = h // m, w // m
    hpos = np.arange(h).reshape(hb, m, 1, 1)
    wpos = np.arange(w).reshape(1, 1, wb, m)
    hpos = np.broadcast_to(hpos.transpose(0, 2, 1, 3),
                           (hb, wb, m, m)).reshape(-1)
    wpos = np.broadcast_to(wpos.transpose(0, 2, 1, 3),
                           (hb, wb, m, m)).reshape(-1)
    pos = np.stack([hpos, wpos], axis=1).astype(np.int32)
    return np.tile(pos, (t, 1))


def _rope_2d(x: jax.Array, pos_hw: jax.Array, head_dim: int) -> jax.Array:
    """Rotate-half rope with per-axis frequency halves.

    x [N, H, hd]; pos_hw [N, 2]; frequencies: first hd/4 use the h
    position, next hd/4 the w position (Qwen2-VL vision rotary layout).
    """
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


@partial(jax.jit, static_argnums=0)
def vision_forward(cfg: VisionConfig, w: VisionW, patches: jax.Array,
                   pos_hw: jax.Array) -> jax.Array:
    """patches [N, patch_dim], pos_hw [N, 2] -> embeds [N/m^2, hidden].

    N must be a multiple of ``spatial_merge_size**2`` (guaranteed by the
    processor's grid).  Full (non-causal) attention over all N patches.
    """
    D, H = cfg.embed_dim, cfg.num_heads
    hd = cfg.head_dim
    act = _act(cfg.hidden_act)
    x = patches.astype(w.patch_w.dtype) @ w.patch_w.T
    if w.patch_b is not None:
        x = x + w.patch_b

    def body(x, bw: VisionBlockW):
        h = _ln(x, bw.ln1_w, bw.ln1_b)
        qkv = h @ bw.qkv_w.T + bw.qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n = x.shape[0]
        q = _rope_2d(q.reshape(n, H, hd), pos_hw, hd)
        k = _rope_2d(k.reshape(n, H, hd), pos_hw, hd)
        v = v.reshape(n, H, hd)
        logits = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (hd ** -0.5)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", p, v.astype(jnp.float32))
        x = x + o.reshape(n, D).astype(x.dtype) @ bw.proj_w.T + bw.proj_b
        h = _ln(x, bw.ln2_w, bw.ln2_b)
        x = x + act(h @ bw.fc1_w.T + bw.fc1_b) @ bw.fc2_w.T + bw.fc2_b
        return x, None

    x, _ = jax.lax.scan(body, x, w.blocks)
    # spatial merge: m*m consecutive patches -> one LLM token
    m2 = cfg.spatial_merge_size ** 2
    x = _ln(x, w.merge_ln_w, w.merge_ln_b).reshape(-1, m2 * D)
    x = jax.nn.gelu(x @ w.merge_fc1_w.T + w.merge_fc1_b, approximate=True)
    return x @ w.merge_fc2_w.T + w.merge_fc2_b


def init_random(cfg: VisionConfig, key: jax.Array,
                dtype=jnp.float32) -> VisionW:
    keys = iter(jax.random.split(key, 8 + 12 * cfg.depth))

    def r(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    D = cfg.embed_dim
    mlp = int(D * cfg.mlp_ratio)
    m2d = cfg.spatial_merge_size ** 2 * D

    def block():
        return VisionBlockW(
            ln1_w=jnp.ones((D,), dtype), ln1_b=jnp.zeros((D,), dtype),
            qkv_w=r(3 * D, D), qkv_b=jnp.zeros((3 * D,), dtype),
            proj_w=r(D, D), proj_b=jnp.zeros((D,), dtype),
            ln2_w=jnp.ones((D,), dtype), ln2_b=jnp.zeros((D,), dtype),
            fc1_w=r(mlp, D), fc1_b=jnp.zeros((mlp,), dtype),
            fc2_w=r(D, mlp), fc2_b=jnp.zeros((D,), dtype))

    blocks = [block() for _ in range(cfg.depth)]
    return VisionW(
        patch_w=r(D, cfg.patch_dim), patch_b=None,
        blocks=jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        merge_ln_w=jnp.ones((D,), dtype),
        merge_ln_b=jnp.zeros((D,), dtype),
        merge_fc1_w=r(m2d, m2d), merge_fc1_b=jnp.zeros((m2d,), dtype),
        merge_fc2_w=r(cfg.hidden_size, m2d),
        merge_fc2_b=jnp.zeros((cfg.hidden_size,), dtype))


def load_vision(reader, cfg: VisionConfig, dtype=jnp.bfloat16,
                prefix: str = "visual.") -> VisionW:
    """Load from a HF Qwen2-VL checkpoint reader (see models/hf_loader)."""

    def arr(key):
        a = reader.get(key)
        if a.dtype == np.uint16:
            a = (a.astype(np.uint32) << 16).view(np.float32)
        return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)

    def opt(key):
        return arr(key) if key in reader else None

    def block(i):
        p = f"{prefix}blocks.{i}."
        return VisionBlockW(
            ln1_w=arr(p + "norm1.weight"), ln1_b=arr(p + "norm1.bias"),
            qkv_w=arr(p + "attn.qkv.weight"),
            qkv_b=arr(p + "attn.qkv.bias"),
            proj_w=arr(p + "attn.proj.weight"),
            proj_b=arr(p + "attn.proj.bias"),
            ln2_w=arr(p + "norm2.weight"), ln2_b=arr(p + "norm2.bias"),
            fc1_w=arr(p + "mlp.fc1.weight"), fc1_b=arr(p + "mlp.fc1.bias"),
            fc2_w=arr(p + "mlp.fc2.weight"), fc2_b=arr(p + "mlp.fc2.bias"))

    patch = arr(prefix + "patch_embed.proj.weight")  # [D, C, tps, ps, ps]
    return VisionW(
        patch_w=patch.reshape(cfg.embed_dim, -1),
        patch_b=opt(prefix + "patch_embed.proj.bias"),
        blocks=jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[block(i) for i in range(cfg.depth)]),
        merge_ln_w=arr(prefix + "merger.ln_q.weight"),
        merge_ln_b=arr(prefix + "merger.ln_q.bias"),
        merge_fc1_w=arr(prefix + "merger.mlp.0.weight"),
        merge_fc1_b=arr(prefix + "merger.mlp.0.bias"),
        merge_fc2_w=arr(prefix + "merger.mlp.2.weight"),
        merge_fc2_b=arr(prefix + "merger.mlp.2.bias"))

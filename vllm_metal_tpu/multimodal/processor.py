# SPDX-License-Identifier: Apache-2.0
"""Image preprocessing for the Qwen-VL vision tower.

Replaces the HF processor the reference inherits through vLLM's
multimodal pipeline: smart-resize to patch-grid multiples, CLIP
normalization, and patchification in the merge-block order the tower
and :func:`..multimodal.vision.patch_positions` expect.
"""

from __future__ import annotations

import math

import numpy as np

from .vision import VisionConfig

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

DEFAULT_MIN_PIXELS = 56 * 56
DEFAULT_MAX_PIXELS = 14 * 14 * 4 * 1280


def smart_resize(height: int, width: int, factor: int,
                 min_pixels: int = DEFAULT_MIN_PIXELS,
                 max_pixels: int = DEFAULT_MAX_PIXELS) -> tuple[int, int]:
    """Target (h, w): multiples of ``factor``, area within bounds,
    aspect ratio approximately preserved."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absurd aspect ratio > 200")
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """img [H, W, C] float32 -> [out_h, out_w, C] (align-corners=False)."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img

    def axis_coords(n_in, n_out):
        c = (np.arange(n_out, dtype=np.float32) + 0.5) * n_in / n_out - 0.5
        return np.clip(c, 0, n_in - 1)

    ys = axis_coords(h, out_h)
    xs = axis_coords(w, out_w)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx).astype(np.float32)


def load_image(source) -> np.ndarray:
    """bytes / path / array -> float32 [H, W, 3] in [0, 1]."""
    if isinstance(source, np.ndarray):
        img = source
    else:
        try:
            from PIL import Image
        except ImportError as exc:
            raise RuntimeError(
                "PIL not available; pass a numpy [H, W, 3] array") from exc
        import io
        if isinstance(source, (bytes, bytearray)):
            img = np.asarray(Image.open(io.BytesIO(source)).convert("RGB"))
        else:
            img = np.asarray(Image.open(source).convert("RGB"))
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def preprocess_image(source, cfg: VisionConfig,
                     min_pixels: int = DEFAULT_MIN_PIXELS,
                     max_pixels: int = DEFAULT_MAX_PIXELS
                     ) -> tuple[np.ndarray, tuple[int, int, int]]:
    """image -> (patches [t*h*w, patch_dim], grid_thw).

    Patch k corresponds to ``patch_positions(grid_thw, merge)[k]``; its
    feature layout is channel-major ``[C, tps, ps, ps]`` flattened (the
    conv3d-weight layout HF checkpoints use).
    """
    img = load_image(source)
    ps, m, tps = cfg.patch_size, cfg.spatial_merge_size, \
        cfg.temporal_patch_size
    h_bar, w_bar = smart_resize(img.shape[0], img.shape[1], ps * m,
                                min_pixels, max_pixels)
    img = _bilinear_resize(img, h_bar, w_bar)
    img = (img - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD

    gh, gw = h_bar // ps, w_bar // ps
    hb, wb = gh // m, gw // m
    # [H, W, C] -> [C, tps, H, W] (static image: repeat along t)
    x = np.repeat(img.transpose(2, 0, 1)[:, None], tps, axis=1)
    c = x.shape[0]
    # -> [hb, m, ps, wb, m, ps] spatial factorization
    x = x.reshape(c, tps, hb, m, ps, wb, m, ps)
    # merge-block order (hb, wb, m, m) with per-patch [C, tps, ps, ps]
    x = x.transpose(2, 5, 3, 6, 0, 1, 4, 7)
    patches = x.reshape(hb * wb * m * m, c * tps * ps * ps)
    return patches.astype(np.float32), (1, gh, gw)

# SPDX-License-Identifier: Apache-2.0
"""M-RoPE (multimodal rotary) position computation.

Qwen2/3-VL-style 3-axis (temporal, height, width) positions.  The
reference delegates this to upstream vLLM's model helper
(``/root/reference/vllm_metal/multimodal/qwen3_vl/adapter.py:299`` →
``vllm .. _get_mrope_input_positions``); here the math is owned in-repo:

* text tokens advance all three axes together,
* an image's placeholder run holds the temporal axis constant while the
  height/width axes enumerate the (merged) patch grid, all offset by the
  running position,
* after a vision segment the running position jumps past
  ``max(t, h, w)`` of that grid, so later text never collides.

``mrope_position_delta`` is the offset to add to the linear token index
for decode steps (all three axes equal there).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class MMFeature:
    """One image attached to a request.

    ``offset``/``num_tokens`` locate its placeholder run in the prompt;
    ``grid_thw`` is the *pre-merge* patch grid; ``pixel_patches`` is the
    patchified pixel tensor ``[t*h*w, C*tps*ps*ps]`` (None when the
    embedding is supplied directly, e.g. tests or cache hits).
    """

    offset: int
    grid_thw: tuple[int, int, int]
    pixel_patches: np.ndarray | None = None
    identifier: str = ""
    # filled by the engine after encoding: [num_tokens, hidden] device array
    embeds: object = None
    _num_tokens: int = field(default=-1, repr=False)

    def num_tokens(self, spatial_merge_size: int) -> int:
        t, h, w = self.grid_thw
        m = spatial_merge_size
        if h % m or w % m:
            raise ValueError(f"grid {self.grid_thw} not divisible by "
                             f"spatial_merge_size={m}")
        return t * (h // m) * (w // m)


def mrope_positions(
    num_tokens: int,
    features: list[MMFeature],
    spatial_merge_size: int,
) -> tuple[np.ndarray, int]:
    """Positions ``[3, num_tokens]`` int32 + decode delta.

    ``features`` must be sorted by ``offset`` and non-overlapping; every
    placeholder run must lie inside ``[0, num_tokens)``.
    """
    pos = np.zeros((3, num_tokens), np.int32)
    st = 0          # running position value
    idx = 0         # token index
    for f in sorted(features, key=lambda f: f.offset):
        n = f.num_tokens(spatial_merge_size)
        if f.offset < idx or f.offset + n > num_tokens:
            raise ValueError(
                f"feature at offset {f.offset} (+{n}) out of range "
                f"(cursor {idx}, prompt {num_tokens})")
        # text run before the image
        run = f.offset - idx
        pos[:, idx:f.offset] = st + np.arange(run, dtype=np.int32)
        st += run
        idx = f.offset
        # image grid
        t, h, w = f.grid_thw
        gh, gw = h // spatial_merge_size, w // spatial_merge_size
        t_idx = np.repeat(np.arange(t, dtype=np.int32), gh * gw)
        h_idx = np.tile(np.repeat(np.arange(gh, dtype=np.int32), gw), t)
        w_idx = np.tile(np.tile(np.arange(gw, dtype=np.int32), gh), t)
        pos[0, idx:idx + n] = st + t_idx
        pos[1, idx:idx + n] = st + h_idx
        pos[2, idx:idx + n] = st + w_idx
        st += max(t, gh, gw)
        idx += n
    # trailing text
    run = num_tokens - idx
    pos[:, idx:] = st + np.arange(run, dtype=np.int32)
    st += run
    delta = st - num_tokens
    return pos, delta

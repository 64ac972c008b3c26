# SPDX-License-Identifier: Apache-2.0
"""Device mesh construction (data x model axes)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(num_devices: int, tp: int, dp: int = 1) -> tuple[int, int]:
    if tp * dp != num_devices:
        raise ValueError(
            f"tp({tp}) * dp({dp}) != device count ({num_devices})")
    return (dp, tp)


def make_mesh(tp: int = 1, dp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None,
              dp_axis: str = "data", tp_axis: str = "model") -> Mesh:
    """dp x tp mesh.  TP rides the fastest-varying (ICI-adjacent) axis."""
    if devices is None:
        devices = jax.devices()
    n = tp * dp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, (dp_axis, tp_axis))

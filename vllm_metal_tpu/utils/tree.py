# SPDX-License-Identifier: Apache-2.0
"""Pytree dataclass helper.

``static_dataclass(meta_fields=...)`` wraps ``dataclasses.dataclass`` +
``jax.tree_util.register_dataclass`` so engine structs traverse as pytrees
with the named fields treated as static metadata (hashable, part of the jit
cache key).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax


def static_dataclass(meta_fields: Sequence[str] = (), **dc_kwargs):
    """Class decorator: dataclass registered as a JAX pytree node."""

    def wrap(cls):
        cls = dataclasses.dataclass(**dc_kwargs)(cls)
        data_fields = [f.name for f in dataclasses.fields(cls)
                       if f.name not in meta_fields]
        jax.tree_util.register_dataclass(
            cls, data_fields=data_fields, meta_fields=list(meta_fields))
        return cls

    return wrap

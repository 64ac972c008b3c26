# SPDX-License-Identifier: Apache-2.0
"""Architecture registry mapping GGUF/HF architecture names to model classes."""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, type] = {}


def register_model(*names: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        for n in names:
            _REGISTRY[n] = cls
        return cls
    return deco


def get_model_class(architecture: str) -> type:
    # import for registration side effects
    from . import llama  # noqa: F401
    from . import gemma  # noqa: F401
    from . import mla  # noqa: F401
    from . import mixtral  # noqa: F401
    from . import qwen2_vl  # noqa: F401
    from . import qwen3_next  # noqa: F401
    from . import qwen3_vl_mm  # noqa: F401
    from . import paddle_vl  # noqa: F401
    try:
        return _REGISTRY[architecture]
    except KeyError:
        raise ValueError(
            f"unsupported architecture {architecture!r}; "
            f"known: {sorted(_REGISTRY)}") from None

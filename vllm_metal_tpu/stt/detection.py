# SPDX-License-Identifier: Apache-2.0
"""STT model detection from config.json model_type (reference:
``/root/reference/vllm_metal/stt/detection.py:60``)."""

from __future__ import annotations

import json
import logging
from pathlib import Path

logger = logging.getLogger(__name__)

_STT_MODEL_TYPES = frozenset({"whisper", "qwen3_asr",
                              "qwen3_omni_moe"})


def is_stt_model(model_path: str) -> bool:
    """True when ``model_path`` is a local dir whose config.json declares a
    known STT ``model_type``.  Unreadable configs -> False."""
    config_file = Path(model_path) / "config.json"
    if not config_file.exists():
        return False
    try:
        with open(config_file) as f:
            cfg = json.load(f)
    except (OSError, json.JSONDecodeError) as exc:
        logger.debug("failed reading %s: %s", config_file, exc)
        return False
    mt = cfg.get("model_type")
    return isinstance(mt, str) and mt.lower() in _STT_MODEL_TYPES

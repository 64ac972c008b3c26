# SPDX-License-Identifier: Apache-2.0
"""PEFT adapter loading (HF `peft` checkpoint layout).

Counterpart of the reference's PEFT safetensors loader
(``/root/reference/vllm_metal/v1/lora/peft_loader.py``): reads
``adapter_config.json`` + ``adapter_model.safetensors`` and maps HF module
names (q_proj/k_proj/...) onto the engine's target names, stacked per layer.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from ..config import ModelConfig
from .layers import LoRAAdapter

_HF_TO_TARGET = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "gate", "up_proj": "up", "down_proj": "down",
}

_KEY_RE = re.compile(
    r"\.layers\.(\d+)\..*?(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj"
    r"|down_proj)\.lora_(A|B)\.weight$")


def load_peft_adapter(path: str, model_cfg: ModelConfig) -> LoRAAdapter:
    from safetensors import safe_open

    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    rank = int(cfg["r"])
    alpha = float(cfg.get("lora_alpha", rank))
    scaling = alpha / rank

    st_path = os.path.join(path, "adapter_model.safetensors")
    tensors: dict[str, np.ndarray] = {}
    with safe_open(st_path, framework="numpy") as f:
        for key in f.keys():
            m = _KEY_RE.search(key)
            if m:
                tensors[key] = f.get_tensor(m.string if False else key)

    l = model_cfg.num_layers
    per_target: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    groups: dict[str, dict[int, dict[str, np.ndarray]]] = {}
    for key, arr in tensors.items():
        m = _KEY_RE.search(key)
        layer, hf_name, ab = int(m.group(1)), m.group(2), m.group(3)
        t = _HF_TO_TARGET[hf_name]
        groups.setdefault(t, {}).setdefault(layer, {})[ab] = arr

    for t, layers in groups.items():
        sample = next(iter(layers.values()))
        a0, b0 = sample["A"], sample["B"]          # A [r, K], B [N, r]
        a = np.zeros((l,) + a0.shape, np.float32)
        b = np.zeros((l,) + b0.shape, np.float32)
        for li, ab in layers.items():
            a[li] = ab["A"].astype(np.float32)
            b[li] = ab["B"].astype(np.float32)
        per_target[t] = (a, b)

    return LoRAAdapter(weights=per_target, rank=rank, scaling=scaling)

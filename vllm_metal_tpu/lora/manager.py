# SPDX-License-Identifier: Apache-2.0
"""LoRA slot-table manager (the reference's LoRAModelManager role)."""

from __future__ import annotations

import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .layers import LoRAAdapter, LoRAPack

logger = logging.getLogger(__name__)


class LoRAManager:
    """Fixed slot table: slot 0 = null adapter; adapters load into slots by
    name and are addressed per request."""

    def __init__(self, model_cfg: ModelConfig, max_loras: int = 4,
                 max_rank: int = 16):
        self.cfg = model_cfg
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.name_to_slot: dict[str, int] = {}
        self._free = list(range(1, max_loras + 1))
        self.packs: dict[str, LoRAPack] = {}
        self._dims = self._target_dims(model_cfg)
        l = model_cfg.num_layers
        s = max_loras + 1
        for t, (n, k) in self._dims.items():
            self.packs[t] = LoRAPack(
                a=jnp.zeros((l, s, max_rank, k), jnp.bfloat16),
                b=jnp.zeros((l, s, n, max_rank), jnp.bfloat16),
                rank=max_rank, scaling=1.0)

    @staticmethod
    def _target_dims(cfg: ModelConfig) -> dict[str, tuple[int, int]]:
        h = cfg.hidden_size
        return {
            "wq": (cfg.q_dim, h),
            "wk": (cfg.kv_dim, h),
            "wv": (cfg.kv_dim, h),
            "wo": (h, cfg.q_dim),
            "gate": (cfg.intermediate_size, h),
            "up": (cfg.intermediate_size, h),
            "down": (h, cfg.intermediate_size),
        }

    # ------------------------------------------------------------------
    def add_adapter(self, name: str, adapter: LoRAAdapter) -> int:
        if name in self.name_to_slot:
            return self.name_to_slot[name]
        if not self._free:
            raise RuntimeError(
                f"no free LoRA slots (max_loras={self.max_loras})")
        if adapter.rank > self.max_rank:
            raise ValueError(
                f"adapter rank {adapter.rank} > max_rank {self.max_rank}")
        slot = self._free.pop(0)
        r = adapter.rank
        for t, (a, b) in adapter.weights.items():
            if t not in self.packs:
                raise ValueError(f"unknown LoRA target {t!r}")
            pack = self.packs[t]
            # scaling folded into B so mixed-scaling adapters coexist
            b_scaled = (np.asarray(b, np.float32)
                        * adapter.scaling).astype(np.float32)
            pa = pack.a.at[:, slot, :r, :].set(
                jnp.asarray(np.asarray(a, np.float32), jnp.bfloat16))
            pb = pack.b.at[:, slot, :, :r].set(
                jnp.asarray(b_scaled, jnp.bfloat16))
            self.packs[t] = LoRAPack(a=pa, b=pb, rank=pack.rank, scaling=1.0)
        self.name_to_slot[name] = slot
        logger.info("LoRA %r -> slot %d (rank %d)", name, slot, r)
        return slot

    def remove_adapter(self, name: str) -> None:
        slot = self.name_to_slot.pop(name, None)
        if slot is None:
            return
        for t, pack in self.packs.items():
            self.packs[t] = LoRAPack(
                a=pack.a.at[:, slot].set(0.0),
                b=pack.b.at[:, slot].set(0.0),
                rank=pack.rank, scaling=pack.scaling)
        self._free.append(slot)

    def slot_for(self, name: Optional[str]) -> int:
        if not name:
            return 0
        if name not in self.name_to_slot:
            raise KeyError(f"LoRA adapter {name!r} not loaded")
        return self.name_to_slot[name]

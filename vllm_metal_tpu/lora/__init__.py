# SPDX-License-Identifier: Apache-2.0
"""Multi-LoRA serving.

TPU-native take on the reference's LoRA stack
(``/root/reference/vllm_metal/v1/lora/`` — slot-table manager, Punica-style
gather+batched-matmul with a null slot, PEFT loader): adapters live in fixed
slots stacked per layer/projection; each step carries per-token slot ids and
the delta is computed as masked low-rank matmuls (slot 0 is the null
adapter, all-zero, so un-adapted tokens cost nothing numerically).
"""

from .layers import LoRAPack, LoRAAdapter, lora_delta
from .manager import LoRAManager
from .peft_loader import load_peft_adapter

__all__ = ["LoRAPack", "LoRAAdapter", "lora_delta", "LoRAManager",
           "load_peft_adapter"]

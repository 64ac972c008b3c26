# SPDX-License-Identifier: Apache-2.0
from .tree import static_dataclass

__all__ = ["static_dataclass"]

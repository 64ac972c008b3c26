# SPDX-License-Identifier: Apache-2.0
"""Paged-attention runtime: KV block pool, per-step metadata, backends."""

from .metadata import AttentionMetadata
from .kv_cache import PagedKVCache

__all__ = ["AttentionMetadata", "PagedKVCache"]

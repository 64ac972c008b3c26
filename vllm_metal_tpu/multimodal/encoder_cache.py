# SPDX-License-Identifier: Apache-2.0
"""Vision-encoder output cache keyed by content hash.

Reference: ``/root/reference/vllm_metal/v1/mm/encoder_cache.py`` (cache
by mm-hash so re-sent images skip the tower).  Embeds live on device;
eviction is LRU by entry count.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Any, Callable


def feature_hash(pixel_patches, grid_thw) -> str:
    h = hashlib.sha256()
    h.update(str(tuple(grid_thw)).encode())
    h.update(memoryview(pixel_patches).cast("B"))
    return h.hexdigest()


class EncoderCache:
    def __init__(self, max_entries: int = 64):
        self.max_entries = max_entries
        self._cache: OrderedDict[str, Any] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_encode(self, key: str, encode: Callable[[], Any]) -> Any:
        if key in self._cache:
            self._cache.move_to_end(key)
            self.hits += 1
            return self._cache[key]
        self.misses += 1
        value = encode()
        self._cache[key] = value
        while len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)
        return value

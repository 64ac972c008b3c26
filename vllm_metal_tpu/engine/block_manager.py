# SPDX-License-Identifier: Apache-2.0
"""KV block allocator with ref-counted prefix caching.

The reference leans on upstream vLLM's block allocator + prefix-cache
hashing (SURVEY.md §0); this is the in-repo TPU equivalent: full blocks are
content-hashed (chained over the prefix), freed blocks stay in an LRU pool
keyed by hash until evicted, and new requests reuse any cached prefix
(honored downstream exactly like the reference's ``num_computed_tokens``
path, ``/root/reference/vllm_metal/v1/model_runner.py:1867-1894``).
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass
from typing import Optional


@dataclass
class Block:
    block_id: int
    ref_count: int = 0
    # content hash when the block is full and hashable, else None
    block_hash: Optional[int] = None


def hash_block(parent_hash: Optional[int], token_ids: tuple[int, ...]) -> int:
    return hash((parent_hash, token_ids))


class BlockManager:
    """Physical block pool. Block 0 is reserved as the null/garbage block so
    that id 0 in padded block tables never aliases real data."""

    def __init__(self, num_blocks: int, block_size: int,
                 enable_prefix_caching: bool = True):
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (block 0 is reserved)")
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self.blocks = [Block(i) for i in range(num_blocks)]
        # free blocks in eviction order (LRU of released cached blocks)
        self.free_queue: OrderedDict[int, None] = OrderedDict(
            (i, None) for i in range(1, num_blocks))
        self.hash_to_block: dict[int, int] = {}
        # per-request allocation state
        self.req_blocks: dict[str, list[int]] = {}
        self.req_hashes: dict[str, list[Optional[int]]] = {}

    # ------------------------------------------------------------------
    @property
    def num_free_blocks(self) -> int:
        return len(self.free_queue)

    def usage(self) -> float:
        total = len(self.blocks) - 1
        return 1.0 - self.num_free_blocks / total if total else 0.0

    def _evict(self, block_id: int) -> None:
        b = self.blocks[block_id]
        if b.block_hash is not None:
            self.hash_to_block.pop(b.block_hash, None)
            b.block_hash = None

    def _alloc_one(self) -> Optional[int]:
        if not self.free_queue:
            return None
        block_id, _ = self.free_queue.popitem(last=False)
        self._evict(block_id)
        b = self.blocks[block_id]
        b.ref_count = 1
        return block_id

    def _ref(self, block_id: int) -> None:
        b = self.blocks[block_id]
        if b.ref_count == 0:
            # revive from free queue (cached block being reused)
            self.free_queue.pop(block_id, None)
        b.ref_count += 1

    def _unref(self, block_id: int) -> None:
        b = self.blocks[block_id]
        assert b.ref_count > 0
        b.ref_count -= 1
        if b.ref_count == 0:
            # keep hash mapping: block is evictable but still cache-hittable
            self.free_queue[block_id] = None

    # ------------------------------------------------------------------
    def get_computed_blocks(self, token_ids: list[int]
                            ) -> tuple[list[int], int]:
        """Longest cached prefix for a new request (full blocks only).

        Never returns *all* blocks of the prompt — at least one token must be
        recomputed so the final hidden state exists for sampling.
        """
        if not self.enable_prefix_caching:
            return [], 0
        hits: list[int] = []
        parent: Optional[int] = None
        limit = (len(token_ids) - 1) // self.block_size  # leave >=1 token
        for bi in range(limit):
            chunk = tuple(token_ids[bi * self.block_size:
                                    (bi + 1) * self.block_size])
            h = hash_block(parent, chunk)
            block_id = self.hash_to_block.get(h)
            if block_id is None:
                break
            hits.append(block_id)
            parent = h
        return hits, len(hits) * self.block_size

    # ------------------------------------------------------------------
    def allocate(self, request_id: str, token_ids: list[int],
                 computed_blocks: Optional[list[int]] = None) -> bool:
        """Initial allocation: adopt cached prefix blocks + fresh blocks to
        cover len(token_ids) KV slots.  Returns False (no side effects) if
        the pool can't satisfy it."""
        assert request_id not in self.req_blocks
        computed_blocks = computed_blocks or []
        total_blocks = -(-len(token_ids) // self.block_size)
        need_new = total_blocks - len(computed_blocks)
        # adopting a cached-but-unreferenced prefix block pulls it OUT of
        # the free queue — budget fresh blocks against what remains after
        # that, or _alloc_one below would come up empty mid-allocation
        free_computed = sum(1 for b in computed_blocks
                            if b in self.free_queue)
        if need_new > self.num_free_blocks - free_computed:
            return False
        blocks: list[int] = []
        for b in computed_blocks:
            self._ref(b)
            blocks.append(b)
        for _ in range(need_new):
            nb = self._alloc_one()
            assert nb is not None
            blocks.append(nb)
        self.req_blocks[request_id] = blocks
        # seed hash chain for the adopted prefix
        hashes: list[Optional[int]] = []
        parent: Optional[int] = None
        for i, b in enumerate(computed_blocks):
            h = self.blocks[b].block_hash
            hashes.append(h)
            parent = h
        hashes.extend([None] * need_new)
        self.req_hashes[request_id] = hashes
        return True

    def append_slots(self, request_id: str, new_total_tokens: int) -> bool:
        """Grow a request's table to cover new_total_tokens KV slots."""
        blocks = self.req_blocks[request_id]
        total_blocks = -(-new_total_tokens // self.block_size)
        need = total_blocks - len(blocks)
        if need <= 0:
            return True
        if need > self.num_free_blocks:
            return False
        for _ in range(need):
            nb = self._alloc_one()
            blocks.append(nb)
            self.req_hashes[request_id].append(None)
        return True

    def commit_full_blocks(self, request_id: str,
                           token_ids: list[int], num_computed: int) -> None:
        """Register content hashes for now-full blocks (prefix caching)."""
        if not self.enable_prefix_caching:
            return
        blocks = self.req_blocks[request_id]
        hashes = self.req_hashes[request_id]
        full = min(num_computed // self.block_size, len(blocks))
        parent: Optional[int] = None
        for bi in range(full):
            if hashes[bi] is not None:
                parent = hashes[bi]
                continue
            chunk = tuple(token_ids[bi * self.block_size:
                                    (bi + 1) * self.block_size])
            h = hash_block(parent, chunk)
            existing = self.hash_to_block.get(h)
            if existing is None or existing == blocks[bi]:
                self.hash_to_block[h] = blocks[bi]
                self.blocks[blocks[bi]].block_hash = h
            hashes[bi] = h
            parent = h

    def free(self, request_id: str) -> None:
        blocks = self.req_blocks.pop(request_id, [])
        self.req_hashes.pop(request_id, None)
        # free in reverse so LRU evicts deepest (least reusable) blocks first
        for b in reversed(blocks):
            self._unref(b)

    def get_block_table(self, request_id: str) -> list[int]:
        return list(self.req_blocks[request_id])

# SPDX-License-Identifier: Apache-2.0
"""Block allocator + prefix-cache behavior."""

import pytest

from vllm_metal_tpu.engine.block_manager import BlockManager


def test_allocate_and_free_refcounts():
    bm = BlockManager(num_blocks=9, block_size=4)
    assert bm.num_free_blocks == 8
    assert bm.allocate("a", list(range(10)))  # 3 blocks
    assert bm.num_free_blocks == 5
    table = bm.get_block_table("a")
    assert len(table) == 3 and 0 not in table
    bm.free("a")
    assert bm.num_free_blocks == 8


def test_allocation_failure_has_no_side_effects():
    bm = BlockManager(num_blocks=4, block_size=4)  # 3 usable
    assert not bm.allocate("a", list(range(17)))   # needs 5
    assert bm.num_free_blocks == 3
    assert bm.allocate("a", list(range(12)))


def test_prefix_cache_hit_and_chain():
    bm = BlockManager(num_blocks=17, block_size=4)
    ids = list(range(12))
    assert bm.allocate("a", ids)
    bm.commit_full_blocks("a", ids, num_computed=12)
    a_table = bm.get_block_table("a")
    bm.free("a")

    # same prompt: full-block prefix reused (but never the whole prompt)
    hits, n = bm.get_computed_blocks(ids + [99])
    assert n == 12 and hits == a_table

    # 12-token prompt: only 2 blocks may be reused (one token must recompute)
    hits, n = bm.get_computed_blocks(ids)
    assert n == 8 and hits == a_table[:2]

    # divergent second block breaks the chain
    div = ids[:4] + [77] + ids[5:]
    hits, n = bm.get_computed_blocks(div + [99])
    assert n == 4 and hits == a_table[:1]


def test_cached_block_revival_refcount():
    bm = BlockManager(num_blocks=9, block_size=2)
    ids = [1, 2, 3, 4, 5]
    assert bm.allocate("a", ids)
    bm.commit_full_blocks("a", ids, num_computed=5)
    bm.free("a")
    free_before = bm.num_free_blocks
    hits, n = bm.get_computed_blocks(ids + [6])
    assert n == 4
    assert bm.allocate("b", ids + [6], hits)
    assert bm.num_free_blocks == free_before - 3  # 2 revived + 1 new
    bm.free("b")
    assert bm.num_free_blocks == 8


def test_eviction_invalidates_hash():
    bm = BlockManager(num_blocks=4, block_size=2)  # 3 usable
    ids = [1, 2, 3, 4]
    assert bm.allocate("a", ids)
    bm.commit_full_blocks("a", ids, num_computed=4)
    bm.free("a")
    # exhaust the pool -> cached blocks get evicted
    assert bm.allocate("b", [9, 9, 9, 9, 9, 9])
    hits, n = bm.get_computed_blocks(ids + [5])
    assert n == 0


def test_append_slots_growth():
    bm = BlockManager(num_blocks=5, block_size=2)
    assert bm.allocate("a", [1, 2, 3])   # 2 blocks
    assert bm.append_slots("a", 4)        # still 2 blocks
    assert len(bm.get_block_table("a")) == 2
    assert bm.append_slots("a", 5)        # 3 blocks
    assert len(bm.get_block_table("a")) == 3
    assert bm.append_slots("a", 8)        # 4 blocks (max)
    assert not bm.append_slots("a", 9)    # pool exhausted


def test_shared_prefix_refcount_protects_blocks():
    bm = BlockManager(num_blocks=9, block_size=2)
    ids = [1, 2, 3, 4]
    assert bm.allocate("a", ids)
    bm.commit_full_blocks("a", ids, num_computed=4)
    hits, n = bm.get_computed_blocks(ids + [7, 8])
    assert n == 4
    assert bm.allocate("b", ids + [7, 8], hits)
    bm.free("a")
    # shared blocks still referenced by b: not in free queue
    table_b = bm.get_block_table("b")
    for blk in table_b[:2]:
        assert blk not in bm.free_queue

# SPDX-License-Identifier: Apache-2.0
"""Per-step attention metadata for the packed varlen batch.

TPU-native analogue of the reference's thread-local ``PagedAttentionContext``
+ ``prepare_grouped`` (``/root/reference/vllm_metal/attention/context.py:49,156``):
decode-then-prefill requests are packed into ONE flat token batch, and this
struct carries the indirection arrays every attention backend needs.  Unlike
the reference (shape-flexible MLX lazy graph), all arrays here are padded to
static bucket sizes so XLA compiles once per bucket.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..utils import static_dataclass


TILE_GRAN = 8  # finest q-tile granularity the kernel may use (bq multiple)


@static_dataclass(meta_fields=("max_num_seqs", "max_blocks_per_seq",
                               "work_windows", "pure_decode"))
class AttentionMetadata:
    """All int32. ``T`` = padded token count, ``S`` = padded seq count.

    Padding convention: pad tokens have ``slot_mapping == -1`` (scatter-drop),
    ``token_seq_ids`` pointing at a pad seq whose ``context_lens == 0``.
    """

    # [T] flat cache slot per token: block_id * block_size + offset; -1 = pad.
    slot_mapping: jax.Array
    # [S, max_blocks_per_seq] physical block ids per sequence.
    block_tables: jax.Array
    # [S] total KV length per seq *including* this step's new tokens.
    context_lens: jax.Array
    # [S + 1] cumulative query-token offsets of each seq in the packed batch.
    query_start_loc: jax.Array
    # [T] owning sequence index per token (pad rows -> S-1 allowed, len 0).
    token_seq_ids: jax.Array
    # [T] number of KV positions visible to this token (its absolute pos + 1).
    token_kv_lens: jax.Array
    # [T] absolute position of each token in its sequence.
    positions: jax.Array
    # [] actual (unpadded) number of sequences.
    num_seqs: jax.Array
    # [] actual (unpadded) number of tokens.
    num_tokens: jax.Array
    # [ceil(T / TILE_GRAN)] first sequence overlapping each 8-row q tile
    # (kernels with bq = k*8 index this at stride k).
    tile_first_seq: jax.Array
    # [S] per-request recurrent-state slot (hybrid GDN models).
    seq_state_slots: jax.Array
    # Host-precomputed kernel work lists (one per distinct sliding
    # window in ``work_windows``): the (seq, kv-tile) visit order per q
    # tile, packed ``seq << 16 | tile``.  The attention kernel's inner
    # loop walks these flat lists instead of doing cursor arithmetic on
    # the TPU scalar core (measured: the branch-free cursor walk alone
    # cost ~9.5us per visit — the whole decode attention budget).
    # work_items: [n_windows, W_pad]; work_start: [n_windows, n_tiles+1].
    work_items: Optional[jax.Array] = None
    work_start: Optional[jax.Array] = None
    work_windows: tuple = (None,)
    max_num_seqs: int = 0
    max_blocks_per_seq: int = 0
    # static: every sequence contributed exactly one query token (lets
    # backends pick batch-parallel decode kernels, e.g. GDN)
    pure_decode: bool = False


def _kernel_tiling(token_pad: int, block_size: int) -> tuple[int, int]:
    """(bq, kv_tile) — MUST match the kernel's own choice rules."""
    from ..ops.paged_attention_kernel import DEFAULT_BQ, KV_TILE
    bq = DEFAULT_BQ if token_pad >= DEFAULT_BQ else 8
    return bq, max(KV_TILE, block_size)


def _build_work_lists(
    query_lens: list[int],
    context_lens: list[int],
    windows: tuple,
    token_pad: int,
    block_size: int,
    context_slack: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Flat (seq, kv-tile) visit lists per q tile, per sliding window.

    Sliding-window lists skip tiles no query row of the tile can see
    (the kernel's former on-device ``start_tile`` computation).
    Returns (work_items [n_win, W_pad], work_start [n_win, n_tiles+1]).
    """
    bq, kv_tile = _kernel_tiling(token_pad, block_size)
    n_tiles = -(-token_pad // bq)   # kernel rounds the token dim UP to bq
    qsl = np.zeros(len(query_lens) + 1, np.int64)
    np.cumsum(query_lens, out=qsl[1:])
    per_win: list[list[int]] = []
    starts = np.zeros((len(windows), n_tiles + 1), np.int32)
    for wi, window in enumerate(windows):
        items: list[int] = []
        for ti in range(n_tiles):
            row0, row_end = ti * bq, (ti + 1) * bq
            for s, (ql, cl) in enumerate(zip(query_lens, context_lens)):
                q_lo = max(qsl[s], row0) - row0
                q_hi = min(qsl[s + 1], row_end) - row0
                if q_hi <= q_lo:
                    continue
                pos_row0 = cl - ql + (row0 - qsl[s])
                # slack covers on-device context growth (decode windows)
                end_tile = -(-(pos_row0 + q_hi + context_slack) // kv_tile)
                if window is not None:
                    first = max(pos_row0 + q_lo - window + 1, 0)
                    t0 = first // kv_tile
                else:
                    t0 = 0
                items.extend((s << 16) | t for t in range(t0, end_tile))
            starts[wi, ti + 1] = len(items)
        per_win.append(items)
    w_max = max(max((len(x) for x in per_win), default=0), 1)
    w_pad = 64
    while w_pad < w_max:
        w_pad *= 2
    out = np.zeros((len(windows), w_pad), np.int32)
    for wi, items in enumerate(per_win):
        out[wi, :len(items)] = items
    return out, starts


def build_metadata(
    *,
    query_lens: list[int],
    context_lens: list[int],
    block_tables: list[list[int]],
    block_size: int,
    token_pad: int,
    seq_pad: int,
    max_blocks_per_seq: int,
    state_slots: Optional[list[int]] = None,
    sliding_windows: tuple = (None,),
    work_context_slack: int = 0,
) -> AttentionMetadata:
    """Host-side batch assembly (numpy), then device put.

    ``query_lens[i]`` new tokens for seq i; ``context_lens[i]`` total KV length
    including those new tokens; ``block_tables[i]`` covers the full context.
    """
    s = len(query_lens)
    assert s <= seq_pad and s == len(context_lens) == len(block_tables)
    total = sum(query_lens)
    assert total <= token_pad, (total, token_pad)

    slot_mapping = np.full((token_pad,), -1, np.int32)
    token_seq_ids = np.full((token_pad,), max(seq_pad - 1, 0), np.int32)
    token_kv_lens = np.zeros((token_pad,), np.int32)
    positions = np.zeros((token_pad,), np.int32)
    bt = np.zeros((seq_pad, max_blocks_per_seq), np.int32)
    ctx = np.zeros((seq_pad,), np.int32)
    qsl = np.zeros((seq_pad + 1,), np.int32)

    t = 0
    for i, (ql, cl, blocks) in enumerate(
            zip(query_lens, context_lens, block_tables)):
        assert len(blocks) <= max_blocks_per_seq
        bt[i, :len(blocks)] = blocks
        ctx[i] = cl
        start_pos = cl - ql
        for j in range(ql):
            pos = start_pos + j
            block_idx = pos // block_size
            slot_mapping[t] = blocks[block_idx] * block_size + pos % block_size
            token_seq_ids[t] = i
            token_kv_lens[t] = pos + 1
            positions[t] = pos
            t += 1
        qsl[i + 1] = t
    qsl[s + 1:] = t

    slots_arr = np.arange(seq_pad, dtype=np.int32)
    if state_slots is not None:
        slots_arr[:len(state_slots)] = state_slots

    n_tiles = -(-token_pad // TILE_GRAN)
    tile_first_seq = np.full((n_tiles,), s, np.int32)
    for ti in range(n_tiles):
        if ti * TILE_GRAN < total:
            tile_first_seq[ti] = token_seq_ids[ti * TILE_GRAN]

    if None not in sliding_windows:
        sliding_windows = (None,) + tuple(sliding_windows)
    work_items, work_start = _build_work_lists(
        query_lens, context_lens, sliding_windows, token_pad, block_size,
        context_slack=work_context_slack)

    return AttentionMetadata(
        slot_mapping=jax.numpy.asarray(slot_mapping),
        block_tables=jax.numpy.asarray(bt),
        context_lens=jax.numpy.asarray(ctx),
        query_start_loc=jax.numpy.asarray(qsl),
        token_seq_ids=jax.numpy.asarray(token_seq_ids),
        token_kv_lens=jax.numpy.asarray(token_kv_lens),
        positions=jax.numpy.asarray(positions),
        num_seqs=jax.numpy.asarray(s, jax.numpy.int32),
        num_tokens=jax.numpy.asarray(total, jax.numpy.int32),
        tile_first_seq=jax.numpy.asarray(tile_first_seq),
        seq_state_slots=jax.numpy.asarray(slots_arr),
        work_items=jax.numpy.asarray(work_items),
        work_start=jax.numpy.asarray(work_start),
        work_windows=tuple(sliding_windows),
        max_num_seqs=seq_pad,
        max_blocks_per_seq=max_blocks_per_seq,
        pure_decode=all(ql == 1 for ql in query_lens),
    )

# SPDX-License-Identifier: Apache-2.0
"""Fused in-place TurboQuant cache write (Pallas, all pools aliased).

TPU analogue of the reference's ``TQEncodePrimitive``
(``/root/reference/vllm_metal/metal/paged_ops.cpp:846`` +
``turboquant.metal:698``) over the block-payload pool layout
(``attention/quant_kv_cache.py``): the ENCODE + per-block MERGE math runs
as cheap jnp ops on the step's rows (``_merged_payloads`` — bit-disjoint
scatter-adds), and this kernel does the part XLA can't do in place: an
RMW blend of each touched block against the multi-GB pools —

    pool_block = (pool_block & ~mask) | payload     (int8 code planes)
    pool_block = where(mask, payload, pool_block)   (bf16 scale rows)

RMW because packed bytes interleave DIFFERENT tokens' bit fields: a
decode write of token 67 must preserve token 3's nibble in the same
byte.  One grid step per touched block; every DMA moves whole
``[KH, rows, 128]`` payloads (the 128-lane alignment real-TPU Mosaic
requires — block_size must be 128 on chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(layer, ublocks, *refs, n_arr: int, nb: int):
    """refs: payload_0..n, mask_0..n (VMEM, block-sliced),
    pool_in_0..n (ANY), pool_out_0..n (ANY), lstage_0..n, sstage_0..n,
    lsem, ssem.

    SOFTWARE-PIPELINED RMW across grid steps (r5): the old
    load->wait->blend->store->wait sequence per block serialized two DMA
    round-trip latencies per touched block (~5.7 ms/step of a TQ decode
    — more than the attention read).  Stage buffers are double-buffered
    rings persisting across grid steps: step b waits the load it issued
    at b-2, blends into a separate store ring, and prefetches block
    b+2's load, so all DMA latency overlaps neighbor blocks' work.
    Blocks are disjoint (ublocks is sorted-unique), so reordered
    loads/stores never alias."""
    pays = refs[:n_arr]
    msks = refs[n_arr:2 * n_arr]
    outs = refs[3 * n_arr:4 * n_arr]
    lstages = refs[4 * n_arr:5 * n_arr]
    sstages = refs[5 * n_arr:6 * n_arr]
    lsem, ssem = refs[6 * n_arr], refs[6 * n_arr + 1]
    li = layer[0]
    b = pl.program_id(0)
    b_pad = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def load_copies(bi, s):
        return [pltpu.make_async_copy(
            outs[j].at[li, ublocks[bi]], lstages[j].at[s],
            lsem.at[s, j]) for j in range(n_arr)]

    def store_copies(bi, s):
        return [pltpu.make_async_copy(
            sstages[j].at[s], outs[j].at[li, ublocks[bi]],
            ssem.at[s, j]) for j in range(n_arr)]

    def issue_load(bi, s):
        @pl.when((bi < b_pad) & (ublocks[jnp.minimum(bi, b_pad - 1)] < nb))
        def _():
            for cp in load_copies(bi, s):
                cp.start()

    @pl.when(b == 0)
    def _():
        issue_load(0, 0)
        issue_load(1, 1)

    @pl.when(ublocks[b] < nb)
    def _():
        # drain the store that used this slot two steps ago before
        # overwriting its staging buffer
        @pl.when(b >= 2)
        def _():
            for cp in store_copies(b - 2, slot):
                cp.wait()
        for cp in load_copies(b, slot):
            cp.wait()
        for j in range(n_arr):
            old = lstages[j][slot]
            pay = pays[j][0]
            msk = msks[j][0]
            if old.dtype == jnp.int8:
                sstages[j][slot] = (old & ~msk) | pay
            else:
                sstages[j][slot] = jnp.where(msk != 0, pay, old)
        for cp in store_copies(b, slot):
            cp.start()
        issue_load(b + 2, slot)

    # epilogue: drain in-flight stores.  Pads sort to the END of
    # ublocks, so the real blocks form a prefix [0, R): the last two
    # stores in flight belong to R-1 and R-2 (steps R.. skipped their
    # waits as pads).
    @pl.when(b == b_pad - 1)
    def _():
        r = jax.lax.fori_loop(
            0, b_pad,
            lambda i, acc: acc + jnp.where(ublocks[i] < nb, 1, 0),
            jnp.int32(0))
        for off in (2, 1):
            bi = r - off

            @pl.when(bi >= 0)
            def _(bi=bi):
                for cp in store_copies(bi, jax.lax.rem(bi, 2)):
                    cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("interpret",),
                   donate_argnums=(0,))
def tq_block_write(
    pools: tuple,       # N arrays [L, NB, KH, rows_j, lanes_j] (aliased)
    ublocks: jax.Array,  # [B] touched blocks, pad == NB (skipped)
    payloads: tuple,    # N arrays [B, KH, rows_j, lanes_j]
    masks: tuple,       # N int8 arrays [B, KH, rows_j, lanes_j]
    layer_idx,
    interpret: bool = False,
):
    pools = tuple(pools)
    n_arr = len(pools)
    nb = pools[0].shape[1]
    b_pad = ublocks.shape[0]
    kh = pools[0].shape[2]
    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    masks = tuple(m.astype(jnp.int8) for m in masks)
    payloads = tuple(p.astype(pool.dtype)
                     for p, pool in zip(payloads, pools))

    kernel = functools.partial(_kernel, n_arr=n_arr, nb=nb)
    blocked = [
        pl.BlockSpec((1,) + p.shape[1:], lambda b, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for p in payloads]
    blocked_m = [
        pl.BlockSpec((1,) + m.shape[1:], lambda b, *_: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for m in masks]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_pad,),
        in_specs=blocked + blocked_m
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        scratch_shapes=[pltpu.VMEM((2,) + p.shape[2:], p.dtype)
                        for p in pools]            # load ring
        + [pltpu.VMEM((2,) + p.shape[2:], p.dtype)
           for p in pools]                          # store ring
        + [pltpu.SemaphoreType.DMA((2, n_arr)),
           pltpu.SemaphoreType.DMA((2, n_arr))],
    )
    # args: (layer, ublocks, payload x n, mask x n, pool x n)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pools],
        input_output_aliases={2 + 2 * n_arr + j: j for j in range(n_arr)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer, ublocks, *payloads, *masks, *pools)
    return tuple(out)

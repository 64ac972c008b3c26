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
    pool_in_0..n (ANY), pool_out_0..n (ANY), stage_0..n, lsem, ssem."""
    pays = refs[:n_arr]
    msks = refs[n_arr:2 * n_arr]
    outs = refs[3 * n_arr:4 * n_arr]
    stages = refs[4 * n_arr:5 * n_arr]
    lsem, ssem = refs[5 * n_arr], refs[5 * n_arr + 1]
    li = layer[0]
    b = pl.program_id(0)
    blk = ublocks[b]

    @pl.when(blk < nb)
    def _():
        def copies(sem, to_hbm):
            cps = []
            for j in range(n_arr):
                hbm = outs[j].at[li, :, blk]
                cps.append(pltpu.make_async_copy(
                    hbm if not to_hbm else stages[j],
                    stages[j] if not to_hbm else hbm,
                    sem.at[j]))
            return cps

        for cp in copies(lsem, to_hbm=False):
            cp.start()
        for cp in copies(lsem, to_hbm=False):
            cp.wait()
        for j in range(n_arr):
            old = stages[j][...]
            pay = pays[j][0]
            msk = msks[j][0]
            if old.dtype == jnp.int8:
                stages[j][...] = (old & ~msk) | pay
            else:
                stages[j][...] = jnp.where(msk != 0, pay, old)
        for cp in copies(ssem, to_hbm=True):
            cp.start()
        for cp in copies(ssem, to_hbm=True):
            cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("interpret",),
                   donate_argnums=(0,))
def tq_block_write(
    pools: tuple,       # N arrays [L, KH, NB, rows_j, lanes_j] (aliased)
    ublocks: jax.Array,  # [B] touched blocks, pad == NB (skipped)
    payloads: tuple,    # N arrays [B, KH, rows_j, lanes_j]
    masks: tuple,       # N int8 arrays [B, KH, rows_j, lanes_j]
    layer_idx,
    interpret: bool = False,
):
    pools = tuple(pools)
    n_arr = len(pools)
    nb = pools[0].shape[2]
    b_pad = ublocks.shape[0]
    kh = pools[0].shape[1]
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
        scratch_shapes=[pltpu.VMEM((p.shape[1],) + p.shape[3:], p.dtype)
                        for p in pools]
        + [pltpu.SemaphoreType.DMA((n_arr,)),
           pltpu.SemaphoreType.DMA((n_arr,))],
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

# SPDX-License-Identifier: Apache-2.0
"""Fused in-place KV cache write (Pallas, input/output aliased).

TPU analogue of the reference's ``ReshapeAndCachePrimitive``
(``/root/reference/vllm_metal/metal/paged_ops.cpp:1015`` +
``reshape_and_cache.metal:99``), and for the same reason: the functional
``cache.at[...].set`` scatter is NOT lowered in place by XLA inside the
layer loop — each layer copies the entire multi-GB pool (measured ~370
ms/step on an 8B model).  This kernel aliases the pool through
``input_output_aliases`` so only the touched rows move.

The pool is the split layout ``[L, NB, 2, KH, bs, D]`` (dim 2 = K|V —
see ``attention/kv_cache.py``).

Mosaic constraint: HBM slices must be 8-sublane aligned, so single token
rows are written read-modify-write through aligned ``[KH, 8, D]`` staging
tiles (one for the K rows, one for the V rows of the same block).  The
staging tiles are kept across consecutive tokens (prefill writes are
sequential runs), so full tiles flush once per 8 tokens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 8
_ROW_RING = 8


def _rac_rows_kernel(layer_ref, slots_ref, ntok_ref, k_new, v_new, kv_in,
                     kv_out, stage, lsem, ssem, *, t_pad: int, bs: int):
    """Decode-path write: wave-parallel pair RMW.

    The staged-group kernel below serializes 4 blocking DMAs per block
    switch — measured 0.865 ms/layer for 16 decode tokens (~70% of the
    whole decode step).  Here every token GROUP (consecutive tokens
    sharing an 8-row sublane group — the smallest HBM-sliceable unit)
    gets its own staging slot, so the
    three phases each run as one overlapped DMA wave:

      1. issue ALL pair loads (group starts only),
      2. wait + blend new rows per group, issue its store immediately,
      3. drain all store semaphores.

    Correctness: groups are disjoint memory (slots ascend within a
    request; blocks belong to one request), so loads/stores of
    different groups never alias.
    """
    li = layer_ref[0]
    n_tok = jnp.minimum(ntok_ref[0], t_pad)   # pads never iterate
    _GRP = 8   # sublane DMA granularity

    def group_of(i):
        return slots_ref[i] // _GRP      # disjoint 8-slot ranges

    def pair_copies(i, sem, to_hbm):
        slot = slots_ref[i]
        blk = slot // bs
        base = slot % bs // _GRP * _GRP
        cps = []
        for j in (0, 1):
            vmem = stage.at[i, j]
            hbm = kv_out.at[li, blk, j, :, pl.ds(base, _GRP)]
            cps.append(pltpu.make_async_copy(
                hbm if not to_hbm else vmem,
                vmem if not to_hbm else hbm,
                sem.at[i, j]))
        return cps

    # "group start" = valid token whose group differs from the previous
    # VALID token's (pads may interleave); tracked via a carried group id
    def start_and_next(i, lastg):
        valid = slots_ref[i] >= 0
        g = group_of(i)
        start = valid & (g != lastg)
        return start, jnp.where(valid, g, lastg)

    # wave 1: all group loads in flight at once
    def issue_loads(i, lastg):
        start, lastg = start_and_next(i, lastg)

        @pl.when(start)
        def _():
            for cp in pair_copies(i, lsem, to_hbm=False):
                cp.start()
        return lastg

    jax.lax.fori_loop(0, n_tok, issue_loads, jnp.int32(-1))

    # wave 2: blend each token's row into its group's staging tile; a
    # group's store is issued when the next group begins (and at the end)
    def blend(i, carry):
        g, lastg = carry
        slot = slots_ref[i]
        start, lastg = start_and_next(i, lastg)

        @pl.when(start & (g >= 0))
        def _():
            for cp in pair_copies(g, ssem, to_hbm=True):
                cp.start()

        @pl.when(start)
        def _():
            for cp in pair_copies(i, lsem, to_hbm=False):
                cp.wait()

        g = jnp.where(start, i, g)

        @pl.when(slot >= 0)
        def _():
            row = slot % bs % _GRP
            sel = jax.lax.broadcasted_iota(
                jnp.int32, stage.shape[2:], 1) == row
            stage[g, 0] = jnp.where(sel, k_new[i][:, None, :], stage[g, 0])
            stage[g, 1] = jnp.where(sel, v_new[i][:, None, :], stage[g, 1])
        return g, lastg

    g, _ = jax.lax.fori_loop(0, n_tok, blend,
                             (jnp.int32(-1), jnp.int32(-1)))

    @pl.when(g >= 0)
    def _():
        for cp in pair_copies(g, ssem, to_hbm=True):
            cp.start()

    # wave 3: drain stores (one per group, issued from its start index)
    def drain(i, lastg):
        start, lastg = start_and_next(i, lastg)

        @pl.when(start)
        def _():
            for cp in pair_copies(i, ssem, to_hbm=True):
                cp.wait()
        return lastg

    jax.lax.fori_loop(0, n_tok, drain, jnp.int32(-1))


def _rac_kernel(layer_ref, slots_ref, ntok_ref, k_new, v_new, kv_in,
                kv_out, kbuf, vbuf, sems, *, t_pad: int, bs: int):
    li = layer_ref[0]
    n_tok = jnp.minimum(ntok_ref[0], t_pad)

    def flush(blk, base):
        base = pl.multiple_of(base, _ALIGN)
        cpk = pltpu.make_async_copy(
            kbuf, kv_out.at[li, blk, 0, :, pl.ds(base, _ALIGN)], sems.at[0])
        cpv = pltpu.make_async_copy(
            vbuf, kv_out.at[li, blk, 1, :, pl.ds(base, _ALIGN)], sems.at[1])
        cpk.start()
        cpv.start()
        cpk.wait()
        cpv.wait()

    def load(blk, base):
        base = pl.multiple_of(base, _ALIGN)
        cpk = pltpu.make_async_copy(
            kv_out.at[li, blk, 0, :, pl.ds(base, _ALIGN)], kbuf, sems.at[2])
        cpv = pltpu.make_async_copy(
            kv_out.at[li, blk, 1, :, pl.ds(base, _ALIGN)], vbuf, sems.at[3])
        cpk.start()
        cpv.start()
        cpk.wait()
        cpv.wait()

    def body(i, carry):
        cur_blk, cur_base, dirty = carry
        slot = slots_ref[i]
        blk = slot // bs
        base = pl.multiple_of((slot % bs) // _ALIGN * _ALIGN, _ALIGN)
        valid = slot >= 0
        switch = valid & ((blk != cur_blk) | (base != cur_base))

        @pl.when(switch & (dirty == 1))
        def _():
            flush(cur_blk, cur_base)

        @pl.when(switch)
        def _():
            load(blk, base)

        @pl.when(valid)
        def _():
            # dynamic sublane stores must be 8-aligned in Mosaic; insert the
            # row with a masked blend instead
            row = slot % bs - base
            sel = jax.lax.broadcasted_iota(
                jnp.int32, kbuf.shape, 1) == row
            kbuf[:] = jnp.where(sel, k_new[i][:, None, :], kbuf[:])
            vbuf[:] = jnp.where(sel, v_new[i][:, None, :], vbuf[:])

        cur_blk = jnp.where(switch, blk, cur_blk)
        cur_base = jnp.where(switch, base, cur_base)
        dirty = jnp.where(valid, 1, dirty)
        return cur_blk, cur_base, dirty

    cur_blk, cur_base, dirty = jax.lax.fori_loop(
        0, n_tok, body, (jnp.int32(-1), jnp.int32(0), jnp.int32(0)),
        unroll=False)

    @pl.when(dirty == 1)
    def _():
        flush(cur_blk, cur_base)


@functools.partial(jax.jit, static_argnames=("interpret", "block_size"),
                   donate_argnums=(0,))
def reshape_and_cache(
    kv_cache: jax.Array,       # [L, NB, 2, KH, bs, D] (aliased in place)
    k_new: jax.Array,          # [T, KH, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,   # [T] (-1 = skip; ascending within requests)
    layer_idx,                 # int or traced scalar
    block_size: int = 0,
    interpret: bool = False,
    num_tokens=None,           # real token count (pads skip entirely)
) -> jax.Array:
    l, nb, two, kh, bs_pool, d = kv_cache.shape
    bs = block_size or bs_pool
    assert bs == bs_pool and two == 2 and bs % _ALIGN == 0
    t_pad = k_new.shape[0]
    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    ntok = jnp.asarray(t_pad if num_tokens is None else num_tokens,
                       jnp.int32).reshape(1)

    k_new = k_new.astype(kv_cache.dtype)
    v_new = v_new.astype(kv_cache.dtype)
    pool = kv_cache
    unview = None
    # decode-sized batches: wave-parallel pair RMW; prefill batches
    # amortize better through the sequential 8-row staging path
    if t_pad <= 64:
        kernel = functools.partial(_rac_rows_kernel, t_pad=t_pad, bs=bs)
        scratch = [
            pltpu.VMEM((t_pad, 2, kh, 8, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((t_pad, 2)),
            pltpu.SemaphoreType.DMA((t_pad, 2)),
        ]
    else:
        kernel = functools.partial(_rac_kernel, t_pad=t_pad, bs=bs)
        scratch = [
            pltpu.VMEM((kh, _ALIGN, d), kv_cache.dtype),
            pltpu.VMEM((kh, _ALIGN, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_new
            pl.BlockSpec(memory_space=pl.ANY),       # kv pool (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        # args: (layer, slots, ntok, k_new, v_new, pool)
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer, slot_mapping, ntok, k_new, v_new, pool)
    return unview(out) if unview is not None else out

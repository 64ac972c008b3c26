# SPDX-License-Identifier: Apache-2.0
"""Fused in-place KV cache write (Pallas, input/output aliased).

TPU analogue of the reference's ``ReshapeAndCachePrimitive``
(``/root/reference/vllm_metal/metal/paged_ops.cpp:1015`` +
``reshape_and_cache.metal:99``), and for the same reason: the functional
``cache.at[...].set`` scatter is NOT lowered in place by XLA inside the
layer loop — each layer copies the entire multi-GB pool (measured ~370
ms/step on an 8B model).  This kernel aliases the pool through
``input_output_aliases`` so only the touched rows move.

The pool is the combined layout ``[L, NB, KH, 2*bs, D]`` (K rows [0, bs),
V rows [bs, 2bs) of each (block, head) — see ``attention/kv_cache.py``).

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


def _rac_kernel(layer_ref, slots_ref, k_new, v_new, kv_in,
                kv_out, kbuf, vbuf, sems, *, t_pad: int, bs: int):
    li = layer_ref[0]

    def flush(blk, base):
        base = pl.multiple_of(base, _ALIGN)
        vbase = pl.multiple_of(base + bs, _ALIGN)
        cpk = pltpu.make_async_copy(
            kbuf, kv_out.at[li, blk, :, pl.ds(base, _ALIGN)], sems.at[0])
        cpv = pltpu.make_async_copy(
            vbuf, kv_out.at[li, blk, :, pl.ds(vbase, _ALIGN)], sems.at[1])
        cpk.start()
        cpv.start()
        cpk.wait()
        cpv.wait()

    def load(blk, base):
        base = pl.multiple_of(base, _ALIGN)
        vbase = pl.multiple_of(base + bs, _ALIGN)
        cpk = pltpu.make_async_copy(
            kv_out.at[li, blk, :, pl.ds(base, _ALIGN)], kbuf, sems.at[2])
        cpv = pltpu.make_async_copy(
            kv_out.at[li, blk, :, pl.ds(vbase, _ALIGN)], vbuf, sems.at[3])
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
        0, t_pad, body, (jnp.int32(-1), jnp.int32(0), jnp.int32(0)),
        unroll=False)

    @pl.when(dirty == 1)
    def _():
        flush(cur_blk, cur_base)


@functools.partial(jax.jit, static_argnames=("interpret", "block_size"),
                   donate_argnums=(0,))
def reshape_and_cache(
    kv_cache: jax.Array,       # [L, NB, KH, 2*bs, D] (aliased in place)
    k_new: jax.Array,          # [T, KH, D]
    v_new: jax.Array,
    slot_mapping: jax.Array,   # [T] (-1 = skip; ascending within requests)
    layer_idx,                 # int or traced scalar
    block_size: int = 0,
    interpret: bool = False,
) -> jax.Array:
    l, nb, kh, bs2, d = kv_cache.shape
    bs = block_size or bs2 // 2
    assert bs * 2 == bs2 and bs % _ALIGN == 0
    t_pad = k_new.shape[0]
    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    kernel = functools.partial(_rac_kernel, t_pad=t_pad, bs=bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_new
            pl.BlockSpec(memory_space=pl.ANY),       # kv pool (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((kh, _ALIGN, d), kv_cache.dtype),
            pltpu.VMEM((kh, _ALIGN, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        # args: (layer, slots, k_new, v_new, kv_cache)
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer, slot_mapping, k_new.astype(kv_cache.dtype),
      v_new.astype(kv_cache.dtype), kv_cache)

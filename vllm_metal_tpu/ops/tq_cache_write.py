# SPDX-License-Identifier: Apache-2.0
"""Fused in-place TurboQuant cache write (Pallas, all pools aliased).

TPU analogue of the reference's ``TQEncodePrimitive``
(``/root/reference/vllm_metal/metal/paged_ops.cpp:846`` +
``turboquant.metal:698``): the ENCODE math runs as cheap jnp ops on the
step's [T, KH, D] rows (tiny), but the SCATTER into the five pool arrays
(k codes / k scale / k zero / v codes / v scale) must not round-trip the
multi-GB pools — the functional ``.at[].set`` lowers to a full-pool copy
per layer (the same pathology ``reshape_and_cache`` kills for the bf16
pool).  This kernel is the wave-parallel pair-RMW write generalized to N
aliased arrays sharing the ``[L, KH, NB, bs, last]`` row structure.

Wave structure (same correctness argument as ``_rac_rows_kernel``):
token GROUPS (consecutive tokens sharing one 8-row sublane group) are
disjoint memory, so (1) all group loads start, (2) each group blends its
new rows and starts its store, (3) stores drain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GRP = 8   # sublane DMA granularity


def _tq_write_kernel(layer_ref, slots_ref, ntok_ref, *refs,
                     t_pad: int, bs: int, n_arr: int):
    """refs: [new_0..new_{n-1}, pool_in_0.., pool_out_0..,
    stage_0.., lsem, ssem]."""
    new = refs[:n_arr]
    outs = refs[2 * n_arr:3 * n_arr]
    stages = refs[3 * n_arr:4 * n_arr]
    lsem, ssem = refs[4 * n_arr], refs[4 * n_arr + 1]
    li = layer_ref[0]
    n_tok = jnp.minimum(ntok_ref[0], t_pad)

    def group_of(i):
        return slots_ref[i] // _GRP

    def pair_copies(i, sem, to_hbm):
        slot = slots_ref[i]
        blk = slot // bs
        base = slot % bs // _GRP * _GRP
        cps = []
        for j in range(n_arr):
            vmem = stages[j].at[i]
            hbm = outs[j].at[li, :, blk, pl.ds(base, _GRP)]
            cps.append(pltpu.make_async_copy(
                hbm if not to_hbm else vmem,
                vmem if not to_hbm else hbm,
                sem.at[i, j]))
        return cps

    def start_and_next(i, lastg):
        valid = slots_ref[i] >= 0
        g = group_of(i)
        start = valid & (g != lastg)
        return start, jnp.where(valid, g, lastg)

    # wave 1: all group loads in flight
    def issue_loads(i, lastg):
        start, lastg = start_and_next(i, lastg)

        @pl.when(start)
        def _():
            for cp in pair_copies(i, lsem, to_hbm=False):
                cp.start()
        return lastg

    jax.lax.fori_loop(0, n_tok, issue_loads, jnp.int32(-1))

    # wave 2: blend rows; issue a group's store when the next group starts
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
            for j in range(n_arr):
                sel = jax.lax.broadcasted_iota(
                    jnp.int32, stages[j].shape[1:], 1) == row
                # new rows arrive pre-replicated to [kh, _GRP, last]
                # (host-side broadcast): a bare where, no in-kernel
                # reshape — Mosaic rejects sub-lane bf16 reshapes
                stages[j][g] = jnp.where(sel, new[j][i], stages[j][g])
        return g, lastg

    g, _ = jax.lax.fori_loop(0, n_tok, blend,
                             (jnp.int32(-1), jnp.int32(-1)))

    @pl.when(g >= 0)
    def _():
        for cp in pair_copies(g, ssem, to_hbm=True):
            cp.start()

    # wave 3: drain stores
    def drain(i, lastg):
        start, lastg = start_and_next(i, lastg)

        @pl.when(start)
        def _():
            for cp in pair_copies(i, ssem, to_hbm=True):
                cp.wait()
        return lastg

    jax.lax.fori_loop(0, n_tok, drain, jnp.int32(-1))


@functools.partial(jax.jit,
                   static_argnames=("block_size", "interpret"),
                   donate_argnums=(0,))
def tq_cache_write(
    pools: tuple,              # N arrays [L, KH, NB, bs, last_j] (aliased)
    news: tuple,               # N arrays [T, KH, last_j]
    slot_mapping: jax.Array,   # [T] (-1 = skip)
    layer_idx,
    block_size: int,
    interpret: bool = False,
    num_tokens=None,
):
    """Scatter N new-row arrays into N aliased pools sharing the
    ``[L, KH, NB, bs, last]`` row structure (packed TQ uses up to 7:
    code hi/lo planes + scales/zeros — ``attention/quant_kv_cache.py``)."""
    bs = block_size
    t_pad = news[0].shape[0]
    kh = news[0].shape[1]
    layer = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    ntok = jnp.asarray(t_pad if num_tokens is None else num_tokens,
                       jnp.int32).reshape(1)
    pools = tuple(pools)
    news = tuple(
        jnp.broadcast_to(n.astype(p.dtype)[:, :, None, :],
                         (t_pad, kh, _GRP, p.shape[-1]))
        for n, p in zip(news, pools))
    n_arr = len(pools)

    kernel = functools.partial(_tq_write_kernel, t_pad=t_pad, bs=bs,
                               n_arr=n_arr)
    scratch = [pltpu.VMEM((t_pad, kh, _GRP, p.shape[-1]), p.dtype)
               for p in pools]
    scratch += [pltpu.SemaphoreType.DMA((t_pad, n_arr)),
                pltpu.SemaphoreType.DMA((t_pad, n_arr))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_arr
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        scratch_shapes=scratch,
    )
    # args: (layer, slots, ntok, new x5, pool x5)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pools],
        input_output_aliases={3 + n_arr + j: j for j in range(n_arr)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer, slot_mapping, ntok, *news, *pools)
    return tuple(out)

# SPDX-License-Identifier: Apache-2.0
"""Pipeline parallelism: SPMD stage loop over a ``pp`` mesh axis.

TPU-native counterpart of the reference's PP "Phase 0"
(``/root/reference/vllm_metal/distributed/pipeline.py:64``): contiguous
layer ranges per stage, activations handed stage-to-stage.  The
reference runs one OS process per stage with lazy TCP-ring send/recv
(``pipeline_send/recv:191,210``); here every device runs ONE compiled
program — stage weights and the KV pool shard their layer dim over the
``pp`` mesh axis, the stage loop runs under ``lax.fori_loop`` with
``lax.cond`` gating the active stage, and ``ppermute`` moves the hidden
activations over ICI.  The final hidden is psum-broadcast so logits are
replicated (the reference instead routes sampled ids back through the
scheduler, ``model_runner.py:1953``).

Same Phase-0 restrictions: uniform layer config (no sliding-window
patterns / YOCO / hybrid), layer count divisible by the stage count.
Parity contract mirrors the reference's ``tools/pp_parity_check.py``:
logits bit-exact vs the single-device path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..attention.kv_cache import PagedKVCache
from ..ops.quant_matmul import QuantLinear


def split_stage_weights(model: Any, weights: Any, num_stages: int) -> Any:
    """Per-layer weight list -> stacked leaves [S, L/S, ...].

    The stage dim (0) shards over the ``pp`` mesh axis; everything else
    (embedding, final norm, lm_head) replicates.
    """
    layers = weights.layers
    assert isinstance(layers, (list, tuple)), "PP needs per-layer weights"
    n = len(layers)
    if n % num_stages:
        raise ValueError(
            f"{n} layers not divisible by {num_stages} stages")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    def reshape(leaf):
        return leaf.reshape(num_stages, n // num_stages, *leaf.shape[1:])

    return dataclasses.replace(
        weights, layers=jax.tree.map(reshape, stacked))


def pp_weight_pspecs(weights: Any, pp_axis: str = "pp") -> Any:
    """Layer leaves get P(pp_axis) on the stage dim; the rest replicate."""
    def spec(path, leaf):
        names = [getattr(p, "name", None) for p in path]
        if "layers" in names:
            return P(pp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, weights)


def _select_layer(stage_layers, j):
    """Pick local layer j from leaves [Lloc, ...] (QuantLinear-aware)."""
    def sel(leaf):
        if isinstance(leaf, QuantLinear):
            return leaf.at_layer(j)
        return jax.lax.dynamic_index_in_dim(leaf, j, 0, keepdims=False)

    return jax.tree.map(sel, stage_layers,
                        is_leaf=lambda x: isinstance(x, QuantLinear))


class PipelineRunner:
    """Minimal PP step executor (greedy argmax), mirroring the shape of
    ``ModelRunner.execute`` for the pipeline topology."""

    def __init__(self, model: Any, weights: Any, cfg: Any, mesh: Mesh,
                 num_blocks: int, pp_axis: str = "pp",
                 use_pallas: Optional[bool] = None):
        from ..attention.backend import PagedAttentionBackend

        assert cfg.model.sliding_window_pattern is None \
            and not cfg.model.extra.get("num_kv_shared_layers") \
            and not cfg.model.is_mla, \
            "PP phase 0: uniform transformer layers only"
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.pp_axis = pp_axis
        self.num_stages = mesh.shape[pp_axis]
        self.backend = PagedAttentionBackend(cfg.model,
                                             use_pallas=use_pallas)
        self.weights = split_stage_weights(model, weights, self.num_stages)
        cache = PagedKVCache.allocate(
            cfg.model, cfg.cache, num_blocks,
            dtype=jnp.bfloat16 if cfg.cache.cache_dtype == "bfloat16"
            else jnp.float32)
        lloc = cfg.model.num_layers // self.num_stages
        self.kv = cache.kv.reshape(
            self.num_stages, lloc, *cache.kv.shape[1:])
        self.block_size = cache.block_size
        self.max_blocks_per_seq = max(
            1, cfg.model.max_model_len // cfg.cache.block_size)
        self._step = self._build_step()

    # ------------------------------------------------------------------
    def _build_step(self):
        model = self.model
        backend = self.backend
        S = self.num_stages
        bs = self.block_size
        axis = self.pp_axis
        w_specs = pp_weight_pspecs(self.weights, axis)

        def step(weights, kv, token_ids, md):
            layers_local = jax.tree.map(
                lambda leaf: leaf[0], weights.layers,
                is_leaf=lambda x: False)          # [1, Lloc, ...] -> [Lloc]
            lloc = jax.tree.leaves(layers_local)[0].shape[0]
            kvloc = kv[0]                          # [Lloc, nb, KH, 2bs, D]
            s = jax.lax.axis_index(axis)
            x = model.embed(weights, token_ids)

            def run_stage(x, kvloc):
                cache = PagedKVCache(kv=kvloc, block_size=bs)

                def body(carry, j):
                    x, cache = carry
                    lw = _select_layer(layers_local, j)
                    q, k, v = model.layer_qkv(lw, x, md.positions)
                    out, cache = backend.attend(j, q, k, v, cache, md,
                                                getattr(lw, "sinks", None))
                    x = model.layer_post_attn(lw, x, out)
                    return (x, cache), None

                (x, cache), _ = jax.lax.scan(
                    body, (x, cache), jnp.arange(lloc, dtype=jnp.int32))
                return x, cache.kv

            def stage_iter(i, carry):
                x, kvloc = carry
                x, kvloc = jax.lax.cond(
                    s == i, run_stage, lambda x, kv: (x, kv), x, kvloc)
                x = jax.lax.ppermute(
                    x, axis, [(j, (j + 1) % S) for j in range(S)])
                return x, kvloc

            x, kvloc = jax.lax.fori_loop(0, S, stage_iter, (x, kvloc))
            # the final permute parked the last stage's output on stage 0;
            # broadcast it so every device returns identical logits
            x = jax.lax.psum(
                jnp.where(s == 0, x, jnp.zeros_like(x)), axis)
            from ..models.common import rms_norm
            x = rms_norm(x, weights.final_norm, model.cfg.rms_norm_eps)
            logits = model.logits(weights, x)
            return logits, kvloc[None]

        from jax import shard_map
        sharded = shard_map(
            step, mesh=self.mesh,
            in_specs=(w_specs, P(axis), P(), P()),
            out_specs=(P(), P(axis)),
            check_vma=False)
        return functools.partial(jax.jit, donate_argnums=(1,))(sharded)

    # ------------------------------------------------------------------
    def forward_logits(self, token_ids, md) -> jax.Array:
        """Packed varlen batch -> logits [T_pad, V] (replicated)."""
        logits, self.kv = self._step(self.weights, self.kv,
                                     jnp.asarray(token_ids), md)
        return logits

    # ------------------------------------------------------------------
    # LLMEngine runner contract (the reference serves PP through the same
    # scheduler/model-runner seam: v1/model_runner.py:1930-1968 samples on
    # the last stage and feeds ids back through the scheduler; here logits
    # are psum-replicated so sampling is identical on every device).
    cache = None            # no hybrid state (phase 0: uniform layers)
    lora_manager = None

    def _token_bucket(self, n: int) -> int:
        for b in self.cfg.scheduler.token_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"{n} tokens exceeds the largest bucket "
            f"{self.cfg.scheduler.token_buckets[-1]}")

    def _sample_fn(self):
        if not hasattr(self, "_sample_c"):
            from ..engine.sampler import sample

            @jax.jit
            def fn(logits, qsl, st, step):
                rows = jnp.clip(qsl[1:] - 1, 0, logits.shape[0] - 1)
                return sample(logits[rows].astype(jnp.float32), st, step)

            self._sample_c = fn
        return self._sample_c

    def execute(self, seqs, sync: bool = True):
        """One engine step over the pipeline: prefill/decode packed batch
        -> sampled tokens.  No spec/LoRA/mm in PP phase 0 (launcher
        guards); grammar bitmasks ride the shared sampler."""
        import numpy as np

        from ..attention.metadata import build_metadata
        from ..engine.model_runner import StepOutput
        from ..engine.sampler import SamplingTensors

        assert seqs, "empty step"
        s_pad = self.cfg.scheduler.max_num_seqs
        total = sum(len(s.query_tokens) for s in seqs)
        t_pad = self._token_bucket(total)
        md = build_metadata(
            query_lens=[len(s.query_tokens) for s in seqs],
            context_lens=[s.context_len for s in seqs],
            block_tables=[s.block_table for s in seqs],
            block_size=self.block_size,
            token_pad=t_pad, seq_pad=s_pad,
            max_blocks_per_seq=self.max_blocks_per_seq)
        flat = np.zeros((t_pad,), np.int32)
        t = 0
        for s in seqs:
            flat[t:t + len(s.query_tokens)] = s.query_tokens
            t += len(s.query_tokens)
        ring = 64
        recent = np.full((s_pad, ring), -1, np.int32)
        for i, s in enumerate(seqs):
            r = s.recent_tokens[-ring:]
            if r:
                recent[i, :len(r)] = r
        bitmask = None
        if any(s.token_bitmask is not None for s in seqs):
            nwords = (self.cfg.model.vocab_size + 31) // 32
            bitmask = np.full((s_pad, nwords), 0xFFFFFFFF, np.uint32)
            for i, s in enumerate(seqs):
                if s.token_bitmask is not None:
                    bitmask[i] = s.token_bitmask
        st = SamplingTensors.from_lists(
            [s.params for s in seqs], s_pad, recent_tokens=recent,
            token_bitmask=bitmask)
        logits, self.kv = self._step(self.weights, self.kv,
                                     jnp.asarray(flat), md)
        step_idx = getattr(self, "step_counter", 0)
        tokens, logprobs, tkv, tki = self._sample_fn()(
            logits, md.query_start_loc, st,
            jnp.asarray(step_idx, jnp.int32))
        self.step_counter = step_idx + 1
        n = len(seqs)
        host = jax.device_get((tokens, logprobs, tkv, tki))
        return StepOutput(token_ids=host[0][:n], logprobs=host[1][:n],
                          topk_vals=host[2][:n], topk_ids=host[3][:n],
                          logits=logits[jnp.clip(
                              md.query_start_loc[1:] - 1, 0,
                              logits.shape[0] - 1)][:n])

# SPDX-License-Identifier: Apache-2.0
"""MTP (multi-token-prediction) draft proposer with target-KV sharing.

Re-implements the behavior of the reference's Gemma4 MTP assistant
(``/root/reference/vllm_metal/v1/gemma4_mtp.py:46``): an in-model draft
head that (a) consumes the target's final hidden state plus the embedding of
the freshly sampled token, (b) runs one extra transformer layer whose
attention READS the target's paged KV cache (the ``read_existing_kv`` KV
sharing plan — no separate draft cache), and (c) projects through the
target's lm_head to emit a 1-token draft.  Like the reference, drafts are
1-token and greedy-only.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..attention.metadata import build_metadata
from ..models.common import apply_rope, embed_lookup, rms_norm
from ..ops.paged_attention import paged_attention_ref
from ..ops.quant_matmul import QuantLinear, linear
from ..utils import static_dataclass


@static_dataclass()
class MTPHeadWeights:
    """One draft layer + the fusion projection (target vocab head reused)."""

    fuse: QuantLinear          # [H, 2H]: concat(hidden, embed) -> H
    attn_norm: jax.Array
    wq: QuantLinear
    wk: QuantLinear
    wv: QuantLinear
    wo: QuantLinear
    mlp_norm: jax.Array
    gate: QuantLinear
    up: QuantLinear
    down: QuantLinear
    final_norm: jax.Array


def init_mtp_head(cfg, key, dtype=jnp.float32) -> MTPHeadWeights:
    keys = iter(jax.random.split(key, 12))

    def dense(shape, scale=0.02):
        return QuantLinear.dense(
            (jax.random.normal(next(keys), shape, jnp.float32)
             * scale).astype(dtype))

    h = cfg.hidden_size
    return MTPHeadWeights(
        fuse=dense((h, 2 * h)),
        attn_norm=jnp.ones((h,), dtype),
        wq=dense((cfg.q_dim, h)),
        wk=dense((cfg.kv_dim, h)),
        wv=dense((cfg.kv_dim, h)),
        wo=dense((h, cfg.q_dim)),
        mlp_norm=jnp.ones((h,), dtype),
        gate=dense((cfg.intermediate_size, h)),
        up=dense((cfg.intermediate_size, h)),
        down=dense((h, cfg.intermediate_size)),
        final_norm=jnp.ones((h,), dtype),
    )


class MTPProposer:
    """Drafts one token per decode round from the target's state."""

    def __init__(self, target_model: Any, head: MTPHeadWeights,
                 runner: Any):
        self.model = target_model
        self.head = head
        self.runner = runner
        self.cfg = target_model.cfg
        self._fwd = None

    def release(self, request_id: str) -> None:
        pass

    def record_result(self, *a, **kw) -> None:
        pass

    # ------------------------------------------------------------------
    def _forward(self):
        if self._fwd is not None:
            return self._fwd
        cfg = self.cfg
        model = self.model

        @jax.jit
        def fwd(head: MTPHeadWeights, target_weights, kv_cache,
                hidden: jax.Array, token: jax.Array, md):
            """hidden [H], token []: one draft token via shared-KV attention.

            The draft query attends the target's LAST layer KV pool
            read-only (positions beyond the cached context are invisible,
            matching the reference's read_existing_kv plan).
            """
            emb = embed_lookup(target_weights.embedding, token[None])[0]
            x = linear(jnp.concatenate([hidden.astype(jnp.float32),
                                        emb.astype(jnp.float32)])[None, :],
                       head.fuse)
            hh = rms_norm(x, head.attn_norm, cfg.rms_norm_eps)
            q1 = linear(hh, head.wq).reshape(1, -1, cfg.head_dim)
            q1 = apply_rope(q1, md.positions[:1], model.inv_freq)
            # pad the single draft row to the metadata's token_pad
            t_pad = md.positions.shape[0]
            q = jnp.pad(q1, ((0, t_pad - 1), (0, 0), (0, 0)))
            layer = cfg.num_layers - 1
            # split pool [L, NB, 2, KH, bs, D] -> ref layout [KH, NB, *, D]
            kc = jnp.swapaxes(kv_cache[layer, :, 0], 0, 1)
            vc = jnp.swapaxes(kv_cache[layer, :, 1], 0, 1)
            out = paged_attention_ref(
                q, kc, vc, md, scale=cfg.head_dim ** -0.5)[:1]
            x = x + linear(out.reshape(1, -1), head.wo)
            hm = rms_norm(x, head.mlp_norm, cfg.rms_norm_eps)
            y = jax.nn.silu(linear(hm, head.gate).astype(jnp.float32)
                            ).astype(hm.dtype) * linear(hm, head.up)
            x = x + linear(y, head.down)
            x = rms_norm(x, head.final_norm, cfg.rms_norm_eps)
            logits = model.logits(target_weights, x)
            return jnp.argmax(logits[0]).astype(jnp.int32)

        self._fwd = fwd
        return fwd

    def propose_from_state(self, token_ids: list[int],
                           hidden: np.ndarray,
                           block_table: list[int]) -> list[int]:
        """1-token draft given the target's last hidden state."""
        runner = self.runner
        n = len(token_ids)
        md = build_metadata(
            query_lens=[1], context_lens=[n],
            block_tables=[block_table],
            block_size=runner.cfg.cache.block_size,
            token_pad=8, seq_pad=runner.cfg.scheduler.max_num_seqs,
            max_blocks_per_seq=runner.max_blocks_per_seq)
        fwd = self._forward()
        tok = fwd(self.head, runner.weights, runner.cache.kv,
                  jnp.asarray(hidden), jnp.asarray(token_ids[-1], jnp.int32),
                  md)
        return [int(tok)]

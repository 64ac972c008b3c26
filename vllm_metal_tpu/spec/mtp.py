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
    """Drafts one token per decode round from the target's state.

    The target's last hidden rows stay DEVICE-RESIDENT: each step the
    engine calls :meth:`stash_hidden` (an async device scatter into a
    per-request slot buffer) instead of fetching ``[S, H]`` to host —
    through a remote-dispatch tunnel that fetch cost tens of ms per step
    (r4 weak #5); the draft head gathers its rows on device."""

    def __init__(self, target_model: Any, head: MTPHeadWeights,
                 runner: Any):
        self.model = target_model
        self.head = head
        self.runner = runner
        self.cfg = target_model.cfg
        self._fwd = None
        nslots = runner.cfg.scheduler.max_num_seqs
        self._buf = jnp.zeros((nslots, target_model.cfg.hidden_size),
                              jnp.bfloat16)
        self._slots: dict[str, int] = {}
        self._free = list(range(nslots))
        self._scatter = jax.jit(
            lambda buf, hidden, rows, slots: buf.at[slots].set(
                hidden.astype(buf.dtype)[rows], mode="drop"),
            donate_argnums=(0,))

    # -- device-resident hidden-state slots ----------------------------
    def has_hidden(self, request_id: str) -> bool:
        return request_id in self._slots

    def stash_hidden(self, request_ids: list, hidden, rows: list) -> None:
        """Scatter ``hidden[rows[i]]`` into each request's slot (one async
        device dispatch; nothing crosses to host)."""
        if not request_ids:
            return
        nslots = self._buf.shape[0]
        slots = []
        for rid in request_ids:
            s = self._slots.get(rid)
            if s is None:
                if not self._free:      # shouldn't happen (<= max_num_seqs)
                    slots.append(nslots)    # out-of-bounds -> dropped
                    continue
                s = self._free.pop(0)
                self._slots[rid] = s
            slots.append(s)
        p = nslots - len(slots)
        rows_a = np.asarray(list(rows) + [0] * p, np.int32)
        slots_a = np.asarray(slots + [nslots] * p, np.int32)
        self._buf = self._scatter(self._buf, hidden,
                                  jnp.asarray(rows_a), jnp.asarray(slots_a))

    def release(self, request_id: str) -> None:
        s = self._slots.pop(request_id, None)
        if s is not None:
            self._free.append(s)

    def record_result(self, *a, **kw) -> None:
        pass

    # ------------------------------------------------------------------
    def _forward(self):
        if self._fwd is not None:
            return self._fwd
        cfg = self.cfg
        model = self.model
        use_pallas = getattr(self.runner.backend, "use_pallas", False)

        @jax.jit
        def fwd(head: MTPHeadWeights, target_weights, kv_cache,
                buf: jax.Array, slots: jax.Array, tokens: jax.Array, md):
            """buf [nslots, H] + slots [B], tokens [B]: one draft token per
            request via shared-KV attention — ONE dispatch for the whole
            decode-ready batch, hidden rows gathered ON DEVICE from the
            stash buffer.  Draft queries attend the target's LAST layer KV
            pool read-only (positions beyond the cached context are
            invisible, matching the reference's read_existing_kv plan)."""
            hidden = buf[jnp.clip(slots, 0, buf.shape[0] - 1)]
            b = hidden.shape[0]
            emb = embed_lookup(target_weights.embedding, tokens)   # [B, H]
            x = linear(jnp.concatenate(
                [hidden.astype(jnp.float32), emb.astype(jnp.float32)],
                axis=-1), head.fuse)                               # [B, H]
            hh = rms_norm(x, head.attn_norm, cfg.rms_norm_eps)
            q = linear(hh, head.wq).reshape(b, -1, cfg.head_dim)
            q = apply_rope(q, md.positions[:b], model.inv_freq)
            # pad q lanes to the pool's 128-multiple width
            # (kv_cache.allocate); rows are already the batch rows
            dp = kv_cache.shape[-1]
            q = jnp.pad(q, ((0, 0), (0, 0), (0, dp - cfg.head_dim)))
            layer = cfg.num_layers - 1
            if use_pallas:
                from ..ops.paged_attention_kernel import paged_attention
                out = paged_attention(
                    q, kv_cache, md, layer,
                    scale=cfg.head_dim ** -0.5)[:, :, :cfg.head_dim]
            else:
                # split pool [L, NB, 2, KH, bs, D] -> ref [KH, NB, *, D]
                kc = jnp.swapaxes(kv_cache[layer, :, 0], 0, 1)
                vc = jnp.swapaxes(kv_cache[layer, :, 1], 0, 1)
                out = paged_attention_ref(
                    q, kc, vc, md, scale=cfg.head_dim ** -0.5
                )[:, :, :cfg.head_dim]
            x = x + linear(out.reshape(b, -1), head.wo)
            hm = rms_norm(x, head.mlp_norm, cfg.rms_norm_eps)
            y = jax.nn.silu(linear(hm, head.gate).astype(jnp.float32)
                            ).astype(hm.dtype) * linear(hm, head.up)
            x = x + linear(y, head.down)
            x = rms_norm(x, head.final_norm, cfg.rms_norm_eps)
            logits = model.logits(target_weights, x)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B]

        self._fwd = fwd
        return fwd

    def propose_batch(self, reqs: list) -> dict[str, list[int]]:
        """reqs: [(request_id, token_ids, block_table), ...] -> one jitted
        dispatch covering every decode-ready request; hidden states come
        from the device-resident stash (no host round trip)."""
        if not reqs:
            return {}
        runner = self.runner
        b_pad = runner._seq_bucket(len(reqs))
        md = build_metadata(
            query_lens=[1] * len(reqs),
            context_lens=[len(t) for _, t, _ in reqs],
            block_tables=[bt for _, _, bt in reqs],
            block_size=runner.cfg.cache.block_size,
            token_pad=b_pad, seq_pad=b_pad,
            max_blocks_per_seq=runner.max_blocks_per_seq)
        nslots = self._buf.shape[0]
        slots = np.full((b_pad,), nslots, np.int32)
        toks = np.zeros((b_pad,), np.int32)
        for i, (rid, token_ids, _) in enumerate(reqs):
            slots[i] = self._slots[rid]
            toks[i] = token_ids[-1]
        fwd = self._forward()
        out = np.asarray(fwd(self.head, runner.weights, runner.cache.kv,
                             self._buf, jnp.asarray(slots),
                             jnp.asarray(toks), md))
        return {rid: [int(out[i])] for i, (rid, _, _) in enumerate(reqs)}

    def propose_from_state(self, token_ids: list[int],
                           hidden: np.ndarray,
                           block_table: list[int]) -> list[int]:
        """1-token draft for a single request (batched entry point above).

        ``hidden`` is stashed on device first (test/offline convenience)."""
        self.stash_hidden(["r"], jnp.asarray(hidden, jnp.float32)[None],
                          [0])
        try:
            return self.propose_batch([("r", token_ids, block_table)])["r"]
        finally:
            self.release("r")


def save_mtp_head(path: str, head: MTPHeadWeights) -> None:
    """Serialize an MTP head to safetensors (canonical names below)."""
    from safetensors.numpy import save_file
    import numpy as np
    tensors = {}
    for name in ("fuse", "wq", "wk", "wv", "wo", "gate", "up", "down"):
        ql = getattr(head, name)
        assert ql.kind == "dense", "only dense MTP heads serialize"
        tensors[name + ".weight"] = np.asarray(ql.w, np.float32)
    for name in ("attn_norm", "mlp_norm", "final_norm"):
        tensors[name + ".weight"] = np.asarray(getattr(head, name),
                                               np.float32)
    save_file(tensors, path)


def load_mtp_head(path: str, cfg, dtype=jnp.bfloat16) -> MTPHeadWeights:
    """Load an MTP head checkpoint.

    Accepts (a) the canonical layout written by :func:`save_mtp_head`
    (``fuse.weight``, ``wq.weight``, ...), or (b) HF-style draft-layer
    names (``eh_proj.weight`` for the fusion projection and
    ``model.layers.0.self_attn.q_proj.weight`` etc.) — the reference loads
    a full assistant checkpoint for the same role
    (``/root/reference/vllm_metal/v1/gemma4_mtp.py:46``).
    """
    import os
    from safetensors import safe_open
    import numpy as np

    if os.path.isdir(path):
        import glob as _glob
        files = sorted(_glob.glob(os.path.join(path, "*.safetensors")))
    else:
        files = [path]
    tensors: dict[str, np.ndarray] = {}
    for fp in files:
        with safe_open(fp, framework="numpy") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)

    def arr(*names):
        for n in names:
            if n in tensors:
                a = tensors[n]
                if a.dtype == np.uint16:
                    a = (a.astype(np.uint32) << 16).view(np.float32)
                return jnp.asarray(np.asarray(a, np.float32), dtype=dtype)
        raise KeyError(f"MTP head tensor missing: tried {names}")

    def lin(*names):
        return QuantLinear.dense(arr(*names))

    p = "model.layers.0."
    return MTPHeadWeights(
        fuse=lin("fuse.weight", "eh_proj.weight", p + "eh_proj.weight"),
        attn_norm=arr("attn_norm.weight", p + "input_layernorm.weight"),
        wq=lin("wq.weight", p + "self_attn.q_proj.weight"),
        wk=lin("wk.weight", p + "self_attn.k_proj.weight"),
        wv=lin("wv.weight", p + "self_attn.v_proj.weight"),
        wo=lin("wo.weight", p + "self_attn.o_proj.weight"),
        mlp_norm=arr("mlp_norm.weight",
                     p + "post_attention_layernorm.weight"),
        gate=lin("gate.weight", p + "mlp.gate_proj.weight"),
        up=lin("up.weight", p + "mlp.up_proj.weight"),
        down=lin("down.weight", p + "mlp.down_proj.weight"),
        final_norm=arr("final_norm.weight", "model.norm.weight"),
    )

# SPDX-License-Identifier: Apache-2.0
"""Decode-step anatomy by ablation (the profiler hangs on this platform).

Runs the REAL multi-step decode window (bench configuration) with
components knocked out via monkeypatching, and reports the deltas:

  full           : the production step
  no_write       : KV write skipped             -> write cost
  no_attn        : attention -> identity (write kept) -> attn read cost
  no_attn_write  : both out                     -> weights+elementwise path

Each variant compiles its own program; times are best-of-N of a window-of-8
dispatch (device-side loop, host dispatch amortized).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def make_runner(args):
    import bench as B
    from vllm_metal_tpu.engine.model_runner import ModelRunner
    model, weights, cfg = B.build_model("llama3-8b")
    bs = cfg.cache.block_size
    blocks_needed = args.batch * -(-(args.ctx + args.window * 4 + 2) // bs) + 2
    blocks_needed = -(-blocks_needed // 128) * 128
    weights = model.fuse_projections(weights)
    weights = model.stack_layers(weights)
    runner = ModelRunner(model, weights, cfg, num_blocks=blocks_needed)
    return runner, cfg


def time_window(runner, cfg, args, iters=4):
    from vllm_metal_tpu.engine.model_runner import SeqStepInput
    from vllm_metal_tpu.engine.sampling_params import SamplingParams
    bs = cfg.cache.block_size
    w = args.window
    blocks_per_seq = -(-(args.ctx + w * 4 + 2) // bs)
    tables = [list(range(1 + i * blocks_per_seq,
                         1 + (i + 1) * blocks_per_seq))
              for i in range(args.batch)]
    gp = SamplingParams(temperature=0.0)

    def seqs(cl):
        return [SeqStepInput(query_tokens=[7], context_len=cl,
                             block_table=tables[i], params=gp)
                for i in range(args.batch)]

    # chained windows, one fetch per pass (r4: tunnel RTT is ~28 ms, a
    # per-window sync would read ~3.5 ms/step of pure host latency)
    h = runner.execute_decode_window(seqs(args.ctx + 1), w, sync=False)
    h = runner.execute_decode_window(seqs(args.ctx + 1 + w), w,
                                     sync=False, feed=h["feed"])
    runner.fetch_windows([h])  # compile both programs
    n_win = 6
    best = float("inf")
    for it in range(iters):
        t0 = time.perf_counter()
        h = None
        hs = []
        for wd in range(n_win):
            # cycle cl within the block-table coverage (timing only —
            # KV contents are irrelevant, table bounds are not)
            cl = args.ctx + 1 + ((it * n_win + wd) % 3) * w
            h = runner.execute_decode_window(
                seqs(cl), w, sync=False,
                feed=None if h is None else h["feed"])
            hs.append(h)
        runner.fetch_windows(hs)
        best = min(best, time.perf_counter() - t0)
    return best / (w * n_win)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--variants", default="full,no_write,no_attn,no_attn_write")
    args = ap.parse_args()

    from vllm_metal_tpu.attention import backend as bk
    from vllm_metal_tpu.attention.kv_cache import PagedKVCache

    orig_attend = bk.PagedAttentionBackend.attend
    orig_write = PagedKVCache.write

    def attend_skip_write(self, layer_idx, q, k, v, cache, md, sinks=None,
                          tq_plan=None):
        out, _ = orig_attend(self, layer_idx, q, k, v, cache, md, sinks,
                             tq_plan=tq_plan)
        return out, cache

    def attend_identity(self, layer_idx, q, k, v, cache, md, sinks=None,
                        tq_plan=None):
        kw = {"plan": tq_plan} if tq_plan is not None else {}
        cache = cache.write(layer_idx, k, v, md.slot_mapping,
                            num_tokens=md.num_tokens, **kw)
        return q, cache

    def attend_neither(self, layer_idx, q, k, v, cache, md, sinks=None,
                       tq_plan=None):
        return q, cache

    variants = {
        "full": orig_attend,
        "no_write": attend_skip_write,
        "no_attn": attend_identity,
        "no_attn_write": attend_neither,
        # layered knockouts on top of no_attn_write (isolate the
        # non-layer costs of the window program):
        "naw_no_head": attend_neither,       # + logits head -> zeros
        "naw_no_embed_head": attend_neither,  # + embed -> zeros too
        # matmuls -> cheap broadcast (weights never stream): what's left
        # of the full step is attention+write+glue
        "no_matmul": orig_attend,
    }

    from vllm_metal_tpu.models import llama as _llama
    import jax.numpy as jnp
    orig_logits = _llama.LlamaModel.logits
    orig_embed = _llama.LlamaModel.embed

    def zero_logits(self, weights, hidden):
        # tiny head: keeps the argmax/token feedback structure, removes
        # the lm-head matmul cost
        return hidden[:, :128].astype(jnp.float32)

    def zero_embed(self, weights, token_ids):
        h = self.cfg.hidden_size
        return (token_ids[:, None] * 0).astype(jnp.bfloat16) + \
            jnp.zeros((1, h), jnp.bfloat16)

    from vllm_metal_tpu.models import llama as _l2
    orig_linear = _l2.linear

    def cheap_linear(x, ql, *a, **kw):
        n = ql.w.shape[-1] if ql.layout == "kn" else ql.w.shape[-2]
        if ql.stacked:
            n = ql.w.shape[-1]
        return jnp.zeros((x.shape[0], n), x.dtype) + x[:, :1]

    results = {}
    runner, cfg = make_runner(args)
    for name in args.variants.split(","):
        bk.PagedAttentionBackend.attend = variants[name]
        _llama.LlamaModel.logits = zero_logits \
            if name.startswith("naw_no_") else orig_logits
        _llama.LlamaModel.embed = zero_embed \
            if name == "naw_no_embed_head" else orig_embed
        _l2.linear = cheap_linear if name == "no_matmul" else orig_linear
        runner._compiled.clear()
        t0 = time.perf_counter()
        ms = time_window(runner, cfg, args) * 1e3
        results[name] = ms
        print(f"{name:15s}: {ms:7.3f} ms/step   "
              f"(incl compile {time.perf_counter()-t0:.0f}s)", flush=True)
    bk.PagedAttentionBackend.attend = orig_attend
    _llama.LlamaModel.logits = orig_logits
    _llama.LlamaModel.embed = orig_embed

    if "full" in results and "no_write" in results:
        print(f"write cost   : {results['full']-results['no_write']:7.3f} ms")
    if "no_write" in results and "no_attn_write" in results:
        print(f"attn cost    : "
              f"{results['no_write']-results['no_attn_write']:7.3f} ms")
    if "no_attn" in results and "no_attn_write" in results:
        print(f"write cost(2): "
              f"{results['no_attn']-results['no_attn_write']:7.3f} ms")


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""Perplexity harness: teacher-forced NLL over a text file.

BASELINE.md north star 3 wants Δppl(quantized GGUF vs fp16) ≤ the
reference's gap.  This environment has zero egress (no real checkpoints
downloadable — see docs/validation.md), so the harness is committed
ready-to-run: point it at any real GGUF/HF checkpoint and a text file.

    python tools/perplexity.py model.gguf --text wiki.txt \
        [--ctx 2048] [--stride 1024] [--max-tokens 65536]

Sliding-window evaluation (llama.cpp-compatible protocol): windows of
``ctx`` tokens advance by ``stride``; only the last ``stride`` positions
of each window are scored, so every scored token sees >= ctx - stride
tokens of context.  Prints one JSON line with nll/token and ppl.
Run twice (quantized vs fp) and diff the ppl for the Δppl number.
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Some sandboxes install a jax platform plugin that wins platform selection
# even when JAX_PLATFORMS is set in the environment; pin it explicitly via
# config (which the plugin respects) so `JAX_PLATFORMS=cpu tools/perplexity.py`
# really runs on CPU (tests/test_multihost.py's child uses the same idiom).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def load(model_path: str):
    from vllm_metal_tpu.engine.tokenizer import from_gguf, from_hf
    from vllm_metal_tpu.gguf.reader import GGUFFile

    if model_path.endswith(".gguf"):
        from vllm_metal_tpu.gguf.loader import load_model
        model, weights, cfg = load_model(model_path)
        tok = from_gguf(GGUFFile(model_path))
    else:
        from vllm_metal_tpu.models.hf_loader import load_hf_model
        model, weights, cfg = load_hf_model(model_path)
        tok = from_hf(model_path)
    return model, weights, cfg, tok


def window_nll(model, weights, cfg, ids: np.ndarray, score_from: int,
               use_pallas=None) -> tuple[float, int]:
    """Sum NLL of ids[score_from:] given full causal context (one window).

    Dense prefill through the paged runtime (one sequence, enough blocks
    to hold the window) — logits for EVERY position, log-softmax scored
    against the next token.
    """
    from vllm_metal_tpu.attention.backend import PagedAttentionBackend
    from vllm_metal_tpu.attention.kv_cache import PagedKVCache
    from vllm_metal_tpu.attention.metadata import build_metadata
    from vllm_metal_tpu.config import CacheConfig

    t = len(ids)
    t_pad = -(-t // 128) * 128
    bs = 128
    nblocks = t_pad // bs + 2
    ccfg = CacheConfig(block_size=bs)
    backend = PagedAttentionBackend(cfg, use_pallas=use_pallas)
    cache = PagedKVCache.allocate(cfg, ccfg, nblocks)
    md = build_metadata(
        query_lens=[t], context_lens=[t],
        block_tables=[list(range(1, 1 + t_pad // bs))],
        block_size=bs, token_pad=t_pad, seq_pad=2,
        max_blocks_per_seq=t_pad // bs + 1)
    tokens = np.zeros((t_pad,), np.int32)
    tokens[:t] = ids

    @jax.jit
    def fwd(weights, cache, tokens):
        rt, _ = backend.make_attn_fn(cache, md)
        hidden = model.forward_hidden(weights, tokens, md.positions, rt)
        logits = model.logits(weights, hidden).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nxt = jnp.concatenate([tokens[1:], tokens[:1]])
        tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
        return tok_lp

    tok_lp = np.asarray(fwd(weights, cache, jnp.asarray(tokens)))
    # score positions score_from .. t-2 (each predicts ids[i+1])
    sl = tok_lp[score_from:t - 1]
    return float(-sl.sum()), int(sl.size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--text", required=True,
                    help="UTF-8 text file to score")
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--stride", type=int, default=1024)
    ap.add_argument("--max-tokens", type=int, default=65536)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    model, weights, cfg, tok = load(args.model)
    with open(args.text, encoding="utf-8") as f:
        text = f.read()
    ids = np.asarray(tok.encode(text)[:args.max_tokens], np.int32)
    print(f"scoring {len(ids)} tokens, ctx={args.ctx} "
          f"stride={args.stride}", file=sys.stderr)

    total_nll, total_n = 0.0, 0
    start = 0
    while start < len(ids) - 1:
        end = min(start + args.ctx, len(ids))
        window = ids[start:end]
        score_from = 0 if start == 0 else args.ctx - args.stride
        nll, n = window_nll(model, weights, cfg, window, score_from,
                            use_pallas=False if args.no_pallas else None)
        total_nll += nll
        total_n += n
        print(f"  [{start}:{end}] nll/tok="
              f"{total_nll / max(total_n, 1):.4f}", file=sys.stderr)
        if end == len(ids):
            break
        start += args.stride
    print(json.dumps({
        "model": args.model,
        "tokens_scored": total_n,
        "nll_per_token": round(total_nll / max(total_n, 1), 5),
        "perplexity": round(math.exp(total_nll / max(total_n, 1)), 4),
        "ctx": args.ctx, "stride": args.stride,
    }))


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""Speculative-decoding serving benchmark (ngram proposer, 8B shapes).

Measures what the reference documents for its draft-model SD
(``/root/reference/docs/speculative_decoding.md`` "Performance":
1.36-1.48x TPOT single-stream): tokens/s THROUGH THE ENGINE with the
proposer on vs off, plus the acceptance rate.  The ngram proposer's
acceptance depends on output repetitiveness, so the prompt set uses
repeating token patterns — this benchmarks the verify/accept MACHINERY
at a stated acceptance rate, not language-model draftability (no real
checkpoint in this environment; docs/validation.md).

    python tools/spec_bench.py [--conc 1] [--num-spec 3]
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


def build(spec_tokens: int):
    import bench as B
    from vllm_metal_tpu.config import SpecConfig
    from vllm_metal_tpu.engine.engine import LLMEngine
    from vllm_metal_tpu.engine.model_runner import ModelRunner

    model, weights, cfg = B.build_model(
        "llama3-8b" if jax.default_backend() == "tpu" else "tiny")
    if spec_tokens:
        cfg.spec.method = "ngram"
        cfg.spec.num_speculative_tokens = spec_tokens
        cfg.spec.ngram_min = 1
    weights = model.fuse_projections(weights)
    weights = model.stack_layers(weights)
    runner = ModelRunner(model, weights, cfg, num_blocks=384)
    eng = LLMEngine(model, weights, cfg, num_blocks=384, runner=runner)
    return eng


def run(eng, conc: int, max_tokens: int, prompt_len: int = 96):
    from vllm_metal_tpu.engine.sampling_params import SamplingParams
    # repeating pattern -> the greedy continuation tends to repeat, and
    # the ngram proposer drafts the repeats
    base = [11, 23, 47, 61]
    for i in range(conc):
        p = (base * ((prompt_len // len(base)) + 1))[:prompt_len]
        p[0] = 5 + i
        eng.add_request(p, SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens,
                                          ignore_eos=True))
    # warm pass
    while eng.has_unfinished():
        eng.step()
    eng.num_accepted_drafts = eng.num_proposed_drafts = 0
    for i in range(conc):
        p = (base * ((prompt_len // len(base)) + 1))[:prompt_len]
        p[0] = 50 + i
        eng.add_request(p, SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens,
                                          ignore_eos=True))
    t0 = time.perf_counter()
    generated = 0
    while eng.has_unfinished():
        for out in eng.step():
            generated += len(out.new_token_ids)
    dt = time.perf_counter() - t0
    acc = (eng.num_accepted_drafts / eng.num_proposed_drafts
           if eng.num_proposed_drafts else 0.0)
    return generated / dt, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conc", type=int, default=1)
    ap.add_argument("--num-spec", type=int, default=3)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--window", type=int, default=0,
                    help="decode_window for BOTH engines (0 = off): with "
                         "windows on, the engine auto-skips drafting for "
                         "window-eligible batches, so spec can only help")
    args = ap.parse_args()

    for conc in (args.conc, 8):
        base_eng = build(0)
        if args.window:
            base_eng.cfg.scheduler.decode_window = args.window
        base_tps, _ = run(base_eng, conc, args.max_tokens)
        del base_eng
        spec_eng = build(args.num_spec)
        if args.window:
            spec_eng.cfg.scheduler.decode_window = args.window
        spec_tps, acc = run(spec_eng, conc, args.max_tokens)
        del spec_eng
        print(f"conc={conc} window={args.window}: "
              f"base {base_tps:.1f} tok/s, "
              f"spec(k={args.num_spec}) {spec_tps:.1f} tok/s "
              f"({spec_tps / base_tps:.2f}x), acceptance {acc:.2f}",
              flush=True)


if __name__ == "__main__":
    main()

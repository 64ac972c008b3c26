# SPDX-License-Identifier: Apache-2.0
"""Capture a jax.profiler trace of the bench decode window and print the
per-kernel device-time breakdown (ground truth for the roofline work).

Usage: python tools/profile_step.py [--batch 16] [--ctx 1024]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--outdir", default="/tmp/jaxtrace")
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()

    import bench as B

    model, weights, cfg = B.build_model("llama3-8b")
    bs = cfg.cache.block_size
    blocks_needed = args.batch * -(-(args.ctx + 64) // bs) + 2
    blocks_needed = -(-blocks_needed // 128) * 128
    weights = model.fuse_projections(weights)
    weights = model.stack_layers(weights)
    from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
    from vllm_metal_tpu.engine.sampling_params import SamplingParams
    runner = ModelRunner(model, weights, cfg, num_blocks=blocks_needed)
    del weights

    blocks_per_seq = -(-(args.ctx + 34) // bs)
    tables = [list(range(1 + i * blocks_per_seq, 1 + (i + 1) * blocks_per_seq))
              for i in range(args.batch)]
    gp = SamplingParams(temperature=0.0)

    def seqs(cl):
        return [SeqStepInput(query_tokens=[7], context_len=cl,
                             block_table=tables[i], params=gp)
                for i in range(args.batch)]

    w = args.window
    runner.execute_decode_window(seqs(args.ctx + 1), w)  # compile
    t0 = time.perf_counter()
    runner.execute_decode_window(seqs(args.ctx + 1 + w), w)
    print(f"window of {w}: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"({(time.perf_counter()-t0)*1e3/w:.2f} ms/step)", file=sys.stderr)

    os.system(f"rm -rf {args.outdir}")
    with jax.profiler.trace(args.outdir):
        runner.execute_decode_window(seqs(args.ctx + 1 + 2 * w), w)

    # parse trace: find the .trace.json.gz perfetto/chrome trace
    paths = glob.glob(f"{args.outdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # device-side complete events: pid/tid naming varies; use events with
    # 'dur' on TensorCore pids
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    import re
    agg = {}
    cnt = {}
    total = 0.0
    top = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        if name.startswith("jit_"):
            top += dur               # parent envelope; children re-count
            continue
        base = re.sub(r"[.\d]+$", "", name)
        agg[base] = agg.get(base, 0.0) + dur
        cnt[base] = cnt.get(base, 0) + 1
        total += dur
    print(f"pids: {pids}", file=sys.stderr)
    print(f"\njit envelope: {top:.2f} ms ({top / w:.2f} ms/step); "
          f"children sum {total:.2f} ms over window of {w}")
    print(f"{'total ms':>9}  {'/step':>8}  {'n':>5}  op")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        if ms < 0.05:
            continue
        print(f"{ms:9.3f}  {ms/w:8.3f}  {cnt[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    main()

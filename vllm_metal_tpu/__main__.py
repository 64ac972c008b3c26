# SPDX-License-Identifier: Apache-2.0
"""CLI: ``python -m vllm_metal_tpu serve model.gguf [--port 8000] ...``"""

from __future__ import annotations

import argparse
import logging

from . import envs


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    ap = argparse.ArgumentParser(prog="vllm_metal_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve", help="start the OpenAI-compatible server")
    s.add_argument("model", help="path to a .gguf checkpoint")
    s.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir/id (default: GGUF-embedded)")
    s.add_argument("--host", default=envs.HOST)
    s.add_argument("--port", type=int, default=envs.PORT)
    s.add_argument("--max-model-len", type=int, default=None)
    s.add_argument("--block-size", type=int, default=64)
    s.add_argument("--max-num-seqs", type=int, default=64)
    s.add_argument("--max-num-batched-tokens", type=int, default=2048)
    s.add_argument("--gpu-memory-utilization", "--memory-fraction",
                   dest="memory_fraction", type=float, default=None)
    s.add_argument("--num-blocks", type=int, default=None)
    s.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    s.add_argument("--pipeline-parallel-size", "-pp", type=int, default=1)
    s.add_argument("--coordinator-address", default=None,
                   help="host:port for multi-host jax.distributed")
    s.add_argument("--num-hosts", type=int, default=None)
    s.add_argument("--host-id", type=int, default=None)
    s.add_argument("--kv-quant-k", default="")
    s.add_argument("--kv-quant-v", default="")
    s.add_argument("--decode-window", type=int, default=1,
                   help="multi-step decode scheduling window (1 = off)")
    s.add_argument("--speculative-method", default="",
                   choices=["", "ngram", "draft_model", "mtp"],
                   help="speculative decoding method")
    s.add_argument("--num-speculative-tokens", type=int, default=4)
    s.add_argument("--draft-model", default=None,
                   help="draft checkpoint for --speculative-method "
                        "draft_model (.gguf or HF dir)")
    s.add_argument("--mtp-head", default=None,
                   help="MTP head safetensors for --speculative-method mtp")
    s.add_argument("--lora", action="append", default=[],
                   metavar="NAME=PATH",
                   help="load a PEFT LoRA adapter (repeatable); select "
                        "per request via lora_name or model=NAME")
    s.add_argument("--max-loras", type=int, default=4)
    s.add_argument("--served-model-name", default=None)

    lbp = sub.add_parser(
        "serve-lb",
        help="data-parallel front: load-balance over replica servers")
    lbp.add_argument("--backends", required=True,
                     help="comma-separated replica base URLs "
                          "(e.g. http://h1:8000,http://h2:8000)")
    lbp.add_argument("--host", default="0.0.0.0")
    lbp.add_argument("--port", type=int, default=8080)

    args = ap.parse_args()
    if args.cmd == "serve-lb":
        from .server.lb import serve_lb
        serve_lb([b.strip() for b in args.backends.split(",") if b.strip()],
                 host=args.host, port=args.port)
        return
    if args.cmd == "serve":
        from .parallel import init_multihost
        init_multihost(args.coordinator_address, args.num_hosts,
                       args.host_id)
        from .stt import is_stt_model
        if is_stt_model(args.model):
            import json
            import os
            from .server.stt_server import serve_stt
            with open(os.path.join(args.model, "config.json")) as f:
                mt = json.load(f).get("model_type", "").lower()
            if mt == "whisper":
                from .stt.transcriber import load_transcriber
                tr = load_transcriber(args.model)
            else:
                from .stt.qwen3_asr import load_asr_transcriber
                tr = load_asr_transcriber(args.model)
            serve_stt(tr, host=args.host, port=args.port,
                      model_name=args.served_model_name or args.model)
            return
        from .engine.launcher import build_engine
        from .server.openai_server import serve
        engine, tok = build_engine(
            args.model, tokenizer_path=args.tokenizer,
            max_model_len=args.max_model_len, block_size=args.block_size,
            max_num_seqs=args.max_num_seqs,
            max_num_batched_tokens=args.max_num_batched_tokens,
            memory_fraction=args.memory_fraction,
            num_blocks=args.num_blocks,
            tensor_parallel_size=args.tensor_parallel_size,
            pipeline_parallel_size=args.pipeline_parallel_size,
            kv_quant_k=args.kv_quant_k, kv_quant_v=args.kv_quant_v,
            decode_window=args.decode_window,
            spec_method=args.speculative_method,
            num_speculative_tokens=args.num_speculative_tokens,
            draft_model_path=args.draft_model,
            mtp_head_path=args.mtp_head,
            lora_adapters=dict(kv.split("=", 1) for kv in args.lora)
            or None,
            max_loras=args.max_loras)
        import jax
        if jax.process_count() > 1:
            # multi-host lockstep serving: every host built the same
            # engine on its shards; process 0 serves HTTP and broadcasts
            # the request stream, the rest replay it
            # (docs/distributed.md "Multi-host")
            from .parallel.multihost import RequestFeed, run_follower
            feed = RequestFeed()
            if jax.process_index() == 0:
                serve(engine, tok, host=args.host, port=args.port,
                      model_name=args.served_model_name or args.model,
                      feed=feed)
            else:
                run_follower(engine, feed)
            return
        serve(engine, tok, host=args.host, port=args.port,
              model_name=args.served_model_name or args.model)


if __name__ == "__main__":
    main()

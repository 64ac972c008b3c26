# SPDX-License-Identifier: Apache-2.0
"""Engine construction: checkpoint -> model/weights/tokenizer -> LLMEngine.

Covers the roles of the reference's ``ModelLifecycle`` + ``WorkerCachePlanner``
(``/root/reference/vllm_metal/v1/model_lifecycle.py:115``,
``cache_policy.py:826``): load + dims, then budget HBM for the paged pool
(limit * fraction - bytes already in use after weight upload -> num_blocks).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax

from .. import envs
from ..config import CacheConfig, EngineConfig, ParallelConfig, \
    SchedulerConfig
from .engine import LLMEngine

logger = logging.getLogger(__name__)

MIN_BLOCKS = 16


def plan_num_blocks(bytes_per_block: int, fraction: float,
                    reserved_bytes: int = 512 << 20,
                    device: Optional[Any] = None) -> int:
    """HBM budget -> paged-pool block count (run after weights are loaded)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    limit = stats.get("bytes_limit", 16 << 30)
    in_use = stats.get("bytes_in_use", 0)
    budget = int(limit * fraction) - in_use - reserved_bytes
    n = max(MIN_BLOCKS, budget // bytes_per_block)
    logger.info(
        "memory plan: limit=%.2fGB in_use=%.2fGB fraction=%.2f -> "
        "%d blocks (%.2fGB)", limit / 1e9, in_use / 1e9, fraction, n,
        n * bytes_per_block / 1e9)
    return int(n)


def build_engine(model_path: str,
                 tokenizer_path: Optional[str] = None,
                 max_model_len: Optional[int] = None,
                 block_size: int = 64,
                 max_num_seqs: int = 64,
                 max_num_batched_tokens: int = 2048,
                 memory_fraction: Optional[float] = None,
                 num_blocks: Optional[int] = None,
                 tensor_parallel_size: int = 1,
                 pipeline_parallel_size: int = 1,
                 use_pallas: Optional[bool] = None,
                 kv_quant_k: str = "", kv_quant_v: str = "",
                 decode_window: int = 1,
                 spec_method: str = "",
                 num_speculative_tokens: int = 4,
                 draft_model_path: Optional[str] = None,
                 mtp_head_path: Optional[str] = None,
                 lora_adapters: Optional[dict] = None,
                 max_loras: int = 4,
                 ) -> tuple[LLMEngine, Any]:
    """Returns (engine, tokenizer).  model_path: .gguf file (for now)."""
    from ..attention.kv_cache import PagedKVCache
    from ..gguf.loader import load_model
    from ..gguf.reader import GGUFFile
    from .model_runner import ModelRunner
    from .tokenizer import from_gguf, from_hf

    import os
    if model_path.endswith(".gguf"):
        model, weights, mcfg = load_model(model_path)
        tok = from_hf(tokenizer_path) if tokenizer_path \
            else from_gguf(GGUFFile(model_path))
    elif os.path.isdir(model_path):
        import json
        with open(os.path.join(model_path, "config.json")) as f:
            hf_cfg = json.load(f)
        from ..models.hf_loader import (PADDLE_ARCHS, VL3_ARCHS, VL_ARCHS,
                                        load_hf_model)
        arch0 = hf_cfg.get("architectures", [""])[0]
        if "quantization_config" in hf_cfg and \
                str(hf_cfg["quantization_config"].get(
                    "quant_method", "")).lower() == "awq":
            from ..gguf.awq_loader import load_awq_model
            model, weights, mcfg = load_awq_model(model_path)
        elif arch0 in PADDLE_ARCHS:
            from ..models.paddle_vl import load_hf_paddle_vl_model
            model, weights, mcfg = load_hf_paddle_vl_model(model_path)
        elif arch0 in VL3_ARCHS:
            from ..models.qwen3_vl_mm import load_hf_qwen3vl_model
            model, weights, mcfg = load_hf_qwen3vl_model(model_path)
        elif arch0 in VL_ARCHS:
            from ..models.qwen2_vl import load_hf_vl_model
            model, weights, mcfg = load_hf_vl_model(model_path)
        else:
            model, weights, mcfg = load_hf_model(model_path)
        tok = from_hf(tokenizer_path or model_path)
    else:
        raise ValueError(
            f"{model_path}: expected a .gguf file or a HF checkpoint dir")
    if max_model_len:
        mcfg.max_model_len = min(max_model_len, mcfg.max_model_len) \
            if mcfg.max_model_len else max_model_len

    if (kv_quant_k and jax.default_backend() == "tpu"
            and block_size != 128 and mcfg.head_dim % 128 == 0):
        # the Pallas TQ kernels need one block == one 128-token KV tile
        # (128-lane DMA alignment, docs/quantization.md "Kernel status");
        # other sizes would run the slow jnp fallback on chip
        logger.warning(
            "kv-quant on TPU: raising block_size %d -> 128 so the Pallas "
            "TQ kernels engage", block_size)
        block_size = 128

    from ..config import SpecConfig
    cfg = EngineConfig(
        model=mcfg,
        cache=CacheConfig(block_size=block_size, kv_quant_k=kv_quant_k,
                          kv_quant_v=kv_quant_v),
        scheduler=SchedulerConfig(
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            decode_window=decode_window),
        parallel=ParallelConfig(tensor_parallel_size=tensor_parallel_size,
                                pipeline_parallel_size=pipeline_parallel_size),
        spec=SpecConfig(method=spec_method,
                        num_speculative_tokens=num_speculative_tokens)
        if spec_method else SpecConfig(),
    )

    mesh = None
    if tensor_parallel_size > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(tp=tensor_parallel_size)

    if num_blocks is None:
        # weights are on device now; measure what's left
        jax.block_until_ready(jax.tree.leaves(weights)[0])
        if kv_quant_k:
            # packed pools are 2.6-5.2x smaller per block: plan with the
            # REAL footprint so compression buys more cached context
            from ..attention.quant_kv_cache import QuantPagedKVCache
            tmp = QuantPagedKVCache.allocate(mcfg, cfg.cache, 1)
        else:
            tmp = PagedKVCache.allocate(mcfg, cfg.cache, 1)
        fraction = memory_fraction if memory_fraction is not None \
            else envs.MEMORY_FRACTION
        num_blocks = plan_num_blocks(tmp.bytes_per_block(), fraction)
        max_useful = (max_num_seqs
                      * -(-mcfg.max_model_len // block_size)) + 1
        num_blocks = min(num_blocks, max_useful)

    lora_manager = None
    if lora_adapters:
        from ..lora.manager import LoRAManager
        from ..lora.peft_loader import load_peft_adapter
        adapters = {name: load_peft_adapter(path, mcfg)
                    for name, path in lora_adapters.items()}
        max_rank = max(a.rank for a in adapters.values())
        lora_manager = LoRAManager(mcfg, max_loras=max_loras,
                                   max_rank=max(max_rank, 8))
        for name, adapter in adapters.items():
            lora_manager.add_adapter(name, adapter)
            logger.info("loaded LoRA adapter %r (rank %d)", name,
                        adapter.rank)

    if pipeline_parallel_size > 1:
        # stage-sharded serving (phase 0): no spec/LoRA/window/quant-KV
        if spec_method or lora_manager is not None or decode_window > 1 \
                or kv_quant_k:
            raise ValueError(
                "pipeline_parallel_size > 1 does not compose with "
                "spec decode, LoRA, decode windows, or quantized KV yet")
        import numpy as np
        from jax.sharding import Mesh
        from ..parallel.pipeline import PipelineRunner
        pp = pipeline_parallel_size
        if len(jax.devices()) < pp:
            raise ValueError(
                f"pipeline_parallel_size={pp} needs {pp} devices, "
                f"have {len(jax.devices())}")
        pmesh = Mesh(np.asarray(jax.devices()[:pp]), (cfg.parallel.pp_axis,))
        runner = PipelineRunner(model, weights, cfg, pmesh,
                                num_blocks=num_blocks,
                                pp_axis=cfg.parallel.pp_axis,
                                use_pallas=use_pallas)
        del weights
        engine = LLMEngine(model, None, cfg, num_blocks=num_blocks,
                           tokenizer=tok, eos_token_id=tok.eos_token_id,
                           runner=runner)
        return engine, tok

    if mesh is None and hasattr(model, "fuse_projections") \
            and isinstance(getattr(weights, "layers", None), list):
        # fuse here with rebinding so the split originals free before
        # the runner allocates the KV pool (peak-memory discipline:
        # originals + fused + pool all live at once can exceed HBM)
        weights = model.fuse_projections(weights)
    runner = ModelRunner(model, weights, cfg, num_blocks=num_blocks,
                         use_pallas=use_pallas, mesh=mesh,
                         lora_manager=lora_manager)
    del weights
    engine = LLMEngine(model, None, cfg, num_blocks=num_blocks,
                       tokenizer=tok, eos_token_id=tok.eos_token_id,
                       runner=runner)
    if spec_method == "draft_model":
        if not draft_model_path:
            raise ValueError("--speculative-method draft_model needs "
                             "--draft-model PATH")
        if draft_model_path.endswith(".gguf"):
            dmodel, dweights, _ = load_model(draft_model_path)
        else:
            from ..models.hf_loader import load_hf_model
            dmodel, dweights, _ = load_hf_model(draft_model_path)
        engine.set_draft_model(dmodel, dweights, use_pallas=use_pallas)
        logger.info("draft-model proposer: %s", draft_model_path)
    elif spec_method == "mtp":
        if not mtp_head_path:
            raise ValueError("--speculative-method mtp needs "
                             "--mtp-head PATH")
        from ..spec.mtp import load_mtp_head
        engine.set_mtp_head(load_mtp_head(mtp_head_path, mcfg))
        logger.info("MTP proposer head: %s", mtp_head_path)
    return engine, tok

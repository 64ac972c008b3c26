# SPDX-License-Identifier: Apache-2.0
"""Engine configuration.

TPU-native re-design of the reference's split config surface
(``/root/reference/vllm_metal/config.py:33`` singleton + vLLM CLI flags +
``--additional-config`` JSON).  Here the whole stack is in-repo, so a single
tree of dataclasses owns every knob; env vars (``envs.py``) only provide
defaults, CLI/JSON overrides land on these dataclasses directly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

from . import envs


@dataclass
class ModelConfig:
    """Describes the model architecture independent of checkpoint format."""

    model: str = ""                       # path to .gguf / safetensors dir / HF id
    architecture: str = "llama"           # llama | qwen2 | qwen3 | gemma | mla | ...
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict[str, Any]] = None
    max_model_len: int = 4096
    tie_word_embeddings: bool = False
    dtype: str = "bfloat16"
    # Per-layer sliding window: None = full attention everywhere; an int w plus
    # a pattern assigns window w to the layers where pattern[i % len] is True.
    sliding_window: Optional[int] = None
    sliding_window_pattern: Optional[list[bool]] = None
    # Attention sinks (GPT-OSS style): per-head learned sink logits.
    use_attention_sinks: bool = False
    logit_softcap: Optional[float] = None
    attn_logit_softcap: Optional[float] = None
    # qk norm (qwen3-style per-head RMSNorm on q/k)
    qk_norm: bool = False
    # MLA (DeepSeek-style multi-head latent attention)
    is_mla: bool = False
    kv_lora_rank: int = 0
    q_lora_rank: int = 0
    qk_rope_head_dim: int = 0
    qk_nope_head_dim: int = 0
    v_head_dim: int = 0
    # activation
    hidden_act: str = "silu"
    # gemma-style embedding scaling by sqrt(hidden)
    scale_embeddings: bool = False
    # lax.scan over stacked layers (compile once per layer instead of per
    # model); None = auto (uniform-window non-MLA models with >= 4 layers)
    scan_layers: Optional[bool] = None
    # extra per-arch fields
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    def layer_sliding_window(self, layer_idx: int) -> Optional[int]:
        """Sliding-window width for a layer, or None for full attention."""
        if self.sliding_window is None:
            return None
        if self.sliding_window_pattern is None:
            return self.sliding_window
        pat = self.sliding_window_pattern
        return self.sliding_window if pat[layer_idx % len(pat)] else None

    @property
    def num_cached_layers(self) -> int:
        """Layers that own KV cache storage.  YOCO (Gemma4-style KV
        sharing, ``extra['num_kv_shared_layers']``) caches only the
        leading layers — trailing layers read a reference layer's pool
        (reference: ``cache_policy.py:314-319``, ``yoco.py``)."""
        return self.num_layers - int(
            self.extra.get("num_kv_shared_layers", 0) or 0)

    def yoco_ref_layer(self, layer_idx: int) -> int:
        """KV-provider layer for a shared layer: the last caching layer
        with the same attention type (sliding vs full) — the reference's
        KV-sharing map (``model_adapter.py:527``)."""
        nc = self.num_cached_layers
        assert layer_idx >= nc
        want = self.layer_sliding_window(layer_idx)
        for j in range(nc - 1, -1, -1):
            if self.layer_sliding_window(j) == want:
                return j
        raise ValueError(
            f"no caching layer matches shared layer {layer_idx} "
            f"(window {want})")


@dataclass
class CacheConfig:
    """Paged KV-cache geometry and quantization."""

    block_size: int = 16                   # tokens per KV block
    num_blocks: int = 0                    # 0 = auto from memory budget
    memory_fraction: float = field(
        default_factory=lambda: envs.MEMORY_FRACTION)
    # TurboQuant-style KV codecs ("" = fp/bf16 cache).
    kv_quant_k: str = field(default_factory=lambda: envs.KV_QUANT_K)
    kv_quant_v: str = field(default_factory=lambda: envs.KV_QUANT_V)
    enable_prefix_caching: bool = True
    cache_dtype: str = "bfloat16"

    def __post_init__(self) -> None:
        if self.block_size <= 0 or self.block_size & (self.block_size - 1):
            raise ValueError(
                f"block_size must be a positive power of two, got {self.block_size}")
        valid_k = ("", "q8_0", "q5_0", "q4_0", "q2_0", "int8", "uint8",
                   "uint4", "uint2")
        valid_v = ("", "q8_0", "q5_0", "q4_0", "q3_0", "q2_0")
        if self.kv_quant_k not in valid_k:
            raise ValueError(f"kv_quant_k must be one of {valid_k}")
        if self.kv_quant_v not in valid_v:
            raise ValueError(f"kv_quant_v must be one of {valid_v}")
        if bool(self.kv_quant_k) != bool(self.kv_quant_v):
            raise ValueError("kv_quant_k and kv_quant_v must be set together")


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler knobs (vLLM-v1-style token budget)."""

    max_num_seqs: int = 64
    max_num_batched_tokens: int = 2048
    enable_chunked_prefill: bool = True
    # multi-step scheduling: run up to N pure-greedy decode steps in one
    # device dispatch (tokens feed back on device).  1 = off.
    decode_window: int = 1
    # Padded token-count buckets for XLA compile reuse.
    token_buckets: tuple[int, ...] = (8, 16, 32, 64, 128, 256, 512, 1024, 2048)

    def __post_init__(self) -> None:
        if self.max_num_batched_tokens < self.max_num_seqs:
            raise ValueError(
                "max_num_batched_tokens must be >= max_num_seqs "
                f"({self.max_num_batched_tokens} < {self.max_num_seqs})")
        if self.decode_window > 1:
            # windows execute in power-of-two sizes (one compiled program
            # per (n_steps, s_pad) pair); normalize here so window
            # chaining — which compares the step window against this
            # value — engages for any configured size (e.g. 24 -> 16)
            self.decode_window = 1 << (self.decode_window.bit_length() - 1)


@dataclass
class ParallelConfig:
    """Mesh geometry. TP shards heads/experts over ICI; DP replicates."""

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # pipeline stages: contiguous layer ranges over a 'pp' mesh axis
    # (parallel/pipeline.py); phase 0 — mutually exclusive with TP
    pipeline_parallel_size: int = 1
    # MoE expert parallelism: shard the expert dim over the tp axis
    # instead of sharding each expert's matrices (moe.MoEWeightsEP)
    expert_parallel: bool = False
    # mesh axis names
    tp_axis: str = "model"
    dp_axis: str = "data"
    pp_axis: str = "pp"

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size
                * self.pipeline_parallel_size)

    def __post_init__(self) -> None:
        if self.pipeline_parallel_size > 1 \
                and self.tensor_parallel_size > 1:
            raise ValueError("PP phase 0 does not compose with TP yet")


@dataclass
class SpecConfig:
    """Speculative decoding (ngram | draft_model | mtp)."""

    method: str = ""                       # "" = off
    num_speculative_tokens: int = 0
    ngram_min: int = 1
    ngram_max: int = 4
    draft_model: str = ""

    def __post_init__(self) -> None:
        if self.method and self.method not in ("ngram", "draft_model", "mtp"):
            raise ValueError(f"unknown speculative method {self.method!r}")
        if self.method and self.num_speculative_tokens <= 0:
            raise ValueError("num_speculative_tokens must be > 0 when enabled")


@dataclass
class EngineConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    spec: SpecConfig = field(default_factory=SpecConfig)
    seed: int = 0

    def replace(self, **kw: Any) -> "EngineConfig":
        return dataclasses.replace(self, **kw)

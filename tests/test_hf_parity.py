# SPDX-License-Identifier: Apache-2.0
"""Loader parity vs transformers' torch reference implementations.

For every newly-loadable HF family (MoE, MLA/DeepSeek, hybrid GDN) a tiny
random checkpoint is instantiated WITH transformers, saved to disk, loaded
through our loader, and the last-position logits of a prefill are compared
against the torch forward.  This is the strongest offline check that the
weight-name mapping, row permutations (rope de-interleave, qkvz ordering,
zero-centered norms) and routing math are right.

Reference role: ``/root/reference/vllm_metal/v1/model_lifecycle.py:167-235``
delegates these mappings to mlx_lm/mlx_vlm; here they are owned in-repo and
verified against the upstream modeling code directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_metal_tpu.config import (CacheConfig, EngineConfig,
                                   SchedulerConfig)
from vllm_metal_tpu.engine.model_runner import ModelRunner, SeqStepInput
from vllm_metal_tpu.engine.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _save(hf_model, path):
    hf_model = hf_model.float().eval()
    hf_model.save_pretrained(str(path), safe_serialization=True)
    return str(path)


def _hf_logits(hf_model, ids):
    with torch.no_grad():
        out = hf_model(torch.tensor([ids], dtype=torch.long))
    return out.logits[0, -1].float().numpy()


def _our_logits(path, ids, num_blocks=16, block_size=16):
    from vllm_metal_tpu.models.hf_loader import load_hf_model
    model, weights, mcfg = load_hf_model(path, dtype=jnp.float32)
    cfg = EngineConfig(
        model=mcfg, cache=CacheConfig(block_size=block_size),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=128,
                                  token_buckets=(32, 64, 128)))
    runner = ModelRunner(model, weights, cfg, num_blocks=num_blocks,
                         use_pallas=False)
    nblk = -(-len(ids) // block_size)
    out = runner.execute([SeqStepInput(
        query_tokens=list(ids), context_len=len(ids),
        block_table=list(range(1, 1 + nblk)),
        params=SamplingParams(temperature=0.0))])
    return np.asarray(out.logits)[0], runner


def _compare(hf_model, path, vocab, seq_len=13, atol=2e-2, rtol=2e-2):
    path = _save(hf_model, path)
    rng = np.random.default_rng(0)
    ids = [int(x) for x in rng.integers(1, vocab - 1, seq_len)]
    want = _hf_logits(hf_model, ids)
    got, _ = _our_logits(path, ids)
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


def test_mixtral_parity(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(0)
    _compare(transformers.MixtralForCausalLM(cfg), tmp_path, 64)


def test_qwen2_moe_parity(tmp_path):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, shared_expert_intermediate_size=24,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=2,
        mlp_only_layers=[], norm_topk_prob=False,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(1)
    _compare(transformers.Qwen2MoeForCausalLM(cfg), tmp_path, 64)


def test_qwen3_moe_parity(tmp_path):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, max_position_embeddings=128,
        attn_implementation="eager")
    torch.manual_seed(2)
    _compare(transformers.Qwen3MoeForCausalLM(cfg), tmp_path, 64)


def test_deepseek_v3_parity(tmp_path):
    # rope_interleave=True default: exercises the de-interleave permutation;
    # sigmoid scoring + e_score_correction_bias + group-limited top-k +
    # shared experts + first_k_dense_replace
    cfg = transformers.DeepseekV3Config(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        kv_lora_rank=16, q_lora_rank=24,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, first_k_dense_replace=1,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(3)
    m = transformers.DeepseekV3ForCausalLM(cfg)
    # random-init correction bias so the selection path is exercised
    with torch.no_grad():
        for layer in m.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
    _compare(m, tmp_path, 64)


def test_deepseek_v2_parity(tmp_path):
    # softmax scoring, greedy top-k, no q_lora (direct q_proj)
    cfg = transformers.DeepseekV2Config(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        kv_lora_rank=16, q_lora_rank=None,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=1.0, first_k_dense_replace=1,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(4)
    _compare(transformers.DeepseekV2ForCausalLM(cfg), tmp_path, 64)


def test_qwen3_next_parity(tmp_path):
    cfg = transformers.Qwen3NextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, shared_expert_intermediate_size=16,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.25,
        linear_num_key_heads=2, linear_key_head_dim=8,
        linear_num_value_heads=4, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, full_attention_interval=4,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, max_position_embeddings=128,
        attn_implementation="eager")
    torch.manual_seed(5)
    m = transformers.Qwen3NextForCausalLM(cfg)
    # default A_log/dt_bias are degenerate constants; randomize mildly
    with torch.no_grad():
        for layer in m.model.layers:
            la = getattr(layer, "linear_attn", None)
            if la is not None:
                la.A_log.uniform_(-1.0, 0.5)
                la.dt_bias.uniform_(-0.3, 0.3)
    _compare(m, tmp_path, 64)


def test_qwen3_next_greedy_decode_matches(tmp_path):
    """Multi-step greedy decode parity (exercises conv/recurrent state
    carry-over between steps, not just one prefill)."""
    cfg = transformers.Qwen3NextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=16, shared_expert_intermediate_size=16,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.25,
        linear_num_key_heads=2, linear_key_head_dim=8,
        linear_num_value_heads=4, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, full_attention_interval=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, max_position_embeddings=128,
        attn_implementation="eager")
    torch.manual_seed(6)
    m = transformers.Qwen3NextForCausalLM(cfg).float().eval()
    with torch.no_grad():
        for layer in m.model.layers:
            la = getattr(layer, "linear_attn", None)
            if la is not None:
                la.A_log.uniform_(-1.0, 0.5)
                la.dt_bias.uniform_(-0.3, 0.3)
    path = _save(m, tmp_path)

    rng = np.random.default_rng(1)
    ids = [int(x) for x in rng.integers(1, 63, 9)]
    with torch.no_grad():
        want = m.generate(torch.tensor([ids], dtype=torch.long),
                          max_new_tokens=4, do_sample=False)
    want = [int(x) for x in want[0, len(ids):]]

    from vllm_metal_tpu.engine.engine import LLMEngine
    from vllm_metal_tpu.models.hf_loader import load_hf_model
    model, weights, mcfg = load_hf_model(path, dtype=jnp.float32)
    ecfg = EngineConfig(
        model=mcfg, cache=CacheConfig(block_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4,
                                  max_num_batched_tokens=64,
                                  token_buckets=(16, 32, 64)))
    eng = LLMEngine(model, weights, ecfg, num_blocks=16, use_pallas=False)
    outs = eng.generate([ids], SamplingParams(temperature=0.0,
                                              max_tokens=4))
    got = list(outs.values())[0].token_ids
    assert got == want, (got, want)


def test_vl_arch_routing(tmp_path):
    """build_engine routes VL architectures to the VL loader (smoke:
    raises past the routing point, not at it)."""
    from vllm_metal_tpu.models.hf_loader import VL_ARCHS
    assert "Qwen2VLForConditionalGeneration" in VL_ARCHS


def test_ernie4_5_parity(tmp_path):
    """ERNIE 4.5 dense (PaddleOCR-VL's text backbone): llama layer shape
    with GLM-style interleaved-pair rope, tied embeddings."""
    from transformers.models.ernie4_5 import (
        Ernie4_5Config, Ernie4_5ForCausalLM)
    cfg = Ernie4_5Config(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        use_bias=False, tie_word_embeddings=True, rope_theta=500000.0)
    torch.manual_seed(0)
    hf = Ernie4_5ForCausalLM(cfg)
    _compare(hf, tmp_path, vocab=96)

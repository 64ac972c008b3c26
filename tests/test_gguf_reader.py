# SPDX-License-Identifier: Apache-2.0
"""GGUF container parse round-trip through the test writer."""

import numpy as np

from tests.gguf_writer import write_gguf
from vllm_metal_tpu.gguf.reader import GGMLType, GGUFFile
from vllm_metal_tpu.gguf.quants import dequantize


def test_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((8, 256)).astype(np.float32)
    w1 = rng.standard_normal((4, 256)).astype(np.float32)
    w2 = rng.standard_normal((16,)).astype(np.float32)
    meta = {
        "general.architecture": "llama",
        "llama.block_count": 2,
        "llama.embedding_length": 64,
        "llama.attention.head_count": 4,
        "tokenizer.ggml.tokens": ["a", "b", "c"],
        "llama.rope.freq_base": 10000.0,
        "some.flag": True,
    }
    path = str(tmp_path / "t.gguf")
    write_gguf(path, meta, {
        "blk.0.attn_q.weight": (w0, GGMLType.Q4_K),
        "blk.0.attn_k.weight": (w1, GGMLType.Q8_0),
        "output_norm.weight": (w2, GGMLType.F32),
    })

    f = GGUFFile(path)
    assert f.architecture == "llama"
    assert f.metadata["llama.block_count"] == 2
    assert f.metadata["tokenizer.ggml.tokens"] == ["a", "b", "c"]
    assert abs(f.metadata["llama.rope.freq_base"] - 10000.0) < 1e-6
    assert f.metadata["some.flag"] is True

    info = f.tensors["blk.0.attn_q.weight"]
    assert info.shape == (8, 256)
    assert info.ggml_type == GGMLType.Q4_K

    got = dequantize(f.tensor_data("output_norm.weight"), GGMLType.F32, (16,))
    np.testing.assert_array_equal(got, w2)

    dq = dequantize(f.tensor_data("blk.0.attn_q.weight"), GGMLType.Q4_K, (8, 256))
    rms = np.sqrt(np.mean((dq - w0) ** 2)) / np.sqrt(np.mean(w0 ** 2))
    assert rms < 0.10

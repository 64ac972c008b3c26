# SPDX-License-Identifier: Apache-2.0
"""AWQ loading: pack/unpack roundtrip, validation rejections (reference
model: tests/quant/ alias rejection + repack parity), dequant parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.gguf.awq_loader import (
    AWQ_GROUP, awq_to_quant_linear, pack_awq_words, unpack_awq_words,
    validate_awq_config,
)
from vllm_metal_tpu.ops.quant_matmul import dequantize_ref


def test_awq_word_roundtrip():
    rng = np.random.default_rng(0)
    cols = rng.integers(0, 16, (4, 64)).astype(np.uint8)
    words = pack_awq_words(cols)
    np.testing.assert_array_equal(unpack_awq_words(words), cols)


@pytest.mark.parametrize("qcfg,msg", [
    ({"w_bit": 3, "q_group_size": 128, "version": "gemm"}, "4-bit"),
    ({"w_bit": 4, "q_group_size": 64, "version": "gemm"}, "group_size"),
    ({"w_bit": 4, "q_group_size": 128, "version": "gemv"}, "GEMM"),
    ({"w_bit": 4, "q_group_size": 128, "version": "gemm",
      "zero_point": False}, "zero_point"),
])
def test_awq_validation_rejections(qcfg, msg):
    with pytest.raises(ValueError, match=msg):
        validate_awq_config(qcfg)


def test_awq_alias_acceptance():
    validate_awq_config({"bits": 4, "group_size": 128, "version": "GEMM"})


def test_awq_dequant_parity():
    """Engine q4 repack must reproduce the AWQ dequant formula exactly."""
    rng = np.random.default_rng(1)
    k, n = 256, 64
    g = AWQ_GROUP
    q = rng.integers(0, 16, (k, n)).astype(np.uint8)
    z = rng.integers(0, 16, (k // g, n)).astype(np.uint8)
    s = (rng.standard_normal((k // g, n)) * 0.02).astype(np.float32)

    qweight = pack_awq_words(q)
    qzeros = pack_awq_words(z)
    ql = awq_to_quant_linear(qweight, qzeros, s)

    want = (q.astype(np.float32) - np.repeat(z, g, axis=0)) \
        * np.repeat(s, g, axis=0)          # [K, N]
    got = np.asarray(dequantize_ref(ql, jnp.float32))  # [N, K]
    # bf16 scale storage quantizes s and z*s
    np.testing.assert_allclose(got, want.T, atol=2e-3, rtol=2e-2)

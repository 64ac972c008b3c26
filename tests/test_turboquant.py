# SPDX-License-Identifier: Apache-2.0
"""TurboQuant codec tests (reference model: tests/test_turboquant.py —
Python codec vs kernel parity + mse floors, SURVEY.md §2.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vllm_metal_tpu.ops.turboquant import (
    fwht, fwht_signs, k_decode, k_encode, v_decode, v_encode,
    _lloyd_codebook,
)


def test_fwht_involution():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 128)), dtype=jnp.float32)
    y = fwht(fwht(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_fwht_orthonormal():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 64)), dtype=jnp.float32)
    y = np.asarray(fwht(x))
    np.testing.assert_allclose((y * y).sum(-1), (np.asarray(x) ** 2).sum(-1),
                               rtol=1e-5)


def test_fwht_signs_deterministic():
    s1 = fwht_signs(128)
    s2 = fwht_signs(128)
    np.testing.assert_array_equal(s1, s2)
    assert set(np.unique(s1)) == {-1.0, 1.0}


@pytest.mark.parametrize("codec,tol", [
    # floors: int8 ~ scale/sqrt(12) ~ 0.006; u4 ~ 0.083; u2 ~ 0.41
    ("q8_0", 0.007), ("uint8", 0.007), ("q4_0", 0.09), ("uint2", 0.45),
])
def test_k_roundtrip_error(codec, tol):
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.standard_normal((16, 8, 128)), dtype=jnp.float32)
    codes, scale, zero = k_encode(k, codec)
    assert codes.dtype == jnp.int8
    out = np.asarray(k_decode(codes, scale, zero, codec, jnp.float32))
    rms = np.sqrt(np.mean((out - np.asarray(k)) ** 2))
    assert rms < tol, rms


@pytest.mark.parametrize("codec,tol", [
    ("q8_0", 0.02), ("q5_0", 0.06), ("q3_0", 0.2), ("q2_0", 0.42),
])
def test_v_roundtrip_error(codec, tol):
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((32, 4, 128)), dtype=jnp.float32)
    codes, scale = v_encode(v, codec)
    out = np.asarray(v_decode(codes, scale, codec, jnp.float32))
    rms = np.sqrt(np.mean((out - np.asarray(v)) ** 2)) \
        / np.sqrt(np.mean(np.asarray(v) ** 2))
    assert rms < tol, rms


def test_lloyd_3bit_matches_published_table():
    cb = _lloyd_codebook(3)
    # symmetric, ordered, max-level near 2.15 (Max 1960 published values)
    np.testing.assert_allclose(cb, -cb[::-1], atol=1e-6)
    assert abs(cb[-1] - 2.152) < 0.01


def test_lloyd_codebooks_monotone():
    for bits in (2, 4, 5):
        cb = _lloyd_codebook(bits)
        assert len(cb) == 1 << bits
        assert np.all(np.diff(cb) > 0)


def test_k_codes_respect_width():
    rng = np.random.default_rng(4)
    k = jnp.asarray(rng.standard_normal((8, 128)), dtype=jnp.float32)
    codes, _, _ = k_encode(k, "q4_0")
    c = np.asarray(codes)
    assert c.min() >= 0 and c.max() <= 15
    codes8, _, _ = k_encode(k, "q8_0")
    c8 = np.asarray(codes8)
    assert c8.min() >= -128 and c8.max() <= 127


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 8])
def test_pack_unpack_roundtrip(bits):
    from vllm_metal_tpu.ops.turboquant import (
        pack_codes, packed_widths, plane_split, unpack_codes)
    rng = np.random.default_rng(bits)
    d = 128
    c = rng.integers(0, 1 << bits, (6, 3, d))
    if bits == 8:
        c = c.astype(np.int8)  # 8-bit stores raw int8 (maybe signed)
    hi, lo = pack_codes(jnp.asarray(c), bits)
    wh, wl = packed_widths(d, bits)
    assert hi.shape[-1] == wh and hi.dtype == jnp.int8
    if wl:
        assert lo.shape[-1] == wl
    else:
        assert lo is None
    back = np.asarray(unpack_codes(hi, lo, bits))
    if bits == 8:
        np.testing.assert_array_equal(back, c.astype(np.int32))
    else:
        np.testing.assert_array_equal(back, c)
    # plane widths decompose the bit count exactly (storage is exact)
    ph, plo = plane_split(bits)
    assert ph + plo == bits


def test_compression_ratios_match_reference_class():
    """Packed pools must land in the reference's compression class
    (/root/reference/docs/turboquant.md 'Compression': q8_0/q3_0 2.56x,
    q5_0 3.37x, q4_0 3.76x, uint2 4.92x)."""
    from vllm_metal_tpu.ops.turboquant import compression_ratio
    ref = {("q8_0", "q3_0"): 2.56, ("q5_0", "q3_0"): 3.37,
           ("q4_0", "q3_0"): 3.76, ("uint2", "q3_0"): 4.92}
    for (ck, cv), want in ref.items():
        got = compression_ratio(ck, cv, 128)
        assert got >= want, (ck, cv, got, want)
        assert got < want * 1.25, (ck, cv, got, want)

"""Property tests for the canonical quant/pack/unpack/dequant semantics.

TPU-native analogue of the reference's `quant/test.py:21-54`
(test_vcache / test_kcache round-trip error) plus pack/unpack inversion.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kivi_tpu.core import quant as Q


BITS = [2, 4, 8]


@pytest.mark.parametrize("bits", BITS)
def test_pack_unpack_inverse(bits):
    rng = np.random.default_rng(0)
    D = 128
    codes = rng.integers(0, 1 << bits, size=(3, 2, D, 64), dtype=np.uint32)
    for axis in (-2, -1, 2, 3):
        if codes.shape[axis] % (32 // bits) != 0:
            continue
        packed = Q.pack_planar(jnp.asarray(codes), bits, axis=axis)
        assert packed.dtype == jnp.uint32
        assert packed.shape[axis % 4] == codes.shape[axis] // (32 // bits)
        out = Q.unpack_planar(packed, bits, axis=axis)
        np.testing.assert_array_equal(np.asarray(out), codes)


def test_pack_planar_bit_layout():
    """Pin the exact bit layout: channel d = j*Dw + w -> word w bits [j*b,(j+1)*b)."""
    bits, D = 2, 32
    fpi, Dw = 16, 2
    codes = np.arange(D, dtype=np.uint32) % 4
    packed = np.asarray(Q.pack_planar(jnp.asarray(codes[None]), bits, axis=-1))[0]
    for d in range(D):
        j, w = d // Dw, d % Dw
        got = (packed[w] >> (j * bits)) & 0b11
        assert got == codes[d], (d, j, w)


@pytest.mark.parametrize("bits", BITS)
def test_quant_roundtrip_error_bound(bits):
    """Dequant error per element must be <= scale/2 (round-to-nearest)."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 3, 8, 128), dtype=jnp.float32) * 3.0
    gs = 32
    codes, scale, mn = Q.quantize_last(x, gs, bits)
    deq = Q.dequantize_last(codes, scale, mn, gs)
    err = jnp.abs(deq - x)
    bound = jnp.repeat(scale, gs, axis=-1) * 0.5 + 1e-6
    assert bool(jnp.all(err <= bound))
    # mean relative error sanity (reference prints these in quant/test.py)
    rel = jnp.mean(err) / jnp.mean(jnp.abs(x))
    assert float(rel) < {2: 0.6, 4: 0.12, 8: 0.01}[bits]


def test_quantize_last_constant_group_safe():
    x = jnp.ones((1, 64), jnp.float32) * 5.0
    codes, scale, mn = Q.quantize_last(x, 32, 2)
    deq = Q.dequantize_last(codes, scale, mn, 32)
    np.testing.assert_allclose(np.asarray(deq), 5.0)


@pytest.mark.parametrize("bits", BITS)
def test_k_block_roundtrip(bits):
    """K path: per-CHANNEL stats (groups along tokens), transposed storage."""
    B, H, D, T = 2, 2, 64, 96
    gs = 32
    k_t = jax.random.normal(jax.random.PRNGKey(2), (B, H, D, T), jnp.float32)
    k_codes, k_scale, k_mn = Q.quantize_k_block(k_t, gs, bits)
    assert k_codes.shape == (B, H, D // (32 // bits), T)
    assert k_scale.shape == (B, H, T // gs, D)
    deq = Q.dequantize_k(k_codes, k_scale, k_mn, gs, bits)
    assert deq.shape == k_t.shape
    # groups must be along T: a channel with huge outlier should not pollute
    # other channels' error.  Check elementwise bound instead:
    scale_e = jnp.repeat(jnp.swapaxes(k_scale, -1, -2), gs, axis=-1)
    assert bool(jnp.all(jnp.abs(deq - k_t) <= scale_e * 0.5 + 1e-6))


@pytest.mark.parametrize("bits", BITS)
def test_v_block_roundtrip(bits):
    """V path: per-TOKEN stats (groups along channels)."""
    B, H, T, D = 2, 2, 40, 128
    gs = 32
    v = jax.random.normal(jax.random.PRNGKey(3), (B, H, T, D), jnp.float32)
    v_codes, v_scale, v_mn = Q.quantize_v_block(v, gs, bits)
    assert v_codes.shape == (B, H, D // (32 // bits), T)
    assert v_scale.shape == (B, H, D // gs, T)
    deq = Q.dequantize_v(v_codes, v_scale, v_mn, gs, bits)
    scale_e = jnp.repeat(jnp.swapaxes(v_scale, -1, -2), gs, axis=-1)
    assert bool(jnp.all(jnp.abs(deq - v) <= scale_e * 0.5 + 1e-6))


def test_k_grouping_axis_is_tokens():
    """Put an outlier in one token-group of one channel; only that group's
    quantization error may grow."""
    B, H, D, T, gs = 1, 1, 8, 64, 32
    rng = np.random.default_rng(4)
    k = rng.normal(size=(B, H, D, T)).astype(np.float32)
    k[0, 0, 0, 5] = 100.0  # outlier: channel 0, group 0
    kj = jnp.asarray(k)
    codes, scale, mn = Q.quantize_k_block(kj, gs, 4)
    deq = np.asarray(Q.dequantize_k(codes, scale, mn, gs, 4))
    err = np.abs(deq - k)
    # other channels and channel-0-group-1 stay accurate
    assert err[0, 0, 1:, :].max() < 0.2
    assert err[0, 0, 0, gs:].max() < 0.2


def test_v_grouping_axis_is_channels():
    B, H, T, D, gs = 1, 1, 8, 64, 32
    rng = np.random.default_rng(5)
    v = rng.normal(size=(B, H, T, D)).astype(np.float32)
    v[0, 0, 2, 3] = 100.0  # outlier: token 2, channel-group 0
    codes, scale, mn = Q.quantize_v_block(jnp.asarray(v), gs, 4)
    deq = np.asarray(Q.dequantize_v(codes, scale, mn, gs, 4))
    err = np.abs(deq - v)
    assert err[0, 0, :, gs:].max() < 0.2          # other channel group fine
    assert np.delete(err[0, 0, :, :gs], 2, 0).max() < 0.2  # other tokens fine


# ---------------------------------------------------------------------------
# fake-quant simulate mode (reference models/utils_quant.py semantics)
# ---------------------------------------------------------------------------

from kivi_tpu.core import fake_quant as FQ


def test_fake_quant_asym_matches_real_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 64, 128),
                          jnp.float32)
    gs, bits = 32, 2
    sim = FQ.fake_quant_grouped(x, bits, gs, axis=-1)
    codes, scale, mn = Q.quantize_last(x, gs, bits)
    real = Q.dequantize_last(codes, scale, mn, gs)
    np.testing.assert_allclose(np.asarray(sim), np.asarray(real),
                               rtol=1e-5, atol=1e-5)


def test_fake_quant_kv_axes():
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64, 128),
                          jnp.float32)
    kq, vq = FQ.fake_quant_kv(k, k, 2, 2, 32)
    # K grouped along tokens: a per-channel constant survives exactly
    const = jnp.ones((1, 2, 64, 128)) * jnp.arange(128)
    kq2, _ = FQ.fake_quant_kv(const, const, 2, 2, 32)
    np.testing.assert_allclose(np.asarray(kq2), np.asarray(const),
                               atol=1e-5)


def test_fake_quant_straight_through_grad():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(FQ.fake_quant_grouped(x, 2, 32) ** 2))(x)
    # STE: gradient == d/dx sum(q^2) with dq/dx = 1 -> 2*q
    q = FQ.fake_quant_grouped(x, 2, 32)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * q), rtol=1e-5)

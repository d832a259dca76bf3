"""Pallas kernel vs pure-jnp reference equivalence.

TPU-native analogue of the reference's kernel tests
(`quant/gemv.py:93-165` MHA/MQA GEMV tests and `quant/test.py:173-202`
test_4d_qmatmul): the fused dequant matmuls must match a dequantize-then-
matmul oracle built on kivi_tpu.core.quant.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kivi_tpu.core import quant as Q
from kivi_tpu.kernels import qk_dequant_matmul, pv_dequant_matmul


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("r", [1, 4])
def test_qk_dequant_matmul_matches_oracle(bits, r):
    B, H, D, T, gs = 2, 3, 128, 512, 32
    key = jax.random.PRNGKey(0)
    k_t = jax.random.normal(key, (B, H, D, T), jnp.float32)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, H, r, D),
                          jnp.float32)
    k_codes, k_scale, k_mn = Q.quantize_k_block(k_t, gs, bits)
    oracle = jnp.einsum("bhrd,bhdt->bhrt", q,
                        Q.dequantize_k(k_codes, k_scale, k_mn, gs, bits),
                        precision="highest")
    got = qk_dequant_matmul(q, k_codes, k_scale, k_mn, gs, bits,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-5, atol=2e-4)
    # fast bf16 path: same result to ~bf16 rounding of scales/q
    fast = qk_dequant_matmul(q, k_codes, k_scale, k_mn, gs, bits)
    rel = float(jnp.max(jnp.abs(fast - oracle)) / jnp.max(jnp.abs(oracle)))
    assert rel < 3e-2, rel


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("r", [1, 4])
def test_pv_dequant_matmul_matches_oracle(bits, r):
    B, H, D, T, gs = 2, 3, 128, 512, 32
    key = jax.random.PRNGKey(2)
    v = jax.random.normal(key, (B, H, T, D), jnp.float32)
    p = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(key, 1), (B, H, r, T)), -1)
    v_codes, v_scale, v_mn = Q.quantize_v_block(v, gs, bits)
    oracle = jnp.einsum("bhrt,bhtd->bhrd", p,
                        Q.dequantize_v(v_codes, v_scale, v_mn, gs, bits),
                        precision="highest")
    got = pv_dequant_matmul(p, v_codes, v_scale, v_mn, gs, bits,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-5, atol=2e-4)
    fast = pv_dequant_matmul(p, v_codes, v_scale, v_mn, gs, bits)
    rel = float(jnp.max(jnp.abs(fast - oracle)) / jnp.max(jnp.abs(oracle)))
    assert rel < 8e-2, rel


def test_qk_small_head_dim_and_t_block():
    """head_dim 32 (tiny configs) and T not a multiple of the default
    t_block must still work via t_block clamping."""
    B, H, D, T, gs, bits = 1, 2, 32, 128, 16, 4
    key = jax.random.PRNGKey(3)
    k_t = jax.random.normal(key, (B, H, D, T), jnp.float32)
    q = jax.random.normal(jax.random.fold_in(key, 1), (B, H, 2, D))
    k_codes, k_scale, k_mn = Q.quantize_k_block(k_t, gs, bits)
    oracle = jnp.einsum("bhrd,bhdt->bhrt", q,
                        Q.dequantize_k(k_codes, k_scale, k_mn, gs, bits),
                        precision="highest")
    got = qk_dequant_matmul(q, k_codes, k_scale, k_mn, gs, bits,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-5, atol=2e-4)


def test_pv_zero_probs_tail_contributes_nothing():
    """Masked (zero) probability tail must not perturb the output —
    the decode path relies on this instead of slicing."""
    B, H, D, T, gs, bits = 1, 1, 128, 256, 32, 2
    key = jax.random.PRNGKey(4)
    v = jax.random.normal(key, (B, H, T, D), jnp.float32)
    v_codes, v_scale, v_mn = Q.quantize_v_block(v, gs, bits)
    p = jax.nn.softmax(jax.random.normal(jax.random.fold_in(key, 1),
                                         (B, H, 1, T)), -1)
    n = 96
    pz = p * (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3) < n)
    got = pv_dequant_matmul(pz, v_codes, v_scale, v_mn, gs, bits,
                            compute_dtype=jnp.float32)
    oracle = jnp.einsum(
        "bhrt,bhtd->bhrd", pz,
        Q.dequantize_v(v_codes, v_scale, v_mn, gs, bits),
                        precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-5, atol=2e-4)


# ---------------------------------------------------------------------------
# quantize+pack kernels vs the jnp reference (core.quant)
# ---------------------------------------------------------------------------

from kivi_tpu.kernels.quant_pack import quantize_pack_k, quantize_pack_v


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quantize_pack_k_matches_reference(bits):
    B, H, D, T = 2, 3, 128, 256
    gs = 32
    k_t = jax.random.normal(jax.random.PRNGKey(7), (B, H, D, T), jnp.float32)
    ref_c, ref_s, ref_m = Q.quantize_k_block(k_t, gs, bits)
    got_c, got_s, got_m = quantize_pack_k(k_t, gs, bits, t_block=128)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               rtol=1e-6)
    # codes may differ by 1 at exact rounding ties (reciprocal-multiply vs
    # divide); dequantized values must agree within one scale step.
    d_ref = Q.dequantize_k(ref_c, ref_s, ref_m, gs, bits)
    d_got = Q.dequantize_k(got_c, got_s, got_m, gs, bits)
    step = np.repeat(np.asarray(jnp.swapaxes(ref_s, -1, -2)), gs, axis=-1)
    assert np.all(np.abs(np.asarray(d_got - d_ref)) <= step + 1e-6)
    exact = (np.asarray(got_c) == np.asarray(ref_c)).mean()
    assert exact > 0.999


@pytest.mark.parametrize("bits", [2, 4])
def test_quantize_pack_v_matches_reference(bits):
    B, H, T, D = 2, 2, 192, 128
    gs = 32
    v = jax.random.normal(jax.random.PRNGKey(9), (B, H, T, D), jnp.float32)
    ref_c, ref_s, ref_m = Q.quantize_v_block(v, gs, bits)
    got_c, got_s, got_m = quantize_pack_v(
        jnp.swapaxes(v, -1, -2), gs, bits, t_block=64)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               rtol=1e-6)
    d_ref = Q.dequantize_v(ref_c, ref_s, ref_m, gs, bits)
    d_got = Q.dequantize_v(got_c, got_s, got_m, gs, bits)
    step = np.repeat(np.asarray(jnp.swapaxes(ref_s, -1, -2)), gs, axis=-1)
    assert np.all(np.abs(np.asarray(d_got - d_ref)) <= step + 1e-6)
    exact = (np.asarray(got_c) == np.asarray(ref_c)).mean()
    assert exact > 0.999


# ---------------------------------------------------------------------------
# fused fp decode attention kernel vs the jnp fp path
# ---------------------------------------------------------------------------

from kivi_tpu.cache.fp_cache import (FpLayerCache, fp_append,
                                     fp_decode_attention, init_fp_cache)


@pytest.mark.parametrize("sliding_window", [None, 48])
def test_fp_decode_kernel_matches_jnp(sliding_window):
    B, Hq, Hkv, D, Tmax = 2, 8, 4, 128, 256
    cache = init_fp_cache(B, Hkv, D, Tmax)
    k = jax.random.normal(jax.random.PRNGKey(0), (B, Hkv, 100, D),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, 100, D),
                          jnp.bfloat16)
    cache = fp_append(cache, k, v)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, Hq, 1, D), jnp.float32)
    ref = fp_decode_attention(q, cache, sliding_window=sliding_window,
                              impl="jnp")
    got = fp_decode_attention(q, cache, sliding_window=sliding_window,
                              impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

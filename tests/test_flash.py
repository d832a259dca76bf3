"""Flash prefill kernel vs the exact jnp attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.core.attention import prefill_attention
from kivi_tpu.kernels import flash_attention


def _mk(B, Hq, Hkv, T, D, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("T", [128, 256, 384])
@pytest.mark.parametrize("gqa", [1, 4])
def test_flash_matches_exact_causal(T, gqa):
    B, Hkv, D = 2, 2, 128
    q, k, v = _mk(B, Hkv * gqa, Hkv, T, D)
    ref = prefill_attention(q, k, v, impl="jnp")
    got = flash_attention(q, k, v, causal=True, blk_q=128, blk_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_unpadded_tail():
    # T not a multiple of the block size exercises the padding path
    B, Hq, Hkv, T, D = 1, 2, 2, 200, 128
    q, k, v = _mk(B, Hq, Hkv, T, D, seed=3)
    ref = prefill_attention(q, k, v, impl="jnp")
    got = flash_attention(q, k, v, causal=True, blk_q=128, blk_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_sliding_window():
    B, Hq, Hkv, T, D = 1, 2, 1, 256, 128
    q, k, v = _mk(B, Hq, Hkv, T, D, seed=5)
    ref = prefill_attention(q, k, v, impl="jnp", sliding_window=64)
    got = flash_attention(q, k, v, causal=True, sliding_window=64,
                          blk_q=128, blk_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

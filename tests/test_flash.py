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


@pytest.mark.parametrize("pads", [[0, 130], [300, 511]])
def test_flash_heavy_pad_clamped_blocks(pads):
    # pads large enough that whole q AND k blocks are dead exercises the
    # varlen index-map clamps (dead tiles repeat a live tile's index so
    # the fetch is elided; the live predicate must exclude every one)
    B, Hq, Hkv, T, D = 2, 2, 2, 512, 128
    q, k, v = _mk(B, Hq, Hkv, T, D, seed=7)
    pad = jnp.asarray(pads, jnp.int32)
    ref = prefill_attention(q, k, v, impl="jnp", pad_len=pad)
    got = flash_attention(q, k, v, causal=True, blk_q=128, blk_k=128,
                          pad_len=pad)
    live = jnp.arange(T)[None, None, :, None] >= pad[:, None, None, None]
    np.testing.assert_allclose(np.asarray(jnp.where(live, got, 0)),
                               np.asarray(jnp.where(live, ref, 0)),
                               rtol=2e-2, atol=2e-2)


def test_flash_swa_pad_combined_clamps():
    B, Hq, Hkv, T, D = 1, 2, 1, 512, 128
    q, k, v = _mk(B, Hq, Hkv, T, D, seed=9)
    pad = jnp.asarray([140], jnp.int32)
    ref = prefill_attention(q, k, v, impl="jnp", sliding_window=128,
                            pad_len=pad)
    got = flash_attention(q, k, v, causal=True, sliding_window=128,
                          blk_q=128, blk_k=128, pad_len=pad)
    live = jnp.arange(T)[None, None, :, None] >= pad[:, None, None, None]
    np.testing.assert_allclose(np.asarray(jnp.where(live, got, 0)),
                               np.asarray(jnp.where(live, ref, 0)),
                               rtol=2e-2, atol=2e-2)

"""Flash-extend kernel vs the jnp extend oracle.

extend_attention(impl="pallas") routes the quantized history through
kernels/flash_extend.py (online softmax, no O(T1*Tmax) logits) and
merges the jnp window/self halves; impl="jnp" is the oracle.  Sweeps
the same store-phase relationships as the decode kernel tests plus the
extend-specific axes: suffix length, GQA fold, left-pad, sliding
window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.cache.kivi_cache import (decode_append, init_layer_cache,
                                       prefill_ingest)
from kivi_tpu.config import QuantConfig
from kivi_tpu.core.attention import extend_attention


def _mk_cache(T_prompt, steps, qcfg, B=2, H=2, D=128, Tmax=1024, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    cache = init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(ks[0], (B, H, T_prompt, D), jnp.float32)
    v = jax.random.normal(ks[1], (B, H, T_prompt, D), jnp.float32)
    cache = prefill_ingest(cache, k, v, qcfg)
    step = jax.jit(lambda c, kn, vn: decode_append(c, kn, vn, qcfg))
    for i in range(steps):
        kn = jax.random.normal(jax.random.fold_in(ks[2], i), (B, H, 1, D),
                               jnp.float32)
        vn = jax.random.normal(jax.random.fold_in(ks[3], i), (B, H, 1, D),
                               jnp.float32)
        cache = step(cache, kn, vn)
    return cache


def _qkv(cache, T1, r=2, seed=7):
    B, H, _, D = cache.k_win.shape
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H * r, T1, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, T1, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, T1, D), jnp.float32)
    return q, k, v


def _compare(cache, qcfg, T1, r=2, seed=7, **kw):
    q, k, v = _qkv(cache, T1, r, seed)
    want = extend_attention(q, k, v, cache, qcfg, impl="jnp", **kw)
    got = extend_attention(q, k, v, cache, qcfg, impl="pallas", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("bits", [(2, 2), (4, 4), (2, 4)])
@pytest.mark.parametrize("tprompt,steps", [
    (40, 0),     # nothing quantized yet: kernel contributes nothing
    (128, 0),    # K store just flushed a whole block
    (200, 60),   # mid-stream: both stores active, V ahead of K
    (190, 140),  # several V flushes + K flushes
    (600, 30),   # multi-chunk history (chunk=512)
])
def test_flash_extend_matches_jnp(bits, tprompt, steps):
    qcfg = QuantConfig(k_bits=bits[0], v_bits=bits[1], group_size=32,
                       residual_length=128)
    cache = _mk_cache(tprompt, steps, qcfg)
    _compare(cache, qcfg, T1=64)


@pytest.mark.parametrize("t1", [8, 128, 256])
def test_flash_extend_suffix_lengths(t1):
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    cache = _mk_cache(300, 20, qcfg)
    _compare(cache, qcfg, T1=t1)


def test_flash_extend_mha_r1():
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    cache = _mk_cache(256, 10, qcfg)
    _compare(cache, qcfg, T1=32, r=1)


def test_flash_extend_gqa_r4():
    qcfg = QuantConfig(k_bits=4, v_bits=4, group_size=32,
                       residual_length=128)
    cache = _mk_cache(256, 10, qcfg)
    _compare(cache, qcfg, T1=32, r=4)


def test_flash_extend_with_pad():
    """Left-padded rows: garbage positions [0, pad) masked inside the
    kernel (and whole below-pad chunks skipped)."""
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    cache = _mk_cache(600, 0, qcfg)
    pads = jnp.asarray([37, 520], jnp.int32)  # row 1 skips chunk 0 whole
    _compare(cache, qcfg, T1=64, pad_len=pads)


@pytest.mark.parametrize("window", [192, 512])
def test_flash_extend_sliding_window(window):
    """Mistral SWA: per-query-row lower bound inside the kernel."""
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    cache = _mk_cache(600, 40, qcfg)
    _compare(cache, qcfg, T1=64, sliding_window=window)


def test_flash_extend_sliding_window_and_pad():
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    cache = _mk_cache(600, 0, qcfg)
    pads = jnp.asarray([10, 300], jnp.int32)
    _compare(cache, qcfg, T1=32, sliding_window=256, pad_len=pads)


def test_flash_extend_empty_history_merge():
    """nkq == 0: the kernel returns the neutral flash element and the
    output must equal pure window+self attention."""
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    cache = _mk_cache(50, 0, qcfg)  # all tokens still in the window
    assert int(cache.n_k_quant) == 0
    _compare(cache, qcfg, T1=16)


def test_flash_extend_qhist_fallback_path(monkeypatch):
    """The qhist-partial kernel + jnp window/self merge remains the
    fallback for geometries the full megakernel rejects; keep it
    oracle-exact by forcing the dispatch gate off."""
    import kivi_tpu.kernels.flash_extend as FE
    monkeypatch.setattr(FE, "flash_extend_full_supported",
                        lambda *a, **k: False)
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    cache = _mk_cache(300, 20, qcfg)
    _compare(cache, qcfg, T1=64)


def test_flash_extend_full_t1_phases():
    """Full megakernel at engine-realistic suffix sizes (T1 = 128/256,
    the chunked-prefill chunks the old jnp halves could not afford):
    history/window phases swept."""
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    for tprompt, steps, t1 in ((512, 0, 128), (640, 17, 256),
                               (896, 0, 128)):
        cache = _mk_cache(tprompt, steps, qcfg)
        _compare(cache, qcfg, T1=t1, r=1)

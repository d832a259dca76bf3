"""Left-padding / attention-mask support across the stack.

The reference threads a 2-D attention mask through every forward
(`models/llama_kivi.py:710-717`, `_upad_input` `:525`).  Here padding is
always LEFT padding, so the mask reduces to a per-row lower position
bound `pad_len` carried through prefill_attention, flash, every decode
kernel and the engine/batcher.  Invariants under test:

  * pallas kernels with pad_len agree with the jnp oracle with pad_len;
  * padded outputs equal unpadded outputs of the bare suffix (exact for
    the fp paths — padding must be numerically invisible);
  * engine.generate with pad_lens reproduces unpadded generation (fp16
    cache: token-equal; quantized: same up to group-boundary shift,
    checked via the engine's own pad path in test_batcher.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.cache.fp_cache import (fp_append, fp_decode_attention,
                                     init_fp_cache)
from kivi_tpu.cache.kivi_cache import decode_append, init_layer_cache, prefill_ingest
from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.core.attention import decode_attention, prefill_attention
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine


def _padded_qkv(key, B, Hq, Hkv, T, D, pads):
    """Random q/k/v where row b's first pads[b] positions are garbage
    (big values — leakage through the mask shows up loudly)."""
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), jnp.float32)
    idx = jnp.arange(T)[None, None, :, None]
    pad = jnp.asarray(pads, jnp.int32).reshape(B, 1, 1, 1)
    poison = 37.0
    k = jnp.where(idx < pad, poison, k)
    v = jnp.where(idx < pad, -poison, v)
    return q, k, v


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_prefill_pad_equals_unpadded_suffix(impl):
    """Rows of a left-padded prefill equal the unpadded attention over
    the suffix — the pad is invisible."""
    B, Hq, Hkv, T, D = 2, 4, 2, 256, 128
    pads = [64, 0]
    q, k, v = _padded_qkv(jax.random.PRNGKey(0), B, Hq, Hkv, T, D, pads)
    out = prefill_attention(q, k, v, impl=impl,
                            pad_len=jnp.asarray(pads, jnp.int32))
    for b, p in enumerate(pads):
        want = prefill_attention(q[b:b + 1, :, p:], k[b:b + 1, :, p:],
                                 v[b:b + 1, :, p:], impl=impl)
        np.testing.assert_allclose(np.asarray(out[b:b + 1, :, p:]),
                                   np.asarray(want), rtol=2e-2, atol=2e-2)


def test_prefill_pad_jnp_vs_pallas():
    B, Hq, Hkv, T, D = 2, 4, 2, 512, 128
    pads = [200, 3]
    q, k, v = _padded_qkv(jax.random.PRNGKey(1), B, Hq, Hkv, T, D, pads)
    pad = jnp.asarray(pads, jnp.int32)
    a = prefill_attention(q, k, v, impl="jnp", pad_len=pad)
    b = prefill_attention(q, k, v, impl="pallas", pad_len=pad)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-2, atol=2e-2)


def test_prefill_fully_padded_rows_zero():
    """Query rows inside the pad softmax over an empty set -> exact 0
    (both impls), never NaN."""
    B, Hq, Hkv, T, D = 1, 2, 2, 256, 128
    pads = [128]
    q, k, v = _padded_qkv(jax.random.PRNGKey(2), B, Hq, Hkv, T, D, pads)
    for impl in ("jnp", "pallas"):
        out = np.asarray(prefill_attention(
            q, k, v, impl=impl, pad_len=jnp.asarray(pads, jnp.int32)))
        assert not np.any(np.isnan(out))
        np.testing.assert_array_equal(out[:, :, :pads[0]], 0.0)


# ---------------------------------------------------------------------------
# decode kernels (quantized cache)
# ---------------------------------------------------------------------------

def _mk_padded_cache(T_fill, qcfg, pads, B, H, D=128, Tmax=1024, seed=0):
    """Cache whose first pads[b] positions are zeros (what
    modeling._attention_block stores for pad slots)."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    cache = init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(ks[0], (B, H, T_fill, D), jnp.float32)
    v = jax.random.normal(ks[1], (B, H, T_fill, D), jnp.float32)
    idx = jnp.arange(T_fill)[None, None, :, None]
    pad = jnp.asarray(pads, jnp.int32).reshape(B, 1, 1, 1)
    k = jnp.where(idx < pad, 0.0, k)
    v = jnp.where(idx < pad, 0.0, v)
    return prefill_ingest(cache, k, v, qcfg)


@pytest.mark.parametrize("tfill,rl,vf,r", [
    (200, 128, 128, 4),   # wide-kernel geometry (GQA)
    (200, 128, 32, 4),    # per-head kernel (unaligned v_flush)
    (640, 256, 128, 4),   # wide kernel, strip spans chunks
    (300, 128, 128, 1),   # MHA
])
def test_decode_pad_pallas_matches_oracle(tfill, rl, vf, r):
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=rl, v_flush=vf)
    B, H, D = 2, 2, 128
    pads = [96, 0]
    cache = _mk_padded_cache(tfill, qcfg, pads, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(5), (B, H * r, 1, D),
                          jnp.float32)
    pad = jnp.asarray(pads, jnp.int32)
    ref = decode_attention(q, cache, qcfg, impl="jnp", pad_len=pad)
    got = decode_attention(q, cache, qcfg, impl="pallas", pad_len=pad)
    assert not np.any(np.isnan(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_decode_pad_in_window():
    """pad_len larger than the quantized store: the bound cuts into the
    fp window itself."""
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, r, D = 2, 2, 4, 128
    tfill = 150                      # nkq=128, 22 in window
    pads = [135, 130]                # both inside the window span
    cache = _mk_padded_cache(tfill, qcfg, pads, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(6), (B, H * r, 1, D),
                          jnp.float32)
    pad = jnp.asarray(pads, jnp.int32)
    ref = decode_attention(q, cache, qcfg, impl="jnp", pad_len=pad)
    got = decode_attention(q, cache, qcfg, impl="pallas", pad_len=pad)
    assert not np.any(np.isnan(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# fp decode
# ---------------------------------------------------------------------------

def test_fp_decode_pad_matches_and_invisible():
    B, Hq, Hkv, D, Tmax = 2, 4, 2, 128, 1024
    T_fill, pads = 300, [128, 5]
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    k = jax.random.normal(ks[0], (B, Hkv, T_fill, D), jnp.float32)
    v = jax.random.normal(ks[1], (B, Hkv, T_fill, D), jnp.float32)
    q = jax.random.normal(ks[2], (B, Hq, 1, D), jnp.float32)
    cache = fp_append(init_fp_cache(B, Hkv, D, Tmax), k, v)
    pad = jnp.asarray(pads, jnp.int32)
    ref = fp_decode_attention(q, cache, impl="jnp", pad_len=pad)
    got = fp_decode_attention(q, cache, impl="pallas", pad_len=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # pad invisibility (exact path): suffix-only cache gives the same out
    for b, p in enumerate(pads):
        c1 = fp_append(init_fp_cache(1, Hkv, D, Tmax),
                       k[b:b + 1, :, p:], v[b:b + 1, :, p:])
        want = fp_decode_attention(q[b:b + 1], c1, impl="jnp")
        np.testing.assert_allclose(np.asarray(ref[b:b + 1]),
                                   np.asarray(want), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# engine end-to-end
# ---------------------------------------------------------------------------

def test_engine_padded_matches_unpadded_fp16():
    """Left-padded ragged batch through the fp16-cache engine is
    token-equal to per-row unpadded generation."""
    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=32)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(3)
    lens = [24, 40]
    T = max(lens)
    prompts = [list(rng.randint(1, cfg.vocab_size, size=n)) for n in lens]
    padded = [[0] * (T - len(p)) + p for p in prompts]
    pads = [T - len(p) for p in prompts]
    with jax.default_matmul_precision("highest"):
        eng = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=128,
                     batch_size=2)
        got = np.asarray(eng.generate(jnp.asarray(padded, jnp.int32), 8,
                                      pad_lens=pads))
        for b, p in enumerate(prompts):
            eng1 = Engine(cfg=cfg, qcfg=qcfg, params=params,
                          max_seq_len=128, batch_size=1)
            want = np.asarray(eng1.generate(
                jnp.asarray([p], jnp.int32), 8))
            np.testing.assert_array_equal(got[b], want[0])


def test_engine_small_batch_topup():
    """A batch smaller than engine.batch_size is topped up internally
    and the extra rows dropped from the output."""
    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    toks = jnp.asarray(np.random.RandomState(4).randint(
        1, cfg.vocab_size, size=(1, 16)), jnp.int32)
    with jax.default_matmul_precision("highest"):
        eng2 = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=64,
                      batch_size=2)
        got = np.asarray(eng2.generate(toks, 6))
        assert got.shape == (1, 6)
        eng1 = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=64,
                      batch_size=1)
        want = np.asarray(eng1.generate(toks, 6))
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# config validation
# ---------------------------------------------------------------------------

def test_mixed_fp_quant_bits_rejected():
    with pytest.raises(ValueError, match="mixed"):
        QuantConfig(k_bits=16, v_bits=2)
    with pytest.raises(ValueError, match="mixed"):
        QuantConfig(k_bits=4, v_bits=16)
    QuantConfig(k_bits=16, v_bits=16)   # both-fp fine
    QuantConfig(k_bits=2, v_bits=4)     # both-quant fine

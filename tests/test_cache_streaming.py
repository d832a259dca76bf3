"""Cache state-machine tests + the streaming-decode equivalence test.

TPU-native port of the reference's closest thing to an integration test,
`quant/test.py:125-170` (test_streaming_kvcache): run real decode steps
through the KIVI cache and compare attention outputs against exact fp
attention over the same tokens.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kivi_tpu.config import QuantConfig
from kivi_tpu.cache import kivi_cache as KC
from kivi_tpu.core import quant as Q
from kivi_tpu.core.attention import decode_attention, prefill_attention


def make_qcfg(**kw):
    kw.setdefault("group_size", 16)
    kw.setdefault("residual_length", 32)
    return QuantConfig(**kw)


def test_prefill_counters_key_blocks():
    qcfg = make_qcfg()
    B, H, D, Tmax = 1, 2, 32, 256
    cache = KC.init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(jax.random.PRNGKey(0), (B, H, 70, D))
    v = jax.random.normal(jax.random.PRNGKey(1), (B, H, 70, D))
    cache = KC.prefill_ingest(cache, k, v, qcfg)
    # keys: floor(70/32)*32 = 64 quantized, 6 in window
    assert int(cache.n_k_quant) == 64 and int(cache.n_k_win) == 6
    # values: ceil((70-32)/16)*16 = 48 quantized, 22 in window
    assert int(cache.n_v_quant) == 48 and int(cache.n_v_win) == 22
    assert int(cache.seq_len) == 70


def test_prefill_short_prompt_all_in_window():
    qcfg = make_qcfg()
    cache = KC.init_layer_cache(1, 1, 32, 128, qcfg)
    k = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 10, 32))
    cache = KC.prefill_ingest(cache, k, k, qcfg)
    assert int(cache.n_k_quant) == 0 and int(cache.n_k_win) == 10
    assert int(cache.n_v_quant) == 0 and int(cache.n_v_win) == 10


def test_decode_append_flush_cadence():
    qcfg = make_qcfg()  # gs=16, W=32
    B, H, D, Tmax = 1, 1, 32, 256
    cache = KC.init_layer_cache(B, H, D, Tmax, qcfg)
    key = jax.random.PRNGKey(2)
    step = jax.jit(lambda c, k, v: KC.decode_append(c, k, v, qcfg))
    for t in range(80):
        kv = jax.random.normal(jax.random.fold_in(key, t), (2, B, H, 1, D))
        cache = step(cache, kv[0], kv[1])
        assert int(cache.seq_len) == t + 1
        assert int(cache.n_k_win) >= 1
        assert int(cache.n_k_quant) % qcfg.residual_length == 0
        assert int(cache.n_v_quant) % qcfg.group_size == 0
        assert int(cache.n_v_quant) + int(cache.n_v_win) == t + 1
    # after 80 tokens with W=32: keys flushed twice (at steps 33 and 65)
    assert int(cache.n_k_quant) == 64
    assert int(cache.n_k_win) == 16


def test_decode_append_masked_matches_cond():
    """decode_append_masked (the batcher's vmap-friendly form) must be
    bit-identical to decode_append for active rows across several flush
    boundaries, and freeze ALL state for inactive rows."""
    qcfg = make_qcfg()  # gs=16, W=32
    B, H, D, Tmax = 1, 2, 32, 256
    c_cond = KC.init_layer_cache(B, H, D, Tmax, qcfg)
    c_mask = KC.init_layer_cache(B, H, D, Tmax, qcfg)
    key = jax.random.PRNGKey(5)
    step_c = jax.jit(lambda c, k, v: KC.decode_append(c, k, v, qcfg))
    step_m = jax.jit(lambda c, k, v, a: KC.decode_append_masked(
        c, k, v, qcfg, active=a))
    on = jnp.asarray(True)
    for t in range(80):  # two K flushes, three V flushes
        kv = jax.random.normal(jax.random.fold_in(key, t), (2, B, H, 1, D))
        c_cond = step_c(c_cond, kv[0], kv[1])
        c_mask = step_m(c_mask, kv[0], kv[1], on)
    for a, b in zip(jax.tree_util.tree_leaves(c_cond),
                    jax.tree_util.tree_leaves(c_mask)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # inactive: counters frozen, valid state untouched
    frozen = c_mask
    off = jnp.asarray(False)
    kv = jax.random.normal(jax.random.fold_in(key, 999), (2, B, H, 1, D))
    after = step_m(frozen, kv[0], kv[1], off)
    assert int(after.n_k_win) == int(frozen.n_k_win)
    assert int(after.n_v_win) == int(frozen.n_v_win)
    assert int(after.n_k_quant) == int(frozen.n_k_quant)
    assert int(after.n_v_quant) == int(frozen.n_v_quant)
    # stores and the VALID window prefix are bit-identical
    np.testing.assert_array_equal(np.asarray(after.k_codes),
                                  np.asarray(frozen.k_codes))
    np.testing.assert_array_equal(np.asarray(after.v_codes),
                                  np.asarray(frozen.v_codes))
    nkw = int(frozen.n_k_win)
    np.testing.assert_array_equal(
        np.asarray(after.k_win[:, :, :nkw]),
        np.asarray(frozen.k_win[:, :, :nkw]))


def _exact_reference(q_all, k_all, v_all, t):
    """Exact fp attention for query at position t over tokens [0, t]."""
    att = np.einsum("hd,hkd->hk", q_all[:, t], k_all[:, : t + 1])
    att = att / np.sqrt(q_all.shape[-1])
    att = att - att.max(-1, keepdims=True)
    p = np.exp(att)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hk,hkd->hd", p, v_all[:, : t + 1])


# Tolerances are MEASURED envelopes (seeds 3/7/11, ~1.3x headroom over
# the worst seed), two data regimes:
#   * "structured": per-channel K outliers + iid V (evalsuite/synth.py) —
#     the regime KIVI was designed for (reference vis/vis.ipynb);
#     measured 2-bit 0.20-0.26, 4-bit 0.035-0.064, 8-bit 0.004-0.009.
#   * "iid": iid-normal K/V, the WORST case for grouped quantization;
#     measured 2-bit 0.37-0.41, 4-bit 0.069-0.074, 8-bit 0.006-0.007.
# Structured 2-bit error is ~2x below iid — the per-channel-K/per-token-V
# axis choice exploiting the structure, quantified.  Errors scale ~16x
# per 2 bits, confirming round-to-nearest behavior.
@pytest.mark.parametrize("bits,tol,tol_s", [
    (8, 0.010, 0.012), (4, 0.095, 0.080), (2, 0.48, 0.32)])
@pytest.mark.parametrize("gqa", [1, 2])
@pytest.mark.parametrize("structured", [False, True])
def test_streaming_decode_vs_exact(bits, tol, tol_s, gqa, structured):
    """Port of reference quant/test.py:125-170: KIVI streaming decode vs
    exact attention, relative output error small."""
    qcfg = QuantConfig(k_bits=bits, v_bits=bits, group_size=16,
                       residual_length=32)
    B, Hkv, D, Tmax = 1, 2, 32, 256
    Hq = Hkv * gqa
    T0, steps = 48, 40
    key = jax.random.PRNGKey(3)
    if structured:
        from kivi_tpu.evalsuite.synth import structured_kv
        tol = tol_s
        ks, vs = structured_kv(key, B, Hkv, T0 + steps, D)
    else:
        ks = jax.random.normal(key, (B, Hkv, T0 + steps, D), jnp.float32)
        vs = jax.random.normal(jax.random.fold_in(key, 1),
                               (B, Hkv, T0 + steps, D), jnp.float32)
    qs = jax.random.normal(jax.random.fold_in(key, 2),
                           (B, Hq, T0 + steps, D), jnp.float32)

    cache = KC.init_layer_cache(B, Hkv, D, Tmax, qcfg, dtype=jnp.float32)
    cache = KC.prefill_ingest(cache, ks[:, :, :T0], vs[:, :, :T0], qcfg)

    append = jax.jit(lambda c, k, v: KC.decode_append(c, k, v, qcfg))
    attend = jax.jit(lambda q, c: decode_attention(q, c, qcfg))

    k_np = np.repeat(np.asarray(ks[0]), gqa, axis=0)
    v_np = np.repeat(np.asarray(vs[0]), gqa, axis=0)
    q_np = np.asarray(qs[0])

    rels = []
    for i in range(steps):
        t = T0 + i
        cache = append(cache, ks[:, :, t:t + 1], vs[:, :, t:t + 1])
        out = attend(qs[:, :, t:t + 1], cache)
        ref = _exact_reference(q_np, k_np, v_np, t)
        rel = np.abs(np.asarray(out[0, :, 0]) - ref).mean() / (
            np.abs(ref).mean() + 1e-9)
        rels.append(rel)
    assert float(np.mean(rels)) < tol, np.mean(rels)


def test_decode_attention_matches_exact_when_nothing_quantized():
    """With everything still inside the fp windows, decode attention must be
    exact (up to f32 rounding)."""
    qcfg = make_qcfg()
    B, Hkv, Hq, D = 2, 2, 4, 32
    cache = KC.init_layer_cache(B, Hkv, D, 128, qcfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(4)
    T = 20
    ks = jax.random.normal(key, (B, Hkv, T, D), jnp.float32)
    vs = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, T, D))
    q = jax.random.normal(jax.random.fold_in(key, 2), (B, Hq, 1, D))
    for t in range(T):
        cache = KC.decode_append(cache, ks[:, :, t:t + 1], vs[:, :, t:t + 1],
                                 qcfg)
    out = decode_attention(q, cache, qcfg)
    ref = prefill_attention(
        jnp.concatenate([jnp.zeros((B, Hq, T - 1, D)), q], axis=2),
        ks, vs)[:, :, -1:]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

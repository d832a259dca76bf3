"""Prefix caching / chunked prefill (extend-mode) tests.

The reference's prefill is all-or-nothing exact attention
(`/root/reference/models/llama_kivi.py:420-452`); `prefill_extend` /
`extend_attention` / `Engine.prefill_prefix` add chunked continuation on
top of the quantized cache.  The load-bearing invariant: extending a
cache holding T0 tokens by a T1 suffix must land in EXACTLY the state a
one-shot ingest of all T0+T1 tokens produces (quantization blocks and
group boundaries depend only on absolute position), so shared-prefix
snapshots are indistinguishable from a full prefill downstream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.cache import kivi_cache as KC
from kivi_tpu.cache.fp_cache import (fp_append, fp_extend_attention,
                                     init_fp_cache)
from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.core.attention import (decode_attention, extend_attention,
                                     prefill_attention)
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine


def make_qcfg(**kw):
    kw.setdefault("k_bits", 2)
    kw.setdefault("v_bits", 2)
    kw.setdefault("group_size", 16)
    kw.setdefault("residual_length", 32)
    return QuantConfig(**kw)


def _kv(key, B, H, T, D, dtype=jnp.float32):
    k = jax.random.normal(jax.random.PRNGKey(key), (B, H, T, D), dtype)
    v = jax.random.normal(jax.random.PRNGKey(key + 1), (B, H, T, D), dtype)
    return k, v


# ---------------------------------------------------------------------------
# cache-state equivalence: extend == one-shot ingest, bit for bit
# ---------------------------------------------------------------------------

# splits exercise: W-aligned, off-boundary, prefix inside the window
# (T0 < W), suffix crossing several W blocks, suffix of 1, and a second
# chained extend.
@pytest.mark.parametrize("t0,t1", [(64, 64), (70, 58), (10, 118),
                                   (33, 1), (32, 96), (100, 28)])
def test_prefill_extend_matches_one_shot(t0, t1):
    qcfg = make_qcfg()  # gs=16, W=32
    B, H, D, Tmax = 2, 2, 32, 256
    k, v = _kv(0, B, H, t0 + t1, D)

    one = KC.init_layer_cache(B, H, D, Tmax, qcfg, jnp.float32)
    one = KC.prefill_ingest(one, k, v, qcfg)

    two = KC.init_layer_cache(B, H, D, Tmax, qcfg, jnp.float32)
    two = KC.prefill_ingest(two, k[:, :, :t0], v[:, :, :t0], qcfg)
    two = KC.prefill_extend(two, k[:, :, t0:], v[:, :, t0:], qcfg, t0)

    for f in ("k_codes", "k_scale", "k_mn", "v_codes", "v_scale", "v_mn",
              "k_win", "v_win"):
        np.testing.assert_array_equal(
            np.asarray(getattr(one, f)), np.asarray(getattr(two, f)), f)
    for f in ("n_k_quant", "n_k_win", "n_v_quant", "n_v_win"):
        assert int(getattr(one, f)) == int(getattr(two, f)), f


def test_prefill_extend_chained():
    """Three chained extends == one-shot (multi-turn prefix growth)."""
    qcfg = make_qcfg(v_flush=32)
    B, H, D, Tmax = 1, 2, 32, 512
    splits = [40, 40 + 37, 40 + 37 + 91]
    k, v = _kv(10, B, H, splits[-1], D)

    one = KC.init_layer_cache(B, H, D, Tmax, qcfg, jnp.float32)
    one = KC.prefill_ingest(one, k, v, qcfg)

    two = KC.init_layer_cache(B, H, D, Tmax, qcfg, jnp.float32)
    prev = 0
    for s in splits:
        blk = slice(prev, s)
        if prev == 0:
            two = KC.prefill_ingest(two, k[:, :, blk], v[:, :, blk], qcfg)
        else:
            two = KC.prefill_extend(two, k[:, :, blk], v[:, :, blk], qcfg,
                                    prev)
        prev = s

    np.testing.assert_array_equal(np.asarray(one.k_codes),
                                  np.asarray(two.k_codes))
    np.testing.assert_array_equal(np.asarray(one.v_codes),
                                  np.asarray(two.v_codes))
    np.testing.assert_array_equal(np.asarray(one.k_win),
                                  np.asarray(two.k_win))
    np.testing.assert_array_equal(np.asarray(one.v_win),
                                  np.asarray(two.v_win))
    assert int(one.seq_len) == int(two.seq_len) == splits[-1]


def test_prefill_extend_bf16_window_roundtrip():
    """bf16 activations + bf16 window (the engine's configuration) also
    land bit-identical: the window round-trips bf16->bf16 losslessly."""
    qcfg = make_qcfg()
    B, H, D, Tmax = 1, 1, 32, 256
    k, v = _kv(20, B, H, 100, D, jnp.bfloat16)
    one = KC.init_layer_cache(B, H, D, Tmax, qcfg, jnp.bfloat16)
    one = KC.prefill_ingest(one, k, v, qcfg)
    two = KC.init_layer_cache(B, H, D, Tmax, qcfg, jnp.bfloat16)
    two = KC.prefill_ingest(two, k[:, :, :70], v[:, :, :70], qcfg)
    two = KC.prefill_extend(two, k[:, :, 70:], v[:, :, 70:], qcfg, 70)
    np.testing.assert_array_equal(np.asarray(one.k_codes),
                                  np.asarray(two.k_codes))
    np.testing.assert_array_equal(
        np.asarray(one.k_win, np.float32), np.asarray(two.k_win, np.float32))
    np.testing.assert_array_equal(
        np.asarray(one.v_win, np.float32), np.asarray(two.v_win, np.float32))


# ---------------------------------------------------------------------------
# extend attention correctness
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sliding_window", [None, 48])
def test_fp_extend_matches_full_prefill(sliding_window):
    """fp twin is exact: suffix rows of full prefill attention == extend
    attention over a cache holding the prefix."""
    B, Hq, Hkv, D, Tmax = 2, 4, 2, 32, 128
    t0, t1 = 50, 30
    k, v = _kv(30, B, Hkv, t0 + t1, D)
    q = jax.random.normal(jax.random.PRNGKey(33), (B, Hq, t0 + t1, D))

    full = prefill_attention(q, k, v, sliding_window=sliding_window)

    cache = init_fp_cache(B, Hkv, D, Tmax, jnp.float32)
    cache = fp_append(cache, k[:, :, :t0], v[:, :, :t0])
    got = fp_extend_attention(q[:, :, t0:], k[:, :, t0:], v[:, :, t0:],
                              cache, sliding_window=sliding_window)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(full[:, :, t0:]),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_extend_attention_8bit_matches_fp(impl):
    """At 8 bits the quantized history is near-exact, so extend over the
    KIVI cache must track the fp oracle tightly."""
    qcfg = make_qcfg(k_bits=8, v_bits=8)
    B, Hq, Hkv, D, Tmax = 1, 4, 2, 32, 128
    t0, t1 = 70, 26
    k, v = _kv(40, B, Hkv, t0 + t1, D)
    q = jax.random.normal(jax.random.PRNGKey(44), (B, Hq, t0 + t1, D))

    full = prefill_attention(q, k, v)

    cache = KC.init_layer_cache(B, Hkv, D, Tmax, qcfg, jnp.float32)
    cache = KC.prefill_ingest(cache, k[:, :, :t0], v[:, :, :t0], qcfg)
    got = extend_attention(q[:, :, t0:], k[:, :, t0:], v[:, :, t0:],
                           cache, qcfg, impl=impl)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(full[:, :, t0:]),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("bits", [2, 4])
def test_extend_single_token_matches_decode(bits):
    """A one-token extend is semantically a decode step: same cache, same
    token, outputs must agree (decode appends-then-attends; extend
    attends history + exact self)."""
    qcfg = make_qcfg(k_bits=bits, v_bits=bits)
    B, Hq, Hkv, D, Tmax = 1, 4, 2, 32, 128
    t0 = 70  # window at 6/32 after ingest: the append cannot flush
    k, v = _kv(50, B, Hkv, t0 + 1, D)
    q = jax.random.normal(jax.random.PRNGKey(55), (B, Hq, 1, D))

    cache = KC.init_layer_cache(B, Hkv, D, Tmax, qcfg, jnp.float32)
    cache = KC.prefill_ingest(cache, k[:, :, :t0], v[:, :, :t0], qcfg)

    ext = extend_attention(q, k[:, :, t0:], v[:, :, t0:], cache, qcfg)

    dec_cache = KC.decode_append(cache, k[:, :, t0:], v[:, :, t0:], qcfg)
    dec = decode_attention(q, dec_cache, qcfg)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(dec),
                               atol=2e-5, rtol=2e-5)


def test_extend_sliding_window_matches_fp_window():
    """SWA extend at 8 bits vs the fp twin (which is exact vs prefill)."""
    qcfg = make_qcfg(k_bits=8, v_bits=8)
    B, Hq, Hkv, D, Tmax = 1, 2, 2, 32, 128
    t0, t1, win = 64, 20, 48
    k, v = _kv(60, B, Hkv, t0 + t1, D)
    q = jax.random.normal(jax.random.PRNGKey(66), (B, Hq, t0 + t1, D))

    fpc = init_fp_cache(B, Hkv, D, Tmax, jnp.float32)
    fpc = fp_append(fpc, k[:, :, :t0], v[:, :, :t0])
    want = fp_extend_attention(q[:, :, t0:], k[:, :, t0:], v[:, :, t0:],
                               fpc, sliding_window=win)

    cache = KC.init_layer_cache(B, Hkv, D, Tmax, qcfg, jnp.float32)
    cache = KC.prefill_ingest(cache, k[:, :, :t0], v[:, :, :t0], qcfg)
    got = extend_attention(q[:, :, t0:], k[:, :, t0:], v[:, :, t0:],
                           cache, qcfg, sliding_window=win)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# engine API: prefill_prefix / extend / generate(prefix=)
# ---------------------------------------------------------------------------

def _tiny(vocab=64):
    return ModelConfig(vocab_size=vocab, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       num_kv_heads=2, head_dim=16,
                       max_position_embeddings=256)


def _params(cfg, seed=0):
    return modeling.init_params(cfg, jax.random.PRNGKey(seed),
                                dtype=jnp.float32)


def _toks(seed, shape, vocab=64):
    return jnp.asarray(np.random.default_rng(seed).integers(
        1, vocab, shape), jnp.int32)


def test_engine_extend_matches_one_shot_snapshot():
    """Engine.extend(snap, t1) vs prefill_prefix(t0 + t1) on the fp16
    cache: suffix activations are exact either way, so cache contents
    must agree to fp noise (summation order differs between the prefill
    and extend attention paths, so bit-identity is cache-level only —
    see test_prefill_extend_matches_one_shot).  Also: extend must NOT
    corrupt the source snapshot (donation hygiene)."""
    cfg = _tiny()
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    eng = Engine(cfg, qcfg, _params(cfg), max_seq_len=128, batch_size=1)
    eng.cache_dtype = jnp.float32
    t0, t1 = _toks(0, (37,)), _toks(1, (45,))

    snap0 = eng.prefill_prefix(t0)
    before = jax.tree_util.tree_map(np.asarray, snap0.caches)
    snap1 = eng.extend(snap0, t1)
    after = jax.tree_util.tree_map(np.asarray, snap0.caches)
    one = eng.prefill_prefix(jnp.concatenate([t0, t1]))

    jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)
    assert snap1.length == one.length == 82
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5),
        snap1.caches, one.caches)


def test_engine_generate_prefix_fp_matches_full():
    """fp16-cache engine: generate(prefix=snap, suffix) must be token-
    equal to generate(prefix + suffix) — the extend path is exact when
    nothing is quantized."""
    cfg = _tiny()
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    eng = Engine(cfg, qcfg, _params(cfg), max_seq_len=128, batch_size=2)
    eng.cache_dtype = jnp.float32
    prefix, suffix = _toks(2, (30,)), _toks(3, (2, 11))
    full = jnp.concatenate(
        [jnp.broadcast_to(prefix, (2, 30)), suffix], axis=1)

    want = np.asarray(eng.generate(full, 12))
    snap = eng.prefill_prefix(prefix)
    got = np.asarray(eng.generate(suffix, 12, prefix=snap))
    np.testing.assert_array_equal(got, want)


def test_engine_generate_prefix_8bit_matches_full():
    """8-bit KIVI: suffix tokens see a near-exact quantized prefix, so
    greedy tokens should not drift at tiny scale."""
    cfg = _tiny()
    eng = Engine(cfg, make_qcfg(k_bits=8, v_bits=8), _params(cfg),
                 max_seq_len=128, batch_size=2)
    eng.cache_dtype = jnp.float32
    prefix, suffix = _toks(4, (40,)), _toks(5, (2, 9))
    full = jnp.concatenate(
        [jnp.broadcast_to(prefix, (2, 40)), suffix], axis=1)

    want = np.asarray(eng.generate(full, 10))
    snap = eng.prefill_prefix(prefix)
    got = np.asarray(eng.generate(suffix, 10, prefix=snap))
    assert (got == want).mean() >= 0.9, (got, want)


def test_engine_generate_prefix_2bit_runs_and_broadcasts():
    """2-bit end to end: rows with identical suffixes must decode
    identically (broadcast_rows gave every row the same prefix), tokens
    finite/valid, and repeated generates from one snapshot agree (the
    snapshot is not consumed).  Chained-extend and one-shot snapshots
    legitimately DIFFER at 2-bit — extend-path suffix activations saw a
    quantized prefix — so no cross-path equality here (that invariant
    is cache-level: test_prefill_extend_matches_one_shot)."""
    cfg = _tiny()
    eng = Engine(cfg, make_qcfg(), _params(cfg), max_seq_len=256,
                 batch_size=2)
    eng.cache_dtype = jnp.float32
    t0, t1 = _toks(6, (33,)), _toks(7, (19,))
    suffix = jnp.broadcast_to(_toks(8, (7,)), (2, 7))

    snap = eng.extend(eng.prefill_prefix(t0), t1)
    out = np.asarray(eng.generate(suffix, 15, prefix=snap))
    assert out.shape == (2, 15)
    np.testing.assert_array_equal(out[0], out[1])
    assert ((out >= 0) & (out < cfg.vocab_size)).all()

    again = np.asarray(eng.generate(suffix, 15, prefix=snap))
    np.testing.assert_array_equal(out, again)


def test_engine_prefix_repetition_penalty_sees_prefix_tokens():
    """The seen-mask must cover PREFIX tokens, not just the suffix: a
    penalized generate with prefix must match the full-prompt run."""
    cfg = _tiny()
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    eng = Engine(cfg, qcfg, _params(cfg), max_seq_len=128, batch_size=1)
    eng.cache_dtype = jnp.float32
    prefix, suffix = _toks(9, (25,)), _toks(10, (1, 6))
    full = jnp.concatenate([prefix.reshape(1, -1), suffix], axis=1)

    want = np.asarray(eng.generate(full, 10, repetition_penalty=1.5))
    got = np.asarray(eng.generate(suffix, 10,
                                  prefix=eng.prefill_prefix(prefix),
                                  repetition_penalty=1.5))
    np.testing.assert_array_equal(got, want)


def test_prefill_chunked_fp_matches_one_shot():
    """fp16 cache: every chunk attends exact history, so chunked prefill
    logits and greedy generation must match the one-shot path."""
    cfg = _tiny()
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    eng = Engine(cfg, qcfg, _params(cfg), max_seq_len=256, batch_size=2)
    eng.cache_dtype = jnp.float32
    toks = _toks(11, (2, 100))

    want_logits, want_caches = eng._prefill(
        eng.params, toks, eng.init_caches(), None)
    got_logits, got_caches = eng.prefill_chunked(toks, chunk_size=32)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits),
                               atol=1e-4, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5),
        got_caches, want_caches)


def test_prefill_chunked_compiles_once_per_phase():
    """Interior chunks at different absolute positions must share ONE
    extend compilation (prev_len canonicalized to its quantization
    phase) — the whole point of chunked prefill on TPU, where each
    distinct prefill geometry costs a 20-40 s compile."""
    cfg = _tiny()
    eng = Engine(cfg, make_qcfg(), _params(cfg), max_seq_len=1024,
                 batch_size=1)
    eng.cache_dtype = jnp.float32
    # W=32, vf=gs=16 -> L=32; chunk 64 is phase-aligned.  9 chunks +
    # one 36-token remainder.
    toks = _toks(12, (1, 9 * 64 + 36))
    logits, caches = eng.prefill_chunked(toks, chunk_size=64)
    assert logits.shape == (1, cfg.vocab_size)
    assert int(caches[0].seq_len) == 612
    # chunk 0 (empty cache), ONE shared interior phase, remainder
    assert eng._extend._cache_size() <= 3

    # a second, longer prompt reuses all three compilations
    toks2 = _toks(13, (1, 14 * 64 + 36))
    eng.prefill_chunked(toks2, chunk_size=64)
    assert eng._extend._cache_size() <= 3


def test_prefill_chunked_8bit_generation_tracks_one_shot():
    """8-bit: chunks attend near-exact quantized history; greedy tokens
    from a chunked-prefill prefix should track the one-shot prefix."""
    cfg = _tiny()
    eng = Engine(cfg, make_qcfg(k_bits=8, v_bits=8), _params(cfg),
                 max_seq_len=256, batch_size=2)
    eng.cache_dtype = jnp.float32
    prefix = _toks(14, (90,))
    suffix = jnp.broadcast_to(_toks(15, (8,)), (2, 8))

    snap_one = eng.prefill_prefix(prefix)
    snap_chk = eng.prefill_prefix(prefix, chunk_size=32)
    want = np.asarray(eng.generate(suffix, 10, prefix=snap_one))
    got = np.asarray(eng.generate(suffix, 10, prefix=snap_chk))
    assert (got == want).mean() >= 0.9, (got, want)


def test_fp_extend_pad_matches_padded_prefill():
    """Left-pad masking in extend: fp extend over a cache built from a
    padded prefix must equal the padded one-shot prefill's suffix rows
    (prefill_attention's pad_len path is the oracle)."""
    B, Hq, Hkv, D, Tmax = 2, 4, 2, 32, 128
    t0, t1 = 48, 30
    pads = jnp.asarray([7, 21], jnp.int32)
    k, v = _kv(80, B, Hkv, t0 + t1, D)
    q = jax.random.normal(jax.random.PRNGKey(88), (B, Hq, t0 + t1, D))

    full = prefill_attention(q, k, v, pad_len=pads)

    cache = init_fp_cache(B, Hkv, D, Tmax, jnp.float32)
    cache = fp_append(cache, k[:, :, :t0], v[:, :, :t0])
    got = fp_extend_attention(q[:, :, t0:], k[:, :, t0:], v[:, :, t0:],
                              cache, pad_len=pads)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(full[:, :, t0:]),
                               atol=2e-5, rtol=2e-5)


def test_extend_pad_8bit_matches_fp():
    """Quantized extend with pad masking tracks the fp twin at 8 bits."""
    qcfg = make_qcfg(k_bits=8, v_bits=8)
    B, Hq, Hkv, D, Tmax = 2, 4, 2, 32, 128
    t0, t1 = 64, 20
    pads = jnp.asarray([5, 17], jnp.int32)
    k, v = _kv(90, B, Hkv, t0 + t1, D)
    q = jax.random.normal(jax.random.PRNGKey(99), (B, Hq, t0 + t1, D))

    fpc = init_fp_cache(B, Hkv, D, Tmax, jnp.float32)
    fpc = fp_append(fpc, k[:, :, :t0], v[:, :, :t0])
    want = fp_extend_attention(q[:, :, t0:], k[:, :, t0:], v[:, :, t0:],
                               fpc, pad_len=pads)

    cache = KC.init_layer_cache(B, Hkv, D, Tmax, qcfg, jnp.float32)
    cache = KC.prefill_ingest(cache, k[:, :, :t0], v[:, :, :t0], qcfg)
    got = extend_attention(q[:, :, t0:], k[:, :, t0:], v[:, :, t0:],
                           cache, qcfg, pad_len=pads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


def test_chunked_ragged_fp_matches_one_shot():
    """fp16 cache: RAGGED prompts (left-padded to a chunk multiple)
    through chunked prefill must generate token-equal to the one-shot
    padded path — including a row whose pad exceeds the chunk size
    (its first chunk is entirely garbage)."""
    cfg = _tiny()
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    eng = Engine(cfg, qcfg, _params(cfg), max_seq_len=256, batch_size=2)
    eng.cache_dtype = jnp.float32
    toks = _toks(16, (2, 96))
    pads = [13, 41]   # row 1's pad > chunk 32: fully-padded first chunk

    want = np.asarray(eng.generate(toks, 12, pad_lens=pads))
    got = np.asarray(eng.generate(toks, 12, pad_lens=pads,
                                  prefill_chunk_size=32))
    np.testing.assert_array_equal(got, want)


def test_chunked_ragged_2bit_compile_sharing():
    """2-bit ragged chunked prefill: two DIFFERENT padded prompt
    lengths (both chunk multiples) share the same two extend
    compilations, outputs valid/deterministic."""
    cfg = _tiny()
    eng = Engine(cfg, make_qcfg(), _params(cfg), max_seq_len=512,
                 batch_size=2)
    eng.cache_dtype = jnp.float32
    out1 = np.asarray(eng.generate(_toks(17, (2, 128)), 10,
                                   pad_lens=[3, 19],
                                   prefill_chunk_size=64))
    n_after_first = eng._extend._cache_size()
    out2 = np.asarray(eng.generate(_toks(18, (2, 320)), 10,
                                   pad_lens=[30, 0],
                                   prefill_chunk_size=64))
    assert eng._extend._cache_size() == n_after_first <= 2
    for out in (out1, out2):
        assert ((out >= 0) & (out < cfg.vocab_size)).all()
        assert np.isfinite(out).all()


def test_broadcast_rows_counters_are_fresh_buffers():
    """broadcast_rows must COPY 0-d counters: the result is handed to
    donating jits, which must not invalidate the snapshot's buffers."""
    qcfg = make_qcfg()
    cache = KC.init_layer_cache(1, 2, 32, 128, qcfg, jnp.float32)
    k, v = _kv(70, 1, 2, 50, 32)
    cache = KC.prefill_ingest(cache, k, v, qcfg)
    out = KC.broadcast_rows(cache, 4)
    assert out.k_codes.shape[0] == 4
    assert int(out.n_k_quant) == int(cache.n_k_quant)
    assert out.n_k_quant is not cache.n_k_quant
    np.testing.assert_array_equal(np.asarray(out.k_win[0]),
                                  np.asarray(cache.k_win[0]))
    np.testing.assert_array_equal(np.asarray(out.k_win[3]),
                                  np.asarray(cache.k_win[0]))


def test_extend_zeroes_pad_kv_like_prefill():
    """Ragged chunked prefill: the extend path must zero pad slots' K/V
    exactly as one-shot prefill does (K quant groups straddling the pad
    boundary must see 0s, not garbage activations).  With a single
    chunk covering the whole prompt, extend-from-empty and one-shot
    prefill ingest identical K/V, so LAYER 0's cache must match
    bitwise (without the zeroing, its pad slots hold garbage
    activations); deeper layers only to fp32 tolerance — their inputs
    ride layer-0 attention, whose prefill/extend implementations reduce
    in different orders."""
    import dataclasses as dc

    from kivi_tpu.config import tiny_config

    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)

    def eng():
        e = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=256,
                   batch_size=2)
        e.cache_dtype = jnp.float32
        return e

    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 64), 1,
                              cfg.vocab_size, jnp.int32)
    pads = [5, 0]                    # 5 is NOT a multiple of group_size
    e1, e2 = eng(), eng()
    _, c_one = e1._prefill(params, toks, e1.init_caches(),
                           jnp.asarray(pads, jnp.int32))
    _, c_chk = e2.prefill_chunked(toks, chunk_size=64, pad_lens=pads)
    for i, (a, b) in enumerate(zip(c_one, c_chk)):
        for f in dc.fields(a):
            av, bv = np.asarray(getattr(a, f.name)), \
                np.asarray(getattr(b, f.name))
            if i == 0:
                np.testing.assert_array_equal(
                    av, bv, err_msg=f"layer {i} {f.name}")
            elif np.issubdtype(av.dtype, np.floating):
                np.testing.assert_allclose(
                    av, bv, rtol=2e-3, atol=2e-3,
                    err_msg=f"layer {i} {f.name}")

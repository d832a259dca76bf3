"""Beam search over the KIVI cache (engine.generate_beam + cache reorder).

The reference gets beam search from HF generate() + `_reorder_cache`
(`/root/reference/models/llama_kivi.py:950-957`); here the beams are
batch rows and the cache re-orders by gather each step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.cache.kivi_cache import (init_layer_cache, prefill_ingest,
                                       reorder)
from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine


def _tiny(vocab=64):
    return ModelConfig(vocab_size=vocab, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=2,
                       num_kv_heads=2, head_dim=16,
                       max_position_embeddings=256)


def test_cache_reorder_matches_manual():
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=16,
                       residual_length=16)
    B, H, D = 4, 2, 64
    cache = init_layer_cache(B, H, D, 128, qcfg)
    k = jax.random.normal(jax.random.PRNGKey(0), (B, H, 40, D),
                          jnp.float32)
    cache = prefill_ingest(cache, k, k, qcfg)
    idx = jnp.asarray([2, 2, 0, 3])
    got = reorder(cache, idx)
    np.testing.assert_array_equal(np.asarray(got.k_codes),
                                  np.asarray(cache.k_codes)[idx])
    np.testing.assert_array_equal(np.asarray(got.v_win),
                                  np.asarray(cache.v_win)[idx])
    assert int(got.n_k_quant) == int(cache.n_k_quant)


def _params(cfg, seed=0):
    return modeling.init_params(cfg, jax.random.PRNGKey(seed),
                                dtype=jnp.float32)


def test_beam1_matches_greedy():
    """num_beams=1 beam search IS greedy decoding."""
    cfg = _tiny()
    params = _params(cfg)
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        1, cfg.vocab_size, (2, 12)))
    eng = Engine(cfg, qcfg, params, max_seq_len=64, batch_size=2)
    eng.cache_dtype = jnp.float32
    greedy = np.asarray(eng.generate(toks, 10))
    beam = np.asarray(eng.generate_beam(toks, 10, num_beams=1))
    np.testing.assert_array_equal(greedy, beam)


def test_beam_score_at_least_greedy():
    """The best beam's total logprob must be >= the greedy path's."""
    cfg = _tiny()
    params = _params(cfg, seed=3)
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    toks = jnp.asarray(np.random.default_rng(1).integers(
        1, cfg.vocab_size, (1, 8)))
    new = 8

    def path_logprob(seq):
        """Sum of per-token logprobs of `seq` (1, new) continuing toks."""
        eng = Engine(cfg, qcfg, params, max_seq_len=64, batch_size=1)
        eng.cache_dtype = jnp.float32
        full = jnp.concatenate([toks, seq], axis=1)
        caches = eng.init_caches()
        B, T = full.shape
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32),
                                     (B, T))
        logits, _ = modeling.forward(params, full, caches, cfg, qcfg,
                                     positions, mode="prefill")
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = full[:, toks.shape[1]:]
        src = lp[:, toks.shape[1] - 1:-1, :]
        return float(jnp.sum(jnp.take_along_axis(
            src, tgt[:, :, None], axis=2)))

    eng1 = Engine(cfg, qcfg, params, max_seq_len=64, batch_size=1)
    eng1.cache_dtype = jnp.float32
    greedy = eng1.generate(toks, new)
    eng4 = Engine(cfg, qcfg, params, max_seq_len=64, batch_size=4)
    eng4.cache_dtype = jnp.float32
    beam = eng4.generate_beam(toks, new, num_beams=4)
    assert path_logprob(beam) >= path_logprob(greedy) - 1e-3


def test_beam_kivi_cache_runs():
    """Beam search over the quantized cache with flushes crossing."""
    cfg = _tiny()
    params = _params(cfg, seed=7)
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=16,
                       residual_length=32)
    toks = jnp.asarray(np.random.default_rng(2).integers(
        1, cfg.vocab_size, (2, 30)))
    eng = Engine(cfg, qcfg, params, max_seq_len=128, batch_size=4)
    out = np.asarray(eng.generate_beam(toks, 40, num_beams=2))
    assert out.shape == (2, 40)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_beam_padded_matches_unpadded_fp16():
    """Left-padded beam search equals unpadded beam search at fp16 (the
    pad mask must survive the per-step cache reorder)."""
    cfg = _tiny()
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    prompt = list(np.random.RandomState(2).randint(1, cfg.vocab_size,
                                                   size=20))
    nb, steps = 3, 6
    with jax.default_matmul_precision("highest"):
        eng = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=128,
                     batch_size=nb)
        want = np.asarray(eng.generate_beam(
            jnp.asarray([prompt], jnp.int32), steps, num_beams=nb))
        pad = 7
        eng2 = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=128,
                      batch_size=nb)
        got = np.asarray(eng2.generate_beam(
            jnp.asarray([[0] * pad + prompt], jnp.int32), steps,
            num_beams=nb, pad_lens=[pad]))
    np.testing.assert_array_equal(got, want)


def test_beam_with_prefix_matches_full_prompt():
    """Beam search behind a shared prefix: fp16 cache, so the extend
    path is exact and the beams must match the full-prompt run."""
    cfg = _tiny()
    params = _params(cfg)
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    eng = Engine(cfg, qcfg, params, max_seq_len=128, batch_size=4)
    eng.cache_dtype = jnp.float32
    rng = np.random.default_rng(4)
    prefix = jnp.asarray(rng.integers(1, cfg.vocab_size, 20), jnp.int32)
    suffix = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 8)),
                         jnp.int32)
    full = jnp.concatenate(
        [jnp.broadcast_to(prefix, (2, 20)), suffix], axis=1)

    want = np.asarray(eng.generate_beam(full, 10, num_beams=2))
    snap = eng.prefill_prefix(prefix)
    got = np.asarray(eng.generate_beam(suffix, 10, num_beams=2,
                                       prefix=snap))
    np.testing.assert_array_equal(got, want)

"""Streaming generation (engine.generate_stream) vs generate().

Greedy streams must be token-equal to the one-shot scan (segmenting
changes dispatch granularity, not math — prompt_len canonicalization
makes the segments share compilations); EOS rows pad identically and
the stream may stop early once every row has finished.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine

CFG = tiny_config()
QCFG = QuantConfig(k_bits=2, v_bits=2, group_size=32, residual_length=32)


def _eng(qcfg=QCFG, batch=2, max_seq=256):
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    e = Engine(cfg=CFG, qcfg=qcfg, params=params, max_seq_len=max_seq,
               batch_size=batch)
    e.cache_dtype = jnp.float32
    return e


def _collect(stream):
    blocks = list(stream)
    return np.concatenate(blocks, axis=1), blocks


@pytest.mark.parametrize("segment", [1, 5, 16])
def test_stream_matches_generate_greedy(segment):
    eng = _eng()
    toks = jnp.asarray(np.random.default_rng(0).integers(
        1, CFG.vocab_size, (2, 20)), jnp.int32)
    want = np.asarray(eng.generate(toks, 23))
    got, blocks = _collect(eng.generate_stream(toks, 23,
                                               segment=segment))
    np.testing.assert_array_equal(got, want)
    assert blocks[0].shape == (2, 1)     # time-to-first-token yield


def test_stream_matches_generate_with_penalty_and_pad():
    eng = _eng()
    toks = jnp.asarray(np.random.default_rng(1).integers(
        1, CFG.vocab_size, (2, 24)), jnp.int32)
    kw = dict(pad_lens=[3, 9], repetition_penalty=1.6)
    want = np.asarray(eng.generate(toks, 18, **kw))
    got, _ = _collect(eng.generate_stream(toks, 18, segment=7, **kw))
    np.testing.assert_array_equal(got, want)


def test_stream_eos_pads_and_stops_early():
    """Pick the EOS id from the model's own greedy output so it fires
    mid-stream: rows past EOS emit eos, and the stream ends early."""
    eng = _eng()
    toks = jnp.asarray(np.random.default_rng(2).integers(
        1, CFG.vocab_size, (2, 16)), jnp.int32)
    free = np.asarray(eng.generate(toks, 24))
    eos = int(free[0, 5])                # row 0 hits it at step <= 5
    want = np.asarray(eng.generate(toks, 24, eos_token_id=eos))
    got, blocks = _collect(eng.generate_stream(toks, 24, segment=4,
                                               eos_token_id=eos))
    n = got.shape[1]
    assert n <= 24
    np.testing.assert_array_equal(got, want[:, :n])
    # everything beyond the stream's early stop is EOS padding
    assert (want[:, n:] == eos).all()


def test_stream_matches_generate_sampled():
    """temperature > 0: the stream advances the host rng chain exactly
    as the one-shot scan splits it, so sampled streams are bit-identical
    to generate() under the same seed."""
    eng = _eng()
    toks = jnp.asarray(np.random.default_rng(5).integers(
        1, CFG.vocab_size, (2, 18)), jnp.int32)
    kw = dict(temperature=0.8, top_k=40, top_p=0.95,
              rng=jax.random.PRNGKey(7))
    want = np.asarray(eng.generate(toks, 17, **kw))
    got, _ = _collect(eng.generate_stream(toks, 17, segment=6, **kw))
    np.testing.assert_array_equal(got, want)


def test_batcher_on_token_streams_every_token():
    """Request.on_token fires once per harvested token, in order, and
    the streamed sequence equals the retired Result exactly."""
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.batcher import ContinuousBatcher, Request

    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.default_rng(4)
    streamed = {0: [], 1: []}
    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=2,
                            max_seq_len=256, prompt_buckets=(32,))
    reqs = [Request(uid=u, prompt=list(rng.integers(1, CFG.vocab_size,
                                                    10 + 3 * u)),
                    max_new_tokens=9 + u,
                    on_token=streamed[u].append) for u in (0, 1)]
    res = bat.run(reqs)
    for u in (0, 1):
        assert streamed[u] == res[u].tokens
        assert len(streamed[u]) == 9 + u


def test_stream_with_prefix_matches_generate():
    eng = _eng()
    rng = np.random.default_rng(3)
    snap = eng.prefill_prefix(jnp.asarray(rng.integers(1, CFG.vocab_size,
                                                       40), jnp.int32))
    sfx = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 7)), jnp.int32)
    want = np.asarray(eng.generate(sfx, 15, prefix=snap))
    got, _ = _collect(eng.generate_stream(sfx, 15, segment=6,
                                          prefix=snap))
    np.testing.assert_array_equal(got, want)

"""Continuous batcher vs the plain engine (the oracle).

The batcher LEFT-pads prompts to their bucket and threads the pad count
through every attention as a mask, so each request's output must equal
what the single-sequence engine produces:
  * fp16 cache: token-equal to the UNPADDED engine run (padding is
    numerically invisible — the correctness-proving case);
  * quantized cache: bit-equal to the engine's own left-pad path (the
    pad shifts quantization-group boundaries, so unpadded equality is
    only approximate at 2-bit; cross-shape bit-equality proves slot
    interleaving changes nothing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _exact_matmul():
    """Token-exact equality between batch shapes needs exact math: at
    TPU default matmul precision (single-pass bf16) the batcher's
    batch-2 logits and the oracle engine's batch-1 logits round
    differently and argmax ties flip on random-weight models."""
    with jax.default_matmul_precision("highest"):
        yield


from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.serving.batcher import ContinuousBatcher, Request
from kivi_tpu.serving.engine import Engine

CFG = tiny_config()
QCFG = QuantConfig(k_bits=2, v_bits=2, group_size=32, residual_length=32)
MAX = 256
BUCKETS = (32, 64)


def _oracle(params, qcfg, prompt, max_new, bucket):
    """Engine run matching the batcher's cache layout: left-padded to
    the bucket, pad carried as a mask."""
    pad = bucket - len(prompt)
    padded = [0] * pad + list(prompt)
    eng = Engine(cfg=CFG, qcfg=qcfg, params=params, max_seq_len=MAX,
                 batch_size=1)
    out = eng.generate(jnp.asarray([padded], jnp.int32), max_new,
                       pad_lens=[pad])
    return [int(t) for t in np.asarray(out[0])]


def _oracle_unpadded(params, qcfg, prompt, max_new):
    eng = Engine(cfg=CFG, qcfg=qcfg, params=params, max_seq_len=MAX,
                 batch_size=1)
    out = eng.generate(jnp.asarray([list(prompt)], jnp.int32), max_new)
    return [int(t) for t in np.asarray(out[0])]


@pytest.mark.parametrize("quant", [True, False])
def test_batcher_matches_engine(quant):
    qcfg = QCFG if quant else QuantConfig(k_bits=16, v_bits=16,
                                          group_size=32, residual_length=32)
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, CFG.vocab_size, size=n))
               for n in (20, 32, 45, 17)]
    reqs = [Request(uid=i, prompt=p, max_new_tokens=6 + i)
            for i, p in enumerate(prompts)]

    bat = ContinuousBatcher(CFG, qcfg, params, num_slots=2,
                            max_seq_len=MAX, prompt_buckets=BUCKETS)
    results = bat.run(reqs)
    assert sorted(results) == [0, 1, 2, 3]

    for req in reqs:
        bucket = 32 if len(req.prompt) <= 32 else 64
        want = _oracle(params, qcfg, req.prompt, req.max_new_tokens, bucket)
        got = results[req.uid].tokens
        assert got == want, (req.uid, got, want)
        if not quant:
            # fp16 cache: padding must be numerically invisible — the
            # served output equals the bare unpadded prompt's output
            want_bare = _oracle_unpadded(params, qcfg, req.prompt,
                                         req.max_new_tokens)
            assert got == want_bare, (req.uid, got, want_bare)


def test_batcher_eos_retires_slot():
    params = modeling.init_params(CFG, jax.random.PRNGKey(1))
    prompt = list(np.random.RandomState(1).randint(1, 200, size=16))
    # run once to learn the 2nd generated token, then use it as "eos"
    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                            max_seq_len=MAX, prompt_buckets=BUCKETS)
    full = bat.run([Request(uid=0, prompt=prompt, max_new_tokens=8)])
    toks = full[0].tokens
    eos = toks[2]
    bat2 = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                             max_seq_len=MAX, prompt_buckets=BUCKETS)
    res = bat2.run([Request(uid=0, prompt=prompt, max_new_tokens=8,
                            eos_token_id=eos)])
    assert res[0].tokens == toks[:3]


def test_batcher_rejects_oversized():
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                            max_seq_len=64, prompt_buckets=(32,))
    res = bat.run([Request(uid=7, prompt=[1] * 30, max_new_tokens=100)])
    assert res[7].tokens == []


def test_batcher_per_request_sampling():
    """Mixed greedy/sampled traffic in one batch: greedy requests stay
    token-equal to the engine oracle while sampled requests produce
    tokens from the filtered set (top_k=1 forces determinism)."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(7)
    p1 = list(rng.randint(1, CFG.vocab_size, size=24))
    p2 = list(rng.randint(1, CFG.vocab_size, size=30))
    reqs = [
        Request(uid=0, prompt=p1, max_new_tokens=6),               # greedy
        Request(uid=1, prompt=p2, max_new_tokens=6,
                temperature=1.5, top_k=1),                         # = greedy
        Request(uid=2, prompt=p1, max_new_tokens=6,
                temperature=2.0, top_p=0.95),                      # sampled
    ]
    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=2,
                            max_seq_len=MAX, prompt_buckets=BUCKETS)
    results = bat.run(reqs)
    want0 = _oracle(params, QCFG, p1, 6, 32)
    assert results[0].tokens == want0
    # temperature>0 with top_k=1 must equal the greedy trajectory
    want1 = _oracle(params, QCFG, p2, 6, 32)
    assert results[1].tokens == want1
    assert len(results[2].tokens) == 6
    assert all(0 <= t < CFG.vocab_size for t in results[2].tokens)


def test_batcher_repetition_penalty_matches_engine():
    """Greedy + repetition penalty is deterministic: batcher output must
    equal the engine with the same penalty (both penalize from the
    FIRST generated token, HF ordering)."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    prompt = list(np.random.RandomState(9).randint(
        1, CFG.vocab_size, size=28))
    pen = 1.8
    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                            max_seq_len=MAX, prompt_buckets=BUCKETS)
    got = bat.run([Request(uid=0, prompt=prompt, max_new_tokens=8,
                           repetition_penalty=pen)])[0].tokens
    pad = 32 - len(prompt)
    eng = Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=MAX,
                 batch_size=1)
    want = [int(t) for t in np.asarray(eng.generate(
        jnp.asarray([[0] * pad + prompt], jnp.int32), 8, pad_lens=[pad],
        repetition_penalty=pen)[0])]
    assert got == want, (got, want)
    # (the penalty TRANSFORM's HF semantics are pinned separately in
    # test_sampling.py; on a random-weight model a moderate penalty may
    # not flip any greedy token, so no trajectory-change assertion here)


def test_batcher_chunked_admission_matches_bucketed_fp():
    """prefill_chunk admission at fp16 must be token-equal to the
    bucketed batcher: padding is numerically invisible on the fp cache,
    so both pad amounts must yield identical trajectories."""
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=32)
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(3)
    prompts = [list(rng.randint(1, CFG.vocab_size, size=n))
               for n in (20, 45, 33)]
    reqs = lambda: [Request(uid=i, prompt=p, max_new_tokens=7)
                    for i, p in enumerate(prompts)]

    bucketed = ContinuousBatcher(CFG, qcfg, params, num_slots=2,
                                 max_seq_len=MAX, prompt_buckets=BUCKETS)
    chunked = ContinuousBatcher(CFG, qcfg, params, num_slots=2,
                                max_seq_len=MAX, prefill_chunk=16)
    want = bucketed.run(reqs())
    got = chunked.run(reqs())
    for uid in (0, 1, 2):
        assert got[uid].tokens == want[uid].tokens, uid
    # the chunked admission's extend jit served every prompt length
    # with two compilations (empty-cache chunk + interior phase)
    assert chunked._extend_chunk._cache_size() <= 2


def test_batcher_chunked_admission_2bit_runs():
    """2-bit chunked admission: trajectories are valid and the engine's
    chunked generate with the same pad is the bit-oracle (same chunk
    layout, same masks, slot interleaving must change nothing)."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    prompt = list(np.random.RandomState(5).randint(
        1, CFG.vocab_size, size=40))
    C = 32
    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                            max_seq_len=MAX, prefill_chunk=C)
    got = bat.run([Request(uid=0, prompt=prompt,
                           max_new_tokens=8)])[0].tokens

    pad = C * ((len(prompt) + C - 1) // C) - len(prompt)
    eng = Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=MAX,
                 batch_size=1)
    eng.cache_dtype = jnp.bfloat16
    want = [int(t) for t in np.asarray(eng.generate(
        jnp.asarray([[0] * pad + prompt], jnp.int32), 8,
        pad_lens=[pad], prefill_chunk_size=C)[0])]
    assert got == want, (got, want)


def test_batcher_shared_prefix_matches_engine_fp():
    """Batcher-wide shared prefix (system-prompt serving): each
    request's trajectory must be token-equal to the engine's
    generate(prefix=snapshot) on the same suffix — fp16 cache, so the
    chunk+decode-tail admission must be numerically invisible.
    Suffixes exercise: pure decode-tail (7 < chunk), chunk + tail
    (20 = 16 + 4), exact chunk multiple (32)."""
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=32)
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(11)
    prefix_toks = jnp.asarray(rng.randint(1, CFG.vocab_size, 40),
                              jnp.int32)
    eng = Engine(cfg=CFG, qcfg=qcfg, params=params, max_seq_len=MAX,
                 batch_size=1)
    eng.cache_dtype = jnp.bfloat16   # match the batcher's cache dtype
    snap = eng.prefill_prefix(prefix_toks)

    prompts = [list(rng.randint(1, CFG.vocab_size, n))
               for n in (7, 20, 32)]
    bat = ContinuousBatcher(CFG, qcfg, params, num_slots=2,
                            max_seq_len=MAX, prefill_chunk=16,
                            prefix=snap)
    results = bat.run([Request(uid=i, prompt=p, max_new_tokens=6)
                       for i, p in enumerate(prompts)])
    for i, p in enumerate(prompts):
        want = [int(t) for t in np.asarray(eng.generate(
            jnp.asarray([p], jnp.int32), 6, prefix=snap)[0])]
        assert results[i].tokens == want, (i, results[i].tokens, want)


def test_batcher_shared_prefix_2bit_and_rejection():
    """2-bit shared-prefix serving: valid deterministic trajectories;
    requests that cannot fit prefix+prompt+max_new are rejected with an
    empty Result; repetition penalty covers PREFIX tokens."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(12)
    prefix_toks = jnp.asarray(rng.randint(1, CFG.vocab_size, 64),
                              jnp.int32)
    eng = Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=MAX,
                 batch_size=1)
    eng.cache_dtype = jnp.bfloat16
    snap = eng.prefill_prefix(prefix_toks)

    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=2,
                            max_seq_len=MAX, prefill_chunk=32,
                            prefix=snap)
    p_ok = list(rng.randint(1, CFG.vocab_size, 40))
    p_big = list(rng.randint(1, CFG.vocab_size, MAX - 64))  # can't fit
    results = bat.run([
        Request(uid=0, prompt=p_ok, max_new_tokens=8,
                repetition_penalty=1.5),
        Request(uid=1, prompt=p_big, max_new_tokens=8),
        Request(uid=2, prompt=list(p_ok), max_new_tokens=8,
                repetition_penalty=1.5),
    ])
    assert results[1].tokens == []                    # rejected
    assert len(results[0].tokens) == 8
    assert results[0].tokens == results[2].tokens     # deterministic
    assert all(0 <= t < CFG.vocab_size for t in results[0].tokens)

    want = [int(t) for t in np.asarray(eng.generate(
        jnp.asarray([p_ok], jnp.int32), 8, prefix=snap,
        repetition_penalty=1.5)[0])]
    assert results[0].tokens == want


def test_cancel_queued_and_active():
    """cancel() drops a queued request outright and frees a mid-decode
    slot (partial tokens recorded); remaining traffic is unaffected."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    bat = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                            max_seq_len=MAX, prompt_buckets=(32,))
    rng = np.random.RandomState(0)
    p = lambda n=10: list(rng.randint(1, CFG.vocab_size, n))
    bat.submit(Request(uid=0, prompt=p(), max_new_tokens=50))
    bat.submit(Request(uid=1, prompt=p(), max_new_tokens=6))  # queued
    bat.step()
    bat.step()
    assert bat.active[0] and len(bat.slot_out[0]) >= 2
    assert bat.cancel(1)               # still queued: dropped
    assert bat.results[1].tokens == []
    n_partial = len(bat.slot_out[0])
    assert bat.cancel(0)               # mid-decode: slot freed
    assert not bat.active.any()
    assert len(bat.results[0].tokens) == n_partial
    assert not bat.cancel(99)          # unknown uid
    # the freed slot serves new traffic
    res = bat.run([Request(uid=2, prompt=p(), max_new_tokens=4)])
    assert len(res[2].tokens) == 4


def test_prefix_admission_at_window_boundary_matches_engine():
    """(prefix + prompt) a multiple of W: the admit tail-scan's MASKED
    steps run with a FULL window (n_win == W, flush act-gated), where an
    unconditionally-written append clamps onto slot W-1 and corrupts
    the last real token (caught by review; fixed in
    kivi_cache.decode_append_masked).  Token equality with the engine
    is the invariant."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    rng = np.random.RandomState(3)
    W = QCFG.residual_length                       # 32
    pfx = list(rng.randint(1, CFG.vocab_size, 40))
    eng = Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=MAX,
                 batch_size=1)
    eng.cache_dtype = jnp.bfloat16
    snap = eng.prefill_prefix(jnp.asarray(pfx, jnp.int32))
    for n in (24, 23):          # 40+24 = 2W (boundary), 63 (control)
        prompt = list(rng.randint(1, CFG.vocab_size, n))
        bat = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                                max_seq_len=MAX, prefix=snap)
        got = bat.run([Request(uid=0, prompt=prompt,
                               max_new_tokens=10)])[0].tokens
        want = [int(t) for t in np.asarray(eng.generate(
            jnp.asarray([prompt], jnp.int32), 10, prefix=snap)[0])]
        assert got == want, (n, got, want)


def test_empty_prompt_rejected_every_mode():
    """An empty prompt is rejected with an empty Result in bucketed,
    chunked and prefix modes alike (the chunked path used to crash
    step() with logits=None)."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    for kw in ({}, {"prefill_chunk": 32}):
        bat = ContinuousBatcher(CFG, QCFG, params, num_slots=1,
                                max_seq_len=MAX, **kw)
        res = bat.run([Request(uid=0, prompt=[], max_new_tokens=4),
                       Request(uid=1, prompt=[5, 6, 7],
                               max_new_tokens=4)])
        assert res[0].tokens == [] and len(res[1].tokens) == 4, kw

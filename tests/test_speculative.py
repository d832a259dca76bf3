"""Speculative decoding (serving/speculative.py).

The contract under test: greedy speculative output is TOKEN-EQUAL to
the target engine's own greedy generate(), for any draft — a perfect
draft (same weights), a different/worse draft, an fp16-cache draft —
and across quantization flush boundaries, where the boundary
discipline (eager flush + block clamp + window-only ingest with
counter rollback) must keep the block's sequential twin flush-free.

Engines are constructed once and shared across tests (functools caches)
— each Engine owns fresh jit wrappers, so per-test construction would
recompile every dispatch signature and dominate the suite's runtime.
Engines are stateless between calls (caches re-init per generate).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine
from kivi_tpu.serving.speculative import SpeculativeEngine

CFG = tiny_config()
SMALL = tiny_config(num_layers=1)
QCFG = QuantConfig(k_bits=2, v_bits=2, group_size=32, residual_length=32)


@functools.lru_cache(maxsize=None)
def _eng(small=False, seed=0, fp=False):
    cfg = SMALL if small else CFG
    qcfg = (QuantConfig(k_bits=16, v_bits=16, group_size=32,
                        residual_length=32) if fp else QCFG)
    params = modeling.init_params(cfg, jax.random.PRNGKey(seed),
                                  dtype=jnp.float32)
    e = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=512,
               batch_size=1)
    e.cache_dtype = jnp.float32
    return e


@functools.lru_cache(maxsize=None)
def _spec(small=False, seed=0, fp=False, k=4):
    return SpeculativeEngine(_eng(), _eng(small=small, seed=seed, fp=fp),
                             k=k)


def _prompt(seed, n=20):
    return jnp.asarray(np.random.default_rng(seed).integers(
        1, CFG.vocab_size, (1, n)), jnp.int32)


@functools.lru_cache(maxsize=None)
def _want(seed, gen, n=20):
    return np.asarray(_eng().generate(_prompt(seed, n), gen))


def test_perfect_draft_accepts_everything():
    """Draft == target: every proposal accepted up to the per-iteration
    boundary clamp (j == keff everywhere), output token-equal."""
    spec = _spec()                      # draft IS the target engine
    got = spec.generate(_prompt(0), 21)
    np.testing.assert_array_equal(got, _want(0, 21))
    assert all(j == ke for j, ke in
               zip(spec.last_acceptance, spec.last_keff))
    assert max(spec.last_acceptance) == 4   # full depth away from edges


def test_perfect_draft_exact_across_boundaries():
    """The round-4 regression: a PERFECT draft at k=5 used to diverge
    from target greedy at flush crossings (the width-(k+1) verify
    attends block-start cache state, sequential decode attends
    mid-block flushed state).  The boundary clamp must keep the stream
    exact over many W=32 / vf=32 crossings, and must actually fire."""
    spec = _spec(k=5)                   # draft IS the target engine
    got = spec.generate(_prompt(2, n=25), 60)
    want = np.asarray(_eng().generate(_prompt(2, n=25), 60))
    np.testing.assert_array_equal(got, want)
    assert spec.stats["clamped"] > 0
    assert spec.stats["boundary_flush_k"] > 0
    assert all(j == ke for j, ke in
               zip(spec.last_acceptance, spec.last_keff))


def test_mismatched_draft_still_exact():
    """A different (1-layer, different-seed) draft: acceptance is
    partial/zero, the output must STILL equal target greedy."""
    got = _spec(small=True, seed=7).generate(_prompt(1), 19)
    np.testing.assert_array_equal(got, _want(1, 19))


@pytest.mark.parametrize("k", [3, 5])
def test_exact_across_flush_boundaries(k):
    """Long generation (60 tokens) over W=32 caches crosses several K
    and V flush boundaries at varying phases: eager boundary flushes,
    block clamps and counter rollbacks must all preserve token
    equality with a mismatched draft (partial/zero acceptance)."""
    spec = _spec(small=True, seed=3, k=k)
    got = spec.generate(_prompt(2, n=25), 60)
    want = np.asarray(_eng().generate(_prompt(2, n=25), 60))
    np.testing.assert_array_equal(got, want)
    assert spec.stats["boundary_flush_k"] > 0
    assert spec.stats["boundary_flush_v"] > 0


def test_fp16_draft_cache():
    """Draft with an unquantized cache: FpLayerCache rewind (length
    counter only)."""
    got = _spec(small=True, seed=5, fp=True).generate(_prompt(3), 33)
    np.testing.assert_array_equal(got, _want(3, 33))


def test_eos_early_exit():
    free = _want(4, 24)
    eos = int(free[0, 6])
    want = free[:, :np.argmax(free[0] == eos) + 1]
    got = _spec().generate(_prompt(4), 24, eos_token_id=eos)
    np.testing.assert_array_equal(got, want)


def test_generate_stream_matches_generate():
    """Streaming blocks concatenate to exactly generate()'s output; the
    first yield is the single first token; EOS cuts mid-block."""
    spec = _spec(small=True, seed=3)
    toks = _prompt(8)
    want = spec.generate(toks, 21)
    blocks = list(spec.generate_stream(toks, 21))
    assert blocks[0].shape == (1,)
    np.testing.assert_array_equal(np.concatenate(blocks), want[0])
    # EOS: stream output equals generate with the same eos
    eos = int(want[0, 7])
    w2 = spec.generate(toks, 21, eos_token_id=eos)
    b2 = list(spec.generate_stream(toks, 21, eos_token_id=eos))
    np.testing.assert_array_equal(np.concatenate(b2), w2[0])


def test_spec_accept_marginal_matches_target():
    """The Leviathan theorem: the first emitted token's marginal equals
    the target distribution p exactly, for ANY proposal q.  Checked
    empirically at V=6 with an adversarially different q."""
    from kivi_tpu.serving.speculative import spec_accept

    rng = np.random.default_rng(0)
    V = 6
    p = rng.dirichlet(np.ones(V), size=2)         # (k+1=2, V)
    q = rng.dirichlet(np.full(V, 0.3), size=1)    # (k=1, V), spiky
    n = 40_000
    counts = np.zeros(V)
    xs = rng.choice(V, size=n, p=q[0])
    us = rng.random(n)
    for t in range(n):
        emitted = spec_accept(p, q, np.asarray([xs[t]]),
                              np.asarray([us[t]]), rng)
        counts[emitted[0]] += 1
    tv = 0.5 * np.abs(counts / n - p[0]).sum()
    assert tv < 0.02, (tv, counts / n, p[0])


def test_sampled_generation_runs_and_is_seed_deterministic():
    """temperature > 0 end to end: completes, stays in-vocab, and the
    same rng seed reproduces the same stream (host + device choices
    both keyed off it)."""
    spec = _spec(small=True, seed=3)
    kw = dict(temperature=0.8, top_k=20, top_p=0.95,
              rng=jax.random.PRNGKey(11))
    a = spec.generate(_prompt(6), 25, **kw)
    b = spec.generate(_prompt(6), 25, **kw)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 25) and (a < CFG.vocab_size).all()


def test_rejects_batched_engines():
    params = modeling.init_params(CFG, jax.random.PRNGKey(0))
    big = Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=128,
                 batch_size=2)
    with pytest.raises(ValueError, match="batch_size=1"):
        SpeculativeEngine(big, _eng())
    with pytest.raises(ValueError, match="batch_size=1"):
        SpeculativeEngine(_eng(), big)

def test_generate_device_matches_host_loop():
    """The device-resident while-loop (generate_device) must be
    token-equal to the host-loop greedy generate, across W=32 flush
    boundaries, for perfect and mismatched drafts."""
    spec = _spec(k=5)                     # perfect draft, clamps fire
    toks = _prompt(2, n=25)
    np.testing.assert_array_equal(spec.generate_device(toks, 40),
                                  spec.generate(toks, 40))
    spec2 = _spec(small=True, seed=3)     # mismatched draft
    toks2 = _prompt(1)
    np.testing.assert_array_equal(spec2.generate_device(toks2, 30),
                                  spec2.generate(toks2, 30))


def test_generate_device_eos():
    spec = _spec(small=True, seed=3)
    toks = _prompt(4)
    free = spec.generate(toks, 24)
    eos = int(free[0, 6])
    want = spec.generate(toks, 24, eos_token_id=eos)
    got = spec.generate_device(toks, 24, eos_token_id=eos)
    np.testing.assert_array_equal(got, want)


def test_generate_device_fp_draft():
    spec = _spec(small=True, seed=5, fp=True)
    toks = _prompt(3)
    np.testing.assert_array_equal(spec.generate_device(toks, 22),
                                  spec.generate(toks, 22))

"""Batched speculative decoding (serving/spec_batcher.py).

Contract: per-request greedy output through the SpeculativeBatcher is
TOKEN-EQUAL to the plain batcher's (hence the padded engine's) greedy
output for any draft model, across slots with divergent positions,
pads, flush phases and per-iteration acceptance — the batched
composition of test_speculative.py's boundary discipline and
test_batcher.py's padded-oracle equality.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.serving.batcher import Request
from kivi_tpu.serving.engine import Engine
from kivi_tpu.serving.spec_batcher import SpeculativeBatcher

CFG = tiny_config()
SMALL = tiny_config(num_layers=1)
QCFG = QuantConfig(k_bits=2, v_bits=2, group_size=32, residual_length=32)
FP = QuantConfig(k_bits=16, v_bits=16, group_size=32, residual_length=32)
MAX = 256
BUCKETS = (32, 64)


@pytest.fixture(autouse=True)
def _exact_matmul():
    # same rationale as test_batcher: cross-batch-shape token equality
    # needs exact math or argmax ties flip on random-weight models
    with jax.default_matmul_precision("highest"):
        yield


@functools.lru_cache(maxsize=None)
def _params(seed=0, small=False):
    return modeling.init_params(SMALL if small else CFG,
                                jax.random.PRNGKey(seed),
                                dtype=jnp.float32)


def _prompts(seed=0, lens=(20, 32, 45, 17)):
    rng = np.random.RandomState(seed)
    return [list(rng.randint(1, CFG.vocab_size, size=n)) for n in lens]


def _oracle(prompt, max_new):
    """Padded engine greedy (the batcher's proven oracle)."""
    bucket = 32 if len(prompt) <= 32 else 64
    pad = bucket - len(prompt)
    eng = Engine(cfg=CFG, qcfg=QCFG, params=_params(), max_seq_len=MAX,
                 batch_size=1)
    out = eng.generate(jnp.asarray([[0] * pad + list(prompt)], jnp.int32),
                       max_new, pad_lens=[pad])
    return [int(t) for t in np.asarray(out[0])]


def _spec_bat(dcfg, dqcfg, dparams, k=4, slots=2):
    return SpeculativeBatcher(CFG, QCFG, _params(), dcfg, dqcfg, dparams,
                              num_slots=slots, max_seq_len=MAX, k=k,
                              prompt_buckets=BUCKETS)


def test_perfect_draft_matches_engine_across_boundaries():
    """Draft == target: ragged prompts, 40 new tokens each (several
    W=32 K and V flush crossings at per-slot divergent phases), slot
    churn (4 requests, 2 slots).  Every stream must equal the padded
    engine oracle, and clamps/flushes must actually fire."""
    bat = _spec_bat(CFG, QCFG, _params(), k=4, slots=2)
    reqs = [Request(uid=i, prompt=p, max_new_tokens=40)
            for i, p in enumerate(_prompts())]
    results = bat.run(reqs)
    assert sorted(results) == [0, 1, 2, 3]
    for req in reqs:
        want = _oracle(req.prompt, req.max_new_tokens)
        got = results[req.uid].tokens
        assert got == want, (req.uid, got, want)
    assert bat.stats["clamped"] > 0
    assert bat.stats["accepted"] > 0


def test_mismatched_draft_still_exact():
    """1-layer different-seed draft: low/zero acceptance, streams must
    STILL equal the oracle."""
    bat = _spec_bat(SMALL, QCFG, _params(seed=7, small=True), k=3)
    reqs = [Request(uid=i, prompt=p, max_new_tokens=25)
            for i, p in enumerate(_prompts(seed=1, lens=(20, 40)))]
    results = bat.run(reqs)
    for req in reqs:
        want = _oracle(req.prompt, req.max_new_tokens)
        assert results[req.uid].tokens == want, req.uid


def test_fp16_draft_cache():
    """Unquantized draft cache: caps come from max_seq_len, rollback is
    the fp length counter."""
    bat = _spec_bat(SMALL, FP, _params(seed=5, small=True), k=3)
    reqs = [Request(uid=0, prompt=_prompts(seed=2, lens=(24,))[0],
                    max_new_tokens=30)]
    results = bat.run(reqs)
    want = _oracle(reqs[0].prompt, 30)
    assert results[0].tokens == want


def test_eos_cuts_mid_block_and_retires():
    """EOS landing inside an accepted block truncates the visible
    stream exactly there and frees the slot."""
    prompt = _prompts(seed=3, lens=(20,))[0]
    free = _oracle(prompt, 30)
    eos = free[11]
    want = free[:free.index(eos) + 1]
    bat = _spec_bat(CFG, QCFG, _params(), k=4, slots=1)
    results = bat.run([Request(uid=0, prompt=prompt, max_new_tokens=30,
                               eos_token_id=eos)])
    assert results[0].tokens == want
    assert not bat.active.any()


def test_streaming_on_token():
    got = []
    prompt = _prompts(seed=4, lens=(20,))[0]
    bat = _spec_bat(CFG, QCFG, _params(), k=4, slots=1)
    bat.run([Request(uid=0, prompt=prompt, max_new_tokens=20,
                     on_token=got.append)])
    assert got == _oracle(prompt, 20)


def test_rejects_penalty_and_prefix_requests():
    bat = _spec_bat(SMALL, QCFG, _params(small=True))
    with pytest.raises(ValueError, match="repetition penalty"):
        bat.submit(Request(uid=1, prompt=[1, 2], max_new_tokens=4,
                           repetition_penalty=1.3))
    with pytest.raises(ValueError, match="prefixes"):
        bat.submit(Request(uid=2, prompt=[1, 2], max_new_tokens=4,
                           prefix_tokens=[3, 4]))


# ---------------------------------------------------------------------------
# sampled mode (round 5): on-device Leviathan accept over batched slots
# ---------------------------------------------------------------------------


def test_sampled_mode_greedy_slots_unchanged():
    """A mixed batch (one sampled slot forces the sampled dispatches)
    must leave greedy slots' streams byte-equal to the oracle: their
    one-hot p/q reduce the on-device accept to greedy prefix match."""
    prompts = _prompts(seed=6, lens=(20, 30))
    bat = _spec_bat(CFG, QCFG, _params(), k=3, slots=2)
    reqs = [Request(uid=0, prompt=prompts[0], max_new_tokens=25),
            Request(uid=1, prompt=prompts[1], max_new_tokens=25,
                    temperature=0.8, top_k=0, top_p=1.0)]
    results = bat.run(reqs)
    want = _oracle(prompts[0], 25)
    assert results[0].tokens == want
    assert len(results[1].tokens) == 25


def test_spec_accept_device_marginal_matches_target():
    """Leviathan theorem for the ON-DEVICE accept core: the first
    emitted token's marginal equals the target distribution p for ANY
    proposal q — the jnp twin of speculative.spec_accept's theorem
    test, vmapped over 40K keys at V=6 with an adversarially spiky
    draft and draft tokens ACTUALLY drawn from q."""
    from kivi_tpu.serving.spec_batcher import spec_accept_device

    rng = np.random.default_rng(0)
    V, k, n = 6, 2, 40_000
    p = jnp.asarray(rng.dirichlet(np.ones(V), size=k + 1))
    q = jnp.asarray(rng.dirichlet(np.full(V, 0.3), size=k))
    xs = jnp.asarray(rng.choice(V, size=(n, k), p=np.asarray(q[0])),
                     jnp.int32)  # both steps drawn from q[0] row; fine:
    # the theorem holds per position for any q_i, and position 0 is
    # what the marginal checks
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    emitted, j = jax.vmap(
        lambda x, key: spec_accept_device(p, q, x, jnp.int32(k), key)
    )(xs, keys)
    first = np.asarray(emitted[:, 0])
    counts = np.bincount(first, minlength=V)
    tv = 0.5 * np.abs(counts / n - np.asarray(p[0])).sum()
    assert tv < 0.02, (tv, counts / n)


def test_spec_accept_device_greedy_onehot_is_prefix_match():
    """One-hot p/q (the greedy limit): accept == prefix match, the
    correction/bonus == target argmax — the property that lets mixed
    batches share one dispatch."""
    from kivi_tpu.serving.spec_batcher import spec_accept_device

    V, k = 8, 3
    tgt = jnp.asarray([2, 5, 1, 4])           # target argmax per pos
    drf = jnp.asarray([2, 5, 7])              # draft diverges at i=2
    p = jax.nn.one_hot(tgt, V)
    q = jax.nn.one_hot(drf, V)
    emitted, j = spec_accept_device(p, q, drf, jnp.int32(k),
                                    jax.random.PRNGKey(0))
    assert int(j) == 2
    assert [int(t) for t in emitted[:3]] == [2, 5, 1]


def test_sampled_mode_seed_deterministic():
    prompt = _prompts(seed=9, lens=(20,))[0]
    outs = []
    for _ in range(2):
        bat = _spec_bat(SMALL, QCFG, _params(seed=9, small=True), k=3,
                        slots=1)
        bat.rng = jax.random.PRNGKey(77)
        res = bat.run([Request(uid=0, prompt=prompt, max_new_tokens=15,
                               temperature=0.9, top_k=20)])
        outs.append(res[0].tokens)
    assert outs[0] == outs[1]
    assert len(outs[0]) == 15
    assert all(0 <= t < CFG.vocab_size for t in outs[0])

"""Sampling transforms pinned against transformers' LogitsProcessors.

The reference gets its sampling suite for free from HF `generate()`
(`/root/reference/example.py:43`); serving/sampling.py reimplements the
reachable processors as jnp transforms.  These tests pin the semantics
token-for-token / logit-for-logit against the HF implementations on
fixed logits (torch CPU), so any drift from HF behavior fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import (LogitsProcessorList,
                          RepetitionPenaltyLogitsProcessor,
                          TemperatureLogitsWarper, TopKLogitsWarper,
                          TopPLogitsWarper)

from kivi_tpu.serving import sampling

V = 50
RNG = np.random.RandomState(0)
LOGITS = RNG.randn(4, V).astype(np.float32) * 3.0


def _hf(warper, logits, input_ids=None):
    ids = (torch.zeros((logits.shape[0], 1), dtype=torch.long)
           if input_ids is None else torch.as_tensor(input_ids))
    out = warper(ids, torch.as_tensor(logits.copy()))
    return out.numpy()


@pytest.mark.parametrize("k", [1, 3, 17, 50, 0])
def test_top_k_matches_hf(k):
    got = np.asarray(sampling.apply_top_k(jnp.asarray(LOGITS), k))
    if k == 0:
        np.testing.assert_array_equal(got, LOGITS)  # disabled
        return
    want = _hf(TopKLogitsWarper(top_k=k), LOGITS)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9, 0.999])
def test_top_p_matches_hf(p):
    got = np.asarray(sampling.apply_top_p(jnp.asarray(LOGITS), p))
    want = _hf(TopPLogitsWarper(top_p=p), LOGITS)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_top_p_keeps_at_least_one():
    peaked = np.full((2, V), -100.0, np.float32)
    peaked[:, 7] = 100.0
    got = np.asarray(sampling.apply_top_p(jnp.asarray(peaked), 0.01))
    assert np.all(np.isfinite(got[:, 7]))
    assert np.all(np.isneginf(np.delete(got, 7, axis=1)))


@pytest.mark.parametrize("pen", [1.2, 2.0])
def test_repetition_penalty_matches_hf(pen):
    ids = RNG.randint(0, V, size=(4, 9))
    seen = sampling.seen_mask_from_prompt(jnp.asarray(ids), V)
    got = np.asarray(sampling.apply_repetition_penalty(
        jnp.asarray(LOGITS), seen, pen))
    want = _hf(RepetitionPenaltyLogitsProcessor(penalty=pen), LOGITS, ids)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_repetition_penalty_excludes_pad():
    ids = np.zeros((1, 6), np.int64)
    ids[0, 2:] = [5, 6, 7, 8]           # pad token id 0 at slots 0-1
    seen = sampling.seen_mask_from_prompt(jnp.asarray(ids), V,
                                          pad_len=jnp.asarray([2]))
    seen = np.asarray(seen)
    assert not seen[0, 0]               # pad id not penalized
    assert seen[0, 5] and seen[0, 8]


def test_update_seen():
    seen = jnp.zeros((2, V), jnp.bool_)
    seen = sampling.update_seen(seen, jnp.asarray([3, 4]))
    seen = np.asarray(seen)
    assert seen[0, 3] and seen[1, 4] and seen.sum() == 2


def test_temperature_then_warp_order():
    """Full chain: HF applies penalty, then temperature, then top-k,
    then top-p.  Compare the post-warp distributions."""
    t, k, p, pen = 0.7, 11, 0.92, 1.3
    ids = RNG.randint(0, V, size=(4, 5))
    chain = LogitsProcessorList([
        RepetitionPenaltyLogitsProcessor(penalty=pen),
        TemperatureLogitsWarper(temperature=t),
        TopKLogitsWarper(top_k=k),
        TopPLogitsWarper(top_p=p)])
    want = _hf(chain, LOGITS, ids)

    seen = sampling.seen_mask_from_prompt(jnp.asarray(ids), V)
    x = sampling.apply_repetition_penalty(jnp.asarray(LOGITS), seen, pen)
    x = x / t
    x = sampling.apply_top_k(x, k)
    x = sampling.apply_top_p(x, p)
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-5)


def test_sample_step_greedy():
    out = sampling.sample_step(jnp.asarray(LOGITS), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), LOGITS.argmax(-1))


def test_sample_step_respects_filters():
    """With top_k=1 every sample must be the argmax regardless of rng."""
    for s in range(5):
        out = sampling.sample_step(
            jnp.asarray(LOGITS), jax.random.PRNGKey(s),
            temperature=1.5, top_k=1)
        np.testing.assert_array_equal(np.asarray(out), LOGITS.argmax(-1))


# ---------------------------------------------------------------------------
# per-row batched sampler (the continuous batcher's variant)
# ---------------------------------------------------------------------------

def test_per_row_greedy_matches_argmax():
    out = sampling.sample_step_per_row(
        jnp.asarray(LOGITS), jax.random.PRNGKey(0),
        jnp.zeros(4), jnp.zeros(4, jnp.int32), jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), LOGITS.argmax(-1))


def test_per_row_topk1_matches_argmax():
    out = sampling.sample_step_per_row(
        jnp.asarray(LOGITS), jax.random.PRNGKey(3),
        jnp.full(4, 1.3), jnp.ones(4, jnp.int32), jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), LOGITS.argmax(-1))


def test_per_row_filter_matches_static():
    """Row-wise filtering equals the static warpers applied per row."""
    t, k, p = 0.8, 7, 0.9
    lt = jnp.asarray(LOGITS) / t
    want = sampling.apply_top_p(sampling.apply_top_k(lt, k), p)
    # reproduce via the per-row internals: rows where the filtered set
    # differs would sample outside the static keep-set with prob > 0;
    # instead check directly that every per-row sample lies in the
    # static keep-set across many draws
    keep = np.isfinite(np.asarray(want))
    for s in range(20):
        out = sampling.sample_step_per_row(
            jnp.asarray(LOGITS), jax.random.PRNGKey(s),
            jnp.full(4, t), jnp.full(4, k, jnp.int32), jnp.full(4, p))
        for b, tok in enumerate(np.asarray(out)):
            assert keep[b, tok], (b, tok)


def test_per_row_mixed_greedy_and_sampled():
    """Greedy rows are deterministic while sampled rows vary."""
    temps = jnp.asarray([0.0, 2.0, 0.0, 2.0])
    outs = set()
    for s in range(10):
        out = np.asarray(sampling.sample_step_per_row(
            jnp.asarray(LOGITS), jax.random.PRNGKey(s), temps,
            jnp.zeros(4, jnp.int32), jnp.ones(4)))
        assert out[0] == LOGITS[0].argmax() and out[2] == LOGITS[2].argmax()
        outs.add((out[1], out[3]))
    assert len(outs) > 1

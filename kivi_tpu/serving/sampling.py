"""Sampling transforms with HuggingFace `generate()` semantics.

The reference inherits its sampling suite from HF generate
(`/root/reference/example.py:43`); this module reimplements the
processors the reference can reach — temperature, top-k, top-p and
repetition penalty — as pure jnp transforms usable inside a
`lax.scan` decode body.  Semantics are pinned against transformers'
LogitsProcessor implementations in tests/test_sampling.py:

  * repetition penalty (CTRL): for every token id already present in
    the sequence (prompt AND generated — HF penalizes over the full
    input_ids), logit > 0 -> logit / p, logit <= 0 -> logit * p.
  * temperature: logits / t  (HF TemperatureLogitsWarper).
  * top-k: keep the k largest logits, others -> -inf (TopKLogitsWarper).
  * top-p: sort descending, keep the smallest prefix whose softmax mass
    reaches top_p (always >= 1 token), others -> -inf (TopPLogitsWarper
    with min_tokens_to_keep=1).

Application order matches HF: penalty (processor) before the warpers,
warpers in temperature -> top_k -> top_p order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FILTER_VALUE = -float("inf")


def apply_repetition_penalty(logits: jax.Array, seen: jax.Array,
                             penalty: float) -> jax.Array:
    """logits (B, V) f32; seen (B, V) bool mask of token ids present in
    the sequence so far.  HF RepetitionPenaltyLogitsProcessor."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_repetition_penalty_per_row(logits: jax.Array, seen: jax.Array,
                                     penalty: jax.Array) -> jax.Array:
    """Per-ROW penalty values (B,) — the batcher's variant; rows with
    penalty == 1.0 are untouched by construction."""
    pen = jnp.asarray(penalty, jnp.float32).reshape(-1, 1)
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen, penalized, logits)


def apply_top_k(logits: jax.Array, top_k: int) -> jax.Array:
    """Keep the top_k largest logits per row (HF TopKLogitsWarper)."""
    if top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, FILTER_VALUE, logits)


def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """Nucleus filtering (HF TopPLogitsWarper, min_tokens_to_keep=1):
    sort descending, keep tokens while the cumulative softmax mass of
    STRICTLY HIGHER-ranked tokens is < top_p (so the token that crosses
    the threshold is kept)."""
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # mass before this rank; rank 0 always kept
    prev = cum - probs
    keep_sorted = prev < top_p
    # threshold logit = smallest kept logit; ties below it are dropped
    # exactly like HF's scatter-by-sorted-index (equal logits share rank
    # boundaries only at measure-zero ties)
    n_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)  # >= 1
    thr = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits < thr, FILTER_VALUE, logits)


def warp_logits(logits: jax.Array, *, temperature: float, top_k: int = 0,
                top_p: float = 1.0) -> jax.Array:
    """HF warper chain (temperature -> top_k -> top_p) on raw logits
    (..., V); temperature must be > 0.  softmax of the result is the
    sampling distribution — speculative decoding consumes it as the
    p/q measures of the accept-reject rule."""
    logits = logits / temperature
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    return logits


def sample_step(logits: jax.Array, rng, *, temperature: float = 0.0,
                top_k: int = 0, top_p: float = 1.0) -> jax.Array:
    """One sampling decision from raw logits (B, V) -> token ids (B,).

    temperature == 0 is greedy (argmax), matching the engine's prior
    behavior and HF do_sample=False."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        rng, warp_logits(logits, temperature=temperature, top_k=top_k,
                         top_p=top_p)).astype(jnp.int32)


def warp_logits_per_row(logits: jax.Array, temperature: jax.Array,
                        top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Per-ROW warper chain (temperature -> top_k -> top_p), every
    control traced: rank masking replaces the static lax.top_k, the
    nucleus threshold follows apply_top_p.  Rows with temperature <= 0
    are warped at t=1 (callers handle greedy separately).  Rows with
    top_k <= 0 / top_p >= 1 are unfiltered."""
    B, V = logits.shape
    t = jnp.asarray(temperature, jnp.float32).reshape(B, 1)
    k = jnp.asarray(top_k, jnp.int32).reshape(B, 1)
    p = jnp.asarray(top_p, jnp.float32).reshape(B, 1)
    lt = logits / jnp.where(t <= 0.0, 1.0, t)

    order = jnp.argsort(-lt, axis=-1)               # descending
    ranks = jnp.argsort(order, axis=-1)             # rank of each logit
    keep_k = ranks < jnp.where(k > 0, k, V)
    lt = jnp.where(keep_k, lt, FILTER_VALUE)

    sorted_lt = jnp.take_along_axis(lt, order, axis=-1)
    probs = jax.nn.softmax(sorted_lt, axis=-1)
    prev = jnp.cumsum(probs, axis=-1) - probs
    n_keep = jnp.sum(prev < p, axis=-1, keepdims=True)  # >= 1
    thr = jnp.take_along_axis(sorted_lt, n_keep - 1, axis=-1)
    return jnp.where(lt < thr, FILTER_VALUE, lt)


def probs_per_row(logits: jax.Array, temperature: jax.Array,
                  top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Per-row SAMPLING DISTRIBUTION: softmax of the warped logits for
    sampled rows, a one-hot at the argmax for greedy rows
    (temperature <= 0).  The greedy one-hot makes the Leviathan
    accept-reject reduce exactly to greedy prefix matching, so mixed
    greedy/sampled slots share one batched speculative accept."""
    B, V = logits.shape
    t = jnp.asarray(temperature, jnp.float32).reshape(B, 1)
    w = jax.nn.softmax(warp_logits_per_row(logits, temperature, top_k,
                                           top_p), axis=-1)
    hot = jax.nn.one_hot(jnp.argmax(logits, -1), V, dtype=w.dtype)
    return jnp.where(t <= 0.0, hot, w)


def sample_step_per_row(logits: jax.Array, rng, temperature: jax.Array,
                        top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Per-ROW sampling controls — the continuous batcher's variant:
    each slot carries its own (temperature, top_k, top_p), all traced
    (no per-request recompile).  temperature <= 0 rows are greedy.
    Semantics per row match the static sample_step (tested)."""
    greedy = jnp.asarray(temperature, jnp.float32) <= 0.0
    lt = warp_logits_per_row(logits, temperature, top_k, top_p)
    sampled = jax.random.categorical(rng, lt).astype(jnp.int32)
    return jnp.where(greedy, jnp.argmax(logits, -1).astype(jnp.int32),
                     sampled)


def seen_mask_from_prompt(tokens: jax.Array, vocab_size: int,
                          pad_len=None) -> jax.Array:
    """(B, T) prompt ids -> (B, V) bool mask for the repetition penalty.
    Left-pad slots (index < pad_len[b]) are excluded."""
    B, T = tokens.shape
    one = jnp.ones((B, T), jnp.bool_)
    if pad_len is not None:
        idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        one = idx >= jnp.asarray(pad_len, jnp.int32).reshape(B, 1)
    seen = jnp.zeros((B, vocab_size), jnp.bool_)
    return seen.at[jnp.arange(B)[:, None], tokens].max(one)


def update_seen(seen: jax.Array, token: jax.Array) -> jax.Array:
    """Mark newly generated token ids (B,) in the (B, V) mask."""
    B = seen.shape[0]
    return seen.at[jnp.arange(B), token].set(True)

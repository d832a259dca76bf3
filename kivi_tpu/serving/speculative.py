"""Speculative decoding: draft-model proposals, one-pass target verify.

Beyond-reference serving feature (the reference decodes strictly one
token per forward through HF `generate()`, `/root/reference/example.py:
43`): a small draft model proposes `k` greedy tokens in one on-device
decode scan, the target model scores all of them (plus a bonus
position) in ONE width-(k+1) extend forward, and the longest matching
prefix is accepted — per Leviathan et al. (arXiv:2211.17192), greedy
variant, so the emitted stream is TOKEN-EQUAL to the target engine's
own greedy output no matter how bad the draft is.  KIVI is what makes
the draft cheap to co-host: both models' KV caches are 2/4-bit.

TPU shape discipline: every iteration is exactly two fixed-shape
dispatches — the draft's k-step `lax.scan` and the target's width-(k+1)
extend — plus O(k) host logic.  Rejection does NOT recompile anything:

Cache rewind.  jax arrays are immutable, so the pre-iteration cache
pytree survives for free; the problem is producing "cache with only the
j+1 accepted tokens" afterwards.  Two paths:
  * counter rewind (common): if no quantization watermark moved past
    the accepted length, the speculative tokens live only in the fp
    windows — rewinding the two window counters makes the stale slots
    dead, and every later writer (decode_append at n_win, flush of a
    FULL window, prefill_extend reading [:n_win)) overwrites them
    before any reader sees them.  One eager `flush_k_now` restores the
    prefill-canonical "flushed at T % W == 0" state when the rewind
    lands exactly on a key-block boundary (the same K/V canonical-state
    asymmetry generate_stream handles at segment boundaries).
  * replay (rare, quant watermark crossed): re-append the accepted
    tokens one by one through a teacher-forced decode jit from the
    retained pre-iteration pytree, then the same boundary flush.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.cache.fp_cache import FpLayerCache
from kivi_tpu.cache.kivi_cache import flush_k_now
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import (Engine, canonical_phase,
                                     nkq_prefill as _nkq_prefill,
                                     nvq_canonical as _nvq)


def _nkq_decode(T: int, W: int) -> int:
    """Quantized-key count after reaching T tokens via decode appends
    (flush fires BEFORE the append that would overfill, so a window
    that just filled stays unflushed: differs from prefill-canonical
    exactly at T % W == 0)."""
    return ((T - 1) // W) * W if T > 0 else 0


def spec_accept(p: np.ndarray, q: np.ndarray, xs: np.ndarray,
                us: np.ndarray, rng: np.random.Generator) -> list:
    """Leviathan et al. accept-reject over one speculative window.

    p: (k+1, V) target sampling probabilities (warped + softmaxed);
    q: (k, V) draft probabilities; xs: (k,) draft tokens; us: (k,)
    U(0,1) draws.  Token i is accepted with prob min(1, p_i(x)/q_i(x));
    the first rejection emits a sample from the residual
    normalize(max(p_i - q_i, 0)); full acceptance emits a bonus sample
    from p_k.  The emitted-token marginal equals sampling directly from
    p (the theorem tests/test_speculative.py checks empirically)."""
    k = len(xs)
    for i in range(k):
        x = int(xs[i])
        if us[i] < min(1.0, float(p[i, x]) / max(float(q[i, x]), 1e-20)):
            continue
        r = np.maximum(p[i] - q[i], 0.0)
        s = float(r.sum())
        dist = r / s if s > 1e-12 else p[i] / float(p[i].sum())
        return [int(t) for t in xs[:i]] + [int(rng.choice(len(dist),
                                                          p=dist))]
    bonus = p[k] / float(p[k].sum())
    return [int(t) for t in xs] + [int(rng.choice(len(bonus), p=bonus))]


class SpeculativeEngine:
    """Greedy speculative decoding over two `Engine`s sharing a vocab.

    target: the model whose greedy output is reproduced exactly.
    draft:  a cheaper model (fewer layers/heads — or the same model at
            lower KV bits); correctness never depends on it.
    k:      speculation depth (draft tokens proposed per iteration).

    Both engines must be batch_size=1 (speculative decoding is the
    low-batch latency play; at high batch decode is MXU-bound and
    speculation only burns FLOPs).
    """

    def __init__(self, target: Engine, draft: Engine, k: int = 8):
        if target.batch_size != 1 or draft.batch_size != 1:
            raise ValueError("speculative decoding is batch_size=1 only")
        if target.cfg.vocab_size != draft.cfg.vocab_size:
            raise ValueError("target and draft must share a vocabulary")
        self.target, self.draft, self.k = target, draft, k
        # non-donating jits: rewind/replay needs the pre-iteration
        # pytrees to stay valid, so none of these may alias their
        # cache operands (unlike the engines' own donating jits)
        self._verify = jax.jit(
            functools.partial(self._verify_fn, cfg=target.cfg,
                              qcfg=target.qcfg, impl=target.impl),
            static_argnames=("prev_len",))
        self._draft_scan = jax.jit(
            functools.partial(Engine._decode_scan_fn, cfg=draft.cfg,
                              qcfg=draft.qcfg, impl=draft.impl),
            static_argnames=("steps", "temperature", "prompt_len",
                             "top_k", "top_p", "repetition_penalty"))
        self._draft_sample_scan = jax.jit(
            functools.partial(self._draft_sample_scan_fn, cfg=draft.cfg,
                              qcfg=draft.qcfg, impl=draft.impl),
            static_argnames=("steps", "temperature", "top_k", "top_p",
                             "prompt_len"))
        self._replay_step = {
            "target": jax.jit(functools.partial(
                Engine._decode_fn, cfg=target.cfg, qcfg=target.qcfg,
                impl=target.impl)),
            "draft": jax.jit(functools.partial(
                Engine._decode_fn, cfg=draft.cfg, qcfg=draft.qcfg,
                impl=draft.impl)),
        }
        self._flush_k = {
            "target": jax.jit(lambda cs: [
                flush_k_now(c, target.qcfg, target.impl) for c in cs]),
            "draft": jax.jit(lambda cs: [
                flush_k_now(c, draft.qcfg, draft.impl) for c in cs]),
        }
        # rewind-path usage counters (tests + bench introspection)
        self.stats = {"rewind": 0, "replay": 0, "boundary_flush": 0}

    @staticmethod
    def _draft_sample_scan_fn(params, first_token, first_pos, caches, rng,
                              *, cfg, qcfg, impl, steps: int,
                              temperature: float, top_k: int, top_p: float,
                              prompt_len: int):
        """Sampling twin of Engine._decode_scan_fn that ALSO emits each
        step's full warped probability row — the q measure the accept-
        reject rule needs.  Same statically-scheduled flush segments;
        no penalty/pad (speculative sampling is B=1, penalty-free).
        Returns (tokens (B, steps), probs (B, steps, V), caches)."""
        from kivi_tpu.serving import sampling

        static_flush = prompt_len > 0 and qcfg.quantize_kv

        def body(carry, _):
            token, pos, caches, rng = carry
            logits, caches = modeling.forward(
                params, token, caches, cfg, qcfg, pos, mode="decode",
                impl=impl, flush=not static_flush)
            warped = sampling.warp_logits(
                logits[:, -1, :], temperature=temperature, top_k=top_k,
                top_p=top_p)
            probs = jax.nn.softmax(warped, axis=-1)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, warped).astype(
                jnp.int32)[:, None]
            return (nxt, pos + 1, caches, rng), (nxt[:, 0], probs)

        carry = (first_token, first_pos, caches, rng)
        if not static_flush:
            carry, (toks, probs) = jax.lax.scan(body, carry, None,
                                                length=steps)
            return (jnp.swapaxes(toks, 0, 1),
                    jnp.swapaxes(probs, 0, 1), carry[2])
        events = Engine._flush_schedule(qcfg, prompt_len, steps)
        tok_segs, prob_segs, done = [], [], 0
        for b in sorted(events) + [steps]:
            if b - done > 0:
                carry, (toks, probs) = jax.lax.scan(body, carry, None,
                                                    length=b - done)
                tok_segs.append(jnp.swapaxes(toks, 0, 1))
                prob_segs.append(jnp.swapaxes(probs, 0, 1))
                done = b
            if b in events:
                fk, fv = events[b]
                token, pos, caches, rng = carry
                caches = modeling.flush_caches(caches, qcfg, impl,
                                               k=fk, v=fv)
                carry = (token, pos, caches, rng)
        return (jnp.concatenate(tok_segs, axis=1),
                jnp.concatenate(prob_segs, axis=1), carry[2])

    @staticmethod
    def _verify_fn(params, tokens, pos0, caches, *, prev_len, cfg, qcfg,
                   impl):
        """Width-(k+1) extend returning logits at EVERY position (the
        engine's own extend is last-only); appends all k+1 tokens."""
        B, T1 = tokens.shape
        positions = jnp.broadcast_to(
            pos0 + jnp.arange(T1, dtype=jnp.int32), (B, T1))
        logits, caches = modeling.forward(
            params, tokens, caches, cfg, qcfg, positions, mode="extend",
            impl=impl, last_only=False, prev_len=prev_len)
        return logits, caches

    # -- cache rewind -------------------------------------------------------

    def _rewind(self, who: str, new_caches, old_caches, tokens_fed,
                N0: int, N1: int, N2: int, via_decode: bool):
        """Return caches holding exactly N1 committed tokens in
        prefill-canonical state.  new_caches holds N2 (N1 <= N2) tokens
        appended from N0 via extend (via_decode=False) or decode
        appends (True); old_caches is the retained N0 pytree and
        tokens_fed the (N2 - N0)-long append stream for replay."""
        eng = self.target if who == "target" else self.draft
        if not eng.qcfg.quantize_kv:
            if N1 == N2:
                return new_caches
            return [dataclasses.replace(c, length=jnp.int32(N1))
                    for c in new_caches]
        W, vf = eng.qcfg.residual_length, eng.qcfg.value_flush
        nkq_cur = (_nkq_decode(N2, W) if via_decode
                   else _nkq_prefill(N2, W))
        nvq_cur = _nvq(N2, W, vf)
        nkq_want, nvq_want = _nkq_prefill(N1, W), _nvq(N1, W, vf)
        k_ok = nkq_cur == nkq_want or (nkq_cur + W == nkq_want
                                       and N1 - nkq_cur == W)
        v_ok = nvq_cur == nvq_want and N1 - nvq_cur <= W
        self.stats["rewind" if (k_ok and v_ok) else "replay"] += 1
        if not (k_ok and v_ok):
            # replay: teacher-forced decode appends of the accepted
            # tokens from the pre-iteration pytree (counters maintained
            # by decode_append itself — only the boundary-flush state
            # below may still need normalizing)
            new_caches = old_caches
            for t in range(N1 - N0):
                tok = jnp.asarray([[int(tokens_fed[t])]], jnp.int32)
                pos = jnp.full((1, 1), N0 + t, jnp.int32)
                _, new_caches = self._replay_step[who](
                    eng.params, tok, pos, new_caches, None)
            nkq_cur = _nkq_decode(N1, W)
            nvq_cur = _nvq(N1, W, vf)
        elif N1 != N2 or nkq_cur != nkq_want:
            new_caches = [dataclasses.replace(
                c, n_k_win=jnp.int32(N1 - nkq_cur),
                n_v_win=jnp.int32(N1 - nvq_cur)) for c in new_caches]
        if nkq_cur != _nkq_prefill(N1, W):
            # rewind landed on a key-block boundary with the window
            # full-but-unflushed: flush to prefill-canonical
            self.stats["boundary_flush"] += 1
            new_caches = self._flush_k[who](new_caches)
        return new_caches

    # -- generation loop ----------------------------------------------------

    def generate_stream(self, tokens: jax.Array, max_new_tokens: int,
                        eos_token_id: Optional[int] = None, *,
                        temperature: float = 0.0, top_k: int = 0,
                        top_p: float = 1.0,
                        rng: Optional[jax.Array] = None):
        """Streaming twin of generate(): yields 1-D np.int32 blocks —
        the first token alone (time-to-first-token), then each
        iteration's accepted+corrected tokens as they are verified.
        Concatenated blocks equal generate()'s output exactly (same
        loop, same rng discipline)."""
        yield from self._run(tokens, max_new_tokens, eos_token_id,
                             temperature=temperature, top_k=top_k,
                             top_p=top_p, rng=rng)

    def generate(self, tokens: jax.Array, max_new_tokens: int,
                 eos_token_id: Optional[int] = None, *,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0,
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        """Speculative generation.  tokens (1, T) i32; returns (1, n)
        np.int32, n <= max_new_tokens (early exit at EOS — trailing
        positions are simply not produced).

        temperature == 0: greedy, token-equal to target.generate(...,
        temperature=0) for any draft.  temperature > 0: Leviathan
        accept-reject over the HF warper chain (top_k/top_p) — the
        output DISTRIBUTION equals sampling from the target directly
        (per-token streams differ from target.generate: the random
        choices are spent differently by construction).  Repetition
        penalty is not supported speculatively.  Records per-iteration
        acceptance counts in self.last_acceptance."""
        blocks = list(self._run(tokens, max_new_tokens, eos_token_id,
                                temperature=temperature, top_k=top_k,
                                top_p=top_p, rng=rng))
        return np.concatenate(blocks)[None, :].astype(np.int32)

    def _run(self, tokens, max_new_tokens, eos_token_id, *, temperature,
             top_k, top_p, rng):
        """The speculative loop as a generator: yields 1-D np.int32
        blocks (first token, then each iteration's accepted tokens),
        trimmed to max_new_tokens and cut after the first EOS."""
        from kivi_tpu.serving import sampling

        tgt, drf, k = self.target, self.draft, self.k
        sampled = temperature > 0
        tokens = jnp.asarray(tokens, jnp.int32).reshape(1, -1)
        Tp = tokens.shape[1]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        host_rng = np.random.default_rng(
            int(jax.random.randint(jax.random.fold_in(rng, 7), (),
                                   0, 2**31 - 1)))

        t_caches = modeling.init_caches(tgt.cfg, tgt.qcfg, 1,
                                        tgt.max_seq_len, tgt.cache_dtype)
        d_caches = modeling.init_caches(drf.cfg, drf.qcfg, 1,
                                        drf.max_seq_len, drf.cache_dtype)
        t_logits, t_caches = tgt._prefill(tgt.params, tokens, t_caches,
                                          None)
        _, d_caches = drf._prefill(drf.params, tokens, d_caches, None)
        if sampled:
            rng, sub = jax.random.split(rng)
            cur = int(sampling.sample_step(t_logits, sub,
                                           temperature=temperature,
                                           top_k=top_k, top_p=top_p)[0])
        else:
            cur = int(jnp.argmax(t_logits, -1)[0])

        count, last = 1, cur
        yield np.asarray([cur], np.int32)       # time-to-first-token
        N = Tp                       # committed tokens in BOTH caches
        self.last_acceptance = []
        while count < max_new_tokens and (eos_token_id is None
                                          or last != eos_token_id):
            cur_dev = jnp.asarray([[cur]], jnp.int32)
            pos = jnp.full((1, 1), N, jnp.int32)
            d_old, t_old = d_caches, t_caches
            # 1) draft proposes k tokens in one scan
            if sampled:
                rng, sub = jax.random.split(rng)
                d_toks, q_probs, d_caches = self._draft_sample_scan(
                    drf.params, cur_dev, pos, d_caches, sub, steps=k,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    prompt_len=canonical_phase(drf.qcfg, N))
                q_probs = np.asarray(q_probs[0], np.float64)  # (k, V)
            else:
                d_toks, d_caches = self._draft_scan(
                    drf.params, cur_dev, pos, d_caches, rng, None, None,
                    steps=k, prompt_len=canonical_phase(drf.qcfg, N))
            d_toks = np.asarray(d_toks[0])
            # 2) target scores [cur] + draft tokens in one extend
            v_in = jnp.concatenate(
                [cur_dev, jnp.asarray(d_toks[None, :], jnp.int32)], axis=1)
            t_logits, t_caches = self._verify(
                tgt.params, v_in, jnp.full((), N, jnp.int32), t_caches,
                prev_len=canonical_phase(tgt.qcfg, N))
            # 3) accepted prefix + corrected/bonus token
            if sampled:
                p_probs = np.asarray(jax.nn.softmax(
                    sampling.warp_logits(t_logits[0],
                                         temperature=temperature,
                                         top_k=top_k, top_p=top_p),
                    axis=-1), np.float64)                     # (k+1, V)
                emitted = spec_accept(p_probs, q_probs, d_toks,
                                      host_rng.random(k), host_rng)
                j = len(emitted) - 1
            else:
                t_pred = np.asarray(jnp.argmax(t_logits, -1)[0])  # (k+1,)
                j = int(np.argmax(t_pred[:k] != d_toks)) \
                    if (t_pred[:k] != d_toks).any() else k
                emitted = [int(t) for t in d_toks[:j]] + [int(t_pred[j])]
            self.last_acceptance.append(j)
            # 4) rewind both caches to the N + j + 1 committed tokens
            fed = [cur] + [int(t) for t in d_toks]
            t_caches = self._rewind("target", t_caches, t_old, fed,
                                    N, N + j + 1, N + k + 1,
                                    via_decode=False)
            if j == k:
                # full accept: the scan emitted d_toks[k-1] but never
                # fed it back — append it so the draft holds all k+1
                _, d_caches = self._replay_step["draft"](
                    drf.params, jnp.asarray([[int(d_toks[k - 1])]],
                                            jnp.int32),
                    jnp.full((1, 1), N + k, jnp.int32), d_caches, None)
                d2 = N + k + 1
            else:
                d2 = N + k
            d_caches = self._rewind("draft", d_caches, d_old, fed,
                                    N, N + j + 1, d2, via_decode=True)
            N += j + 1
            cur = emitted[-1]
            # trim the visible block: max_new_tokens cap, cut past EOS
            block = emitted[:max_new_tokens - count]
            if eos_token_id is not None and eos_token_id in block:
                block = block[:block.index(eos_token_id) + 1]
            count += len(block)
            last = block[-1] if block else last
            if block:
                yield np.asarray(block, np.int32)
            if eos_token_id is not None and eos_token_id in block:
                return

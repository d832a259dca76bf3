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
extend — plus O(k) host logic, each compiled ONCE (no per-phase
recompiles: neither carries a static flush schedule).

Flush-boundary discipline (the correctness core).  Sequential decode
quantize-flushes a full fp window BEFORE the append that would overfill
it, so tokens after a flush attend the just-quantized history — but a
width-(k+1) verify attends the block-START cache state at every
position.  If a flush boundary fell inside the block, verify logits
would diverge from sequential decode's even under a perfect draft
(observed: k=5 perfect-draft acceptance dropping to 3 with a diverged
stream).  Three rules make the block's sequential twin flush-free:

  * eager boundary flush: at iteration start, if a window is exactly
    full (host-tracked watermarks — exact, because these are the only
    flushes), flush it — the same moment sequential decode would;
  * block clamp: accept at most `keff = min(k, cap_k - 1, cap_v - 1)`
    draft tokens, where cap is the post-flush window headroom of BOTH
    models — the committed count never crosses a boundary mid-block;
  * window-only ingest: draft scan and verify append K/V via
    `KC.window_append_capped` (`ingest="window"`), which never flushes
    and never moves a quantized watermark, so rejecting a block is a
    pure counter rollback (`KC.rollback_counters`) — stale rows beyond
    the rolled-back counts are invisible to attention and overwritten
    by the next block before any flush can quantize them.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.cache.fp_cache import FpLayerCache
from kivi_tpu.cache import kivi_cache as KC
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import (Engine, nkq_prefill as _nkq_prefill,
                                     nvq_canonical as _nvq)


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
        # all cache operands are donated: the window-only ingest means
        # nothing ever needs the pre-iteration pytree back (rejection is
        # a counter rollback on the NEW caches)
        self._verify = jax.jit(
            functools.partial(self._verify_fn, cfg=target.cfg,
                              qcfg=target.qcfg, impl=target.impl),
            donate_argnums=(3,))
        self._draft_scan = jax.jit(
            functools.partial(self._draft_scan_fn, cfg=draft.cfg,
                              qcfg=draft.qcfg, impl=draft.impl),
            static_argnames=("steps",), donate_argnums=(3,))
        self._draft_sample_scan = jax.jit(
            functools.partial(self._draft_sample_scan_fn, cfg=draft.cfg,
                              qcfg=draft.qcfg, impl=draft.impl),
            static_argnames=("steps", "temperature", "top_k", "top_p"),
            donate_argnums=(3,))
        self._draft_bonus = jax.jit(
            functools.partial(self._bonus_fn, cfg=draft.cfg,
                              qcfg=draft.qcfg, impl=draft.impl),
            donate_argnums=(3,))

        def mk_flush(eng, which):
            f = KC.flush_k_now if which == "k" else KC.flush_v_now
            return jax.jit(
                lambda cs: [f(c, eng.qcfg, eng.impl) for c in cs],
                donate_argnums=(0,))

        self._flush_k = {"target": mk_flush(target, "k"),
                         "draft": mk_flush(draft, "k")}
        self._flush_v = {"target": mk_flush(target, "v"),
                         "draft": mk_flush(draft, "v")}
        self._rollback = jax.jit(self._rollback_fn, donate_argnums=(0,))
        # boundary-discipline usage counters (tests + introspection)
        self.stats = {"boundary_flush_k": 0, "boundary_flush_v": 0,
                      "clamped": 0}

    # -- jitted bodies --------------------------------------------------------

    @staticmethod
    def _rollback_fn(caches, n):
        """Counters-only rewind to exactly `n` committed tokens (valid
        because window-only ingest never moves a quantized watermark)."""
        n = jnp.asarray(n, jnp.int32)
        return [dataclasses.replace(c, length=n)
                if isinstance(c, FpLayerCache)
                else KC.rollback_counters(c, n) for c in caches]

    @staticmethod
    def _draft_scan_fn(params, first_token, first_pos, caches, *, cfg,
                       qcfg, impl, steps: int):
        """k greedy draft steps with window-only cache ingest — no flush
        schedule, so ONE compilation covers every position.  Returns
        (tokens (B, steps), caches)."""
        def body(carry, _):
            token, pos, caches = carry
            logits, caches = modeling.forward(
                params, token, caches, cfg, qcfg, pos, mode="decode",
                impl=impl, ingest="window")
            nxt = jnp.argmax(logits[:, -1, :], -1).astype(
                jnp.int32)[:, None]
            return (nxt, pos + 1, caches), nxt[:, 0]

        carry, toks = jax.lax.scan(body, (first_token, first_pos, caches),
                                   None, length=steps)
        return jnp.swapaxes(toks, 0, 1), carry[2]

    @staticmethod
    def _draft_sample_scan_fn(params, first_token, first_pos, caches, rng,
                              *, cfg, qcfg, impl, steps: int,
                              temperature: float, top_k: int,
                              top_p: float):
        """Sampling twin of _draft_scan_fn that ALSO emits each step's
        full warped probability row — the q measure the accept-reject
        rule needs.  Returns (tokens (B, steps), probs (B, steps, V),
        caches)."""
        from kivi_tpu.serving import sampling

        def body(carry, _):
            token, pos, caches, rng = carry
            logits, caches = modeling.forward(
                params, token, caches, cfg, qcfg, pos, mode="decode",
                impl=impl, ingest="window")
            warped = sampling.warp_logits(
                logits[:, -1, :], temperature=temperature, top_k=top_k,
                top_p=top_p)
            probs = jax.nn.softmax(warped, axis=-1)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, warped).astype(
                jnp.int32)[:, None]
            return (nxt, pos + 1, caches, rng), (nxt[:, 0], probs)

        carry = (first_token, first_pos, caches, rng)
        carry, (toks, probs) = jax.lax.scan(body, carry, None,
                                            length=steps)
        return (jnp.swapaxes(toks, 0, 1), jnp.swapaxes(probs, 0, 1),
                carry[2])

    @staticmethod
    def _verify_fn(params, tokens, pos0, caches, *, cfg, qcfg, impl):
        """Width-(k+1) extend returning logits at EVERY position (the
        engine's own extend is last-only); window-only ingest, so no
        static prev_len and ONE compilation covers every position."""
        B, T1 = tokens.shape
        positions = jnp.broadcast_to(
            pos0 + jnp.arange(T1, dtype=jnp.int32), (B, T1))
        logits, caches = modeling.forward(
            params, tokens, caches, cfg, qcfg, positions, mode="extend",
            impl=impl, last_only=False, ingest="window")
        return logits, caches

    @staticmethod
    def _bonus_fn(params, token, pos, caches, *, cfg, qcfg, impl):
        """One draft decode step, window ingest, logits discarded: feeds
        the final proposal back after a full-depth accept (the scan
        emits it but never consumes it)."""
        _, caches = modeling.forward(
            params, token, caches, cfg, qcfg, pos, mode="decode",
            impl=impl, ingest="window")
        return caches

    # -- host-side boundary discipline ---------------------------------------

    def _check_capacity(self, prompt_len: int, max_new_tokens: int):
        """Reject generations that could fill either cache: the loop
        commits up to k+1 tokens per iteration, so the last iteration
        may overshoot the emitted count by up to k.  Without this the
        caps hit 0 mid-generation and keff clamps to 0 forever (fp
        caches would then overflow via clamped writes)."""
        cap = min(self.target.max_seq_len, self.draft.max_seq_len)
        need = prompt_len + max_new_tokens + self.k
        if need > cap:
            raise ValueError(
                f"prompt_len ({prompt_len}) + max_new_tokens "
                f"({max_new_tokens}) + k ({self.k}) = {need} exceeds "
                f"min(target, draft) max_seq_len = {cap}")

    @staticmethod
    def _wm_init(qcfg, prompt_len: int) -> dict:
        """Quantized watermarks right after prefill (prefill-canonical:
        keys flushed at every full W, values vf-aligned)."""
        if not qcfg.quantize_kv:
            return {}
        W, vf = qcfg.residual_length, qcfg.value_flush
        return {"nkq": _nkq_prefill(prompt_len, W),
                "nvq": _nvq(prompt_len, W, vf)}

    def _sync_boundary(self, who: str, caches, wm: dict, N: int):
        """Eager boundary flushes (exactly when sequential decode would
        flush: a window holding W committed tokens at step start), then
        the window headroom that bounds this iteration's block."""
        eng = self.target if who == "target" else self.draft
        q = eng.qcfg
        if not q.quantize_kv:
            return caches, eng.max_seq_len - N
        W, vf = q.residual_length, q.value_flush
        if N - wm["nkq"] == W:
            caches = self._flush_k[who](caches)
            wm["nkq"] += W
            self.stats["boundary_flush_k"] += 1
        if N - wm["nvq"] == W:
            caches = self._flush_v[who](caches)
            wm["nvq"] += vf
            self.stats["boundary_flush_v"] += 1
        return caches, W - max(N - wm["nkq"], N - wm["nvq"])

    # -- device-resident loop (one dispatch per generation) -----------------

    def _build_device_loop(self, max_new: int, has_eos: bool):
        """One jitted program for the ENTIRE speculative generation:
        `lax.while_loop` whose body is boundary flush -> (k+1)-step
        draft scan -> width-(k+1) verify -> on-device accept ->
        counter rollback.  The host loop pays 2+ dispatch round trips
        per iteration — ruinous over a high-RTT link (measured 31 vs
        161 tok/s against the engine's fused scan through the axon
        tunnel); this is zero host round trips after prefill.

        Only possible because of the boundary discipline: greedy accept
        is pure argmax comparison, the clamp is counter arithmetic, the
        flushes are the masked `n_win == W`-gated writes, and commit/
        reject is a counter replace — no data-dependent host logic
        remains.  The (k+1)-th draft step appends the final proposal's
        K/V so a full accept needs no bonus dispatch (same trick as the
        batched SpeculativeBatcher)."""
        tgt, drf, k = self.target, self.draft, self.k
        qt, qd = tgt.qcfg, drf.qcfg

        def flush_all(caches, qcfg, impl):
            if not qcfg.quantize_kv:
                return caches
            out = []
            for c in caches:
                c = KC.flush_k_masked(c, qcfg, impl)
                out.append(KC.flush_v_masked(c, qcfg, impl))
            return out

        def cap_of(caches, qcfg, eng, n):
            c0 = caches[0]
            if isinstance(c0, FpLayerCache):
                return jnp.int32(eng.max_seq_len) - n
            return (jnp.int32(qcfg.residual_length)
                    - jnp.maximum(c0.n_k_win, c0.n_v_win))

        def fn(params_t, params_d, cur, n0, count0, done0, out0, eos,
               t_caches, d_caches):
            def body(state):
                cur, n, count, done, out, t_caches, d_caches = state
                t_caches = flush_all(t_caches, qt, tgt.impl)
                d_caches = flush_all(d_caches, qd, drf.impl)
                # clamp >= 0: keff == -1 would make j == -1 and
                # n2 == n — a while_loop that never progresses (hang
                # on-device).  The upfront capacity check in
                # generate_device makes cap == 0 unreachable.
                keff = jnp.maximum(jnp.minimum(
                    jnp.int32(k),
                    jnp.minimum(cap_of(t_caches, qt, tgt, n),
                                cap_of(d_caches, qd, drf, n)) - 1), 0)

                def dbody(carry, _):
                    t, p, c = carry
                    logits, c = modeling.forward(
                        params_d, t, c, drf.cfg, qd, p, mode="decode",
                        impl=drf.impl, ingest="window")
                    nxt = jnp.argmax(logits[:, -1, :], -1).astype(
                        jnp.int32)[:, None]
                    return (nxt, p + 1, c), nxt[0, 0]

                pos = jnp.full((1, 1), n, jnp.int32)
                carry, d_toks = jax.lax.scan(
                    dbody, (cur, pos, d_caches), None, length=k + 1)
                d_caches = carry[2]

                v_in = jnp.concatenate([cur, d_toks[:k][None, :]], axis=1)
                positions = (n + jnp.arange(k + 1, dtype=jnp.int32))[None]
                logits, t_caches = modeling.forward(
                    params_t, v_in, t_caches, tgt.cfg, qt, positions,
                    mode="extend", impl=tgt.impl, last_only=False,
                    ingest="window")
                t_pred = jnp.argmax(logits[0], -1).astype(jnp.int32)

                mism = t_pred[:k] != d_toks[:k]
                j = jnp.minimum(
                    jnp.where(mism.any(), jnp.argmax(mism), k), keff)
                ii = jnp.arange(k + 1, dtype=jnp.int32)
                emit = jnp.where(ii < j, d_toks, t_pred[j])
                valid = ii <= j
                old = jax.lax.dynamic_slice(out, (count,), (k + 1,))
                out = jax.lax.dynamic_update_slice(
                    out, jnp.where(valid, emit, old), (count,))
                if has_eos:
                    done = jnp.logical_or(
                        done, jnp.logical_and(valid, emit == eos).any())
                n2 = n + j + 1
                t_caches = self._rollback_fn(t_caches, n2)
                d_caches = self._rollback_fn(d_caches, n2)
                return (t_pred[j][None, None], n2, count + j + 1, done,
                        out, t_caches, d_caches)

            def cond(state):
                _, _, count, done, *_ = state
                return jnp.logical_and(count < max_new,
                                       jnp.logical_not(done))

            state = (cur, n0, count0, done0, out0, t_caches, d_caches)
            state = jax.lax.while_loop(cond, body, state)
            return state[2], state[4]       # (count, out)

        return jax.jit(fn, donate_argnums=(6, 8, 9))

    def generate_device(self, tokens: jax.Array, max_new_tokens: int,
                        eos_token_id: Optional[int] = None) -> np.ndarray:
        """Greedy speculative generation with the whole loop device-
        resident: prefill (2 dispatches) + ONE while-loop dispatch.
        Token-equal to generate(temperature=0) / target greedy.  No
        streaming, no sampling (those stay on the host loop)."""
        tgt, drf, k = self.target, self.draft, self.k
        tokens = jnp.asarray(tokens, jnp.int32).reshape(1, -1)
        Tp = tokens.shape[1]
        self._check_capacity(Tp, max_new_tokens)
        key = (max_new_tokens, eos_token_id is not None)
        loop = getattr(self, "_dev_loops", None)
        if loop is None:
            self._dev_loops = {}
        if key not in self._dev_loops:
            self._dev_loops[key] = self._build_device_loop(*key)

        t_caches = modeling.init_caches(tgt.cfg, tgt.qcfg, 1,
                                        tgt.max_seq_len, tgt.cache_dtype)
        d_caches = modeling.init_caches(drf.cfg, drf.qcfg, 1,
                                        drf.max_seq_len, drf.cache_dtype)
        t_logits, t_caches = tgt._prefill(tgt.params, tokens, t_caches,
                                          None)
        _, d_caches = drf._prefill(drf.params, tokens, d_caches, None)
        cur = jnp.argmax(t_logits, -1).astype(jnp.int32).reshape(1, 1)
        out0 = jnp.zeros((max_new_tokens + k + 2,), jnp.int32)
        out0 = out0.at[0].set(cur[0, 0])
        eos = jnp.int32(eos_token_id if eos_token_id is not None else -1)
        done0 = (cur[0, 0] == eos if eos_token_id is not None
                 else jnp.asarray(False))
        count, out = self._dev_loops[key](
            tgt.params, drf.params, cur, jnp.int32(Tp), jnp.int32(1),
            done0, out0, eos, t_caches, d_caches)
        n = min(int(count), max_new_tokens)
        toks = np.asarray(out)[:n]
        if eos_token_id is not None:
            hits = np.flatnonzero(toks == eos_token_id)
            if hits.size:
                toks = toks[:hits[0] + 1]
        return toks[None, :].astype(np.int32)

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
        self._check_capacity(Tp, max_new_tokens)
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
        t_wm = self._wm_init(tgt.qcfg, Tp)
        d_wm = self._wm_init(drf.qcfg, Tp)
        self.last_acceptance = []
        self.last_keff = []          # per-iteration clamped depth
        while count < max_new_tokens and (eos_token_id is None
                                          or last != eos_token_id):
            # 0) eager boundary flushes + block clamp (see module doc)
            t_caches, cap_t = self._sync_boundary("target", t_caches,
                                                  t_wm, N)
            d_caches, cap_d = self._sync_boundary("draft", d_caches,
                                                  d_wm, N)
            # lower clamp: at cap == 0 (cache full) an unclamped keff of
            # -1 would slice d_toks[:-1] and commit past capacity; the
            # upfront capacity check makes cap == 0 unreachable, the
            # clamp keeps a violated assumption from corrupting state.
            keff = max(0, min(k, cap_t - 1, cap_d - 1))
            self.last_keff.append(keff)
            if keff < k:
                self.stats["clamped"] += 1
            cur_dev = jnp.asarray([[cur]], jnp.int32)
            pos = jnp.full((1, 1), N, jnp.int32)
            # 1) draft proposes k tokens in one scan (always k — one
            # compilation; proposals beyond keff are simply not used)
            if sampled:
                rng, sub = jax.random.split(rng)
                d_toks, q_probs, d_caches = self._draft_sample_scan(
                    drf.params, cur_dev, pos, d_caches, sub, steps=k,
                    temperature=temperature, top_k=top_k, top_p=top_p)
                q_probs = np.asarray(q_probs[0], np.float64)  # (k, V)
            else:
                d_toks, d_caches = self._draft_scan(
                    drf.params, cur_dev, pos, d_caches, steps=k)
            d_toks = np.asarray(d_toks[0])
            # 2) target scores [cur] + draft tokens in one extend
            v_in = jnp.concatenate(
                [cur_dev, jnp.asarray(d_toks[None, :], jnp.int32)], axis=1)
            t_logits, t_caches = self._verify(
                tgt.params, v_in, jnp.full((), N, jnp.int32), t_caches)
            # 3) accepted prefix + corrected/bonus token, depth <= keff
            if sampled:
                p_probs = np.asarray(jax.nn.softmax(
                    sampling.warp_logits(t_logits[0],
                                         temperature=temperature,
                                         top_k=top_k, top_p=top_p),
                    axis=-1), np.float64)                     # (k+1, V)
                emitted = spec_accept(p_probs[:keff + 1],
                                      q_probs[:keff], d_toks[:keff],
                                      host_rng.random(keff), host_rng)
                j = len(emitted) - 1
            else:
                t_pred = np.asarray(jnp.argmax(t_logits, -1)[0])  # (k+1,)
                mism = t_pred[:keff] != d_toks[:keff]
                j = int(np.argmax(mism)) if mism.any() else keff
                emitted = [int(t) for t in d_toks[:j]] + [int(t_pred[j])]
            self.last_acceptance.append(j)
            # 4) commit: the capped window appends already hold every
            # accepted token; rejection is a pure counter rollback
            if j == k:
                # full accept at unclamped depth: the scan emitted
                # d_toks[k-1] but never fed it back — append it so the
                # draft holds all k+1 committed tokens
                d_caches = self._draft_bonus(
                    drf.params, jnp.asarray([[int(d_toks[k - 1])]],
                                            jnp.int32),
                    jnp.full((1, 1), N + k, jnp.int32), d_caches)
            N += j + 1
            t_caches = self._rollback(t_caches, N)
            d_caches = self._rollback(d_caches, N)
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

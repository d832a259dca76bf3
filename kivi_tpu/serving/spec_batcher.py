"""Batched speculative decoding over continuous-batching slots.

Composes the two beyond-reference serving features: every iteration,
ALL active slots draft k tokens in one batched scan and verify them in
one batched width-(k+1) extend — acceptance, positions, window phases
and flush boundaries all diverge per slot.  Per-slot greedy output is
TOKEN-EQUAL to the plain batcher's (hence the engine's) greedy stream
for any draft model.

This is the payoff of the round-4 speculative redesign
(serving/speculative.py): the boundary discipline's three pieces are
all slot-divergence-friendly where the old rewind/replay machinery was
not (replay was a data-dependent per-slot host loop — unbatchable):

  * eager boundary flushes ride `flush_k_masked`/`flush_v_masked`
    under `jax.vmap` — slice-sized selected writes keyed on each
    slot's own `n_win == W`, dispatched every iteration;
  * the block clamp `keff_s = min(k, cap_k-1, cap_v-1)` is O(1) host
    arithmetic per slot from host-mirrored watermarks (exact: the
    masked flushes implement the same rule the mirror simulates);
  * window-only ingest (`ingest="window"`) makes per-slot rejection a
    VECTORIZED counter rollback — one elementwise (S,) counter
    replace, no per-slot control flow.

The draft scan runs k+1 steps (not k): the extra step appends the
final proposal's K/V, so a full-depth accept needs no separate bonus
dispatch — the rollback simply keeps it.  Per iteration the device
work is exactly four fixed-shape dispatches (masked flushes, draft
scan, verify, rollback) regardless of S, k, acceptance, or phase.

Sampling (round 5): temperature > 0 slots run the Leviathan
accept-reject ON DEVICE — per-slot warped draft sampling, target
distributions, accept ratios, residual and bonus samples all inside
the two batched dispatches, so no (S, k, V) probability rows ever
cross to the host.  Greedy slots ride the SAME dispatches as the
temperature -> 0 limit: their p/q are one-hots at the argmax, under
which accept == prefix match and residual/bonus == argmax — byte-equal
to the dedicated greedy path (tested).  Mixed greedy/sampled batches
therefore need one compilation.  Per-slot emitted marginals equal
sampling the target directly (the B=1 engine's theorem, vmapped).  No
repetition penalty, prefixes, or chunked admission (plain bucketed
prefill).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.cache.fp_cache import FpLayerCache
from kivi_tpu.cache import kivi_cache as KC
from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling
from kivi_tpu.serving.batcher import ContinuousBatcher, Request
from kivi_tpu.serving.engine import (nkq_prefill as _nkq_prefill,
                                     nvq_canonical as _nvq)


def spec_accept_device(p, q, xs, keff, key):
    """Leviathan accept-reject for ONE slot's block, fully on device —
    the jnp twin of speculative.spec_accept (same theorem, same
    emitted-token marginal; tests pin both).

    p (k+1, V) target distributions; q (k, V) draft distributions; xs
    (k,) draft tokens; keff traced accept cap.  Accept x_i with prob
    min(1, p_i(x)/q_i(x)) for i < keff; first rejection at j emits a
    sample of normalize(max(p_j - q_j, 0)); surviving to j == keff
    emits the bonus sample from p_keff.  Greedy slots (one-hot p/q)
    reduce exactly to greedy prefix matching with argmax corrections.
    Returns (emitted (k+1,), j) — positions > j in `emitted` are
    garbage."""
    k = xs.shape[0]
    ii = jnp.arange(k, dtype=jnp.int32)
    px = p[ii, xs]
    qx = q[ii, xs]
    us = jax.random.uniform(jax.random.fold_in(key, 0), (k,))
    acc = us < jnp.minimum(1.0, px / jnp.maximum(qx, 1e-20))
    acc = jnp.logical_and(acc, ii < keff)
    rej = jnp.logical_not(acc)
    j = jnp.where(rej.any(), jnp.argmax(rej), jnp.int32(k))
    # residual samples at every position (only row j is consumed)
    r = jnp.maximum(p[:k] - q, 0.0)
    rs = jnp.sum(r, axis=-1, keepdims=True)
    rdist = jnp.where(rs > 1e-12, r / jnp.maximum(rs, 1e-20), p[:k])
    rtok = jax.random.categorical(
        jax.random.fold_in(key, 1),
        jnp.log(jnp.maximum(rdist, 1e-30))).astype(jnp.int32)
    btok = jax.random.categorical(
        jax.random.fold_in(key, 2),
        jnp.log(jnp.maximum(p, 1e-30))).astype(jnp.int32)
    final = jnp.where(j < keff, rtok[jnp.minimum(j, k - 1)], btok[j])
    iii = jnp.arange(k + 1, dtype=jnp.int32)
    emitted = jnp.where(
        iii < j,
        jnp.concatenate([xs, jnp.zeros((1,), jnp.int32)]), final)
    return emitted, j


class SpeculativeBatcher(ContinuousBatcher):
    """ContinuousBatcher whose decode step is a speculative iteration.

    dcfg/dqcfg/dparams: the draft model (cheaper — fewer layers, or the
    same weights at lower KV bits; correctness never depends on it).
    k: speculation depth.  Emits 1..k+1 tokens per slot per step().
    """

    def __init__(self, cfg: ModelConfig, qcfg: QuantConfig, params,
                 dcfg: ModelConfig, dqcfg: QuantConfig, dparams,
                 num_slots: int, max_seq_len: int, k: int = 4,
                 impl: str = "jnp",
                 prompt_buckets=(128, 256, 512, 1024, 2048, 4096)):
        super().__init__(cfg, qcfg, params, num_slots, max_seq_len,
                         impl=impl, prompt_buckets=prompt_buckets)
        if dcfg.vocab_size != cfg.vocab_size:
            raise ValueError("target and draft must share a vocabulary")
        self.dcfg, self.dqcfg, self.dparams, self.k = dcfg, dqcfg, dparams, k

        one = lambda: modeling.init_caches(dcfg, dqcfg, 1, max_seq_len)
        shapes = jax.eval_shape(one)
        self.d_caches = jax.tree_util.tree_map(
            lambda s: jnp.zeros((num_slots, *s.shape), s.dtype), shapes)

        # host-mirrored per-slot committed counts + quantized watermarks
        # (exact: the masked flushes below apply the same n_win == W
        # rule this mirror simulates)
        S = num_slots
        self.n_cache = np.zeros(S, np.int64)      # committed cache tokens
        self.wm = {m: {"nkq": np.zeros(S, np.int64),
                       "nvq": np.zeros(S, np.int64)}
                   for m in ("target", "draft")}

        self._d_prefills: Dict[int, object] = {}
        self._flush_t = self._make_flush(qcfg, impl)
        self._flush_d = self._make_flush(dqcfg, impl)
        self._spec_draft = jax.jit(functools.partial(
            self._spec_draft_fn, cfg=dcfg, qcfg=dqcfg, impl=impl,
            steps=k + 1), donate_argnums=(3,))
        self._spec_verify = jax.jit(functools.partial(
            self._spec_verify_fn, cfg=cfg, qcfg=qcfg, impl=impl),
            donate_argnums=(3,))
        self._spec_draft_s = jax.jit(functools.partial(
            self._spec_draft_sample_fn, cfg=dcfg, qcfg=dqcfg, impl=impl,
            steps=k + 1), donate_argnums=(3,))
        self._spec_verify_s = jax.jit(functools.partial(
            self._spec_verify_sample_fn, cfg=cfg, qcfg=qcfg, impl=impl,
            k=k), donate_argnums=(3,))
        self._rollback = jax.jit(self._rollback_fn, donate_argnums=(0,))
        self._host_temp = np.zeros(S, np.float64)  # sampled-mode switch
        self.stats = {"iterations": 0, "accepted": 0, "clamped": 0}

    # -- jitted bodies ------------------------------------------------------

    @staticmethod
    def _make_flush(qcfg: QuantConfig, impl: str):
        """Eager boundary flushes for every slot in one dispatch: each
        slot flushes iff it is active AND its window is exactly full —
        the same moment sequential decode would flush."""
        if not qcfg.quantize_kv:
            return None

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(caches, active):
            def one(caches1, act1):
                out = []
                for c in caches1:
                    c = KC.flush_k_masked(c, qcfg, impl, pred=act1)
                    out.append(KC.flush_v_masked(c, qcfg, impl,
                                                 pred=act1))
                return out
            return jax.vmap(one)(caches, active)

        return fn

    @staticmethod
    def _spec_draft_fn(params, tok, pos, caches, active, pads, *, cfg,
                       qcfg, impl, steps: int):
        """Batched draft scan: k+1 greedy steps per slot, window-only
        ingest (the (k+1)-th step exists to append the final proposal's
        K/V — its own output is discarded).  Returns (S, k+1) proposals
        and the caches."""
        def one(tok1, pos1, cache1, act1, pad1):
            # tok1/pos1 (1,) — the slot's row under vmap
            def body(carry, _):
                t, p, c = carry
                logits, c = modeling.forward(
                    params, t[:, None], c, cfg, qcfg, p[:, None],
                    mode="decode", impl=impl, pad_len=pad1[None],
                    active=act1, ingest="window")
                nxt = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
                return (nxt, p + 1, c), nxt[0]

            (t, p, c), toks = jax.lax.scan(
                body, (tok1, pos1, cache1), None, length=steps)
            return toks, c

        return jax.vmap(one)(tok, pos, caches, active, pads)

    @staticmethod
    def _spec_verify_fn(params, vin, pos0, caches, active, pads, *, cfg,
                        qcfg, impl):
        """Batched width-(k+1) verify: greedy predictions at every
        position (argmax on device — host never sees logits), window-
        only capped ingest.  Returns (S, k+1) i32 and the caches."""
        def one(vin1, pos01, cache1, act1, pad1):
            T1 = vin1.shape[0]
            positions = (pos01 + jnp.arange(T1, dtype=jnp.int32))[None]
            logits, cache1 = modeling.forward(
                params, vin1[None], cache1, cfg, qcfg, positions,
                mode="extend", impl=impl, last_only=False,
                pad_len=pad1[None], active=act1, ingest="window")
            return jnp.argmax(logits[0], -1).astype(jnp.int32), cache1

        return jax.vmap(one)(vin, pos0, caches, active, pads)

    @staticmethod
    def _spec_draft_sample_fn(params, tok, pos, caches, active, pads,
                              temps, topks, topps, key, *, cfg, qcfg,
                              impl, steps: int):
        """Sampled twin of _spec_draft_fn: per-slot warped sampling
        (greedy slots ride the same code as the temperature <= 0 limit
        of probs_per_row — a one-hot at the argmax).  Returns (S, k+1)
        proposals, (S, k+1, V) per-step draft DISTRIBUTIONS (device-
        resident; the verify dispatch consumes them — they never cross
        to the host), and the caches."""
        from kivi_tpu.serving import sampling

        def one(tok1, pos1, cache1, act1, pad1, t1, k1, p1, key1):
            def body(carry, i):
                t, p, c = carry
                logits, c = modeling.forward(
                    params, t[:, None], c, cfg, qcfg, p[:, None],
                    mode="decode", impl=impl, pad_len=pad1[None],
                    active=act1, ingest="window")
                lg = logits[:, -1, :]                        # (1, V)
                probs = sampling.probs_per_row(
                    lg, t1[None], k1[None], p1[None])
                nxt = jnp.where(
                    t1 <= 0.0,
                    jnp.argmax(lg, -1),
                    jax.random.categorical(
                        jax.random.fold_in(key1, i),
                        sampling.warp_logits_per_row(
                            lg, t1[None], k1[None], p1[None]))
                ).astype(jnp.int32)
                return (nxt, p + 1, c), (nxt[0], probs[0])

            (t, p, c), (toks, qprobs) = jax.lax.scan(
                body, (tok1, pos1, cache1), jnp.arange(steps))
            return toks, qprobs, c

        return jax.vmap(one)(tok, pos, caches, active, pads, temps,
                             topks, topps,
                             jax.random.split(key, tok.shape[0]))

    @staticmethod
    def _spec_verify_sample_fn(params, vin, pos0, caches, active, pads,
                               qprobs, dtoks, keff, temps, topks, topps,
                               key, *, cfg, qcfg, impl, k: int):
        """Sampled verify + ON-DEVICE Leviathan accept-reject per slot
        (the host never sees a logit or probability row).

        Per slot: target distributions p_i over the k+1 block positions
        (greedy slots: one-hots, making accept == greedy prefix match
        and the residual/bonus samples == argmax — byte-equal to the
        greedy path); accept x_i with prob min(1, p_i(x)/q_i(x)) for
        i < keff; first rejection at j emits a sample of
        normalize(max(p_j - q_j, 0)); surviving to j == keff emits the
        bonus sample from p_keff.  Returns (emitted (S, k+1), j (S,))
        and the caches; positions > j in `emitted` are garbage."""
        from kivi_tpu.serving import sampling

        def one(vin1, pos01, cache1, act1, pad1, q1, d1, ke1, t1, k1,
                p1, key1):
            T1 = vin1.shape[0]                              # k + 1
            positions = (pos01 + jnp.arange(T1, dtype=jnp.int32))[None]
            logits, cache1 = modeling.forward(
                params, vin1[None], cache1, cfg, qcfg, positions,
                mode="extend", impl=impl, last_only=False,
                pad_len=pad1[None], active=act1, ingest="window")
            p = sampling.probs_per_row(
                logits[0], jnp.broadcast_to(t1, (T1,)),
                jnp.broadcast_to(k1, (T1,)),
                jnp.broadcast_to(p1, (T1,)))                # (k+1, V)
            emitted, j = spec_accept_device(p, q1[:k], d1[:k], ke1, key1)
            return emitted, j, cache1

        S = vin.shape[0]
        return jax.vmap(one)(vin, pos0, caches, active, pads, qprobs,
                             dtoks, keff, temps, topks, topps,
                             jax.random.split(key, S))

    @staticmethod
    def _rollback_fn(caches, n):
        """Vectorized counter rollback: every slot's committed count set
        to n[s] (valid because window-only ingest never moved a
        quantized watermark).  n: (S,) i32."""
        n = jnp.asarray(n, jnp.int32)
        out = []
        for c in caches:
            if isinstance(c, FpLayerCache):
                out.append(dataclasses.replace(c, length=n))
            else:
                out.append(dataclasses.replace(
                    c, n_k_win=n - c.n_k_quant, n_v_win=n - c.n_v_quant))
        return out

    # -- host-side ----------------------------------------------------------

    def submit(self, req: Request):
        if req.repetition_penalty != 1.0:
            raise ValueError("SpeculativeBatcher does not support "
                             "repetition penalty (it conditions on the "
                             "full emitted sequence, which diverges "
                             "per-slot mid-block)")
        if req.prefix_tokens is not None:
            raise ValueError("SpeculativeBatcher does not take prefixes")
        # a slot commits up to k+1 tokens per step, so the final step
        # may overshoot the emitted count by up to k — reserve that
        # headroom beyond the base admission check (which only covers
        # bucket + max_new_tokens) so per-slot caps never reach 0.
        bucket = self._bucket_for(len(req.prompt))
        if (bucket is None
                or bucket + req.max_new_tokens + self.k > self.T):
            raise ValueError(
                f"prompt bucket + max_new_tokens + k exceeds "
                f"max_seq_len ({self.T}) — request cannot run "
                f"speculatively without overflowing its slot cache")
        super().submit(req)

    def _make_draft_prefill(self, bucket: int):
        cfg, qcfg, impl = self.dcfg, self.dqcfg, self.impl

        def fn(params, tokens, cache, pad):
            B, T = tokens.shape
            positions = jnp.maximum(
                jnp.arange(T, dtype=jnp.int32)[None, :] - pad[:, None], 0)
            _, cache = modeling.forward(
                params, tokens, cache, cfg, qcfg, positions,
                mode="prefill", impl=impl, last_only=True, pad_len=pad)
            return cache

        return jax.jit(fn)

    def _wm_reset(self, slot: int, T0: int):
        self.n_cache[slot] = T0
        for m, q in (("target", self.qcfg), ("draft", self.dqcfg)):
            if q.quantize_kv:
                W, vf = q.residual_length, q.value_flush
                self.wm[m]["nkq"][slot] = _nkq_prefill(T0, W)
                self.wm[m]["nvq"][slot] = _nvq(T0, W, vf)

    def _admit(self):
        """Base bucketed admission for the target, then mirror each
        newly admitted slot into the draft caches + watermarks."""
        prev = self.active.copy()
        super()._admit()
        for s in np.flatnonzero(self.active & ~prev):
            req = self.slot_req[s]
            bucket = self._bucket_for(len(req.prompt))
            pad = bucket - len(req.prompt)
            toks = jnp.asarray([[0] * pad + list(req.prompt)], jnp.int32)
            if bucket not in self._d_prefills:
                self._d_prefills[bucket] = self._make_draft_prefill(bucket)
            cache1 = jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape[1:], a.dtype), self.d_caches)
            cache1 = self._d_prefills[bucket](
                self.dparams, toks, cache1, jnp.asarray([pad], jnp.int32))
            self.d_caches = jax.tree_util.tree_map(
                lambda big, one: jax.lax.dynamic_update_index_in_dim(
                    big, one, int(s), 0), self.d_caches, cache1)
            self._wm_reset(int(s), bucket)
            self._host_temp[int(s)] = req.temperature

    def _caps(self, who: str, qcfg: QuantConfig) -> np.ndarray:
        """Per-slot post-flush window headroom, updating the host
        watermark mirror by the same n_win == W rule the device flush
        applies."""
        S = self.S
        if not qcfg.quantize_kv:
            return np.full(S, self.T, np.int64) - self.n_cache
        W, vf = qcfg.residual_length, qcfg.value_flush
        wm = self.wm[who]
        act = self.active
        fk = act & (self.n_cache - wm["nkq"] == W)
        wm["nkq"][fk] += W
        fv = act & (self.n_cache - wm["nvq"] == W)
        wm["nvq"][fv] += vf
        return W - np.maximum(self.n_cache - wm["nkq"],
                              self.n_cache - wm["nvq"])

    def step(self):
        """Admit, run one speculative iteration (4 fixed-shape
        dispatches), harvest each slot's accepted block."""
        self._retire()
        self._admit()
        if not self.active.any():
            return
        k = self.k
        # 1) eager boundary flushes (device: n_win == W per slot) +
        #    host watermark mirror + per-slot block clamp
        if self._flush_t is not None:
            self.caches = self._flush_t(self.caches, self.act_dev)
        if self._flush_d is not None:
            self.d_caches = self._flush_d(self.d_caches, self.act_dev)
        cap_t = self._caps("target", self.qcfg)
        cap_d = self._caps("draft", self.dqcfg)
        # lower clamp mirrors speculative.py: cap == 0 (a slot at
        # capacity) must not drive keff to -1 and commit past capacity;
        # submit() rejects requests that could reach cap == 0.
        keff = np.maximum(np.minimum(k, np.minimum(cap_t, cap_d) - 1), 0)
        blocks: List[List[int]] = [[] for _ in range(self.S)]
        js = np.zeros(self.S, np.int64)
        if (self._host_temp[self.active] > 0).any():
            # sampled path: per-slot warped draft sampling + on-device
            # Leviathan accept (greedy slots reduce to prefix matching
            # through the one-hot distributions — same dispatches)
            self.rng, s1, s2 = jax.random.split(self.rng, 3)
            d_toks, qprobs, self.d_caches = self._spec_draft_s(
                self.dparams, self.cur_tok, self.pos, self.d_caches,
                self.act_dev, self.pad_dev, self.temp_dev,
                self.topk_dev, self.topp_dev, s1)
            vin = jnp.concatenate([self.cur_tok, d_toks[:, :k]], axis=1)
            emitted, jdev, self.caches = self._spec_verify_s(
                self.params, vin, self.pos[:, 0], self.caches,
                self.act_dev, self.pad_dev, qprobs, d_toks,
                jnp.asarray(keff, jnp.int32), self.temp_dev,
                self.topk_dev, self.topp_dev, s2)
            em, js = np.asarray(emitted), np.asarray(jdev)
            for s in np.flatnonzero(self.active):
                blocks[s] = [int(t) for t in em[s, :js[s] + 1]]
        else:
            # 2) draft proposals: one batched (k+1)-step scan
            d_toks, self.d_caches = self._spec_draft(
                self.dparams, self.cur_tok, self.pos, self.d_caches,
                self.act_dev, self.pad_dev)
            d = np.asarray(d_toks)[:, :k]                    # (S, k)
            # 3) target verify: one batched width-(k+1) extend
            vin = jnp.concatenate(
                [self.cur_tok, jnp.asarray(d, jnp.int32)], axis=1)
            t_pred, self.caches = self._spec_verify(
                self.params, vin, self.pos[:, 0], self.caches,
                self.act_dev, self.pad_dev)
            tp = np.asarray(t_pred)                          # (S, k+1)
            for s in np.flatnonzero(self.active):
                ke = int(keff[s])
                mism = tp[s, :ke] != d[s, :ke]
                j = int(np.argmax(mism)) if mism.any() else ke
                blocks[s] = [int(t) for t in d[s, :j]] + [int(tp[s, j])]
                js[s] = j
        # 4) per-slot commit + vectorized counter rollback
        n_new = self.n_cache.copy()
        cur = np.asarray(self.cur_tok[:, 0]).copy()
        pos_add = np.zeros(self.S, np.int64)
        for s in np.flatnonzero(self.active):
            j = int(js[s])
            n_new[s] += j + 1
            pos_add[s] = j + 1
            cur[s] = blocks[s][-1]
            self.stats["accepted"] += j
            if int(keff[s]) < k:
                self.stats["clamped"] += 1
        self.stats["iterations"] += 1
        self.caches = self._rollback(self.caches, n_new)
        self.d_caches = self._rollback(self.d_caches, n_new)
        self.n_cache = n_new
        self.cur_tok = jnp.asarray(cur[:, None], jnp.int32)
        self.pos = self.pos + jnp.asarray(pos_add[:, None], jnp.int32)
        # 5) harvest: cap at max_new_tokens, cut past EOS
        for s in np.flatnonzero(self.active):
            req = self.slot_req[s]
            if req is None:
                continue
            out = self.slot_out[s]
            block = blocks[s][:req.max_new_tokens - len(out)]
            if (req.eos_token_id is not None
                    and req.eos_token_id in block):
                block = block[:block.index(req.eos_token_id) + 1]
            out.extend(block)
            if req.on_token is not None:
                for t in block:
                    req.on_token(t)

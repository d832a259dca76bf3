"""Continuous batching: slot-based serving over per-slot KIVI caches.

The reference has NO serving layer — it binds to the HF `generate()`
loop, one static batch per call (SURVEY.md: "It is NOT a serving
framework").  This subsystem is new, TPU-first scope: a fixed pool of
`num_slots` sequence slots, each with its own cache position, admitted
and retired independently while one jitted decode program steps ALL
active slots together every iteration.

Design:
  * The stacked caches carry a SLOT axis where the engine has a batch
    axis; per-slot counters come from `jax.vmap` over the single-request
    MASKED cache update (`decode_append_masked`): divergent per-slot
    window phases make flushes data-dependent, but instead of
    `lax.cond` (which vmap turns into a select over both full-store
    branch outputs — a cache copy per slot per step) the flush is an
    unconditional slice-sized write whose content falls back to the
    store's existing bytes on non-flushing steps.  Inactive slots
    freeze their counters, so retirement needs no tree-wide
    where(active) select either.
  * Admission: a new request is prefilled alone (per-prompt-length
    bucketed jit) and its cache state is written into the free slot via
    tree-wide dynamic_update at the slot index.
  * Retirement: a slot frees when EOS is sampled or max_new_tokens is
    reached; freed slots keep decoding garbage but are masked out of the
    cache append (select keeps the old state) and their tokens dropped.

The KIVI cache makes slots cheap: at 2-bit + fp16 residual window, one
32K-token slot of a 7B model costs ~0.6 GiB instead of ~4 GiB (why the
reference advertises "up to 4x larger batch", README.md:29).
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int
    eos_token_id: Optional[int] = None
    # per-request sampling controls (HF semantics, serving/sampling.py);
    # temperature 0 = greedy.  Applied per SLOT inside the one jitted
    # decode program — mixed greedy/sampled traffic shares one trace.
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    # streaming: called with each generated token id the step it is
    # harvested (first token at admission, then once per decode step) —
    # tokens reach the caller at time-to-first-token latency instead of
    # at retirement.  Engine-level streaming is generate_stream; this is
    # its continuous-batching counterpart.  Exceptions propagate to the
    # step()/run() caller.
    on_token: Optional[Callable[[int], None]] = None
    # per-request prefix: token ids resolved through the batcher's
    # PrefixCache at admission (exact hit / extend of the longest
    # stored prefix / fresh prefill + LRU store).  Overrides the
    # batcher-global `prefix` snapshot; requires `prefix_cache=`.
    prefix_tokens: Optional[List[int]] = None


@dataclasses.dataclass
class Result:
    uid: int
    tokens: List[int]


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    # buckets always end at max_seq_len (see __init__), so a request that
    # passed the admission length check always finds a bucket
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class ContinuousBatcher:
    """Synchronous continuous-batching loop (one host, one program)."""

    def __init__(self, cfg: ModelConfig, qcfg: QuantConfig, params,
                 num_slots: int, max_seq_len: int, impl: str = "jnp",
                 prompt_buckets=(128, 256, 512, 1024, 2048, 4096),
                 prefill_chunk: int = 0, prefix=None, prefix_cache=None):
        self.cfg, self.qcfg, self.params = cfg, qcfg, params
        self.S, self.T = num_slots, max_seq_len
        self.impl = impl
        # the bucket list always tops out at max_seq_len: any prompt that
        # fits the cache finds a bucket (a prompt longer than every
        # configured bucket used to crash _admit mid-run)
        buckets = tuple(b for b in prompt_buckets if b < max_seq_len)
        self.prompt_buckets = buckets + (max_seq_len,)
        # prefill_chunk > 0: admission prefills in fixed chunks through
        # the extend path instead of per-bucket one-shot jits — TWO
        # compilations (empty-cache chunk + interior phase) cover every
        # prompt length, where buckets pay a 20-40 s TPU compile each
        # the first time traffic hits them.  Chunks past the first
        # attend already-quantized history (KIVI-approximate, like
        # decode); pad granularity C beats power-of-two buckets.
        if prefill_chunk and qcfg.quantize_kv:
            from kivi_tpu.serving.engine import phase_period
            L = phase_period(qcfg)
            if prefill_chunk % L:
                prefill_chunk += L - prefill_chunk % L
        self.prefill_chunk = prefill_chunk
        # prefix: an Engine.prefill_prefix PrefixSnapshot SHARED by every
        # request (system-prompt serving).  Admission clones the
        # snapshot's batch-1 caches into the slot and ingests ONLY the
        # request's own tokens: whole prefill_chunk-sized chunks through
        # the extend jit, the ragged tail token-by-token through a
        # single-request decode jit (teacher-forced) — no pads, no
        # per-length compilations, prefix prefill FLOPs paid once per
        # PROCESS instead of once per request.
        self.prefix = prefix
        # prefix_cache: a serving.prefix_cache.PrefixCache over an
        # Engine with THIS batcher's cfg/qcfg/max_seq_len AND cache
        # dtype (snapshots are slice-written into the slot caches) —
        # serves
        # Request.prefix_tokens (multi-tenant system prompts; exact or
        # longest-prefix reuse, LRU under a byte budget).
        self.prefix_cache = prefix_cache

        # slot-axis caches: one single-sequence cache vmapped over slots
        one = lambda: modeling.init_caches(cfg, qcfg, 1, max_seq_len)
        shapes = jax.eval_shape(one)
        self.caches = jax.tree_util.tree_map(
            lambda s: jnp.zeros((num_slots, *s.shape), s.dtype), shapes)

        # host-side slot table
        self.active = np.zeros(num_slots, bool)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_out: List[List[int]] = [[] for _ in range(num_slots)]
        self.queue: deque[Request] = deque()
        self.results: Dict[int, Result] = {}

        # device-side per-slot state (pos = TRUE rope position, i.e. the
        # slot's cache position minus its left-pad)
        self.cur_tok = jnp.zeros((num_slots, 1), jnp.int32)
        self.pos = jnp.zeros((num_slots, 1), jnp.int32)
        self.pad_dev = jnp.zeros((num_slots,), jnp.int32)
        self.act_dev = jnp.zeros((num_slots,), jnp.bool_)
        self.temp_dev = jnp.zeros((num_slots,), jnp.float32)
        self.topk_dev = jnp.zeros((num_slots,), jnp.int32)
        self.topp_dev = jnp.ones((num_slots,), jnp.float32)
        self.pen_dev = jnp.ones((num_slots,), jnp.float32)
        # per-slot token-id mask of the sequence so far (prompt +
        # generated), for the repetition penalty — HF penalizes over the
        # FULL input_ids
        self.seen_dev = jnp.zeros((num_slots, cfg.vocab_size), jnp.bool_)
        self.rng = jax.random.PRNGKey(0)

        self._prefills: Dict[int, Callable] = {}
        self._extend_chunk = self._make_extend_chunk()
        self._first_token = self._make_first_token()
        self._admit_decode = self._make_admit_decode()
        # decode jits keyed by the 512-bucketed live-fill bound: the
        # decode kernels' chunk grids stop at the bound instead of
        # sweeping the whole preallocated cache (~28% of the kernel at
        # serving fills is dead-step dispatch).  At most T/512 compiles
        # per process; the bound only ever grows with the fullest slot.
        self._decode_jits: Dict[int, Callable] = {}
        self.fill = np.zeros(num_slots, np.int64)  # per-slot cache tokens

    # -- jitted bodies ------------------------------------------------------

    def _make_prefill(self, bucket: int):
        cfg, qcfg, impl = self.cfg, self.qcfg, self.impl

        def fn(params, tokens, cache, pad, key, temp, topk, topp, pen):
            # tokens (1, bucket) LEFT-padded by pad (1,) slots: one jit
            # per prompt-length bucket, output token-equal to an
            # unpadded prefill of the bare prompt; the request's
            # sampling controls apply to this first token too.
            from kivi_tpu.serving import sampling
            B, T = tokens.shape
            positions = jnp.maximum(
                jnp.arange(T, dtype=jnp.int32)[None, :] - pad[:, None], 0)
            logits, cache = modeling.forward(
                params, tokens, cache, cfg, qcfg, positions,
                mode="prefill", impl=impl, last_only=True, pad_len=pad)
            seen = sampling.seen_mask_from_prompt(tokens, cfg.vocab_size,
                                                  pad_len=pad)
            lg = sampling.apply_repetition_penalty_per_row(
                logits[:, -1], seen, pen)
            nxt = sampling.sample_step_per_row(lg, key, temp, topk, topp)
            return nxt, cache, seen

        return jax.jit(fn)

    def _make_extend_chunk(self):
        """One chunked-prefill step (engine._extend_fn's shape): the
        chunk position rides in traced for RoPE, prev_len is its static
        canonical phase, pad is the whole prompt's left-pad."""
        cfg, qcfg, impl = self.cfg, self.qcfg, self.impl

        @functools.partial(jax.jit, static_argnames=("prev_len",),
                           donate_argnums=(3,))
        def fn(params, chunk, pos0, cache, pad, *, prev_len):
            B, T1 = chunk.shape
            positions = jnp.broadcast_to(
                pos0 + jnp.arange(T1, dtype=jnp.int32)[None, :],
                (B, T1))
            if pad is not None:
                positions = jnp.maximum(positions - pad[:, None], 0)
            logits, cache = modeling.forward(
                params, chunk, cache, cfg, qcfg, positions,
                mode="extend", impl=impl, last_only=True,
                prev_len=prev_len, pad_len=pad, prev_pos=pos0)
            return logits[:, -1, :], cache

        return fn

    def _make_first_token(self):
        """Sample the admitted request's first token (the tail of
        _make_prefill's fn, split out so the chunk loop stays
        sampling-free).  seen: (1, V) bool penalty mask — computed
        HOST-side from the raw token list, so its jit is shape-stable
        across every prompt/prefix length."""

        @jax.jit
        def fn(logits, seen, key, temp, topk, topp, pen):
            from kivi_tpu.serving import sampling
            lg = sampling.apply_repetition_penalty_per_row(logits, seen,
                                                           pen)
            nxt = sampling.sample_step_per_row(lg, key, temp, topk, topp)
            return nxt

        return fn

    TAIL = 32   # tail-scan block: one dispatch ingests up to 32 tokens

    def _make_admit_decode(self):
        """Teacher-forced decode scan for the ragged tail of a prefix
        admission: ingest up to TAIL right-padded prompt tokens in ONE
        dispatch (a per-token host loop cost one dispatch per token —
        ~20x slower at question-sized tails).  Steps >= n_valid run
        masked (active=False freezes the cache, decode_append_masked),
        so one compilation serves every tail length; the returned
        logits are those of token n_valid-1."""
        cfg, qcfg, impl = self.cfg, self.qcfg, self.impl
        TAIL = self.TAIL

        @functools.partial(jax.jit, donate_argnums=(3,))
        def fn(params, toks, pos0, cache, n_valid):
            def body(carry, xs):
                cache, best = carry
                tok, i = xs
                logits, cache = modeling.forward(
                    params, tok[None, None], cache, cfg, qcfg,
                    (pos0 + i)[None, None], mode="decode", impl=impl,
                    last_only=True, active=i < n_valid)
                best = jnp.where(i == n_valid - 1,
                                 logits[:, -1].astype(jnp.float32), best)
                return (cache, best), None

            init = (cache, jnp.zeros((1, cfg.vocab_size), jnp.float32))
            (cache, best), _ = jax.lax.scan(
                body, init, (toks[0], jnp.arange(TAIL, dtype=jnp.int32)))
            return best, cache

        return fn

    def _decode_for(self, fb: int) -> Callable:
        jit = self._decode_jits.get(fb)
        if jit is None:
            jit = jax.jit(functools.partial(
                self._decode_all, cfg=self.cfg, qcfg=self.qcfg,
                impl=self.impl, fill_bound=fb), donate_argnums=(3,))
            self._decode_jits[fb] = jit
        return jit

    @staticmethod
    def _decode_all(params, tok, pos, caches, active, pads, rng, temps,
                    topks, topps, pens, seen, *, cfg, qcfg, impl,
                    fill_bound=None):
        """One decode step for all slots. tok/pos (S,1); active/pads/
        sampling params (S,); seen (S, V) penalty masks; rng one key
        (split per slot inside)."""
        from kivi_tpu.serving import sampling

        S = tok.shape[0]
        keys = jax.random.split(rng, S)

        def one(tok1, pos1, cache1, act1, pad1, key1, t1, k1, p1, pen1,
                seen1):
            # masked-append decode: flushes are slice-sized selected
            # writes (cache/kivi_cache.decode_append_masked) and
            # inactive slots freeze their counters, so neither the
            # flush cond nor an activity select ever copies a full
            # store — per-step cache traffic stays O(window) per slot.
            logits, cache = modeling.forward(
                params, tok1[None], cache1, cfg, qcfg, pos1[None],
                mode="decode", impl=impl, pad_len=pad1[None],
                active=act1, fill_bound=fill_bound)
            # the consumed token joins the sequence before the penalty
            # (engine/HF ordering)
            seen1 = seen1.at[tok1[0]].set(True)
            lg = sampling.apply_repetition_penalty_per_row(
                logits[:, -1], seen1[None], pen1[None])
            nxt = sampling.sample_step_per_row(
                lg, key1, t1[None], k1[None], p1[None])[0]
            return nxt, cache, seen1

        nxt, caches, seen = jax.vmap(one)(
            tok, pos, caches, active, pads, keys, temps, topks, topps,
            pens, seen)
        return nxt, caches, seen

    # -- host-side loop -----------------------------------------------------

    def submit(self, req: Request):
        if req.prefix_tokens is not None and not req.prefix_tokens:
            req = dataclasses.replace(req, prefix_tokens=None)
        if req.prefix_tokens is not None and self.prefix_cache is None:
            raise ValueError(
                "Request.prefix_tokens needs ContinuousBatcher("
                "prefix_cache=PrefixCache(...))")
        self.queue.append(req)

    def cancel(self, uid: int) -> bool:
        """Stop a request: drop it from the queue, or free its slot if
        it is mid-decode (the slot's cache slots are simply reused by
        the next admission).  Records an empty/partial Result so run()
        still terminates.  Returns True if the uid was found live.
        The serving API calls this when a streaming client disconnects
        — without it an orphaned request decodes to max_new_tokens on
        device time other requests could use."""
        for i, req in enumerate(self.queue):
            if req.uid == uid:
                del self.queue[i]
                self.results[uid] = Result(uid, [])
                return True
        for s in range(self.S):
            req = self.slot_req[s]
            if req is not None and req.uid == uid:
                self.results[uid] = Result(uid, self.slot_out[s])
                self.active[s] = False
                self.act_dev = self.act_dev.at[s].set(False)
                self.slot_req[s] = None
                self.slot_out[s] = []
                return True
        return False

    def _bucket_for(self, n: int) -> Optional[int]:
        """Padded prompt length for an n-token prompt: next multiple of
        prefill_chunk in chunked mode, else the configured bucket; None
        if it cannot fit the cache."""
        if n > self.T:
            return None
        if self.prefill_chunk:
            C = self.prefill_chunk
            b = ((n + C - 1) // C) * C
            return b if b <= self.T else None
        return _bucket(n, self.prompt_buckets)

    def _host_seen(self, token_lists) -> jnp.ndarray:
        """(1, V) bool repetition-penalty mask over raw token lists —
        host-side so no jit depends on the prompt length."""
        seen = np.zeros((1, self.cfg.vocab_size), bool)
        for toks in token_lists:
            seen[0, np.asarray(toks, np.int64)] = True
        return jnp.asarray(seen)

    def _admit(self):
        from kivi_tpu.serving.engine import canonical_phase

        while self.queue and not self.active.all():
            req = self.queue[0]
            # capacity check BEFORE any prefix work: the prefix length
            # equals its token count, so an oversized request is
            # rejected without paying its prefix prefill (or letting a
            # too-long prefix crash the engine and 503 the server)
            has_prefix = (req.prefix_tokens is not None
                          or self.prefix is not None)
            P = (len(req.prefix_tokens) if req.prefix_tokens is not None
                 else self.prefix.length if self.prefix is not None
                 else 0)
            # cache usage is P + bucket + max_new (pad slots occupy
            # cache positions), so admission checks the BUCKETED length.
            # Empty prompts are rejected in every mode (the first token
            # samples from prefill logits, which need >= 1 real token;
            # the chunked path used to crash on them).
            bucket = ((len(req.prompt) or None) if has_prefix
                      else self._bucket_for(len(req.prompt)))
            if (not req.prompt or bucket is None
                    or P + bucket + req.max_new_tokens > self.T):
                self.queue.popleft()
                self.results[req.uid] = Result(req.uid, [])  # rejected
                continue
            # per-request prefix (through the prefix_cache manager)
            # overrides the batcher-global shared prefix
            prefix = (self.prefix_cache.get(req.prefix_tokens)
                      if req.prefix_tokens is not None else self.prefix)
            slot = int(np.argmin(self.active))
            req = self.queue.popleft()
            prompt = list(req.prompt)
            self.rng, sub = jax.random.split(self.rng)
            temp = jnp.asarray([req.temperature], jnp.float32)
            topk = jnp.asarray([req.top_k], jnp.int32)
            topp = jnp.asarray([req.top_p], jnp.float32)
            pen = jnp.asarray([req.repetition_penalty], jnp.float32)
            if prefix is not None:
                # shared-prefix admission: clone the snapshot, ingest
                # ONLY this request's tokens — whole prefill_chunk
                # chunks through the extend jit, the ragged tail
                # token-by-token (teacher-forced) through the admit
                # decode jit.  No pads anywhere, no per-length compiles.
                pad = 0
                cache1 = jax.tree_util.tree_map(
                    lambda x: x.copy(), prefix.caches)
                toks = jnp.asarray([prompt], jnp.int32)
                C = self.prefill_chunk
                i, logits = 0, None
                while C and len(prompt) - i >= C:
                    logits, cache1 = self._extend_chunk(
                        self.params, toks[:, i:i + C],
                        jnp.full((), P + i, jnp.int32), cache1, None,
                        prev_len=canonical_phase(self.qcfg, P + i))
                    i += C
                while i < len(prompt):
                    n = min(len(prompt) - i, self.TAIL)
                    blk = jnp.zeros((1, self.TAIL), jnp.int32)
                    blk = blk.at[:, :n].set(toks[:, i:i + n])
                    logits, cache1 = self._admit_decode(
                        self.params, blk, jnp.full((), P + i, jnp.int32),
                        cache1, jnp.int32(n))
                    i += n
                seen0 = self._host_seen(
                    [np.asarray(prefix.tokens[0]), prompt])
                nxt = self._first_token(logits, seen0, sub, temp, topk,
                                        topp, pen)
            else:
                # Prompts are LEFT-padded to the bucket and the pad
                # count is carried as an attention lower bound through
                # every forward (modeling.forward pad_len), so a
                # batched request's output is token-equal to the same
                # prompt through the engine API — the reference's
                # attention_mask plumbing (`models/llama_kivi.py:
                # 710-717`), reduced to a per-row bound because pad
                # sits at positions [0, pad).
                pad = bucket - len(prompt)
                padded = [0] * pad + prompt
                cache1 = jax.tree_util.tree_map(
                    lambda a: jnp.zeros(a.shape[1:], a.dtype),
                    self.caches)
                toks = jnp.asarray([padded], jnp.int32)
                padv = jnp.asarray([pad], jnp.int32)
                if self.prefill_chunk:
                    C = self.prefill_chunk
                    logits = None
                    for t0 in range(0, bucket, C):
                        logits, cache1 = self._extend_chunk(
                            self.params, toks[:, t0:t0 + C],
                            jnp.full((), t0, jnp.int32), cache1, padv,
                            prev_len=canonical_phase(self.qcfg, t0))
                    seen0 = self._host_seen([prompt])
                    nxt = self._first_token(logits, seen0, sub, temp,
                                            topk, topp, pen)
                else:
                    if bucket not in self._prefills:
                        self._prefills[bucket] = self._make_prefill(bucket)
                    nxt, cache1, seen0 = self._prefills[bucket](
                        self.params, toks, cache1, padv, sub, temp,
                        topk, topp, pen)
            # write slot state
            self.caches = jax.tree_util.tree_map(
                lambda big, one: jax.lax.dynamic_update_index_in_dim(
                    big, one, slot, 0), self.caches, cache1)
            self.cur_tok = self.cur_tok.at[slot, 0].set(nxt[0])
            # rope position of the first generated token = true length
            self.pos = self.pos.at[slot, 0].set(P + len(prompt))
            self.pad_dev = self.pad_dev.at[slot].set(pad)
            self.act_dev = self.act_dev.at[slot].set(True)
            self.temp_dev = self.temp_dev.at[slot].set(req.temperature)
            self.topk_dev = self.topk_dev.at[slot].set(req.top_k)
            self.topp_dev = self.topp_dev.at[slot].set(req.top_p)
            self.pen_dev = self.pen_dev.at[slot].set(
                req.repetition_penalty)
            self.seen_dev = self.seen_dev.at[slot].set(seen0[0])
            self.active[slot] = True
            self.slot_req[slot] = req
            self.slot_out[slot] = [int(nxt[0])]
            # committed cache tokens (pads included): prefix admissions
            # ingest P + prompt unpadded, bucketed ones the full bucket
            self.fill[slot] = (P + len(prompt) if prefix is not None
                               else bucket)
            if req.on_token is not None:
                req.on_token(self.slot_out[slot][0])

    def _retire(self):
        for s in range(self.S):
            req = self.slot_req[s]
            if req is None:
                continue
            out = self.slot_out[s]
            done = len(out) >= req.max_new_tokens or (
                req.eos_token_id is not None and out
                and out[-1] == req.eos_token_id)
            if done:
                self.results[req.uid] = Result(req.uid, out)
                self.active[s] = False
                self.act_dev = self.act_dev.at[s].set(False)
                self.slot_req[s] = None
                self.slot_out[s] = []

    def step(self):
        """Admit pending requests, run one decode step, harvest tokens."""
        self._retire()
        self._admit()
        if not self.active.any():
            return
        self.rng, sub = jax.random.split(self.rng)
        # live-fill bound: this step appends one token per active slot.
        # INVARIANT: fb covers ACTIVE slots only — a retired slot's
        # cache counters may exceed it, violating the wide kernel's
        # t_bound contract for that slot (silent attention truncation).
        # That is safe ONLY because inactive slots' sampled tokens are
        # masked and their cache writes act-gated; their attention
        # outputs must never be consumed.  Do not start reading them.
        fb = int(min(-((int(self.fill[self.active].max()) + 1) // -512)
                     * 512, self.T))
        if __debug__:
            assert all(self.fill[s] + 1 <= fb or not self.active[s]
                       for s in range(self.S))
        nxt, self.caches, self.seen_dev = self._decode_for(fb)(
            self.params, self.cur_tok, self.pos, self.caches, self.act_dev,
            self.pad_dev, sub, self.temp_dev, self.topk_dev, self.topp_dev,
            self.pen_dev, self.seen_dev)
        nxt_host = np.asarray(nxt)
        self.cur_tok = nxt[:, None]
        self.pos = self.pos + self.act_dev.astype(jnp.int32)[:, None]
        self.fill[self.active] += 1
        for s in range(self.S):
            if self.active[s] and self.slot_req[s] is not None:
                tok = int(nxt_host[s])
                self.slot_out[s].append(tok)
                req = self.slot_req[s]
                if req.on_token is not None:
                    req.on_token(tok)

    def run(self, requests: List[Request]) -> Dict[int, Result]:
        """Drive until every submitted request completes."""
        for r in requests:
            self.submit(r)
        while self.queue or self.active.any():
            self.step()
        self._retire()
        return self.results

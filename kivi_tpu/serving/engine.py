"""Generation engine: prefill + decode over the static KIVI cache.

Replaces the reference's reliance on the HF `generate()` loop +
`prepare_inputs_for_generation` cache plumbing
(`/root/reference/models/llama_kivi.py:908-948`).  TPU-first design:
  * prefill and a single decode step are each ONE jitted program with
    static shapes (prompt length buckets; cache length fixed at init);
  * multi-token decode runs as `lax.scan` INSIDE jit (`decode_steps`) so
    token generation never round-trips to the host — essential here since
    a host hop costs ~0.2-30 ms through the device tunnel;
  * greedy + temperature/top-k sampling.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling


def canonical_phase(qcfg: QuantConfig, prompt_len: int) -> int:
    """Canonicalize a static token count to its quantization phase:
    flush schedules and prefill_extend's split arithmetic depend only
    on prompt_len mod lcm(W, v_flush) (plus the <= W edge), so callers
    at a later position with the same phase reuse the compilation
    instead of recompiling per call site."""
    if not qcfg.quantize_kv:
        return 0                    # only gates flush/split scheduling
    if prompt_len > 0:
        W, vf = qcfg.residual_length, qcfg.value_flush
        L = W * vf // math.gcd(W, vf)
        if prompt_len > W + L:
            prompt_len = W + 1 + (prompt_len - W - 1) % L
    return prompt_len


def nkq_prefill(T: int, W: int) -> int:
    """Quantized-key count in prefill/extend-canonical state (keys are
    block-flushed: every full W-window is in the store)."""
    return (T // W) * W


def nvq_canonical(T: int, W: int, vf: int) -> int:
    """Quantized-value count at T tokens — same formula in prefill,
    extend and decode canonical states (V flushes vf-granules once the
    window has filled past W)."""
    return 0 if T <= W else ((T - W + vf - 1) // vf) * vf


def phase_period(qcfg: QuantConfig) -> int:
    """lcm(W, v_flush): chunk sizes that are a multiple of this keep
    every interior chunk of a chunked prefill on one phase."""
    W, vf = qcfg.residual_length, qcfg.value_flush
    return W * vf // math.gcd(W, vf)


@dataclasses.dataclass
class PrefixSnapshot:
    """A prefilled shared prompt prefix: batch-1 per-layer caches plus
    the prefix token ids (kept for the repetition-penalty seen-mask).
    Produced by `Engine.prefill_prefix`, consumed by
    `Engine.generate(..., prefix=)`.  The KIVI stores make the snapshot
    4-8x smaller in HBM than an fp16 prefix, which is what makes
    holding many cached prefixes viable."""

    caches: list
    tokens: jax.Array            # (1, T0) i32

    @property
    def length(self) -> int:
        return self.tokens.shape[1]


def save_prefix_snapshot(path: str, snap: "PrefixSnapshot") -> None:
    """Persist a PrefixSnapshot (orbax) so a cached system prompt
    survives process restarts and can be shared across serving
    replicas — at 2-bit the on-disk prefix is 4-8x smaller than fp16
    K/V.  Layout: <path>/meta.json (layer count + field names) and
    <path>/state (orbax tree of tokens + per-layer field dicts).  The
    reference has no cache persistence at all (its KV state dies with
    the `generate()` call)."""
    import json
    import os

    import orbax.checkpoint as ocp

    layers = [{f.name: getattr(c, f.name)
               for f in dataclasses.fields(c)} for c in snap.caches]
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"num_layers": len(layers),
                   "fields": sorted(layers[0].keys())}, f)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "state"),
               {"tokens": snap.tokens,
                "layers": {str(i): d for i, d in enumerate(layers)}})
    ckptr.wait_until_finished()


def load_prefix_snapshot(path: str) -> "PrefixSnapshot":
    """Restore a snapshot written by save_prefix_snapshot.  The caller
    is responsible for loading it into an Engine with the same cfg,
    qcfg, cache dtype and max_seq_len it was built with (shape/dtype
    mismatches surface on first use)."""
    import json
    import os

    import orbax.checkpoint as ocp

    from kivi_tpu.cache.fp_cache import FpLayerCache
    from kivi_tpu.cache.kivi_cache import KiviLayerCache

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(os.path.abspath(path), "state"))
    caches = []
    for i in range(meta["num_layers"]):
        d = state["layers"][str(i)]
        cls = KiviLayerCache if "k_codes" in d else FpLayerCache
        caches.append(cls(**{k: jnp.asarray(v) for k, v in d.items()}))
    return PrefixSnapshot(caches=caches,
                          tokens=jnp.asarray(state["tokens"]))


@dataclasses.dataclass
class Engine:
    cfg: ModelConfig
    qcfg: QuantConfig
    params: dict
    max_seq_len: int
    batch_size: int
    impl: str = "jnp"  # attention impl for the quantized path: jnp|pallas
    debug: bool = False  # checkify float guards on every entry point
    cache_dtype = jnp.bfloat16

    def __post_init__(self):
        # Cache buffers are donated: at bench batch sizes the stacked KV
        # cache is most of HBM, and without aliasing every step would
        # hold input+output copies.  debug=True swaps jit for
        # checkify-instrumented jit (utils/guards.py): NaN/Inf anywhere
        # in the traced program raises at the call site.
        if self.debug:
            import functools as _ft

            from jax.experimental import checkify as _ckf

            from kivi_tpu.utils.guards import checked_jit
            # float-check instrumentation of Pallas kernel BODIES fails
            # Mosaic lowering on the current TPU toolchain (see
            # guards.checked_jit): with pallas kernels on a real TPU,
            # debug mode keeps the user-check contracts (t_bound guard)
            # and drops float checks — run impl="jnp" (the oracle path,
            # same math) to chase NaNs with full float checks there.
            errors = (_ckf.user_checks
                      if (self.impl == "pallas"
                          and jax.default_backend() == "tpu") else None)
            _jit = _ft.partial(checked_jit, errors=errors)
        else:
            _jit = jax.jit
        self._prefill = _jit(
            functools.partial(self._prefill_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            donate_argnums=(2,))
        self._prefill_sp = {}   # (mesh, axis) -> jitted seq-par prefill
        self._decode = _jit(
            functools.partial(self._decode_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            donate_argnums=(3,))
        self._extend = _jit(
            functools.partial(self._extend_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            static_argnames=("prev_len",), donate_argnums=(3,))
        self._decode_scan_jit = _jit(
            functools.partial(self._decode_scan_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            static_argnames=("steps", "temperature", "prompt_len",
                             "top_k", "top_p", "repetition_penalty",
                             "fill_bound"),
            donate_argnums=(3,))
        self._beam_scan = _jit(
            functools.partial(self._beam_scan_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            static_argnames=("steps", "num_beams", "eos_token_id",
                             "prompt_len"),
            donate_argnums=(3,))

    def _decode_scan(self, params, first_token, first_pos, caches, rng,
                     pad=None, *, steps: int, temperature: float = 0.0,
                     prompt_len: int = 0, top_k: int = 0,
                     top_p: float = 1.0, repetition_penalty: float = 1.0,
                     seen=None, forced=None, n_forced=None):
        """_decode_scan_fn with the static prompt_len canonicalized: the
        flush schedule depends only on prompt_len mod lcm(W, v_flush)
        (plus the prompt_len <= W edge), so resuming decode at a later
        position with the same phase reuses the compilation instead of
        recompiling per call site.

        The TRUE prompt_len also caps the cache fill over the whole
        scan at prompt_len + steps — passed (rounded up to 512 so the
        compile key stays coarse) as the decode kernels' static grid
        bound: at serving fills the chunk sweep over the empty cache
        tail is ~28% of the kernel."""
        fb = -((prompt_len + steps) // -512) * 512
        prompt_len = self._canonical_phase(prompt_len)
        return self._decode_scan_jit(params, first_token, first_pos,
                                     caches, rng, pad, seen,
                                     forced, n_forced, steps=steps,
                                     temperature=temperature,
                                     prompt_len=prompt_len, top_k=top_k,
                                     top_p=top_p,
                                     repetition_penalty=repetition_penalty,
                                     fill_bound=fb)

    def _canonical_phase(self, prompt_len: int) -> int:
        return canonical_phase(self.qcfg, prompt_len)

    def _extend_call(self, params, tokens, caches, prev_len: int,
                     pad=None):
        """_extend with prev_len canonicalized (see _canonical_phase):
        the TRUE prev_len rides in as a traced scalar for RoPE
        positions, so chunked prefill compiles once per phase, not once
        per absolute position."""
        pos0 = jnp.full((), prev_len, jnp.int32)
        return self._extend(params, tokens, pos0, caches, pad,
                            prev_len=self._canonical_phase(prev_len))

    # -- jitted bodies ----------------------------------------------------

    @staticmethod
    def _prefill_fn(params, tokens, caches, pad=None, *, cfg, qcfg, impl,
                    seq_mesh=None, last_index=None):
        """tokens (B, T) LEFT-padded by pad (B,) slots per row (None =
        unpadded, zero masking overhead); RoPE positions are true token
        indices (i - pad, clamped at 0), the HF position_ids convention
        for left-padded generation.  seq_mesh: (Mesh, axis[, perm])
        routes prefill attention through the sequence-parallel ring;
        under a striped layout slot s holds token perm[s] (RoPE uses
        the true index) and last_index is the true-last-token slot."""
        B, T = tokens.shape
        truepos = (jnp.asarray(seq_mesh[2], jnp.int32)
                   if seq_mesh is not None and len(seq_mesh) > 2
                   else jnp.arange(T, dtype=jnp.int32))
        if pad is None:
            positions = jnp.broadcast_to(truepos, (B, T))
        else:
            positions = jnp.maximum(truepos[None, :] - pad[:, None], 0)
        logits, caches = modeling.forward(
            params, tokens, caches, cfg, qcfg, positions,
            mode="prefill", impl=impl, last_only=True, pad_len=pad,
            seq_mesh=seq_mesh, last_index=last_index)
        return logits[:, -1, :], caches

    @staticmethod
    def _extend_fn(params, tokens, pos0, caches, pad=None, *, prev_len,
                   cfg, qcfg, impl):
        """Chunked-prefill step: tokens (B, T1) continue a cache that
        already holds pos0 (traced scalar — the TRUE count, for RoPE)
        tokens; prev_len is its STATIC canonical phase and only gates
        prefill_extend's split arithmetic (see _extend_call).  pad (B,)
        is the whole prompt's left-pad: RoPE positions subtract it
        (clamped at 0) and attention front-masks cache slots [0, pad)."""
        B, T1 = tokens.shape
        positions = jnp.broadcast_to(
            pos0 + jnp.arange(T1, dtype=jnp.int32), (B, T1))
        if pad is not None:
            positions = jnp.maximum(positions - pad[:, None], 0)
        logits, caches = modeling.forward(
            params, tokens, caches, cfg, qcfg, positions, mode="extend",
            impl=impl, last_only=True, prev_len=prev_len, pad_len=pad,
            prev_pos=pos0)
        return logits[:, -1, :], caches

    @staticmethod
    def _decode_fn(params, token, pos, caches, pad=None, *, cfg, qcfg,
                   impl):
        """token (B, 1) i32; pos (B, 1) i32 ROPE position of `token`
        (true index: cache position minus pad)."""
        logits, caches = modeling.forward(
            params, token, caches, cfg, qcfg, pos, mode="decode",
            impl=impl, pad_len=pad)
        return logits[:, -1, :], caches

    @staticmethod
    def _flush_schedule(qcfg, prompt_len: int, steps: int):
        """Compile-time flush schedule: for a known prompt length, the
        exact decode steps at which the K / V windows fill are
        deterministic (mirrors prefill_ingest's split arithmetic).
        Returns {step_index: (flush_k, flush_v)}."""
        W, vf = qcfg.residual_length, qcfg.value_flush
        T = prompt_len
        nkq0 = nkq_prefill(T, W)
        nvq0 = nvq_canonical(T, W, vf)
        i_k0 = W - (T - nkq0)
        i_v0 = W - (T - nvq0)
        events = {}
        for i in range(steps):
            fk = i >= i_k0 and (i - i_k0) % W == 0
            fv = i >= i_v0 and (i - i_v0) % vf == 0
            if fk or fv:
                events[i] = (fk, fv)
        return events

    @staticmethod
    def _decode_scan_fn(params, first_token, first_pos, caches, rng,
                        pad=None, seen=None, forced=None, n_forced=None,
                        *, cfg, qcfg, impl, steps: int,
                        temperature: float = 0.0, prompt_len: int = 0,
                        top_k: int = 0, top_p: float = 1.0,
                        repetition_penalty: float = 1.0,
                        fill_bound=None):
        """Generate `steps` tokens fully on-device.

        With a known prompt_len and a KIVI cache, window flushes run
        UNCONDITIONALLY at their statically-known steps and the scanned
        step body carries no flush conds at all (the per-step lax.cond
        machinery on full-cache operands cost ~19 ms/step at bench
        scale).  Returns (tokens (B, steps) i32, caches).

        seen: (B, V) bool token-id mask of the prompt (None disables the
        repetition penalty) — HF penalizes the FULL sequence so far.

        forced/n_forced: teacher-forcing for ragged prefix suffixes —
        forced (B, >= steps+1) i32, n_forced (B,) i32: row b FEEDS
        forced[b, j] at scan step j while j < n_forced[b] and its own
        sample after (the emitted stream is always the SAMPLED
        candidate, realigned per row by generate()).  Rows in teacher
        mode still append to the cache every step, so counters stay
        uniform across the batch and the scan stays one compilation.
        Teacher tokens enter the repetition-penalty seen-mask exactly
        like consumed prompt tokens (HF ordering).
        """
        from kivi_tpu.serving import sampling

        static_flush = prompt_len > 0 and qcfg.quantize_kv
        use_pen = repetition_penalty != 1.0 and seen is not None
        if not use_pen:
            seen = None
        teach = forced is not None

        def body(carry, _):
            token, pos, caches, rng, seen = carry
            logits, caches = modeling.forward(
                params, token, caches, cfg, qcfg, pos,
                mode="decode", impl=impl, flush=not static_flush,
                pad_len=pad, fill_bound=fill_bound)
            logits = logits[:, -1, :]
            if use_pen:
                seen = sampling.update_seen(seen, token[:, 0])
                logits = sampling.apply_repetition_penalty(
                    logits, seen, repetition_penalty)
            if temperature > 0:
                rng, sub = jax.random.split(rng)
            else:
                sub = rng   # unused by greedy sample_step
            nxt = sampling.sample_step(logits, sub, temperature=temperature,
                                       top_k=top_k, top_p=top_p)
            fed = nxt
            if teach:
                # scan step index from the (uniform — teacher mode
                # forbids pads) position counter; feed forced[:, j+1]
                # while the row still has prompt tokens left
                j = pos[0, 0] - first_pos[0, 0]
                ft = jax.lax.dynamic_slice_in_dim(forced, j + 1, 1,
                                                  axis=1)[:, 0]
                fed = jnp.where(j + 1 < n_forced, ft, nxt)
            return (fed[:, None], pos + 1, caches, rng, seen), nxt

        carry = (first_token, first_pos, caches, rng, seen)
        if not static_flush:
            carry, toks = jax.lax.scan(body, carry, None, length=steps)
            return jnp.swapaxes(toks, 0, 1), carry[2]

        events = Engine._flush_schedule(qcfg, prompt_len, steps)
        tok_segs = []
        done = 0
        boundaries = sorted(events) + [steps]
        for b in boundaries:
            seg = b - done
            if seg > 0:
                carry, toks = jax.lax.scan(body, carry, None, length=seg)
                tok_segs.append(jnp.swapaxes(toks, 0, 1))
                done = b
            if b in events:
                fk, fv = events[b]
                token, pos, caches, rng, seen = carry
                caches = modeling.flush_caches(caches, qcfg, impl,
                                               k=fk, v=fv)
                carry = (token, pos, caches, rng, seen)
        return jnp.concatenate(tok_segs, axis=1), carry[2]

    @staticmethod
    def _beam_scan_fn(params, first_logits, first_pos, caches, pad=None,
                      *, cfg, qcfg, impl, steps: int, num_beams: int,
                      eos_token_id: int, prompt_len: int = 0):
        """Beam-search decode: `steps` tokens fully on-device.

        first_logits (B*nb, V) from prefill of the nb-tiled prompts.
        Returns (tokens (B, nb, steps) i32 — already re-ordered so row j
        is beam j's full history, scores (B, nb) raw logprob sums,
        lengths (B, nb) tokens before EOS, caches).  The reference gets
        beam search from HF generate + `_reorder_cache`
        (`/root/reference/models/llama_kivi.py:950-957`).
        """
        from kivi_tpu.cache import kivi_cache as KC

        nb = num_beams
        B = first_logits.shape[0] // nb
        V = first_logits.shape[-1]
        NEG = jnp.float32(-1e9)
        static_flush = prompt_len > 0 and qcfg.quantize_kv

        def advance(logits, state):
            """One beam step from logits (B*nb, V)."""
            scores, alive, lengths, out, s = state
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            # finished beams may only emit EOS, at no cost
            eos_only = jnp.full((V,), NEG).at[eos_token_id].set(0.0)
            logp = jnp.where(alive.reshape(B * nb, 1), logp, eos_only)
            total = scores.reshape(B, nb, 1) + logp.reshape(B, nb, V)
            top, flat = jax.lax.top_k(total.reshape(B, nb * V), nb)
            parent = flat // V                               # (B, nb)
            token = (flat % V).astype(jnp.int32)
            gather = lambda x: jnp.take_along_axis(x, parent, axis=1)
            alive = jnp.logical_and(gather(alive),
                                    token != eos_token_id)
            lengths = gather(lengths) + alive.astype(jnp.int32)
            out = jnp.take_along_axis(
                out, parent[:, :, None], axis=1)
            out = jax.lax.dynamic_update_slice(
                out, token[:, :, None], (0, 0, s))
            flat_parent = (jnp.arange(B)[:, None] * nb + parent).reshape(-1)
            return (top, alive, lengths, out, s + 1), token, flat_parent

        def body(carry, _):
            token, pos, caches, state = carry
            # pad needs no reorder: beams of one request share its pad
            # and parent selection never crosses requests
            logits, caches = modeling.forward(
                params, token, caches, cfg, qcfg, pos,
                mode="decode", impl=impl, flush=not static_flush,
                pad_len=pad)
            state, nxt, flat_parent = advance(logits[:, -1, :], state)
            caches = [KC.reorder(c, flat_parent) for c in caches]
            return (nxt.reshape(B * nb, 1), pos + 1, caches, state), None

        out0 = jnp.zeros((B, nb, steps), jnp.int32)
        scores0 = jnp.tile(jnp.concatenate(
            [jnp.zeros((1,)), jnp.full((nb - 1,), NEG)]), (B, 1))
        state = (scores0.astype(jnp.float32),
                 jnp.ones((B, nb), bool), jnp.zeros((B, nb), jnp.int32),
                 out0, 0)
        # step 0 consumes the prefill logits (outside the scan: its state
        # update has static index s=0)
        state, tok0, flat_parent = advance(first_logits, state)
        caches = [KC.reorder(c, flat_parent) for c in caches]
        carry = (tok0.reshape(B * nb, 1), first_pos, caches, state)

        def run(carry, n):
            if n <= 0:
                return carry
            # state's step counter must be traced inside scan: lift it
            token, pos, caches, (sc, al, ln, out, s) = carry
            def sbody(c, _):
                token, pos, caches, state = c
                (c2, _) = body((token, pos, caches, state), None)
                return c2, None
            carry = ((token, pos, caches,
                      (sc, al, ln, out, jnp.asarray(s, jnp.int32))))
            carry, _ = jax.lax.scan(sbody, carry, None, length=n)
            return carry

        # steps-1 decode forwards remain (token 0 came from the prefill
        # logits); flush events index those forwards exactly as in
        # _decode_scan_fn
        n_body = steps - 1
        if not static_flush:
            carry = run(carry, n_body)
        else:
            events = Engine._flush_schedule(qcfg, prompt_len, n_body)
            done = 0
            boundaries = sorted(events) + [n_body]
            for b in boundaries:
                carry = run(carry, b - done)
                done = b
                if b in events:
                    fk, fv = events[b]
                    token, pos, caches, state = carry
                    caches = modeling.flush_caches(caches, qcfg, impl,
                                                   k=fk, v=fv)
                    carry = (token, pos, caches, state)
        token, pos, caches, (scores, alive, lengths, out, _) = carry
        return out, scores, lengths, caches

    # -- public API --------------------------------------------------------

    def init_caches(self):
        return modeling.init_caches(self.cfg, self.qcfg, self.batch_size,
                                    self.max_seq_len, self.cache_dtype)

    def prefill_seqpar(self, tokens: jax.Array, mesh, axis: str = "data",
                       caches=None, pad_lens=None, striped: bool = False):
        """One-shot prefill with the TOKEN axis sharded over a mesh
        axis: attention runs as a ring over ICI (parallel/ring.py), so
        an n-chip slice splits the O(T²) prompt FLOPs n ways — the
        sequence-parallel long-context path SURVEY.md §5.7 marks as the
        TPU-native stretch over the reference's single-GPU flash
        prefill.  tokens (B, T) with T % mesh.shape[axis] == 0; K/V are
        gathered per layer before cache ingest (O(T) bytes).  Returns
        (last-token logits (B, V), caches), same contract as prefill.

        striped: lay the tokens out in the zigzag order (ring.py
        `zigzag_perm`, needs T % 2n == 0) so every device does ~equal
        causal work instead of device i doing i+1 ring steps — ~2x
        wall-clock on large rings.  The permutation is internal: caches
        and logits come back in true token order.
        """
        n = mesh.shape[axis]
        B, T = tokens.shape
        if T % n:
            raise ValueError(f"prompt length {T} not divisible by the "
                             f"{n}-device '{axis}' mesh axis")
        tokens = jnp.asarray(tokens, jnp.int32)
        seq_mesh, last_index = (mesh, axis), None
        if striped:
            from kivi_tpu.parallel.ring import zigzag_perm
            perm, inv = zigzag_perm(T, n)
            tokens = tokens[:, perm]
            seq_mesh = (mesh, axis, perm)
            last_index = int(inv[T - 1])
        key = (mesh, axis, T if striped else None)
        if key not in self._prefill_sp:
            self._prefill_sp[key] = jax.jit(
                functools.partial(self._prefill_fn, cfg=self.cfg,
                                  qcfg=self.qcfg, impl=self.impl,
                                  seq_mesh=seq_mesh,
                                  last_index=last_index),
                donate_argnums=(2,))
        from jax.sharding import NamedSharding, PartitionSpec as P
        tokens = jax.device_put(tokens, NamedSharding(mesh, P(None, axis)))
        if caches is None:
            caches = modeling.init_caches(self.cfg, self.qcfg, B,
                                          self.max_seq_len,
                                          self.cache_dtype)
        pad = (None if pad_lens is None
               else jnp.asarray(pad_lens, jnp.int32).reshape(B))
        return self._prefill_sp[key](self.params, tokens, caches, pad)

    def prefill_prefix(self, tokens: jax.Array,
                       chunk_size: Optional[int] = None,
                       seq_mesh=None) -> PrefixSnapshot:
        """Prefill a shared prompt prefix ONCE at batch 1 and snapshot
        the resulting caches.  tokens: (T0,) or (1, T0).  The snapshot
        plugs into `generate(..., prefix=)`, which broadcasts it across
        the batch and prefills only each request's suffix — the prefill
        FLOPs and HBM for the shared prefix are paid once per prefix,
        not once per request.  Chain `extend()` for multi-turn reuse.
        chunk_size: prefill through `prefill_chunked` (bounded memory +
        one compile for all prefix lengths; KIVI-approximate past the
        first chunk).  seq_mesh: (Mesh, axis) — prefill the prefix
        sequence-parallel over the mesh axis (`prefill_seqpar`: ring
        attention splits the long prefix's O(T²) over the slice; the
        exact-attention accuracy class, unlike chunking)."""
        tokens = jnp.asarray(tokens, jnp.int32).reshape(1, -1)
        caches = modeling.init_caches(self.cfg, self.qcfg, 1,
                                      self.max_seq_len, self.cache_dtype)
        if seq_mesh is not None:
            _, caches = self.prefill_seqpar(tokens, seq_mesh[0],
                                            seq_mesh[1], caches=caches)
        elif chunk_size is not None:
            _, caches = self.prefill_chunked(tokens, chunk_size,
                                             caches=caches)
        else:
            _, caches = self._prefill(self.params, tokens, caches, None)
        return PrefixSnapshot(caches=caches, tokens=tokens)

    def prefill_chunked(self, tokens: jax.Array, chunk_size: int = 512,
                        caches=None, pad_lens=None):
        """Prefill a long prompt in fixed-size chunks through the extend
        path: activation/logit memory is O(chunk * max_seq_len) instead
        of O(T^2), and — because _extend_call canonicalizes the chunk
        position to its quantization phase — ONE extend compilation
        covers every interior chunk of every prompt length (plus one
        for each distinct remainder), where one-shot prefill compiles
        per distinct prompt length (20-40 s each on TPU).

        Chunks past the first attend the already-QUANTIZED earlier
        chunks, the same accuracy class as KIVI decode; one-shot
        prefill sees the whole prompt exact.  tokens (B, T), LEFT-
        padded by pad_lens (B,) slots per row (None = no padding) — pad
        T to a multiple of chunk_size and ragged prompts of ANY length
        share the same two compilations.  Returns (last-token logits
        (B, V), caches)."""
        qcfg = self.qcfg
        if qcfg.quantize_kv:
            L = phase_period(qcfg)
            if chunk_size % L:
                # keep every interior chunk on the same phase
                chunk_size += L - chunk_size % L
        B, T = tokens.shape
        pad = (None if pad_lens is None
               else jnp.asarray(pad_lens, jnp.int32).reshape(B))
        if caches is None:
            caches = modeling.init_caches(self.cfg, self.qcfg, B,
                                          self.max_seq_len,
                                          self.cache_dtype)
        logits = None
        for t0 in range(0, T, chunk_size):
            chunk = tokens[:, t0:t0 + chunk_size]
            logits, caches = self._extend_call(self.params, chunk,
                                               caches, t0, pad)
        return logits, caches

    def extend(self, snapshot: PrefixSnapshot,
               tokens: jax.Array) -> PrefixSnapshot:
        """Grow a prefix snapshot by more shared tokens (multi-turn
        conversation prefixes).  tokens: (T1,) or (1, T1)."""
        tokens = jnp.asarray(tokens, jnp.int32).reshape(1, -1)
        # donated input: hand the jit a copy so the snapshot stays live
        caches = jax.tree_util.tree_map(lambda x: x.copy(),
                                        snapshot.caches)
        _, caches = self._extend_call(self.params, tokens, caches,
                                      snapshot.length)
        return PrefixSnapshot(
            caches=caches,
            tokens=jnp.concatenate([snapshot.tokens, tokens], axis=1))

    def prefill(self, tokens: jax.Array, caches=None, pad_lens=None):
        """tokens (B, T), LEFT-padded by pad_lens (B,) slots per row
        (None = no padding).  Returns (next_token (B,1), caches)."""
        if caches is None:
            caches = self.init_caches()
        B = tokens.shape[0]
        pad = (None if pad_lens is None
               else jnp.asarray(pad_lens, jnp.int32).reshape(B))
        logits, caches = self._prefill(self.params, tokens, caches, pad)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], caches

    def decode_step(self, token, pos, caches, pad_lens=None):
        B = token.shape[0]
        pad = (None if pad_lens is None
               else jnp.asarray(pad_lens, jnp.int32).reshape(B))
        logits, caches = self._decode(self.params, token, pos, caches, pad)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], caches

    def generate(self, tokens: jax.Array, max_new_tokens: int,
                 eos_token_id: Optional[int] = None,
                 temperature: float = 0.0,
                 rng: Optional[jax.Array] = None,
                 pad_lens=None,
                 top_k: int = 0, top_p: float = 1.0,
                 repetition_penalty: float = 1.0,
                 prefix: Optional[PrefixSnapshot] = None,
                 prefill_chunk_size: Optional[int] = None,
                 suffix_lens=None) -> jax.Array:
        """Greedy/sampled generation.  tokens (B, T) -> (B, max_new_tokens).

        The whole decode loop runs device-side; EOS handling pads after
        the fact (same numerics as HF greedy with early exit).

        tokens may be LEFT-padded (pad_lens (B,) gives each row's pad
        count); a batch smaller than the engine's batch_size is topped
        up with copies of the last row and the extras are dropped.
        Sampling controls follow HF semantics (see serving/sampling.py).

        prefix: a `prefill_prefix` snapshot of a SHARED prompt prefix —
        tokens are then each request's suffix only (equal length unless
        suffix_lens= is given; pads can't sit at the row front once a
        real prefix precedes them).  The snapshot is broadcast across
        the batch and only the suffix is prefilled.  Suffix tokens
        attend the QUANTIZED prefix (a one-shot prefill would see it
        exact) — same accuracy class as any post-window token at decode.

        prefill_chunk_size: prefill through `prefill_chunked` (callers
        should pad T to a multiple of it so every prompt length shares
        the same two compilations; KIVI-approximate past the first
        chunk).  Mutually exclusive with prefix.

        suffix_lens: (B,) host ints — RAGGED per-request suffix lengths
        with a shared prefix (row b's suffix is tokens[b, :suffix_lens
        [b]], right-padded to the array width).  The engine extends the
        prefix with the common min(suffix_lens) tokens, then TEACHER-
        FORCES each row's remaining tail inside the decode scan (cache
        counters stay uniform; one compilation covers every raggedness
        pattern at a given (min, max) pair), realigning the sampled
        stream per row afterwards.  Same accuracy class as chunked
        prefill: tail tokens attend decode-canonical cache state where
        a one-shot suffix extend would see exact fp — inherent to any
        split, not a bug (the batcher's per-slot tail path makes the
        identical tradeoff).  Requires prefix=, no pad_lens.
        """
        (first, caches, pos, pad, seen, rng, Tp,
         n_real, ragged) = self._ingest_prompt(
            tokens, max_new_tokens, pad_lens=pad_lens, prefix=prefix,
            prefill_chunk_size=prefill_chunk_size,
            repetition_penalty=repetition_penalty,
            temperature=temperature, top_k=top_k, top_p=top_p, rng=rng,
            suffix_lens=suffix_lens)
        if ragged is None:
            if max_new_tokens == 1:
                return first[:n_real]
            rest, caches = self._decode_scan(
                self.params, first, pos, caches, rng, pad,
                steps=max_new_tokens - 1, temperature=temperature,
                prompt_len=Tp, top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, seen=seen)
            out = jnp.concatenate([first, rest], axis=1)[:n_real]
        else:
            cand0, forced_tail, n_tail, L = ragged
            B = self.batch_size
            steps = L + max_new_tokens - 1      # L >= 1 when ragged
            fpad = jnp.zeros((B, steps + 2 - forced_tail.shape[1]),
                             jnp.int32)
            rest, caches = self._decode_scan(
                self.params, first, pos, caches, rng, None,
                steps=steps, temperature=temperature,
                prompt_len=Tp - L, top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, seen=seen,
                forced=jnp.concatenate([forced_tail, fpad], axis=1),
                n_forced=n_tail)
            stream = jnp.concatenate([cand0, rest], axis=1)
            idx = n_tail[:, None] + jnp.arange(max_new_tokens,
                                               dtype=jnp.int32)[None, :]
            out = jnp.take_along_axis(stream, idx, axis=1)[:n_real]
        if eos_token_id is not None:
            seen = jnp.cumsum((out == eos_token_id).astype(jnp.int32), axis=1)
            keep = (seen - (out == eos_token_id)) == 0  # tokens before eos
            out = jnp.where(keep, out, eos_token_id)
        return out

    def _ingest_prompt(self, tokens, max_new_tokens, *, pad_lens, prefix,
                       prefill_chunk_size, repetition_penalty,
                       temperature, top_k, top_p, rng, suffix_lens=None):
        """generate()'s prompt prologue, shared with generate_stream():
        batch top-up, prompt ingestion (one-shot / chunked / prefix
        extend), penalty seen-mask, and the FIRST sampled token (which
        goes through the same processor chain as the rest — HF applies
        penalty + warpers from token 0; argmax-ing it regardless of
        temperature was a silent HF deviation).  Returns (first (B,1),
        caches, pos (B,1), pad, seen, rng, Tp, n_real, ragged) —
        `ragged` is None unless suffix_lens demands teacher-forcing, in
        which case it is (cand0 (B,1), forced_tail (B,L), n_tail (B,),
        L) and `first` is the first FED token (teacher where a tail
        exists, cand0 where not)."""
        from kivi_tpu.cache.kivi_cache import broadcast_rows
        from kivi_tpu.serving import sampling

        B, T = tokens.shape
        n_real = B
        lens = (None if suffix_lens is None
                else [int(x) for x in suffix_lens])
        if lens is not None:
            assert prefix is not None, "suffix_lens requires prefix="
            assert len(lens) == B and all(1 <= l <= T for l in lens)
        if B < self.batch_size:
            fill = jnp.repeat(tokens[-1:], self.batch_size - B, axis=0)
            tokens = jnp.concatenate([tokens, fill], axis=0)
            if pad_lens is not None:
                pad_lens = jnp.concatenate([
                    jnp.asarray(pad_lens, jnp.int32).reshape(B),
                    jnp.repeat(jnp.asarray(pad_lens, jnp.int32)[-1:],
                               self.batch_size - B)])
            if lens is not None:
                lens = lens + [lens[-1]] * (self.batch_size - B)
            B = self.batch_size
        assert B == self.batch_size
        if lens is not None:
            T = max(lens)                   # drop unused right padding
            tokens = tokens[:, :T]
            if min(lens) == T:
                lens = None                 # equal lengths: normal path
        Tp = T if prefix is None else prefix.length + T  # full prompt len
        assert Tp + max_new_tokens <= self.max_seq_len, "cache too small"
        if prefix is not None:
            assert pad_lens is None, \
                "prefix composes with suffix_lens=, not pad_lens="
            assert prefill_chunk_size is None, \
                "chunked prefill applies to the prefix-less path"
        pad = (None if pad_lens is None
               else jnp.asarray(pad_lens, jnp.int32).reshape(B))
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        Tmin = T if lens is None else min(lens)
        if prefix is None:
            if prefill_chunk_size is not None:
                logits, caches = self.prefill_chunked(
                    tokens, prefill_chunk_size, pad_lens=pad)
            else:
                caches = self.init_caches()
                logits, caches = self._prefill(self.params, tokens,
                                               caches, pad)
            full_tokens = tokens
        else:
            caches = [broadcast_rows(c, B) for c in prefix.caches]
            logits, caches = self._extend_call(
                self.params, tokens[:, :Tmin], caches, prefix.length)
            suf = tokens
            if lens is not None:
                # padding beyond each row's length must not enter the
                # penalty seen-mask: duplicate the row's last real token
                # (its id is already in the sequence)
                ln = jnp.asarray(lens, jnp.int32)
                last = jnp.take_along_axis(tokens, ln[:, None] - 1, 1)
                live = jnp.arange(T, dtype=jnp.int32)[None] < ln[:, None]
                suf = jnp.where(live, tokens, last)
            full_tokens = jnp.concatenate(
                [jnp.broadcast_to(prefix.tokens, (B, prefix.length)),
                 suf], axis=1)
        seen = None
        if repetition_penalty != 1.0:
            seen = sampling.seen_mask_from_prompt(
                full_tokens, self.cfg.vocab_size, pad_len=pad)
            logits = sampling.apply_repetition_penalty(
                logits, seen, repetition_penalty)
        rng, sub = jax.random.split(rng)
        first = sampling.sample_step(logits, sub, temperature=temperature,
                                     top_k=top_k, top_p=top_p)[:, None]
        ragged = None
        if lens is not None:
            n_tail = jnp.asarray([l - Tmin for l in lens], jnp.int32)
            forced_tail = tokens[:, Tmin:]              # (B, L)
            cand0 = first
            first = jnp.where(n_tail[:, None] > 0, forced_tail[:, :1],
                              cand0)
            ragged = (cand0, forced_tail, n_tail, T - Tmin)
        # RoPE position of the first fed token = tokens in cache so far
        pos = jnp.full((B, 1), (prefix.length + Tmin) if prefix is not None
                       else Tp, jnp.int32)
        if pad is not None:
            pos = pos - pad[:, None]
        return first, caches, pos, pad, seen, rng, Tp, n_real, ragged

    def generate_stream(self, tokens: jax.Array, max_new_tokens: int,
                        *, segment: int = 16,
                        eos_token_id: Optional[int] = None,
                        temperature: float = 0.0,
                        rng: Optional[jax.Array] = None,
                        pad_lens=None, top_k: int = 0, top_p: float = 1.0,
                        repetition_penalty: float = 1.0,
                        prefix: Optional[PrefixSnapshot] = None,
                        prefill_chunk_size: Optional[int] = None):
        """Streaming generation: yields np.int32 blocks of shape
        (B, <=segment) as they decode — the first yield is the single
        first token (time-to-first-token), then `segment`-step scan
        segments.  Semantics match generate(): same sampling chain,
        same EOS padding (rows past their EOS emit eos_token_id), plus
        EARLY EXIT once every row has finished.  The segmented scans
        reuse compilations through the same prompt_len canonicalization
        as decode resume; with repetition penalty the seen-mask is
        re-derived per segment from everything emitted so far.
        """
        from kivi_tpu.serving import sampling

        import numpy as np

        (first, caches, pos, pad, seen, rng, Tp,
         n_real, ragged) = self._ingest_prompt(
            tokens, max_new_tokens, pad_lens=pad_lens, prefix=prefix,
            prefill_chunk_size=prefill_chunk_size,
            repetition_penalty=repetition_penalty,
            temperature=temperature, top_k=top_k, top_p=top_p, rng=rng)
        assert ragged is None
        B = self.batch_size
        done = np.zeros(n_real, bool)

        def emit(block):
            """EOS-pad finished rows; returns (emitted block, stop?)"""
            nonlocal done
            block = np.array(block[:n_real])   # writable host copy
            if eos_token_id is None:
                return block, False
            for j in range(block.shape[1]):
                block[done, j] = eos_token_id
                done |= block[:, j] == eos_token_id
            return block, bool(done.all())

        cur = first
        blk, stop = emit(cur)
        yield blk
        emitted = 1
        while emitted < max_new_tokens and not stop:
            steps = min(segment, max_new_tokens - emitted)
            # flush-schedule base = tokens IN THE CACHE at segment
            # start: the segment's input token is not yet appended, so
            # that's Tp + emitted - 1 (not + emitted)
            pl = Tp + emitted - 1
            rest, caches = self._decode_scan(
                self.params, cur, pos, caches, rng, pad, steps=steps,
                temperature=temperature, prompt_len=pl,
                top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, seen=seen)
            if temperature > 0:
                # the scan consumed one split per step from the chain;
                # advance the host copy the same way so SAMPLED streams
                # stay bit-identical to one-shot generate() (greedy
                # ignores rng entirely)
                for _ in range(steps):
                    rng = jax.random.split(rng)[0]
            if self.qcfg.quantize_kv:
                # A flush due exactly AT the segment boundary is not
                # executed by the scan (it only flushes before appends).
                # The canonical state the next segment's schedule assumes
                # is ASYMMETRIC there: prefill-canonical K at T % W == 0
                # is already flushed (nkq0 = (T//W)*W), so K must flush
                # eagerly here — but canonical V keeps the full window
                # (residual stays W), and the next segment's schedule
                # fires that V flush itself at its step 0; boundary-
                # flushing V too would flush twice (n_v_win < 0).
                ev = self._flush_schedule(
                    self.qcfg, self._canonical_phase(pl),
                    steps + 1).get(steps)
                if ev is not None and ev[0]:
                    caches = modeling.flush_caches(
                        caches, self.qcfg, self.impl, k=True, v=False)
            if seen is not None:
                # fold the segment's tokens into the penalty mask (the
                # scan's internal updates don't persist across segments)
                seen = seen | (
                    jax.nn.one_hot(jnp.concatenate([cur, rest], axis=1),
                                   self.cfg.vocab_size,
                                   dtype=jnp.bool_).any(axis=1))
            cur = rest[:, -1:]
            pos = pos + steps
            emitted += steps
            blk, stop = emit(rest)
            yield blk

    def generate_beam(self, tokens: jax.Array, max_new_tokens: int,
                      num_beams: int, eos_token_id: int = -1,
                      length_penalty: float = 1.0,
                      pad_lens=None,
                      prefix: Optional[PrefixSnapshot] = None
                      ) -> jax.Array:
        """Beam-search generation: tokens (B, T) -> (B, max_new_tokens).

        The engine must be built with batch_size == B * num_beams (the
        beams live as batch rows; the KIVI cache re-orders by a batch
        gather each step — see kivi_cache.reorder).  eos_token_id=-1
        disables EOS (pure max-likelihood beams of fixed length).
        length_penalty follows HF convention: score / length**penalty.
        prefix: as in generate() — tokens are each request's suffix and
        every beam shares the broadcast snapshot.
        """
        B, T = tokens.shape
        nb = num_beams
        assert B * nb == self.batch_size, (
            f"engine batch_size {self.batch_size} != B*num_beams {B * nb}")
        Tp = T if prefix is None else prefix.length + T
        assert Tp + max_new_tokens <= self.max_seq_len, "cache too small"
        tiled = jnp.repeat(tokens, nb, axis=0)               # (B*nb, T)
        pad = (None if pad_lens is None else jnp.repeat(
            jnp.asarray(pad_lens, jnp.int32).reshape(B), nb))
        if prefix is None:
            caches = self.init_caches()
            first_logits, caches = self._prefill(self.params, tiled,
                                                 caches, pad)
        else:
            assert pad is None, "prefix + ragged suffixes unsupported"
            from kivi_tpu.cache.kivi_cache import broadcast_rows
            caches = [broadcast_rows(c, B * nb) for c in prefix.caches]
            first_logits, caches = self._extend_call(
                self.params, tiled, caches, prefix.length)
        pos = jnp.full((B * nb, 1), Tp, jnp.int32)
        if pad is not None:
            pos = pos - pad[:, None]
        out, scores, lengths, caches = self._beam_scan(
            self.params, first_logits, pos, caches, pad,
            steps=max_new_tokens, num_beams=nb,
            eos_token_id=int(eos_token_id), prompt_len=Tp)
        lengths = jnp.maximum(lengths, 1)       # non-EOS token count
        final = scores / (lengths.astype(jnp.float32) ** length_penalty)
        best = jnp.argmax(final, axis=1)                     # (B,)
        return jnp.take_along_axis(
            out, best[:, None, None], axis=1)[:, 0, :]

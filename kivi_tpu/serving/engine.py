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


@dataclasses.dataclass
class Engine:
    cfg: ModelConfig
    qcfg: QuantConfig
    params: dict
    max_seq_len: int
    batch_size: int
    impl: str = "jnp"  # attention impl for the quantized path: jnp|pallas
    cache_dtype = jnp.bfloat16

    def __post_init__(self):
        # Cache buffers are donated: at bench batch sizes the stacked KV
        # cache is most of HBM, and without aliasing every step would
        # hold input+output copies.
        self._prefill = jax.jit(
            functools.partial(self._prefill_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            donate_argnums=(2,))
        self._decode = jax.jit(
            functools.partial(self._decode_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            donate_argnums=(3,))
        self._decode_scan_jit = jax.jit(
            functools.partial(self._decode_scan_fn, cfg=self.cfg,
                              qcfg=self.qcfg, impl=self.impl),
            static_argnames=("steps", "temperature", "prompt_len"),
            donate_argnums=(3,))

    def _decode_scan(self, params, first_token, first_pos, caches, rng, *,
                     steps: int, temperature: float = 0.0,
                     prompt_len: int = 0):
        """_decode_scan_fn with the static prompt_len canonicalized: the
        flush schedule depends only on prompt_len mod lcm(W, v_flush)
        (plus the prompt_len <= W edge), so resuming decode at a later
        position with the same phase reuses the compilation instead of
        recompiling per call site."""
        qcfg = self.qcfg
        if not qcfg.quantize_kv:
            prompt_len = 0          # only gates flush scheduling
        elif prompt_len > 0:
            W, vf = qcfg.residual_length, qcfg.value_flush
            L = W * vf // math.gcd(W, vf)
            if prompt_len > W + L:
                prompt_len = W + 1 + (prompt_len - W - 1) % L
        return self._decode_scan_jit(params, first_token, first_pos,
                                     caches, rng, steps=steps,
                                     temperature=temperature,
                                     prompt_len=prompt_len)

    # -- jitted bodies ----------------------------------------------------

    @staticmethod
    def _prefill_fn(params, tokens, caches, *, cfg, qcfg, impl):
        B, T = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        logits, caches = modeling.forward(
            params, tokens, caches, cfg, qcfg, positions,
            mode="prefill", impl=impl, last_only=True)
        return logits[:, -1, :], caches

    @staticmethod
    def _decode_fn(params, token, pos, caches, *, cfg, qcfg, impl):
        """token (B, 1) i32; pos (B, 1) i32 global position of `token`."""
        logits, caches = modeling.forward(
            params, token, caches, cfg, qcfg, pos, mode="decode", impl=impl)
        return logits[:, -1, :], caches

    @staticmethod
    def _flush_schedule(qcfg, prompt_len: int, steps: int):
        """Compile-time flush schedule: for a known prompt length, the
        exact decode steps at which the K / V windows fill are
        deterministic (mirrors prefill_ingest's split arithmetic).
        Returns {step_index: (flush_k, flush_v)}."""
        W, vf = qcfg.residual_length, qcfg.value_flush
        T = prompt_len
        nkq0 = (T // W) * W
        nvq0 = 0 if T <= W else ((T - W + vf - 1) // vf) * vf
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
    def _decode_scan_fn(params, first_token, first_pos, caches, rng, *,
                        cfg, qcfg, impl, steps: int,
                        temperature: float = 0.0, prompt_len: int = 0):
        """Generate `steps` tokens fully on-device.

        With a known prompt_len and a KIVI cache, window flushes run
        UNCONDITIONALLY at their statically-known steps and the scanned
        step body carries no flush conds at all (the per-step lax.cond
        machinery on full-cache operands cost ~19 ms/step at bench
        scale).  Returns (tokens (B, steps) i32, caches).
        """
        static_flush = prompt_len > 0 and qcfg.quantize_kv

        def body(carry, _):
            token, pos, caches, rng = carry
            logits, caches = modeling.forward(
                params, token, caches, cfg, qcfg, pos,
                mode="decode", impl=impl, flush=not static_flush)
            logits = logits[:, -1, :]
            if temperature > 0:
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(sub, logits / temperature)
            else:
                nxt = jnp.argmax(logits, axis=-1)
            nxt = nxt.astype(jnp.int32)[:, None]
            return (nxt, pos + 1, caches, rng), nxt[:, 0]

        carry = (first_token, first_pos, caches, rng)
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
                token, pos, caches, rng = carry
                caches = modeling.flush_caches(caches, qcfg, impl,
                                               k=fk, v=fv)
                carry = (token, pos, caches, rng)
        return jnp.concatenate(tok_segs, axis=1), carry[2]

    # -- public API --------------------------------------------------------

    def init_caches(self):
        return modeling.init_caches(self.cfg, self.qcfg, self.batch_size,
                                    self.max_seq_len, self.cache_dtype)

    def prefill(self, tokens: jax.Array, caches=None):
        """tokens (B, T).  Returns (next_token (B,1), caches)."""
        if caches is None:
            caches = self.init_caches()
        logits, caches = self._prefill(self.params, tokens, caches)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], caches

    def decode_step(self, token, pos, caches):
        logits, caches = self._decode(self.params, token, pos, caches)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None], caches

    def generate(self, tokens: jax.Array, max_new_tokens: int,
                 eos_token_id: Optional[int] = None,
                 temperature: float = 0.0,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        """Greedy/sampled generation.  tokens (B, T) -> (B, max_new_tokens).

        The whole decode loop runs device-side; EOS handling pads after
        the fact (same numerics as HF greedy with early exit).
        """
        B, T = tokens.shape
        assert B == self.batch_size
        assert T + max_new_tokens <= self.max_seq_len, "cache too small"
        first, caches = self.prefill(tokens)
        if max_new_tokens == 1:
            return first
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        pos = jnp.full((B, 1), T, jnp.int32)
        rest, caches = self._decode_scan(
            self.params, first, pos, caches, rng,
            steps=max_new_tokens - 1, temperature=temperature,
            prompt_len=T)
        out = jnp.concatenate([first, rest], axis=1)
        if eos_token_id is not None:
            seen = jnp.cumsum((out == eos_token_id).astype(jnp.int32), axis=1)
            keep = (seen - (out == eos_token_id)) == 0  # tokens before eos
            out = jnp.where(keep, out, eos_token_id)
        return out

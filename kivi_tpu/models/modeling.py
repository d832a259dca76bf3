"""Functional decoder-only transformer (Llama-2/3, LongChat, Mistral).

One model core instead of the reference's two ~70%-duplicated HF forks
(`/root/reference/models/llama_kivi.py`, `models/mistral_kivi.py` — see
SURVEY.md cross-file notes): the KIVI algorithm lives entirely in the
attention step; family differences (GQA ratio, rope theta/scaling,
sliding window) are plain `ModelConfig` fields.

Design (TPU-first):
  * pure functions over a params pytree; layers are STACKED along a
    leading axis and iterated with `lax.scan` (one trace for all layers);
  * static-shape KIVI or fp cache per layer, also stacked;
  * weights/activations bf16, norms and attention softmax in f32
    (matching the reference's fp32 softmax upcast, `llama_kivi.py:339`).

RoPE follows the HF rotate-half convention so HF checkpoints load with
no weight permutation (`transformers` llama `apply_rotary_pos_emb`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.cache import kivi_cache as KC
from kivi_tpu.cache.fp_cache import (FpLayerCache, fp_append,
                                     fp_append_masked, fp_decode_attention,
                                     fp_extend_attention, init_fp_cache)
from kivi_tpu.core.attention import (decode_attention, extend_attention,
                                     prefill_attention)

LayerCache = Union[KC.KiviLayerCache, FpLayerCache]


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 linear_scale: Optional[float] = None, *,
                 cfg: Optional[ModelConfig] = None):
    """positions (...,) i32 -> cos/sin (..., head_dim//2) f32 (HF
    half-split convention: the two halves share the same angles).

    Scaling: `linear_scale` divides positions (HF "linear" — LongChat);
    passing `cfg` with rope_scaling_kind == "llama3" instead applies the
    frequency-dependent Llama-3.1 scheme (HF `_compute_llama3_parameters`
    in modeling_rope_utils.py): wavelengths longer than
    original_max/low_freq_factor are divided by the factor, shorter than
    original_max/high_freq_factor kept, smooth ramp between."""
    half = head_dim // 2
    # inv_freq[i] = theta**(-2i/D), i in [0, D/2) — HF llama convention
    inv_freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    pos = positions.astype(jnp.float32)
    if cfg is not None and cfg.rope_scaling is not None \
            and cfg.rope_scaling_kind == "llama3":
        factor = cfg.rope_scaling
        lo_f, hi_f = cfg.rope_low_freq_factor, cfg.rope_high_freq_factor
        orig = float(cfg.rope_original_max_position)
        wavelen = 2.0 * jnp.pi / inv_freq
        # long wavelengths scaled, short kept
        scaled = jnp.where(wavelen > orig / lo_f, inv_freq / factor,
                           inv_freq)
        smooth = (orig / wavelen - lo_f) / (hi_f - lo_f)
        smoothed = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        medium = jnp.logical_and(wavelen >= orig / hi_f,
                                 wavelen <= orig / lo_f)
        inv_freq = jnp.where(medium, smoothed, scaled)
    elif linear_scale is not None:
        pos = pos / linear_scale
    ang = pos[..., None] * inv_freq  # (..., half)
    return jnp.cos(ang), jnp.sin(ang)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF rotate-half rope on halves, without materializing any
    full-width f32 temporaries (x1*cos - x2*sin ‖ x2*cos + x1*sin) —
    the rotate_half formulation held several (B,H,T,D) f32 buffers live
    at prefill scale."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    o1 = (x1 * cos - x2 * sin).astype(x.dtype)
    o2 = (x2 * cos + x1 * sin).astype(x.dtype)
    return jnp.concatenate([o1, o2], axis=-1)


def swiglu_mlp(x: jax.Array, wg, wu, wd) -> jax.Array:
    return (jax.nn.silu(x @ wg) * (x @ wu)) @ wd


# ---------------------------------------------------------------------------
# one decoder layer
# ---------------------------------------------------------------------------

def _attention_block(x, lp, cache: LayerCache, cfg: ModelConfig,
                     qcfg: QuantConfig, positions, *, mode: str,
                     impl: str, flush: bool = True, pad_len=None,
                     active=None, prev_len: int = 0, seq_mesh=None,
                     prev_pos=None, ingest: str = "quant",
                     fill_bound: Optional[int] = None,
                     ) -> Tuple[jax.Array, LayerCache]:
    """mode: 'prefill' (T tokens, cache must be empty), 'decode' (T==1),
    or 'extend' (T suffix tokens onto a cache holding prev_len — STATIC —
    tokens: chunked prefill / prefix caching).

    ingest: 'quant' (default) runs the cache's normal ingest
    (prefill_extend / decode_append, which may quantize-flush);
    'window' appends to the fp windows ONLY via
    `KC.window_append_capped` — never flushes, never moves a quantized
    watermark, drops tokens beyond window capacity.  This is the
    speculative-decoding ingest: committing a rejected block becomes a
    pure counter rollback (`KC.rollback_counters`).  Extend/decode modes
    only; fp caches ignore it (fp_append already rolls back by counter).

    seq_mesh: optional (Mesh, axis-name[, perm]) — prefill-only
    sequence parallelism: the token axis arrives sharded over the mesh
    axis and attention runs as a ring (parallel/ring.py).  Cache ingest
    gathers K/V first (O(T) bytes vs the ring's O(T²) FLOP win).  An
    optional third element `perm` (static (T,) int array) says slot s
    holds true token perm[s] — the zigzag load-balanced layout; the
    ring masks by true positions and ingest un-permutes K/V back to
    token order."""
    B, T, _ = x.shape
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q = (x @ lp["wq"]).reshape(B, T, Hq, D).transpose(0, 2, 1, 3)
    k = (x @ lp["wk"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
    v = (x @ lp["wv"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)

    # positions (B, T) -> cos/sin (B, 1, T, D/2), broadcast over heads
    cos, sin = rope_cos_sin(positions, D, cfg.rope_theta, cfg.rope_scaling,
                            cfg=cfg)
    cos, sin = cos[:, None, :, :], sin[:, None, :, :]
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if mode == "prefill":
        perm = (seq_mesh[2] if seq_mesh is not None and len(seq_mesh) > 2
                else None)
        if pad_len is not None:
            # Pad slots occupy real cache positions but must never leak:
            # attention masks them (positions < pad_len[b]) and the
            # stored K/V are zeroed so K quantization groups straddling
            # the pad boundary see 0s rather than garbage activations.
            # True position of slot s is perm[s] under a striped layout.
            truepos = (jnp.arange(T, dtype=jnp.int32) if perm is None
                       else jnp.asarray(perm, jnp.int32))
            live = (truepos[None, None, :, None]
                    >= jnp.asarray(pad_len, jnp.int32).reshape(B, 1, 1, 1))
            k = jnp.where(live, k, 0)
            v = jnp.where(live, v, 0)
        if seq_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from kivi_tpu.parallel.ring import ring_attention
            mesh, saxis = seq_mesh[0], seq_mesh[1]
            out = ring_attention(q, k, v, mesh, axis=saxis,
                                 sliding_window=cfg.sliding_window,
                                 pad_len=pad_len, positions=perm)
            # ingest wants whole quant groups: gather the token axis
            # back (O(T·H·D) bytes — the SP win is attention's O(T²))
            rep = NamedSharding(mesh, PartitionSpec())
            k = jax.lax.with_sharding_constraint(k, rep)
            v = jax.lax.with_sharding_constraint(v, rep)
            if perm is not None:
                import numpy as _np
                inv = jnp.asarray(_np.argsort(_np.asarray(perm)),
                                  jnp.int32)
                k = jnp.take(k, inv, axis=2)
                v = jnp.take(v, inv, axis=2)
        else:
            out = prefill_attention(q, k, v,
                                    sliding_window=cfg.sliding_window,
                                    impl=impl, pad_len=pad_len)
        if isinstance(cache, FpLayerCache):
            cache = fp_append(cache, k, v)
        else:
            cache = KC.prefill_ingest(cache, k, v, qcfg, impl)
    elif mode == "extend":
        # attention reads the PRE-extension cache.  pad_len is the
        # LEFT-pad of the whole (chunked) prompt: garbage sits at cache
        # positions [0, pad) and is front-masked, so ragged prompts ride
        # chunked prefill with one shared compilation.  Per-suffix
        # raggedness (pads between prefix and suffix) stays
        # unrepresentable.
        # active: only the window-only ingest can freeze per-row (the
        # batched speculative verify under vmap); the quantizing ingest
        # has no masked variant in extend mode.
        assert active is None or ingest == "window"
        if pad_len is not None and prev_pos is not None:
            # same rule as prefill: pad slots' K/V are zeroed so the K
            # quantization groups straddling the pad boundary see 0s
            # (the chunk's token i sits at cache position prev_pos + i)
            cpos = prev_pos + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, T, 1), 2)
            live = cpos >= jnp.asarray(pad_len, jnp.int32).reshape(
                B, 1, 1, 1)
            k = jnp.where(live, k, 0)
            v = jnp.where(live, v, 0)
        if isinstance(cache, FpLayerCache):
            out = fp_extend_attention(q, k, v, cache,
                                      sliding_window=cfg.sliding_window,
                                      pad_len=pad_len)
            cache = fp_append_masked(cache, k, v, active)
        else:
            out = extend_attention(q, k, v, cache, qcfg, impl=impl,
                                   sliding_window=cfg.sliding_window,
                                   pad_len=pad_len)
            if ingest == "window":
                cache = KC.window_append_capped(cache, k, v,
                                                active=active)
            else:
                cache = KC.prefill_extend(cache, k, v, qcfg, prev_len,
                                          impl)
    else:
        if isinstance(cache, FpLayerCache):
            cache = (fp_append_masked(cache, k, v, active)
                     if active is not None else fp_append(cache, k, v))
            out = fp_decode_attention(q, cache,
                                      sliding_window=cfg.sliding_window,
                                      impl=impl, pad_len=pad_len,
                                      fill_bound=fill_bound)
        else:
            if ingest == "window":
                cache = KC.window_append_capped(cache, k, v,
                                                active=active)
            elif active is not None:
                # divergent per-row state (continuous batcher under
                # vmap): masked slice writes, no cond machinery
                cache = KC.decode_append_masked(cache, k, v, qcfg, impl,
                                                active=active)
            else:
                cache = KC.decode_append(cache, k, v, qcfg, impl,
                                         do_flush=flush)
            out = decode_attention(q, cache, qcfg, impl=impl,
                                   sliding_window=cfg.sliding_window,
                                   pad_len=pad_len,
                                   fill_bound=fill_bound)

    out = out.transpose(0, 2, 1, 3).reshape(B, T, Hq * D).astype(x.dtype)
    return out @ lp["wo"], cache


def _decoder_layer(x, lp, cache, cfg, qcfg, positions, *, mode, impl,
                   flush=True, pad_len=None, active=None, prev_len=0,
                   seq_mesh=None, prev_pos=None, ingest="quant",
                   fill_bound=None):
    h, cache = _attention_block(
        rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps), lp, cache, cfg, qcfg,
        positions, mode=mode, impl=impl, flush=flush, pad_len=pad_len,
        active=active, prev_len=prev_len, seq_mesh=seq_mesh,
        prev_pos=prev_pos, ingest=ingest, fill_bound=fill_bound)
    x = x + h
    x = x + swiglu_mlp(rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps),
                       lp["wg"], lp["wu"], lp["wd"])
    return x, cache


# ---------------------------------------------------------------------------
# full model forward (scan over stacked layers)
# ---------------------------------------------------------------------------

def forward(params: dict, tokens: jax.Array, caches, cfg: ModelConfig,
            qcfg: QuantConfig, positions: jax.Array, *, mode: str,
            impl: str = "jnp",
            last_only: bool = False,
            flush: bool = True,
            pad_len: Optional[jax.Array] = None,
            active: Optional[jax.Array] = None,
            prev_len: int = 0, seq_mesh=None,
            last_index: Optional[int] = None,
            prev_pos=None, ingest: str = "quant",
            fill_bound: Optional[int] = None) -> Tuple[jax.Array, Any]:
    """tokens (B, T) i32; positions (B, T) i32 ROPE positions (for
    left-padded rows: cache index minus pad_len, clamped at 0).

    pad_len: optional (B,) i32 left-padding per batch row — the TPU
    analogue of the reference's attention_mask plumbing
    (`models/llama_kivi.py:710-717`): pad slots occupy cache positions
    [0, pad_len[b]) and are masked out of every attention.

    Returns (logits (B, T, vocab) f32, new caches).  With last_only,
    logits are (B, 1, vocab) for the final position — generation never
    needs the full (B, T, vocab) f32 tensor, which at bench batch sizes
    is multiple GB.

    Caches are a LIST of per-layer cache pytrees, each layer its own XLA
    buffer, and the layer loop is laid out in Python.  This is the
    zero-copy design: per-layer cache reads feed the Pallas kernels
    directly and appends are in-place dynamic-update-slices on donated
    buffers.  The alternatives both lose: scanning over one stacked
    array pays a dynamic_index gather + dynamic_update scatter of every
    layer's multi-GB slice per step, and even STATIC slices of a stacked
    array are materialized as copies when they feed a Pallas custom call
    (measured: +13 ms/step read-side, +13 ms/step write-back at the
    bench config on v5e).
    """
    x = params["embed"][tokens]

    caches = list(caches)
    for i in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        x, caches[i] = _decoder_layer(x, lp, caches[i], cfg, qcfg,
                                      positions, mode=mode, impl=impl,
                                      flush=flush, pad_len=pad_len,
                                      active=active, prev_len=prev_len,
                                      seq_mesh=seq_mesh,
                                      prev_pos=prev_pos, ingest=ingest,
                                      fill_bound=fill_bound)
    if last_only:
        # last_index: STATIC slot of the sequence's true last token —
        # under a striped (permuted) layout it is not slot T-1
        i = -1 if last_index is None else last_index
        x = x[:, i:, :] if i == -1 else x[:, i:i + 1, :]
    x = rms_norm(x, params["ln_f"], cfg.rms_norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits, caches


def init_caches(cfg: ModelConfig, qcfg: QuantConfig, batch: int,
                max_seq_len: int, dtype=jnp.bfloat16):
    """List of per-layer caches — each layer a separate XLA buffer (see
    forward() docstring for why this beats one stacked array)."""
    def one():
        if qcfg.quantize_kv:
            return KC.init_layer_cache(batch, cfg.num_kv_heads, cfg.head_dim,
                                       max_seq_len, qcfg, dtype)
        return init_fp_cache(batch, cfg.num_kv_heads, cfg.head_dim,
                             max_seq_len, dtype)
    # jit so every layer gets its OWN output buffer: bare jnp.zeros
    # deduplicates identical constants across layers, and a shared buffer
    # cannot be donated L times by the engine's jitted steps.
    return list(jax.jit(lambda: [one() for _ in range(cfg.num_layers)])())


# ---------------------------------------------------------------------------
# random init (tests / benchmarks with realistic shapes)
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    Hq, Hkv, D, Hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.hidden_size
    L, I, V = cfg.num_layers, cfg.intermediate_size, cfg.vocab_size
    ks = jax.random.split(key, 10)

    def nrm(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    s = Hd ** -0.5
    layers = {
        "ln_attn": jnp.ones((L, Hd), dtype),
        "ln_mlp": jnp.ones((L, Hd), dtype),
        "wq": nrm(ks[0], (L, Hd, Hq * D), s),
        "wk": nrm(ks[1], (L, Hd, Hkv * D), s),
        "wv": nrm(ks[2], (L, Hd, Hkv * D), s),
        "wo": nrm(ks[3], (L, Hq * D, Hd), s),
        "wg": nrm(ks[4], (L, Hd, I), s),
        "wu": nrm(ks[5], (L, Hd, I), s),
        "wd": nrm(ks[6], (L, I, Hd), I ** -0.5),
    }
    return {
        "embed": nrm(ks[7], (V, Hd), 1.0),
        "layers": layers,
        "ln_f": jnp.ones((Hd,), dtype),
        "lm_head": nrm(ks[8], (Hd, V), s),
    }


def flush_caches(caches, qcfg: QuantConfig, impl: str = "jnp",
                 k: bool = False, v: bool = False):
    """Unconditional window flushes across all layers (the engine's
    statically-scheduled decode path; see KC.flush_k_now/flush_v_now)."""
    out = []
    for c in caches:
        if k:
            c = KC.flush_k_now(c, qcfg, impl)
        if v:
            c = KC.flush_v_now(c, qcfg, impl)
        out.append(c)
    return out

"""Fused decode megakernel vs the split jnp oracle.

Sweeps cache states with every phase relationship between the K and V
stores (fresh window, K ahead of V, V ahead of K, just-flushed) — the
cross-routing of probabilities between stores is the hard part
(reference semantics `models/llama_kivi.py:115-129,167-172`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.cache.kivi_cache import (decode_append, init_layer_cache,
                                       prefill_ingest)
from kivi_tpu.config import QuantConfig
from kivi_tpu.core.attention import decode_attention


def _mk_cache(T_prompt, steps, qcfg, B=2, H=2, D=128, Tmax=1024, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    cache = init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(ks[0], (B, H, T_prompt, D), jnp.float32)
    v = jax.random.normal(ks[1], (B, H, T_prompt, D), jnp.float32)
    cache = prefill_ingest(cache, k, v, qcfg)
    step = jax.jit(lambda c, kn, vn: decode_append(c, kn, vn, qcfg))
    for i in range(steps):
        kn = jax.random.normal(jax.random.fold_in(ks[2], i), (B, H, 1, D),
                               jnp.float32)
        vn = jax.random.normal(jax.random.fold_in(ks[3], i), (B, H, 1, D),
                               jnp.float32)
        cache = step(cache, kn, vn)
    return cache


@pytest.mark.parametrize("bits", [(2, 2), (4, 4), (2, 4)])
@pytest.mark.parametrize("tprompt,steps", [
    (40, 0),     # prompt only: nothing quantized yet (all-window)
    (128, 0),    # K store just flushed a whole block
    (200, 60),   # mid-stream: both stores active, V ahead of K
    (128, 128),  # K flush boundary reached during decode
    (190, 140),  # several V flushes + K flushes
])
def test_fused_matches_split(bits, tprompt, steps):
    kb, vb = bits
    qcfg = QuantConfig(k_bits=kb, v_bits=vb, group_size=32,
                       residual_length=128)
    B, H, r, D = 2, 2, 4, 128
    cache = _mk_cache(tprompt, steps, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = decode_attention(q, cache, qcfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_fused_mha_r1():
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    B, H, D = 1, 4, 128
    cache = _mk_cache(200, 10, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, 1, D), jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = decode_attention(q, cache, qcfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# head-folded wide kernel (v_flush == residual_length -> 128-aligned nvq)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [(2, 2), (4, 4), (2, 4)])
@pytest.mark.parametrize("tprompt,steps,r", [
    (40, 0, 4),      # all-window
    (128, 0, 4),     # K just flushed
    (200, 60, 4),    # mid-stream
    (128, 130, 1),   # MHA, flush boundaries crossed in decode
    (300, 140, 2),   # several flushes
])
def test_wide_matches_split(bits, tprompt, steps, r):
    # call the wide kernel directly: the dispatcher only routes GQA
    # (r > 1) to it, but the kernel itself supports r == 1 too
    from kivi_tpu.kernels.fused_decode_wide import (
        fused_decode_attention_wide)
    kb, vb = bits
    qcfg = QuantConfig(k_bits=kb, v_bits=vb, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, D = 2, 4, 128
    cache = _mk_cache(tprompt, steps, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = fused_decode_attention_wide(
        q.reshape(B, H, r, D), cache.k_codes, cache.k_scale, cache.k_mn,
        cache.v_codes, cache.v_scale, cache.v_mn, cache.k_win,
        cache.v_win, cache.n_k_quant, cache.n_k_win, cache.n_v_quant,
        group_size=32, k_bits=kb, v_bits=vb).reshape(B, H * r, 1, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# multi-chunk caches: chunks fully before the V window used to feed the
# strip gather an out-of-bounds offset (NaN in interpret, VMEM fault on
# TPU at T=4096) — regression for the vstrip clamp in fused_decode.py
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# v_flush < residual_length: the value-strip [nvq, nvq+W) can straddle a
# chunk boundary (nvq mod C reaches C - v_flush).  The old single-slice
# capture read past the chunk (OOB VMEM on real TPU, err 0.17 in
# interpret); the segmented capture is the regression under test.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tprompt,steps,r", [
    (640, 0, 4),     # nvq=384, C=512: strip [384, 640) spans chunks 0/1
    (640, 90, 4),    # decode crosses K flush + several V flushes
    (520, 250, 1),   # MHA rows, many flushes, strip lands on both sides
    (384, 0, 2),     # nvq=128: strip within one chunk (sanity)
])
def test_wide_strip_spans_chunks(tprompt, steps, r):
    from kivi_tpu.kernels.fused_decode_wide import (
        fused_decode_attention_wide, wide_kernel_supported)
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=256, v_flush=128)
    assert wide_kernel_supported(1024, 256, 128, 2, 2)
    B, H, D = 1, 2, 128
    cache = _mk_cache(tprompt, steps, qcfg, B=B, H=H, D=D, Tmax=1024)
    q = jax.random.normal(jax.random.PRNGKey(11), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = fused_decode_attention_wide(
        q.reshape(B, H, r, D), cache.k_codes, cache.k_scale, cache.k_mn,
        cache.v_codes, cache.v_scale, cache.v_mn, cache.k_win,
        cache.v_win, cache.n_k_quant, cache.n_k_win, cache.n_v_quant,
        group_size=32, k_bits=2, v_bits=2).reshape(B, H * r, 1, D)
    assert not np.any(np.isnan(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_dispatch_routes_8bit_to_wide():
    """decode_attention(impl='pallas') at 8-bit rides the wide kernel
    (round 3) instead of regressing to the split path when the fold
    gives >= 8 rows."""
    qcfg = QuantConfig(k_bits=8, v_bits=8, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, r, D = 2, 4, 4, 128
    cache = _mk_cache(300, 40, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(5), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = decode_attention(q, cache, qcfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_wide_gate_rejects_unaligned_flush():
    from kivi_tpu.kernels.fused_decode_wide import wide_kernel_supported
    assert not wide_kernel_supported(1024, 256, 32, 2, 2)   # v_flush!=128k
    assert not wide_kernel_supported(1024, 384, 128, 2, 2)  # C % W != 0
    assert wide_kernel_supported(1024, 128, 128, 8, 2)      # 8-bit K (r3)
    assert not wide_kernel_supported(1024, 128, 128, 16, 2)
    assert wide_kernel_supported(4096, 128, 128, 2, 4)
    # scale-folded QK bounds: cg*r must fit one MXU row tile and the
    # superblock sublane slice must stay 8-aligned
    assert not wide_kernel_supported(4096, 128, 128, 2, 2, r=16)
    assert not wide_kernel_supported(4096, 128, 128, 2, 2, group_size=128)
    assert wide_kernel_supported(512, 128, 128, 2, 2, group_size=128)


@pytest.mark.parametrize("bits", [(8, 8), (8, 2), (2, 8)])
@pytest.mark.parametrize("tprompt,steps,r", [
    (200, 60, 4),    # mid-stream GQA
    (128, 130, 1),   # MHA, flush boundaries crossed in decode
])
def test_wide_8bit_matches_split(bits, tprompt, steps, r):
    """8-bit plane-layout stores ride the wide kernel (round 3): plane
    shift+mask unpack, centered c-128 codes, the 128*scale correction
    folded into the zero-point projection."""
    from kivi_tpu.kernels.fused_decode_wide import (
        fused_decode_attention_wide)
    kb, vb = bits
    qcfg = QuantConfig(k_bits=kb, v_bits=vb, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, D = 2, 4, 128
    cache = _mk_cache(tprompt, steps, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = fused_decode_attention_wide(
        q.reshape(B, H, r, D), cache.k_codes, cache.k_scale, cache.k_mn,
        cache.v_codes, cache.v_scale, cache.v_mn, cache.k_win,
        cache.v_win, cache.n_k_quant, cache.n_k_win, cache.n_v_quant,
        group_size=32, k_bits=kb, v_bits=vb).reshape(B, H * r, 1, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("impl_cfg", [
    # (tprompt, steps, Tmax, v_flush) — v_flush=None exercises the
    # per-head kernel's sliding V flush; 128 exercises the wide kernel
    (1280, 0, 2048, None),    # nkw == 0, 2 dead-chunk tails
    (1200, 60, 2048, None),   # deep store, window mid-fill
    (700, 0, 2048, None),     # chunk 1 partial, chunks 2-3 dead
    (1280, 0, 2048, 128),
    (1200, 64, 2048, 128),
])
def test_deep_cache_multi_chunk(impl_cfg):
    tprompt, steps, Tmax, v_flush = impl_cfg
    kw = dict(k_bits=2, v_bits=2, group_size=32, residual_length=128)
    if v_flush is not None:
        kw["v_flush"] = v_flush
    qcfg = QuantConfig(**kw)
    B, H, r, D = 1, 2, 2, 128
    cache = _mk_cache(tprompt, steps, qcfg, B=B, H=H, D=D, Tmax=Tmax)
    q = jax.random.normal(jax.random.PRNGKey(5), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = decode_attention(q, cache, qcfg, impl="pallas")
    assert not np.any(np.isnan(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# Mistral sliding-window decode on the MEGAKERNELS: a sliding window is
# the same per-row lower position bound the pad mask uses, so the fused
# kernels serve SWA too (the reference's flash SWA branch is dead code —
# its eager path materializes the full mask).  Oracle: the split jnp
# path's native sliding_window handling.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("vf,r,window", [
    (128, 4, 256),    # wide kernel (GQA fold 8)
    (128, 4, 100),    # window not 128-aligned
    (32, 4, 256),     # per-head kernel (unaligned v_flush)
    (128, 1, 192),    # wide kernel MHA rows
])
def test_swa_decode_matches_split(vf, r, window):
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=vf)
    B, H, D = 2, 2, 128
    cache = _mk_cache(520, 60, qcfg, B=B, H=H, D=D)   # seq_len 580
    q = jax.random.normal(jax.random.PRNGKey(13), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp",
                           sliding_window=window)
    got = decode_attention(q, cache, qcfg, impl="pallas",
                           sliding_window=window)
    assert not np.any(np.isnan(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_swa_decode_with_pad():
    """Sliding window and left-pad compose (lo = max of the two)."""
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, r, D = 2, 2, 4, 128
    cache = _mk_cache(520, 0, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(14), (B, H * r, 1, D),
                          jnp.float32)
    pads = jnp.asarray([400, 0], jnp.int32)   # row 0: pad beyond window
    ref = decode_attention(q, cache, qcfg, impl="jnp",
                           sliding_window=256, pad_len=pads)
    got = decode_attention(q, cache, qcfg, impl="pallas",
                           sliding_window=256, pad_len=pads)
    assert not np.any(np.isnan(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# static live-fill grid bound (t_bound): the grid stops at the bound
# instead of sweeping all Tmax//C chunk steps; arrays keep full-T block
# layout.  Output must be bit-identical to the unbounded kernel, and
# the dispatcher's fill_bound must stay oracle-exact.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tprompt,steps,r,tb", [
    (40, 0, 4, 512),      # all-window, one live chunk of two
    (200, 60, 4, 512),    # mid-stream, bound tight over fill=260
    (300, 140, 2, 512),   # fill=440, strip near the bound
    (500, 11, 1, 512),    # fill=511, bound exactly covers the fill
    (200, 60, 4, 1024),   # bound == Tmax: degenerates to the full sweep
])
def test_wide_t_bound_matches_unbounded(tprompt, steps, r, tb):
    from kivi_tpu.kernels.fused_decode_wide import (
        fused_decode_attention_wide)
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, D = 2, 4, 128
    cache = _mk_cache(tprompt, steps, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                          jnp.float32)
    args = (q.reshape(B, H, r, D), cache.k_codes, cache.k_scale,
            cache.k_mn, cache.v_codes, cache.v_scale, cache.v_mn,
            cache.k_win, cache.v_win, cache.n_k_quant, cache.n_k_win,
            cache.n_v_quant)
    kw = dict(group_size=32, k_bits=2, v_bits=2)
    full = fused_decode_attention_wide(*args, **kw)
    bounded = fused_decode_attention_wide(*args, t_bound=tb, **kw)
    np.testing.assert_array_equal(np.asarray(bounded), np.asarray(full))


def test_dispatch_fill_bound_oracle_exact():
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, r, D = 2, 4, 2, 128
    cache = _mk_cache(200, 60, qcfg, B=B, H=H, D=D)   # fill = 260
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = decode_attention(q, cache, qcfg, impl="pallas",
                           fill_bound=260)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)

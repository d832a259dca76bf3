"""KIVI attention over the static split cache.

Decode attention computes logits in two halves and softmaxes over their
concatenation, exactly like the reference
(`/root/reference/models/llama_kivi.py:115-129, 167-172, 323-399`):

    att = softmax([ q x dequant(K_quant)  ||  q x K_window ] / sqrt(D))
    out = att[..., :n_vq] x dequant(V_quant) + att[..., n_vq:] x V_window

One subtlety the reference never faces: our K and V stores can hold a
DIFFERENT number of quantized tokens (keys flush in residual_length
blocks, values in v_flush blocks; reference values slide by 1 so its
n_vq == t - residual always).  The softmax vector is ordered by token
position with the K split point; `_gather_v_window_probs` re-routes the
probabilities of positions in [n_v_quant, t) — which may live in either
half — onto value-window rows.

GQA: query heads are folded into the kv-head batch (B, Hkv, r, D) and the
quantized operands are never materialized per query head, following the
reference's llama kernel design (`quant/csrc/gemv_cuda.cu:276-280`) and
avoiding mistral's wasteful `repeat_kv_quant`
(`models/mistral_kivi.py:58-67`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from kivi_tpu.config import QuantConfig
from kivi_tpu.core import quant as Q
from kivi_tpu.cache.kivi_cache import KiviLayerCache

NEG_INF = -1e30


def _lane_iota(n: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, n), 3)


def decode_attention(q: jax.Array, cache: KiviLayerCache, qcfg: QuantConfig,
                     *, impl: str = "jnp",
                     sliding_window: Optional[int] = None,
                     pad_len: Optional[jax.Array] = None,
                     fill_bound: Optional[int] = None) -> jax.Array:
    """Single-token decode attention.

    q: (B, Hq, 1, D) post-RoPE queries for the token just appended to the
    cache (so position == cache.seq_len - 1).  Returns (B, Hq, 1, D) f32.

    pad_len: optional (B,) i32 — number of LEFT-padding slots at the
    front of each row's cache (the reference threads a 2-D attention
    mask through every forward, `models/llama_kivi.py:710-717`; here
    left-padding reduces to a per-row lower position bound since pad
    slots sit at positions [0, pad_len)).

    fill_bound: optional STATIC upper bound on cache.seq_len, valid for
    EVERY call under this compilation (the engine passes
    prompt_len + steps for a decode scan).  Rounded up to the kernel
    chunk and forwarded as the wide kernel's t_bound: the chunk grid
    then stops at the bound instead of sweeping all Tmax//C steps —
    dead steps are DMA-elided but still cost dispatch (~28% of the
    kernel at serving fills).  A wrong bound silently truncates
    attention; only pass values derived from static schedule facts.
    """
    B, Hq, M, D = q.shape
    assert M == 1, "decode_attention is single-token; use prefill_attention"
    Hkv = cache.k_win.shape[1]
    r = Hq // Hkv
    Tmax = cache.max_seq_len
    W = qcfg.residual_length
    sm_scale = 1.0 / (D ** 0.5)

    # Kernel dispatch, fastest first.  The head-folded megakernel
    # (kernels/fused_decode_wide.py) lifts the per-head kernel's r-row
    # MXU tiles to head_fold*r rows (measured on v5e at T=4096:
    # 1.8x for Llama-2 MHA geometry with a 16-head fold, 1.3-1.8x for
    # Llama-3 GQA with the full 8-head fold).  Below an 8-row fold the
    # per-head kernel wins again.  It needs 128-aligned windows AND
    # 128-aligned value flushes; the per-head kernel needs only the
    # former and is 2/4-bit only (the wide kernel also runs 8-bit via
    # plane unpack + centered codes); the split path serves everything
    # else (jnp oracle, small folds at 8-bit).
    #
    # A Mistral sliding window is ALSO just a per-row lower position
    # bound (position t attends > t - window), so it folds into the
    # same `lo` the pad mask uses — and the megakernels' front-chunk
    # DMA elision then skips the cache outside the window entirely:
    # long-context SWA decode reads O(window), not O(T).  (The
    # reference never fused SWA — its flash sliding-window branch is
    # dead code, `models/mistral_kivi.py`.)
    lo = pad_len
    if sliding_window is not None:
        swa_lo = jnp.maximum(cache.seq_len - sliding_window, 0)
        swa_lo = jnp.full((B,), swa_lo, jnp.int32)
        lo = swa_lo if lo is None else jnp.maximum(
            jnp.asarray(lo, jnp.int32).reshape(B), swa_lo)
    from kivi_tpu.kernels.fused_decode_wide import (choose_chunk,
                                                    default_head_fold,
                                                    wide_kernel_supported)
    chunk = choose_chunk(Tmax, W, qcfg.value_flush, qcfg.k_bits,
                         qcfg.v_bits, group_size=qcfg.group_size, r=r)
    hg = default_head_fold(Hkv, r, D, Tmax // qcfg.group_size, chunk=chunk)
    if (impl == "pallas" and hg * r >= 8
            and wide_kernel_supported(Tmax, W, qcfg.value_flush,
                                      qcfg.k_bits, qcfg.v_bits, chunk=chunk,
                                      group_size=qcfg.group_size, r=r)):
        from kivi_tpu.kernels.fused_decode_wide import (
            fused_decode_attention_wide)
        tb = None
        if fill_bound is not None and fill_bound + chunk <= Tmax:
            # one spare chunk of slack: covers the strip spilling past
            # the last live chunk, and measured FASTER than the exact
            # bound (the elided spare step lets the window phase's
            # pinned DMA prefetch; docs/artifacts probe_serving_fill)
            tb = -((fill_bound + chunk) // -chunk) * chunk
            # t_bound caller contract (fused_decode_wide docstring): a
            # violated bound silently truncates attention.  Under
            # Engine(debug=True) this raises instead (no-op otherwise).
            from kivi_tpu.utils.guards import debug_check
            debug_check(
                jnp.all(jnp.asarray(cache.n_k_quant) <= tb)
                & jnp.all(jnp.asarray(cache.n_v_quant) + W <= tb),
                "wide-kernel t_bound violated: n_k_quant={nkq} or "
                "n_v_quant={nvq}+W exceeds t_bound={tb} — attention "
                "would be silently truncated",
                nkq=jnp.max(jnp.asarray(cache.n_k_quant)),
                nvq=jnp.max(jnp.asarray(cache.n_v_quant)),
                tb=jnp.int32(tb))
        out = fused_decode_attention_wide(
            q.reshape(B, Hkv, r, D), cache.k_codes, cache.k_scale,
            cache.k_mn, cache.v_codes, cache.v_scale, cache.v_mn,
            cache.k_win, cache.v_win, cache.n_k_quant, cache.n_k_win,
            cache.n_v_quant, group_size=qcfg.group_size, chunk=chunk,
            k_bits=qcfg.k_bits, v_bits=qcfg.v_bits, pad_len=lo,
            t_bound=tb,
            # v_flush == W locks the K/V quantized watermarks together
            # (nvq <= nkq always), so the window phase's pinned V-store
            # block is zero-weighted: drop its three operand streams
            no_pinned_v=qcfg.value_flush == W)
        return out.reshape(B, Hq, 1, D)
    if (impl == "pallas" and W % 128 == 0
            and qcfg.k_bits in (2, 4) and qcfg.v_bits in (2, 4)):
        from kivi_tpu.kernels.fused_decode import fused_decode_attention
        out = fused_decode_attention(
            q.reshape(B, Hkv, r, D), cache.k_codes, cache.k_scale,
            cache.k_mn, cache.v_codes, cache.v_scale, cache.v_mn,
            cache.k_win, cache.v_win, cache.n_k_quant, cache.n_k_win,
            cache.n_v_quant, group_size=qcfg.group_size,
            k_bits=qcfg.k_bits, v_bits=qcfg.v_bits, pad_len=lo)
        return out.reshape(B, Hq, 1, D)

    qg = q.reshape(B, Hkv, r, D).astype(jnp.float32)

    # ---- QK^T: quantized half ------------------------------------------
    pos_q = _lane_iota(Tmax)
    if impl == "pallas":
        from kivi_tpu.kernels import qk_dequant_matmul
        # the kernel gates dead blocks on n_k_quant and emits -inf for
        # positions beyond it - no outer mask needed
        att_q = qk_dequant_matmul(
            qg, cache.k_codes, cache.k_scale, cache.k_mn,
            qcfg.group_size, qcfg.k_bits, n_quant=cache.n_k_quant)
    else:
        k_deq = Q.dequantize_k(cache.k_codes, cache.k_scale, cache.k_mn,
                               qcfg.group_size, qcfg.k_bits)  # (B,Hkv,D,Tmax)
        att_q = jnp.einsum("bhrd,bhdt->bhrt", qg, k_deq)
        att_q = jnp.where(pos_q < cache.n_k_quant, att_q, NEG_INF)

    # ---- QK^T: fp window half ------------------------------------------
    att_w = jnp.einsum("bhrd,bhwd->bhrw", qg,
                       cache.k_win.astype(jnp.float32))
    att_w = jnp.where(_lane_iota(W) < cache.n_k_win, att_w, NEG_INF)

    if sliding_window is not None or pad_len is not None:
        # Lower position bound: Mistral sliding window (token t attends
        # positions > t - sliding_window; current position = seq_len - 1)
        # and/or per-row left-padding — both are "mask positions < lo".
        lo = jnp.zeros((B,), jnp.int32)
        if sliding_window is not None:
            lo = jnp.maximum(lo, cache.seq_len - sliding_window)
        if pad_len is not None:
            lo = jnp.maximum(lo, jnp.asarray(pad_len, jnp.int32))
        lo = lo.reshape(B, 1, 1, 1)
        att_q = jnp.where(pos_q >= lo, att_q, NEG_INF)
        att_w = jnp.where(_lane_iota(W) + cache.n_k_quant >= lo,
                          att_w, NEG_INF)

    # ---- softmax over the concatenation (fp32, reference :339,375) -----
    att = jnp.concatenate([att_q, att_w], axis=-1) * sm_scale
    att = att - jax.lax.stop_gradient(jnp.max(att, axis=-1, keepdims=True))
    p = jnp.exp(att)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p_a, p_b = p[..., :Tmax], p[..., Tmax:]

    # ---- PV: quantized half --------------------------------------------
    p_vq = jnp.where(_lane_iota(Tmax) < cache.n_v_quant, p_a, 0.0)
    if impl == "pallas":
        from kivi_tpu.kernels import pv_dequant_matmul
        out_q = pv_dequant_matmul(
            p_vq, cache.v_codes, cache.v_scale, cache.v_mn,
            qcfg.group_size, qcfg.v_bits, n_quant=cache.n_v_quant)
    else:
        v_deq = Q.dequantize_v(cache.v_codes, cache.v_scale, cache.v_mn,
                               qcfg.group_size, qcfg.v_bits)  # (B,Hkv,T,D)
        out_q = jnp.einsum("bhrt,bhtd->bhrd", p_vq, v_deq)

    # ---- PV: fp window half --------------------------------------------
    p_vw = _gather_v_window_probs(p_a, p_b, cache, W)
    out_w = jnp.einsum("bhrw,bhwd->bhrd", p_vw,
                       cache.v_win.astype(jnp.float32))

    return (out_q + out_w).reshape(B, Hq, 1, D)


def _gather_v_window_probs(p_a, p_b, cache: KiviLayerCache, W: int):
    """Route probabilities of positions [n_v_quant, t) onto value-window
    rows [0, n_v_win).  Position i sits in p_a at slot i when
    i < n_k_quant, else in p_b at slot i - n_k_quant.  Entries beyond the
    valid counts are exact zeros (their logits were -inf), so the two
    contributions can simply be added."""
    *lead, Tmax = p_a.shape
    delta = cache.n_k_quant - cache.n_v_quant  # in [0, W]
    # part from p_a: slots [n_v_quant, n_v_quant + W) (zero-padded at end)
    pad = jnp.zeros((*lead, W), p_a.dtype)
    a_part = jax.lax.dynamic_slice_in_dim(
        jnp.concatenate([p_a, pad], axis=-1), cache.n_v_quant, W, axis=-1)
    # part from p_b: shifted right by delta into a 2W buffer
    buf = jnp.zeros((*lead, 2 * W), p_b.dtype)
    b_part = jax.lax.dynamic_update_slice_in_dim(buf, p_b, delta, axis=-1)
    return a_part + b_part[..., :W]


def extend_attention(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                     cache: KiviLayerCache, qcfg: QuantConfig, *,
                     impl: str = "jnp",
                     sliding_window: Optional[int] = None,
                     pad_len: Optional[jax.Array] = None) -> jax.Array:
    """Multi-token continuation attention: T1 suffix queries attend the
    full cached history (quantized stores + fp windows) plus themselves
    causally.  The chunked-prefill / prefix-cache attention step; the
    reference's prefill is all-or-nothing exact attention
    (`models/llama_kivi.py:420-452`), so this path has no counterpart.

    q: (B, Hq, T1, D); k_new/v_new: (B, Hkv, T1, D) post-RoPE, NOT yet
    appended to the cache.  Returns (B, Hq, T1, D) f32.  Every history
    position precedes every suffix position, so causality only
    constrains the self part.  impl="pallas" runs the two dequant
    contractions through the split kernels with the (r, T1) rows folded;
    logits are O(T1 * Tmax) in HBM (a flash-style extend megakernel is
    a known frontier, not needed for prefix-sized suffixes).

    pad_len: (B,) i32 — rows were LEFT-padded by this many slots; cache
    positions [0, pad) hold garbage and are masked across all three
    halves (the front-pad convention of prefill/decode, which lets
    ragged prompts ride chunked prefill).  Self positions are always
    causally reachable, so the softmax never empties even on a
    fully-padded chunk.
    """
    B, Hq, T1, D = q.shape
    Hkv = cache.k_win.shape[1]
    r = Hq // Hkv
    Tmax = cache.max_seq_len
    W = qcfg.residual_length
    sm_scale = 1.0 / (D ** 0.5)
    T0 = cache.seq_len                                   # traced i32

    qg = q.reshape(B, Hkv, r, T1, D).astype(jnp.float32)
    if impl == "pallas":
        return _extend_attention_flash(qg, k_new, v_new, cache, qcfg,
                                       sliding_window=sliding_window,
                                       pad_len=pad_len)

    att_w, att_s = _extend_ws_logits(qg, k_new, cache,
                                     sliding_window=sliding_window,
                                     pad_len=pad_len)

    # ---- QK^T: quantized half ----------------------------------------
    pos_q = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, Tmax), 4)
    k_deq = Q.dequantize_k(cache.k_codes, cache.k_scale, cache.k_mn,
                           qcfg.group_size, qcfg.k_bits)
    att_q = jnp.einsum("bhrqd,bhdt->bhrqt", qg, k_deq)
    att_q = jnp.where(pos_q < cache.n_k_quant, att_q, NEG_INF)
    if sliding_window is not None:
        lo = (T0 + jnp.arange(T1, dtype=jnp.int32)
              - (sliding_window - 1)).reshape(1, 1, 1, T1, 1)
        att_q = jnp.where(pos_q >= lo, att_q, NEG_INF)
    if pad_len is not None:
        att_q = jnp.where(pos_q >= pad_len.reshape(B, 1, 1, 1, 1),
                          att_q, NEG_INF)

    # ---- softmax over the concatenation (fp32) -------------------------
    att = jnp.concatenate([att_q, att_w, att_s], axis=-1) * sm_scale
    att = att - jax.lax.stop_gradient(jnp.max(att, axis=-1, keepdims=True))
    p = jnp.exp(att)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p_a = p[..., :Tmax]
    p_b = p[..., Tmax:Tmax + W]
    p_s = p[..., Tmax + W:]

    # ---- PV: quantized half --------------------------------------------
    p_vq = jnp.where(pos_q < cache.n_v_quant, p_a, 0.0)
    v_deq = Q.dequantize_v(cache.v_codes, cache.v_scale, cache.v_mn,
                           qcfg.group_size, qcfg.v_bits)
    out_q = jnp.einsum("bhrqt,bhtd->bhrqd", p_vq, v_deq)

    # ---- PV: fp window half (position-routed) + self half --------------
    p_vw = _gather_v_window_probs(p_a, p_b, cache, W)
    out_w = jnp.einsum("bhrqw,bhwd->bhrqd", p_vw,
                       cache.v_win.astype(jnp.float32))
    out_s = jnp.einsum("bhrqj,bhjd->bhrqd", p_s,
                       v_new.astype(jnp.float32))
    return (out_q + out_w + out_s).reshape(B, Hq, T1, D)


def _extend_ws_logits(qg, k_new, cache: KiviLayerCache, *,
                      sliding_window, pad_len):
    """The window + causal-self logit halves of extend attention,
    masked with NEG_INF (UNSCALED): shared between the jnp oracle path
    and the flash-kernel path (which computes only the quantized half
    in-kernel)."""
    B, Hkv, r, T1, D = qg.shape
    W = cache.k_win.shape[2]
    T0 = cache.seq_len

    win_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, W), 4)
    att_w = jnp.einsum("bhrqd,bhwd->bhrqw", qg,
                       cache.k_win.astype(jnp.float32))
    att_w = jnp.where(win_w < cache.n_k_win, att_w, NEG_INF)

    att_s = jnp.einsum("bhrqd,bhjd->bhrqj", qg,
                       k_new.astype(jnp.float32))
    qi = jax.lax.broadcasted_iota(jnp.int32, (T1, T1), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (T1, T1), 1)
    att_s = jnp.where(kj <= qi, att_s, NEG_INF)

    if sliding_window is not None:
        # query i sits at position T0 + i and attends positions
        # > T0 + i - sliding_window across all halves
        lo = (T0 + jnp.arange(T1, dtype=jnp.int32)
              - (sliding_window - 1)).reshape(1, 1, 1, T1, 1)
        att_w = jnp.where(win_w + cache.n_k_quant >= lo, att_w, NEG_INF)
        att_s = jnp.where(kj.reshape(1, 1, 1, T1, T1) + T0 >= lo,
                          att_s, NEG_INF)

    if pad_len is not None:
        pad = pad_len.reshape(B, 1, 1, 1, 1)
        att_w = jnp.where(win_w + cache.n_k_quant >= pad, att_w, NEG_INF)
        # self positions T0 + j can sit below pad only when the current
        # chunk itself still contains pad slots (first chunk).  The
        # causal diagonal j == i is EXEMPT from the pad mask (kept at
        # its true finite logit) so a fully-padded row's softmax cannot
        # empty — folding the exemption into the predicate, not a
        # mask-then-reopen maximum(): XLA may fuse the row-max reduce
        # and the exp operand through differing rewrite paths, and two
        # disagreeing (-1e30-scale) copies of the diagonal turn
        # exp(att - max) into inf/inf = NaN under jit.
        keep = ((kj.reshape(1, 1, 1, T1, T1) + T0 >= pad)
                | (kj == qi).reshape(1, 1, 1, T1, T1))
        att_s = jnp.where(keep, att_s, NEG_INF)
    return att_w, att_s


def _extend_attention_flash(qg, k_new, v_new, cache: KiviLayerCache,
                            qcfg: QuantConfig, *, sliding_window,
                            pad_len) -> jax.Array:
    """Flash-kernel extend attention.  Preferred path: the FULL extend
    megakernel (kernels/flash_extend.flash_extend_attention) — history,
    fp windows and the causal self block all in-kernel, normalized
    output, no HBM logits at all (the jnp window+self halves'
    O(B*T1*(W+T1)) temporaries pinned chunked prefill to 128-token
    chunks).  Unaligned geometries fall back to the qhist-partial
    kernel + jnp window/self merge."""
    from kivi_tpu.kernels.flash_extend import (flash_extend_attention,
                                               flash_extend_full_supported,
                                               flash_extend_qhist)

    B, Hkv, r, T1, D = qg.shape
    W = qcfg.residual_length
    Tmax = cache.max_seq_len
    sm_scale = 1.0 / (D ** 0.5)
    nkq, nvq = cache.n_k_quant, cache.n_v_quant

    if flash_extend_full_supported(Tmax, W, T1, r, qcfg.group_size):
        out = flash_extend_attention(
            qg.reshape(B, Hkv, r * T1, D), cache.k_codes, cache.k_scale,
            cache.k_mn, cache.v_codes, cache.v_scale, cache.v_mn,
            cache.k_win, cache.v_win, k_new, v_new, nkq, cache.n_k_win,
            nvq, cache.seq_len, group_size=qcfg.group_size,
            k_bits=qcfg.k_bits, v_bits=qcfg.v_bits, t1=T1,
            sliding_window=sliding_window or 0, pad_len=pad_len)
        return out.reshape(B, Hkv * r, T1, D)

    acc_q, m_q, l_q = flash_extend_qhist(
        qg.reshape(B, Hkv, r * T1, D), cache.k_codes, cache.k_scale,
        cache.k_mn, cache.v_codes, cache.v_scale, cache.v_mn,
        cache.v_win, nkq, nvq, cache.seq_len,
        group_size=qcfg.group_size, k_bits=qcfg.k_bits,
        v_bits=qcfg.v_bits, t1=T1,
        sliding_window=sliding_window or 0, pad_len=pad_len)
    acc_q = acc_q.reshape(B, Hkv, r, T1, D)
    m_q = m_q.reshape(B, Hkv, r, T1, 1)
    l_q = l_q.reshape(B, Hkv, r, T1, 1)

    att_w, att_s = _extend_ws_logits(qg, k_new, cache,
                                     sliding_window=sliding_window,
                                     pad_len=pad_len)
    s2 = jnp.concatenate([att_w, att_s], axis=-1) * sm_scale

    # V columns behind the window logits: absolute position nkq + w
    # reads the quantized store while < nvq (dequantize the W-token
    # slice at nkq — W-aligned by the cache invariant, clamped at the
    # full-cache edge), else v_win row (nkq + w) - nvq (shift the
    # window rows by delta through a 2W zero-padded buffer).  Rows
    # whose logits are masked carry zero probability, so junk rows in
    # either source are weightless.
    nkq_al = jnp.minimum(nkq, Tmax - W)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, nkq_al, W, axis=-1)
    vq_rows = Q.dequantize_v(sl(cache.v_codes), sl(cache.v_scale),
                             sl(cache.v_mn), qcfg.group_size,
                             qcfg.v_bits)                  # (B,H,W,D)
    delta = nkq - nvq                                      # in [0, W]
    vwin_pad = jnp.concatenate(
        [cache.v_win.astype(jnp.float32),
         jnp.zeros_like(cache.v_win, jnp.float32)], axis=2)
    vwin_rows = jax.lax.dynamic_slice_in_dim(vwin_pad, delta, W, axis=2)
    pos_w = nkq + jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2)
    vcols_w = jnp.where(pos_w < nvq, vq_rows, vwin_rows)   # (B,H,W,D)

    # ---- flash merge of (kernel partial) + (window/self logits) -------
    m2 = jnp.max(s2, axis=-1, keepdims=True)
    m = jnp.maximum(m_q, m2)
    a_q = jnp.exp(m_q - m)
    p2 = jnp.exp(s2 - m)
    l = l_q * a_q + jnp.sum(p2, axis=-1, keepdims=True)
    out = acc_q * a_q
    out += jnp.einsum("bhrqw,bhwd->bhrqd", p2[..., :W], vcols_w)
    out += jnp.einsum("bhrqj,bhjd->bhrqd", p2[..., W:],
                      v_new.astype(jnp.float32))
    out = out / jnp.where(l > 0, l, 1.0)
    return out.reshape(B, Hkv * r, T1, D)


def prefill_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      *, sliding_window: Optional[int] = None,
                      impl: str = "jnp",
                      pad_len: Optional[jax.Array] = None) -> jax.Array:
    """Exact causal attention for prefill (fp, no quantization), matching
    the reference's exact-prefill design (`models/llama_kivi.py:420-423`:
    flash attention, then quantize the prompt KV as a post-step).

    q: (B, Hq, T, D); k, v: (B, Hkv, T, D).  Returns (B, Hq, T, D) f32.
    pad_len: optional (B,) i32 left-padding per row; key positions
    < pad_len[b] are masked out (reference `llama_kivi.py:710-717`).
    Rows at padded QUERY positions softmax over an empty set and emit 0.
    """
    if impl == "pallas":
        from kivi_tpu.kernels import flash_attention
        return flash_attention(q, k, v, causal=True,
                               sliding_window=sliding_window,
                               pad_len=pad_len)
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    r = Hq // Hkv
    qg = q.reshape(B, Hkv, r, T, D).astype(jnp.float32)
    att = jnp.einsum("bhrqd,bhkd->bhrqk", qg, k.astype(jnp.float32))
    att = att / (D ** 0.5)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    mask = kpos <= qpos
    if sliding_window is not None:
        mask &= kpos > qpos - sliding_window
    if pad_len is not None:
        pad = jnp.asarray(pad_len, jnp.int32).reshape(B, 1, 1, 1, 1)
        mask = mask & (kpos >= pad)
        att = jnp.where(mask, att, NEG_INF)
        # fully-masked query rows (padding): uniform softmax would read
        # garbage V; zero them instead (flash kernel does the same)
        p = jnp.where(jnp.any(mask, axis=-1, keepdims=True),
                      jax.nn.softmax(att, axis=-1), 0.0)
    else:
        att = jnp.where(mask, att, NEG_INF)
        p = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhrqk,bhkd->bhrqd", p, v.astype(jnp.float32))
    return out.reshape(B, Hq, T, D)

"""Static-shape KIVI KV cache: the TPU-native replacement for the
reference's per-layer 9-tuple of optional, `torch.cat`-grown tensors
(`/root/reference/models/llama_kivi.py:244,454-455`; consumed `:105-113`).

Everything is preallocated at `max_seq_len`; growth is replaced by
dynamic-slice writes at integer counters, `None`s by masking.  All stored
arrays keep the big token axis LAST (lanes) so appends are aligned column
writes and the layout tiles as (8, 128) VMEM blocks (see core/quant.py).

Streaming policy (reference `models/llama_kivi.py:131-144, 174-187`):
  * every token appends post-RoPE K and V to fp windows;
  * when the K window holds `residual_length` tokens it is quantized
    wholesale and appended to the packed store (exact reference behavior);
  * when the V window holds `residual_length` tokens, the oldest `v_flush`
    tokens (default group_size) are quantized and the window shifts.  The
    reference slides by exactly 1 token per step, which is hostile to
    static-shape jit; this block-flush keeps fp16 coverage of the most
    recent value tokens in (residual_length - v_flush, residual_length]
    instead of exactly residual_length (documented divergence, see
    QuantConfig.v_flush).
  * flushes run at the START of a step (before the append) rather than
    after attention as in the reference — tokens cross into the quantized
    store at most one step earlier, a no-op for accuracy at these window
    sizes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from kivi_tpu.config import QuantConfig
from kivi_tpu.core import quant as Q


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "k_codes", "k_scale", "k_mn", "v_codes", "v_scale", "v_mn",
        "k_win", "v_win", "n_k_quant", "n_k_win", "n_v_quant", "n_v_win",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class KiviLayerCache:
    """Per-layer quantized KV state.

    Shapes (B=batch, H=kv heads, D=head_dim, T=max_seq_len, W=residual_length,
    gs=group_size, KDw=D//(32//k_bits), VDw=D//(32//v_bits)):
      k_codes: u32 (B, H, KDw, T)     plane-packed transposed keys
      k_scale: (B, H, T//gs, D)       one (D,) row per token group, scale_dtype
      k_mn:    (B, H, T//gs, D)       (groups on SUBLANES: decode kernels
                                       stream scales at chunk granularity)
      v_codes: u32 (B, H, VDw, T)     plane-packed transposed values
      v_scale: (B, H, D//gs, T)       per (channel-group, token), scale_dtype
      v_mn:    (B, H, D//gs, T)
      k_win:   (B, H, W, D) fp window of recent keys
      v_win:   (B, H, W, D) fp window of recent values
      n_*:     i32 scalars - valid token counts (quant stores / windows)
    """

    k_codes: jax.Array
    k_scale: jax.Array
    k_mn: jax.Array
    v_codes: jax.Array
    v_scale: jax.Array
    v_mn: jax.Array
    k_win: jax.Array
    v_win: jax.Array
    n_k_quant: jax.Array
    n_k_win: jax.Array
    n_v_quant: jax.Array
    n_v_win: jax.Array

    @property
    def seq_len(self) -> jax.Array:
        """Total tokens seen (the reference's kv_seq_len, 9th tuple slot)."""
        return self.n_k_quant + self.n_k_win

    @property
    def max_seq_len(self) -> int:
        return self.k_codes.shape[-1]


def init_layer_cache(batch: int, num_kv_heads: int, head_dim: int,
                     max_seq_len: int, qcfg: QuantConfig,
                     dtype=jnp.bfloat16) -> KiviLayerCache:
    gs, W = qcfg.group_size, qcfg.residual_length
    assert max_seq_len % gs == 0
    # V groups run along channels: a group_size wider than head_dim
    # would otherwise surface as a shape error deep in dequantize_v
    assert head_dim % gs == 0, (
        f"group_size {gs} must divide head_dim {head_dim}")
    kdw = Q.num_words(head_dim, qcfg.k_bits)
    vdw = Q.num_words(head_dim, qcfg.v_bits)
    B, H, D, T = batch, num_kv_heads, head_dim, max_seq_len
    z = jnp.zeros
    sdt = jnp.dtype(qcfg.scale_dtype)
    i0 = jnp.zeros((), jnp.int32)
    return KiviLayerCache(
        k_codes=z((B, H, kdw, T), jnp.uint32),
        k_scale=z((B, H, T // gs, D), sdt),
        k_mn=z((B, H, T // gs, D), sdt),
        v_codes=z((B, H, vdw, T), jnp.uint32),
        v_scale=z((B, H, D // gs, T), sdt),
        v_mn=z((B, H, D // gs, T), sdt),
        k_win=z((B, H, W, D), dtype),
        v_win=z((B, H, W, D), dtype),
        n_k_quant=i0, n_k_win=i0, n_v_quant=i0, n_v_win=i0,
    )


# ---------------------------------------------------------------------------
# internal append helpers (token axis is LAST in all quant stores)
# ---------------------------------------------------------------------------

def _append_k_quant(cache: KiviLayerCache, k_block, qcfg: QuantConfig,
                    n_tokens: int, impl: str = "jnp") -> KiviLayerCache:
    """Quantize k_block (B,H,n_tokens,D) and append at n_k_quant."""
    gs = qcfg.group_size
    k_t = jnp.swapaxes(k_block, -1, -2)  # kernels cast per tile
    if impl == "pallas":
        from kivi_tpu.kernels.quant_pack import quantize_pack_k
        codes, scale, mn = quantize_pack_k(k_t, gs, qcfg.k_bits)
    else:
        codes, scale, mn = Q.quantize_k_block(k_t, gs, qcfg.k_bits)
    off = cache.n_k_quant
    goff = off // gs
    sdt = cache.k_scale.dtype
    return dataclasses.replace(
        cache,
        k_codes=jax.lax.dynamic_update_slice(
            cache.k_codes, codes, (0, 0, 0, off)),
        k_scale=jax.lax.dynamic_update_slice(
            cache.k_scale, scale.astype(sdt), (0, 0, goff, 0)),
        k_mn=jax.lax.dynamic_update_slice(
            cache.k_mn, mn.astype(sdt), (0, 0, goff, 0)),
        n_k_quant=off + n_tokens,
    )


def _append_v_quant(cache: KiviLayerCache, v_block, qcfg: QuantConfig,
                    n_tokens: int, impl: str = "jnp") -> KiviLayerCache:
    """Quantize v_block (B,H,n_tokens,D) and append at n_v_quant."""
    if impl == "pallas":
        from kivi_tpu.kernels.quant_pack import quantize_pack_v
        codes, scale, mn = quantize_pack_v(
            jnp.swapaxes(v_block, -1, -2), qcfg.group_size, qcfg.v_bits)
    else:
        codes, scale, mn = Q.quantize_v_block(v_block, qcfg.group_size,
                                              qcfg.v_bits)
    off = cache.n_v_quant
    sdt = cache.v_scale.dtype
    return dataclasses.replace(
        cache,
        v_codes=jax.lax.dynamic_update_slice(
            cache.v_codes, codes, (0, 0, 0, off)),
        v_scale=jax.lax.dynamic_update_slice(
            cache.v_scale, scale.astype(sdt), (0, 0, 0, off)),
        v_mn=jax.lax.dynamic_update_slice(
            cache.v_mn, mn.astype(sdt), (0, 0, 0, off)),
        n_v_quant=off + n_tokens,
    )


# ---------------------------------------------------------------------------
# prefill ingest (reference `models/llama_kivi.py:420-452`)
# ---------------------------------------------------------------------------

def prefill_ingest(cache: KiviLayerCache, k, v,
                   qcfg: QuantConfig, impl: str = "jnp") -> KiviLayerCache:
    """Ingest the whole prompt's post-RoPE K/V (B, H, T, D), T static.

    Keys: quantize floor(T/W)*W tokens, window keeps T mod W
    (`llama_kivi.py:425-434`).  Values: quantize first max(0, T-W), window
    keeps the rest (`llama_kivi.py:442-452`).
    """
    W = qcfg.residual_length
    T = k.shape[-2]
    dtype = cache.k_win.dtype

    nkq = (T // W) * W
    if nkq:
        cache = _append_k_quant(cache, k[:, :, :nkq, :], qcfg, nkq, impl)
    nkw = T - nkq
    if nkw:
        cache = dataclasses.replace(
            cache,
            k_win=jax.lax.dynamic_update_slice(
                cache.k_win, k[:, :, nkq:, :].astype(dtype), (0, 0, 0, 0)),
            n_k_win=jnp.int32(nkw),
        )

    # values: no token-alignment requirement (groups are along channels),
    # but keep the quantized count group-aligned so decode-time flushes stay
    # uniform: round T-W up to a multiple of v_flush (window keeps >= W - vf).
    vf = qcfg.value_flush
    nvq = 0 if T <= W else ((T - W + vf - 1) // vf) * vf
    if nvq:
        cache = _append_v_quant(cache, v[:, :, :nvq, :], qcfg, nvq, impl)
    nvw = T - nvq
    if nvw:
        cache = dataclasses.replace(
            cache,
            v_win=jax.lax.dynamic_update_slice(
                cache.v_win, v[:, :, nvq:, :].astype(dtype), (0, 0, 0, 0)),
            n_v_win=jnp.int32(nvw),
        )
    return cache


def prefill_extend(cache: KiviLayerCache, k, v, qcfg: QuantConfig,
                   prev_len: int, impl: str = "jnp") -> KiviLayerCache:
    """Continue prefill: ingest a suffix's post-RoPE K/V (B, H, T1, D)
    into a cache already holding `prev_len` tokens (STATIC int — the
    cache must come from `prefill_ingest`/`prefill_extend` of exactly
    that length, so the split arithmetic is compile-time known).

    End state is BIT-IDENTICAL to `prefill_ingest` of the full
    prev_len+T1 prompt when the window dtype equals the activation
    dtype (the window round-trips bf16->bf16 losslessly): quantization
    blocks and group boundaries depend only on absolute token position,
    so re-quantizing window tokens together with suffix tokens yields
    the same codes the one-shot path would.  This is the cache half of
    prefix caching / chunked prefill — the reference has no equivalent
    (its prefill is all-or-nothing, `models/llama_kivi.py:420-452`).
    """
    W = qcfg.residual_length
    vf = qcfg.value_flush
    T1 = k.shape[-2]
    T0, T = prev_len, prev_len + T1
    assert T <= cache.max_seq_len
    dtype = cache.k_win.dtype

    # ---- keys: quantize in W-blocks spanning old window + suffix ----
    wk0 = T0 % W                       # tokens currently in the window
    tail_k = (jnp.concatenate(
        [cache.k_win[:, :, :wk0, :].astype(k.dtype), k], axis=-2)
        if wk0 else k)
    nq_new = ((wk0 + T1) // W) * W
    if nq_new:
        cache = _append_k_quant(cache, tail_k[:, :, :nq_new, :], qcfg,
                                nq_new, impl)
    wk1 = wk0 + T1 - nq_new            # == T % W
    win = jnp.zeros_like(cache.k_win)
    if wk1:
        win = jax.lax.dynamic_update_slice(
            win, tail_k[:, :, nq_new:, :].astype(dtype), (0, 0, 0, 0))
    cache = dataclasses.replace(cache, k_win=win, n_k_win=jnp.int32(wk1))

    # ---- values: vf-aligned quantized count, as in prefill_ingest ----
    nvq0 = 0 if T0 <= W else ((T0 - W + vf - 1) // vf) * vf
    nvw0 = T0 - nvq0
    tail_v = (jnp.concatenate(
        [cache.v_win[:, :, :nvw0, :].astype(v.dtype), v], axis=-2)
        if nvw0 else v)
    nvq = 0 if T <= W else ((T - W + vf - 1) // vf) * vf
    dq = nvq - nvq0
    if dq:
        cache = _append_v_quant(cache, tail_v[:, :, :dq, :], qcfg, dq,
                                impl)
    nvw1 = T - nvq
    vwin = jnp.zeros_like(cache.v_win)
    if nvw1:
        vwin = jax.lax.dynamic_update_slice(
            vwin, tail_v[:, :, dq:, :].astype(dtype), (0, 0, 0, 0))
    return dataclasses.replace(cache, v_win=vwin,
                               n_v_win=jnp.int32(nvw1))


def broadcast_rows(cache, batch: int):
    """Tile a batch-1 cache pytree to `batch` rows (prefix-cache fan-out:
    one prefilled prefix shared by a whole generation batch).  Works on
    any layer-cache pytree; 0-d counters pass through.  The quantized
    stores make this copy 4-8x cheaper in HBM than an fp16 prefix."""
    # 0-d counters are COPIED (not passed through): callers hand the
    # result to donating jits, which must not invalidate the source's
    # counter buffers
    rep = lambda x: (jnp.repeat(x, batch, axis=0)
                     if getattr(x, "ndim", 0) > 0 else x.copy())
    return jax.tree_util.tree_map(rep, cache)


# ---------------------------------------------------------------------------
# decode append (reference `models/llama_kivi.py:333-399` state machine)
# ---------------------------------------------------------------------------

def flush_k_now(cache: KiviLayerCache, qcfg: QuantConfig,
                impl: str = "jnp") -> KiviLayerCache:
    """Unconditionally quantize the (full) key window into the store.
    Caller must know n_k_win == residual_length (the flush schedule is
    compile-time deterministic for a known prompt length; see
    serving/engine.py)."""
    c = _append_k_quant(cache, cache.k_win, qcfg,
                        qcfg.residual_length, impl)
    return dataclasses.replace(c, n_k_win=jnp.int32(0))


def flush_v_now(cache: KiviLayerCache, qcfg: QuantConfig,
                impl: str = "jnp") -> KiviLayerCache:
    """Unconditionally quantize the oldest v_flush value-window tokens and
    slide the window.  Caller must know n_v_win == residual_length."""
    vf = qcfg.value_flush
    oldest = cache.v_win[:, :, :vf, :]
    c = _append_v_quant(cache, oldest, qcfg, vf, impl)
    shifted = jnp.concatenate(
        [c.v_win[:, :, vf:, :], jnp.zeros_like(c.v_win[:, :, :vf, :])],
        axis=-2)
    return dataclasses.replace(c, v_win=shifted, n_v_win=c.n_v_win - vf)


def decode_append(cache: KiviLayerCache, k_new, v_new,
                  qcfg: QuantConfig, impl: str = "jnp",
                  do_flush: bool = True) -> KiviLayerCache:
    """Append one token's post-RoPE K/V (B, H, 1, D), flushing full windows
    first.  jit-safe: all branches via lax.cond, all shapes static.

    do_flush=False skips the flush conds entirely — for callers that
    schedule flushes statically (the engine's segmented decode scan; the
    lax.cond machinery costs ~19 ms/step at bench scale even on
    non-flushing steps because the branches return the full cache)."""
    W = qcfg.residual_length
    vf = qcfg.value_flush
    dtype = cache.k_win.dtype

    if do_flush:
        cache = jax.lax.cond(cache.n_k_win == W,
                             lambda c: flush_k_now(c, qcfg, impl),
                             lambda c: c, cache)
        cache = jax.lax.cond(cache.n_v_win == W,
                             lambda c: flush_v_now(c, qcfg, impl),
                             lambda c: c, cache)

    return dataclasses.replace(
        cache,
        k_win=jax.lax.dynamic_update_slice(
            cache.k_win, k_new.astype(dtype), (0, 0, cache.n_k_win, 0)),
        v_win=jax.lax.dynamic_update_slice(
            cache.v_win, v_new.astype(dtype), (0, 0, cache.n_v_win, 0)),
        n_k_win=cache.n_k_win + 1,
        n_v_win=cache.n_v_win + 1,
    )


def _masked_store_write(store, block, start, pred):
    """Slice write whose CONTENT falls back to the store's existing
    bytes when pred is false: an unconditional dynamic-update-slice
    that is a no-op write on non-flushing steps.  This is the
    vmap-friendly replacement for `lax.cond(flush, ...)`: under vmap a
    batched cond becomes a select over BOTH branch outputs — i.e. a
    full-store copy per step per row — whereas this form's traffic is
    O(block) always."""
    old = jax.lax.dynamic_slice(store, start, block.shape)
    return jax.lax.dynamic_update_slice(
        store, jnp.where(pred, block, old), start)


def decode_append_masked(cache: KiviLayerCache, k_new, v_new,
                         qcfg: QuantConfig, impl: str = "jnp",
                         active=None) -> KiviLayerCache:
    """`decode_append` for DIVERGENT per-row state (the continuous
    batcher vmaps this over slots, each with its own window phase).

    Semantically identical to `decode_append(do_flush=True)` for
    `active=True` rows; `active=False` rows freeze every counter, so
    their writes land beyond the valid counts and stay invisible — the
    serving layer needs no tree-wide where(active) select over the
    caches (which would copy the full stores every step).

    The flush `lax.cond`s are replaced by unconditional slice-sized
    writes with selected content (`_masked_store_write`): the window is
    quantized every step (O(W·D) — cheap) and non-flushing steps write
    the store's own bytes back.  Per-step HBM traffic is O(window)
    instead of the O(cache) a vmapped cond would cost.
    """
    dtype = cache.k_win.dtype
    act = (jnp.asarray(True) if active is None
           else jnp.asarray(active).reshape(()))

    cache = flush_k_masked(cache, qcfg, impl, pred=act)
    cache = flush_v_masked(cache, qcfg, impl, pred=act)

    # ---- append: inactive rows' writes land at the (frozen) counters,
    # beyond the valid count, hence invisible to attention.  The
    # CONTENT must still be masked (_masked_store_write): an inactive
    # row can legitimately sit at n_win == W (its flush is act-gated),
    # where dynamic_update_slice clamps the start to W-1 — an
    # unconditional write there overwrites the last REAL window token
    # and the next flush quantizes the corruption permanently. ----
    return dataclasses.replace(
        cache,
        k_win=_masked_store_write(cache.k_win, k_new.astype(dtype),
                                  (0, 0, cache.n_k_win, 0), act),
        v_win=_masked_store_write(cache.v_win, v_new.astype(dtype),
                                  (0, 0, cache.n_v_win, 0), act),
        n_k_win=cache.n_k_win + act.astype(jnp.int32),
        n_v_win=cache.n_v_win + act.astype(jnp.int32),
    )


def window_append_capped(cache: KiviLayerCache, k_new, v_new,
                         active=None) -> KiviLayerCache:
    """Append T1 tokens' post-RoPE K/V (B, H, T1, D) to the fp windows
    ONLY — no flushes, no quantization — dropping tokens that would
    overflow a window instead of clobbering its last row (a plain
    dynamic_update_slice at n_win == W clamps the start and overwrites
    the newest REAL token, which the next flush would quantize
    permanently).

    This is the speculative-decoding ingest: a speculation block never
    crosses a flush boundary (the engine clamps its width to the next
    boundary), so accepted tokens always fit the window and rejecting a
    block is a pure counter rollback (`rollback_counters`) — dropped or
    stale rows sit beyond the valid counts, invisible to attention and
    overwritten by later appends before any flush can see them.

    active: optional scalar bool — False freezes the append entirely
    (continuous-batcher slots under vmap)."""
    W = cache.k_win.shape[2]
    T1 = k_new.shape[-2]
    dtype = cache.k_win.dtype
    act = (jnp.asarray(True) if active is None
           else jnp.asarray(active).reshape(()))
    k_win, v_win = cache.k_win, cache.v_win
    nkw, nvw = cache.n_k_win, cache.n_v_win
    for i in range(T1):
        ok_k = jnp.logical_and(act, nkw < W)
        ok_v = jnp.logical_and(act, nvw < W)
        k_win = _masked_store_write(
            k_win, k_new[:, :, i:i + 1, :].astype(dtype),
            (0, 0, nkw, 0), ok_k)
        v_win = _masked_store_write(
            v_win, v_new[:, :, i:i + 1, :].astype(dtype),
            (0, 0, nvw, 0), ok_v)
        nkw = nkw + ok_k.astype(jnp.int32)
        nvw = nvw + ok_v.astype(jnp.int32)
    return dataclasses.replace(cache, k_win=k_win, v_win=v_win,
                               n_k_win=nkw, n_v_win=nvw)


def rollback_counters(cache: KiviLayerCache, n_tokens) -> KiviLayerCache:
    """Roll the window counters back so the cache holds exactly
    `n_tokens` committed tokens.  Valid only when the quantized
    watermarks never moved past n_tokens (guaranteed by the
    window-only speculative ingest, `window_append_capped`): the
    stale window rows beyond the new counts are invisible to attention
    and overwritten by later appends before any flush reads them."""
    n = jnp.asarray(n_tokens, jnp.int32)
    return dataclasses.replace(cache,
                               n_k_win=n - cache.n_k_quant,
                               n_v_win=n - cache.n_v_quant)


def flush_k_masked(cache: KiviLayerCache, qcfg: QuantConfig,
                   impl: str = "jnp", pred=None) -> KiviLayerCache:
    """Masked key-window flush: quantize the window and append it iff
    `pred & (n_k_win == W)` — slice-sized selected writes
    (`_masked_store_write`), never a cond over full stores.  This is
    `decode_append_masked`'s flush half, exposed for callers that flush
    WITHOUT appending (the speculative batcher's boundary flush at
    iteration start)."""
    W = qcfg.residual_length
    gs = qcfg.group_size
    p = jnp.asarray(True) if pred is None else jnp.asarray(pred).reshape(())
    flush_k = jnp.logical_and(p, cache.n_k_win == W)
    k_t = jnp.swapaxes(cache.k_win, -1, -2)
    if impl == "pallas":
        from kivi_tpu.kernels.quant_pack import quantize_pack_k
        kc, ks, km = quantize_pack_k(k_t, gs, qcfg.k_bits)
    else:
        kc, ks, km = Q.quantize_k_block(k_t, gs, qcfg.k_bits)
    off = cache.n_k_quant
    sdt = cache.k_scale.dtype
    return dataclasses.replace(
        cache,
        k_codes=_masked_store_write(cache.k_codes, kc, (0, 0, 0, off),
                                    flush_k),
        k_scale=_masked_store_write(cache.k_scale, ks.astype(sdt),
                                    (0, 0, off // gs, 0), flush_k),
        k_mn=_masked_store_write(cache.k_mn, km.astype(sdt),
                                 (0, 0, off // gs, 0), flush_k),
        n_k_quant=off + jnp.where(flush_k, W, 0),
        n_k_win=jnp.where(flush_k, 0, cache.n_k_win),
    )


def flush_v_masked(cache: KiviLayerCache, qcfg: QuantConfig,
                   impl: str = "jnp", pred=None) -> KiviLayerCache:
    """Masked value-window flush (oldest v_flush tokens + window shift)
    iff `pred & (n_v_win == W)` — see flush_k_masked."""
    W = qcfg.residual_length
    vf = qcfg.value_flush
    gs = qcfg.group_size
    p = jnp.asarray(True) if pred is None else jnp.asarray(pred).reshape(())
    flush_v = jnp.logical_and(p, cache.n_v_win == W)
    oldest = cache.v_win[:, :, :vf, :]
    if impl == "pallas":
        from kivi_tpu.kernels.quant_pack import quantize_pack_v
        vc, vs, vm = quantize_pack_v(jnp.swapaxes(oldest, -1, -2), gs,
                                     qcfg.v_bits)
    else:
        vc, vs, vm = Q.quantize_v_block(oldest, gs, qcfg.v_bits)
    voff = cache.n_v_quant
    sdt = cache.v_scale.dtype
    shifted = jnp.concatenate(
        [cache.v_win[:, :, vf:, :],
         jnp.zeros_like(cache.v_win[:, :, :vf, :])], axis=-2)
    return dataclasses.replace(
        cache,
        v_codes=_masked_store_write(cache.v_codes, vc, (0, 0, 0, voff),
                                    flush_v),
        v_scale=_masked_store_write(cache.v_scale, vs.astype(sdt),
                                    (0, 0, 0, voff), flush_v),
        v_mn=_masked_store_write(cache.v_mn, vm.astype(sdt),
                                 (0, 0, 0, voff), flush_v),
        v_win=jnp.where(flush_v, shifted, cache.v_win),
        n_v_quant=voff + jnp.where(flush_v, vf, 0),
        n_v_win=cache.n_v_win - jnp.where(flush_v, vf, 0),
    )


def reorder(cache, idx: jax.Array):
    """Select/permute batch rows: the beam-search cache reorder.

    idx (B',) i32 gathers along the batch axis of every buffer; 0-d
    leaves (the counters — shared across the batch, all sequences
    advance in lockstep) pass through.  Works on any layer-cache pytree
    (KiviLayerCache, FpLayerCache).  The reference does this over its
    9-tuples in `_reorder_cache` (`/root/reference/models/llama_kivi.py:
    950-957`); here the packed 2-bit stores make the gather ~4.5x
    cheaper than an fp16 cache reorder.
    """
    take = lambda x: (jnp.take(x, idx, axis=0)
                      if getattr(x, "ndim", 0) > 0 else x)
    return jax.tree_util.tree_map(take, cache)

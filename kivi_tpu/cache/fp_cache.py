"""Full-precision KV cache: the fp16-cache baseline path.

Equivalent of the reference's `k_bits == 16` fallback that runs vanilla
HF attention for baseline comparison (`/root/reference/mem_spd_test.py:
23-41`).  Same static-preallocation design as the KIVI cache so the two
are benchmarked apples-to-apples (the reference baseline still pays
`torch.cat` growth; ours doesn't)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "length"],
    meta_fields=[],
)
@dataclasses.dataclass
class FpLayerCache:
    """k: (B, H, D, Tmax) TRANSPOSED (token axis last, like the KIVI
    stores - appends are lane writes, and the decode QK contraction
    consumes it directly; storing (B,H,T,D) made XLA relayout-copy the
    whole multi-GB buffer inside the decode loop on v5e).
    v: (B, H, Tmax, D); length: i32 valid token count."""

    k: jax.Array
    v: jax.Array
    length: jax.Array

    @property
    def seq_len(self) -> jax.Array:
        return self.length

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[-1]


def init_fp_cache(batch: int, num_kv_heads: int, head_dim: int,
                  max_seq_len: int, dtype=jnp.bfloat16) -> FpLayerCache:
    return FpLayerCache(
        k=jnp.zeros((batch, num_kv_heads, head_dim, max_seq_len), dtype),
        v=jnp.zeros((batch, num_kv_heads, max_seq_len, head_dim), dtype),
        length=jnp.zeros((), jnp.int32))


def fp_append(cache: FpLayerCache, k_new, v_new) -> FpLayerCache:
    """Append T tokens of (B, H, T, D)."""
    t = k_new.shape[-2]
    off = cache.length
    return FpLayerCache(
        k=jax.lax.dynamic_update_slice(
            cache.k, jnp.swapaxes(k_new, -1, -2).astype(cache.k.dtype),
            (0, 0, 0, off)),
        v=jax.lax.dynamic_update_slice(
            cache.v, v_new.astype(cache.v.dtype), (0, 0, off, 0)),
        length=off + t,
    )


def fp_append_masked(cache: FpLayerCache, k_new, v_new,
                     active=None) -> FpLayerCache:
    """`fp_append` with a frozen-counter inactive mode (scalar `active`;
    the continuous batcher vmaps this over slots).  Inactive rows still
    write — at the frozen `length`, beyond the valid count, hence
    invisible to attention — so the serving layer needs no tree-wide
    where(active) select over the multi-GB fp stores."""
    if active is None:
        return fp_append(cache, k_new, v_new)
    t = k_new.shape[-2]
    act = jnp.asarray(active).reshape(())
    off = cache.length
    return FpLayerCache(
        k=jax.lax.dynamic_update_slice(
            cache.k, jnp.swapaxes(k_new, -1, -2).astype(cache.k.dtype),
            (0, 0, 0, off)),
        v=jax.lax.dynamic_update_slice(
            cache.v, v_new.astype(cache.v.dtype), (0, 0, off, 0)),
        length=off + t * act.astype(jnp.int32),
    )


def fp_extend_attention(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                        cache: FpLayerCache,
                        sliding_window: Optional[int] = None,
                        pad_len: Optional[jax.Array] = None) -> jax.Array:
    """Multi-token continuation attention over the fp cache: T1 suffix
    queries attend the cached history [0, length) plus themselves
    causally (the fp-baseline twin of core.attention.extend_attention,
    so prefix caching can be A/B'd against the fp16-cache baseline).

    q: (B, Hq, T1, D); k_new/v_new: (B, Hkv, T1, D) NOT yet appended.
    Returns (B, Hq, T1, D) f32."""
    B, Hq, T1, D = q.shape
    Hkv = cache.k.shape[1]
    r = Hq // Hkv
    Tmax = cache.max_seq_len
    T0 = cache.length
    qg = q.reshape(B, Hkv, r, T1, D).astype(jnp.float32)

    att_h = jnp.einsum("bhrqd,bhdt->bhrqt", qg,
                       cache.k.astype(jnp.float32))
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, Tmax), 4)
    att_h = jnp.where(pos < T0, att_h, -1e30)

    att_s = jnp.einsum("bhrqd,bhjd->bhrqj", qg,
                       k_new.astype(jnp.float32))
    qi = jax.lax.broadcasted_iota(jnp.int32, (T1, T1), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (T1, T1), 1)
    att_s = jnp.where(kj <= qi, att_s, -1e30)

    if sliding_window is not None:
        lo = (T0 + jnp.arange(T1, dtype=jnp.int32)
              - (sliding_window - 1)).reshape(1, 1, 1, T1, 1)
        att_h = jnp.where(pos >= lo, att_h, -1e30)
        att_s = jnp.where(kj.reshape(1, 1, 1, T1, T1) + T0 >= lo,
                          att_s, -1e30)

    if pad_len is not None:
        # left-pad front mask; the causal diagonal is EXEMPT inside the
        # predicate (not masked-then-reopened — see the NaN note in
        # core.attention.extend_attention) so fully-padded rows keep a
        # finite softmax
        pad = pad_len.reshape(B, 1, 1, 1, 1)
        att_h = jnp.where(pos >= pad, att_h, -1e30)
        keep = ((kj.reshape(1, 1, 1, T1, T1) + T0 >= pad)
                | (kj == qi).reshape(1, 1, 1, T1, T1))
        att_s = jnp.where(keep, att_s, -1e30)

    att = jnp.concatenate([att_h, att_s], axis=-1) / (D ** 0.5)
    p = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
    out_h = jnp.einsum("bhrqt,bhtd->bhrqd", p[..., :Tmax],
                       cache.v.astype(jnp.float32))
    out_s = jnp.einsum("bhrqj,bhjd->bhrqd", p[..., Tmax:],
                       v_new.astype(jnp.float32))
    return (out_h + out_s).reshape(B, Hq, T1, D)


def fp_decode_attention(q: jax.Array, cache: FpLayerCache,
                        sliding_window: Optional[int] = None,
                        impl: str = "jnp",
                        pad_len: Optional[jax.Array] = None,
                        fill_bound: Optional[int] = None) -> jax.Array:
    """Exact single-token decode attention over the fp cache.

    q: (B, Hq, 1, D) -> (B, Hq, 1, D) f32.  impl="pallas" uses the fused
    flash-decode kernel (kernels/fp_decode.py) — one pass over the cache,
    no logit tensor in HBM, no XLA cache relayouts.  pad_len: optional
    (B,) i32 left-padding per row (positions < pad_len[b] masked).
    fill_bound: optional STATIC upper bound on cache.length for every
    call under this compilation — bounds the kernel's block grid (see
    fp_decode_attention_kernel t_bound).
    """
    B, Hq, M, D = q.shape
    Hkv = cache.k.shape[1]
    r = Hq // Hkv
    Tmax = cache.max_seq_len
    qg = q.reshape(B, Hkv, r, D)
    if impl == "pallas":
        from kivi_tpu.kernels.fp_decode import fp_decode_attention_kernel
        if fill_bound is not None:
            # same silent-truncation contract as the wide kernel's
            # t_bound: raise under Engine(debug=True), no-op otherwise
            from kivi_tpu.utils.guards import debug_check
            debug_check(
                jnp.all(jnp.asarray(cache.length) <= fill_bound),
                "fp_decode t_bound violated: length={n} exceeds "
                "fill_bound={fb} — attention would be silently "
                "truncated",
                n=jnp.max(jnp.asarray(cache.length)),
                fb=jnp.int32(fill_bound))
        out = fp_decode_attention_kernel(
            qg, cache.k, cache.v, cache.length,
            sliding_window=sliding_window, pad_len=pad_len,
            t_bound=fill_bound)
        return out.reshape(B, Hq, M, D)
    att = jnp.einsum("bhrd,bhdt->bhrt", qg.astype(jnp.bfloat16),
                     cache.k).astype(jnp.float32)
    att = att / (D ** 0.5)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Tmax), 3)
    valid = pos < cache.length
    if sliding_window is not None:
        valid &= pos >= cache.length - sliding_window
    if pad_len is not None:
        valid &= pos >= jnp.asarray(pad_len, jnp.int32).reshape(B, 1, 1, 1)
    att = jnp.where(valid, att, -1e30)
    p = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhrt,bhtd->bhrd", p.astype(jnp.bfloat16), cache.v)
    return out.reshape(B, Hq, M, D).astype(jnp.float32)

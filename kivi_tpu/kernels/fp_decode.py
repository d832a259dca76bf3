"""Fused fp-cache decode attention (Pallas, TPU): flash-decode.

Single-token attention over the full-precision KV cache in one kernel:
QK^T, online softmax, and PV accumulation per KV block — no (B,H,T)
logit tensor in HBM and, crucially, no XLA layout copies of the
multi-GB cache (XLA's dot layout assignment wanted the k cache
relayouted inside the decode loop, duplicating it; Pallas consumes the
stored layout directly).

This is the fp16-cache BASELINE path (the reference's `k_bits == 16`
fallback, `/root/reference/mem_spd_test.py:23-41`) and the fp-window
half of future fused KIVI decode kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            blk_t: int, sm_scale: float, sliding_window):
    it = pl.program_id(1)
    nt = pl.num_programs(1)
    length = len_ref[pl.program_id(0)]
    # second half of the prefetch vector: per-row left-pad lower bounds
    lo = len_ref[pl.num_programs(0) + pl.program_id(0)]

    @pl.when(it == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    t0 = it * blk_t
    live = jnp.logical_and(t0 < length, t0 + blk_t > lo)
    if sliding_window is not None:
        live = jnp.logical_and(live, t0 + blk_t > length - sliding_window)

    @pl.when(live)
    def _compute():
        q = q_ref[0]                                   # (r, D) bf16
        k = k_ref[0]                                   # (D, blk_t) bf16
        v = v_ref[0]                                   # (blk_t, D) bf16
        s = jnp.dot(q, k, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT) * sm_scale
        pos = t0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = jnp.logical_and(pos < length, pos >= lo)
        if sliding_window is not None:
            mask = jnp.logical_and(mask, pos >= length - sliding_window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(it == nt - 1)
    def _finish():
        l = l_scr[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = acc_scr[:] / safe


@functools.partial(jax.jit,
                   static_argnames=("blk_t", "sliding_window", "t_bound"))
def fp_decode_attention_kernel(q, k, v, length, *, blk_t: int = 1024,
                               sliding_window=None, pad_len=None,
                               t_bound=None):
    """q (B,Hkv,r,D); k (B,H,D,T) transposed; v (B,H,T,D); length i32.

    Returns (B, Hkv, r, D) f32.  pad_len: optional (B,) i32 left-padding
    per batch row; positions < pad_len[b] are masked and fully-padded
    front blocks skip compute and DMA.

    t_bound: optional STATIC upper bound on `length` for every call
    under this compilation — the block grid stops there instead of
    sweeping all T//blk_t steps (dead blocks are DMA-elided but still
    dispatched).  Mirrors the KIVI wide kernel's t_bound so the two
    bench engines stay symmetric.
    """
    B, H, r, D = q.shape
    T = k.shape[-1]
    BH = B * H
    blk_t = min(blk_t, T)
    assert T % blk_t == 0
    ntb = (T if t_bound is None
           else -(min(t_bound, T) // -blk_t) * blk_t) // blk_t
    assert 1 <= ntb <= T // blk_t
    lo = (jnp.zeros((B,), jnp.int32) if pad_len is None
          else jnp.asarray(pad_len, jnp.int32).reshape(B))
    length = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(length, jnp.int32), (BH,)),
        jnp.repeat(lo, H),
    ])

    kernel = functools.partial(
        _kernel, blk_t=blk_t, sm_scale=1.0 / (D ** 0.5),
        sliding_window=sliding_window)
    # Dead blocks (beyond the valid length, or fully left of the pad)
    # clamp to the nearest live block: consecutive equal indices make
    # Pallas skip the fetch, so a partially filled cache DMAs only its
    # live fraction (mirrors the KIVI wide kernel's dead-chunk elision —
    # the two bench engines pay symmetric costs).
    def _tclamp(b, t, ln):
        last = jnp.maximum((ln[b] + blk_t - 1) // blk_t - 1, 0)
        first = ln[BH + b] // blk_t
        return jnp.clip(jnp.maximum(jnp.minimum(t, last), first),
                        0, T // blk_t - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, ntb),
        in_specs=[
            pl.BlockSpec((1, r, D), lambda b, t, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, blk_t),
                         lambda b, t, ln: (b, 0, _tclamp(b, t, ln)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_t, D),
                         lambda b, t, ln: (b, _tclamp(b, t, ln), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, D), lambda b, t, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r, 128), jnp.float32),
            pltpu.VMEM((r, 128), jnp.float32),
            pltpu.VMEM((r, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, r, D), jnp.float32),
        interpret=_use_interpret(),
    )(length,
      q.astype(jnp.bfloat16).reshape(BH, r, D),
      k.reshape(BH, D, T),
      v.reshape(BH, T, D))
    return out.reshape(B, H, r, D)

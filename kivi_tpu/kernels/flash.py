"""Flash attention (Pallas, TPU): the prefill kernel.

Replaces the reference's external `flash_attn` dependency for exact fp
prefill (`/root/reference/models/llama_kivi.py:420-423,469-522`).
Blockwise causal attention with the standard running-softmax recursion
(online max/denominator), fp32 accumulators, bf16 MXU inputs.

GQA is handled by index arithmetic in the BlockSpec index maps: the KV
block for query head h is head h // (Hq // Hkv) — K/V are never
materialized per query head (same design rule as the decode kernels,
reference `quant/csrc/gemv_cuda.cu:276-280`).

Supports causal masking and the Mistral sliding window
(`models/mistral_kivi.py:848-854` plumbs `sliding_window`; the
reference's flash sliding-window branch is commented out, ours is live).
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


def _flash_kernel(pad_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr,
                  acc_scr, *,
                  sm_scale: float, causal: bool, blk_q: int, blk_k: int,
                  t_actual: int, sliding_window, n_q_heads: int):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    lo = pad_ref[pl.program_id(0) // n_q_heads]   # left-pad of this row

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = iq * blk_q
    k_start = ik * blk_k

    # Block-level pruning: skip fully-masked tiles.  Mirrors the KV
    # index-map clamps in flash_attention below — every step the clamp
    # marks dead is excluded here, so clamped (stale) fetches are never
    # read.  Fully-padded q blocks (whole block left of the pad) and
    # tail-pad q blocks (past t_actual) skip ALL their k steps: the
    # varlen analogue of the reference's `_upad_input`
    # (`models/llama_kivi.py:525`) without any gather/scatter repack.
    live = k_start + blk_k > lo
    live = jnp.logical_and(live, q_start + blk_q > lo)
    live = jnp.logical_and(live, q_start < t_actual)
    live = jnp.logical_and(live, k_start < t_actual)
    if causal:
        live = jnp.logical_and(live, k_start <= q_start + blk_q - 1)
    if sliding_window is not None:
        # newest query in the block attends back at most `window` tokens
        live = jnp.logical_and(
            live, k_start + blk_k > q_start - sliding_window + 1)

    @pl.when(live)
    def _compute():
        q = q_ref[0]                       # (blk_q, D) bf16
        k = k_ref[0]                       # (blk_k, D) bf16
        v = v_ref[0]                       # (blk_k, D) bf16
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT) * sm_scale

        qpos = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 0)
        kpos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1)
        mask = jnp.logical_and(kpos < t_actual, kpos >= lo)
        if causal:
            mask = jnp.logical_and(mask, kpos <= qpos)
        if sliding_window is not None:
            mask = jnp.logical_and(mask, kpos > qpos - sliding_window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]                       # (blk_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)             # (blk_q, 1)
        # NEG_INF is finite: on a fully-masked row m_new == NEG_INF and
        # exp(s - m_new) == 1 uniformly, so p must be zeroed by mask
        # (pad query rows then finish with l == 0 -> exact 0 output)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # (blk_q, blk_k)
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        # fully-masked rows (padding) have l == 0; emit 0s for them
        l = l_scr[:, :1]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sliding_window", "blk_q", "blk_k"))
def flash_attention(q, k, v, *, causal: bool = True, sliding_window=None,
                    blk_q: int = 256, blk_k: int = 256, pad_len=None):
    """q (B, Hq, T, D), k/v (B, Hkv, T, D) -> (B, Hq, T, D) f32.

    T is padded to the block size internally; D must be lane-aligned
    (128 for the Llama/Mistral families; smaller test dims fall back to
    whatever Mosaic supports via interpret mode on CPU).

    pad_len: optional (B,) i32 left-padding per batch row — key
    positions < pad_len[b] are masked and fully-left-of-pad KV tiles are
    pruned at block level.
    """
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    r = Hq // Hkv
    blk_q = min(blk_q, max(128, 1 << (T - 1).bit_length()))
    blk_k = min(blk_k, blk_q)
    Tp = -(-T // blk_q) * blk_q
    if Tp != T:
        pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.astype(jnp.bfloat16).reshape(B * Hq, Tp, D)
    kf = k.astype(jnp.bfloat16).reshape(B * Hkv, Tp, D)
    vf = v.astype(jnp.bfloat16).reshape(B * Hkv, Tp, D)

    nkb = Tp // blk_k

    def kv_index(bh, iq, ik, pad):
        # Dead KV tiles clamp onto the nearest live tile so consecutive
        # grid steps repeat the same block index and Pallas revisit-
        # elision skips the fetch (same trick as the decode kernels'
        # chunk4 map).  The kernel's `live` predicate excludes exactly
        # these steps, so the stale data is never read.  Clamps: causal
        # tail (k past the block diagonal), valid-length tail
        # (k >= t_actual), pad front (k fully left of this row's pad),
        # sliding-window front.
        b = bh // Hq
        ikc = ik
        if causal:
            ikc = jnp.minimum(ikc, ((iq + 1) * blk_q - 1) // blk_k)
        ikc = jnp.minimum(ikc, (T - 1) // blk_k)
        first = pad[b] // blk_k
        if sliding_window is not None:
            swa_q = iq * blk_q - sliding_window + 1
            first = jnp.maximum(first, jnp.maximum(swa_q, 0) // blk_k)
        ikc = jnp.clip(jnp.maximum(ikc, first), 0, nkb - 1)
        return b * Hkv + (bh % Hq) // r, ikc, 0

    pad = (jnp.zeros((B,), jnp.int32) if pad_len is None
           else jnp.asarray(pad_len, jnp.int32).reshape(B))

    kernel = functools.partial(
        _flash_kernel, sm_scale=1.0 / (D ** 0.5), causal=causal,
        blk_q=blk_q, blk_k=blk_k, t_actual=T, sliding_window=sliding_window,
        n_q_heads=Hq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * Hq, Tp // blk_q, Tp // blk_k),
        in_specs=[
            pl.BlockSpec((1, blk_q, D), lambda bh, iq, ik, pad: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, D), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, D), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, D), lambda bh, iq, ik, pad: (bh, iq, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # bf16 out: accumulation is f32 in scratch; the (B,Hq,T,D) output
        # at prefill scale is GBs, halving it matters for peak HBM
        out_shape=jax.ShapeDtypeStruct((B * Hq, Tp, D), jnp.bfloat16),
        interpret=_use_interpret(),
    )(pad, qf, kf, vf)
    return out.reshape(B, Hq, Tp, D)[:, :, :T, :]

"""Fused dequant attention matmuls (Pallas, TPU).

TPU-native equivalents of the reference CUDA decode kernels
`bgemv2_kernel_outer_dim` / `bgemv4_kernel_outer_dim`
(`/root/reference/quant/csrc/gemv_cuda.cu:265-427`) and their wrapper
`cuda_bmm_fA_qB_outer` (`quant/matmul.py:178-219`): the packed cache is
dequantized INSIDE the matmul — no fp cache is ever materialized in HBM.

Design notes (see core/quant.py for the plane-packed layout):
  * unpack = 32/bits shift+mask ops, each producing the CONTIGUOUS channel
    block [j*Dw, (j+1)*Dw) of a (D, Tblk) tile - aligned sublane
    concatenation, no cross-lane shuffles;
  * per-group scale/zero-point never touch the big tile with an
    interleave: group axes are expanded through tiny one-hot matmuls
    (group-expansion matrices built from iota compares), and the
    zero-point term is factored out of the main matmul entirely:
        QK:  att = q @ (codes * scale_exp) + (q @ mn^T) @ E
        PV:  out = p @ (codes * scale_exp)^T + (p @ mn^T) @ E2
  * GQA: query heads ride the tiny sublane axis of q (B, Hkv, r, D); the
    packed operands are indexed per KV head only — the reference's
    llama-kernel head-ratio design (`gemv_cuda.cu:276-280,361-365`),
    never mistral's materialized `repeat_kv_quant`.
  * compute_dtype: bf16 (default) keeps the kernel near the HBM-bandwidth
    floor — codes are integers < 256 and therefore EXACT in bf16; the only
    loss is ~2^-8 relative on scales/q, far below the quantization noise.
    float32 switches every dot to Precision.HIGHEST for bit-accurate
    comparison against the jnp oracle in tests (measured on a v5e: the
    f32 path is ~5x slower - VPU casts and 6-pass MXU dominate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot_kw(compute_dtype):
    if compute_dtype == jnp.float32:
        return dict(preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    # pinned DEFAULT (not inherited): fp32-precision bf16 matmuls fail
    # Mosaic lowering under the real-TPU suite's global highest default
    return dict(preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)


def _unpack_codes(words, bits: int, compute_dtype):
    """words (Dw, Tblk) u32 -> (D, Tblk) codes, channels in natural order
    (plane layout, 8-bit only).

    NOTE: Mosaic has no direct u32->float cast; go through i32, concatenate
    the planes while still integer, and do ONE wide cast (codes are
    < 2**bits so the value is preserved; integers < 256 are exact in bf16).
    """
    fpi = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    planes = [((words >> jnp.uint32(j * bits)) & mask).astype(jnp.int32)
              for j in range(fpi)]
    return jnp.concatenate(planes, axis=0).astype(compute_dtype)


def _unpack_bitcast(words, bits: int, compute_dtype):
    """words (Dw, Tblk) u32 -> (D, Tblk) bf16 `b` values, 2/4-bit crumb
    layout (core.quant.pack_crumbs): THREE integer vreg-ops + one free
    bitcast per word-tile per crumb position — no int->float casts.
    b[d, t] == 1 + code * 2^-7 (2-bit) / 1 + code * 2^-4 (4-bit), so the
    dequant affine is x = (F*scale) * b + (mn - F*scale), F = 2^7-ish
    (see core.quant.crumb_factor).  ~2x fewer VPU ops than the
    shift+mask+cast plane unpack - this kernel's measured floor."""
    nj = 16 // bits
    mask = jnp.uint32({2: 0x0003_0003, 4: 0x000F_000F}[bits])
    expo = jnp.uint32(0x3F80_3F80)
    blocks = []
    for j in range(nj):
        t = (words >> jnp.uint32(bits * j)) & mask
        if bits == 4:
            t = t << jnp.uint32(3)  # mantissa bits [6:3] -> 1 + c/16
        blocks.append(pltpu.bitcast(t | expo, jnp.bfloat16))
    b = jnp.concatenate(blocks, axis=0)  # (D, Tblk) bf16
    return b if compute_dtype == jnp.bfloat16 else b.astype(compute_dtype)


def _unpack_deq(words, scale, mn, bits: int, cdt):
    """Returns (vals (D,T), scale_eff, mn_eff) such that
    dequant(x) == scale_eff[group] * vals + mn_eff[group].

    For 2/4-bit: vals = bitcast_b - 1 = code/F EXACTLY (bf16 represents
    c/F for c < 2^bits).  Subtracting the 1 here instead of folding it
    into mn_eff is load-bearing: vals*scale would otherwise be computed
    as (1+c/F)*F*scale in bf16, whose 2^-8 relative rounding is ~0.16x
    the data range after the mn_eff cancellation — folding keeps every
    elementwise product the same magnitude as the data."""
    if bits == 8:
        return _unpack_codes(words, bits, cdt), scale, mn
    F = float({2: 128, 4: 16}[bits])  # core.quant.crumb_factor
    vals = _unpack_bitcast(words, bits, cdt) - jnp.asarray(1.0, cdt)
    return vals, scale * F, mn


def _group_expand_rows(n_groups: int, n: int, dtype):
    """One-hot E (n_groups, n): E[g, i] = 1 iff i // gs == g."""
    gs = n // n_groups
    gid = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n), 0)
    iid = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n), 1) // gs
    return (gid == iid).astype(dtype)


# ---------------------------------------------------------------------------
# QK^T over the packed key store
# ---------------------------------------------------------------------------

NEG_INF = -1e30


def _qk_kernel(nq_ref, q_ref, w_ref, s_ref, m_ref, o_ref, *, bits: int,
               gs: int, t_block: int, cdt):
    # q (1, r, D) | w (1, Dw, Tblk) u32 | s,m (1, Tg_full, D) unblocked
    # (the cache stores K scales as token-group ROWS since round 4; this
    # compatibility kernel transposes the plane back once per program)
    kw = _dot_kw(cdt)
    nq = nq_ref[0]
    t0 = pl.program_id(1) * t_block

    @pl.when(t0 >= nq)
    def _dead():
        o_ref[0] = jnp.full_like(o_ref[0], NEG_INF)

    @pl.when(t0 < nq)
    def _live():
        q = q_ref[0].astype(cdt)                    # (r, D)
        vals, scale, mn = _unpack_deq(
            w_ref[0], jnp.transpose(s_ref[0], (1, 0)).astype(cdt),
            jnp.transpose(m_ref[0], (1, 0)).astype(cdt), bits, cdt)
        tg_full = scale.shape[1]
        # per-block one-hot group expansion E[g, tau] = (g == (t0+tau)//gs)
        gid = jax.lax.broadcasted_iota(jnp.int32, (tg_full, t_block), 0)
        tau = jax.lax.broadcasted_iota(jnp.int32, (tg_full, t_block), 1)
        expand = (gid == (t0 + tau) // gs).astype(cdt)
        scale_exp = jnp.dot(scale.astype(cdt), expand, **kw).astype(cdt)
        att = jnp.dot(q, vals * scale_exp, **kw)    # f32 accum
        qmn = jnp.dot(q, mn.astype(cdt), **kw)      # (r, Tg_full)
        att += jnp.dot(qmn.astype(cdt), expand, **kw)
        pos = t0 + jax.lax.broadcasted_iota(jnp.int32, att.shape, 1)
        o_ref[0] = jnp.where(pos < nq, att, NEG_INF)


@functools.partial(jax.jit,
                   static_argnames=("group_size", "bits", "t_block",
                                    "compute_dtype"))
def qk_dequant_matmul(qg, k_codes, k_scale, k_mn, group_size: int, bits: int,
                      n_quant=None, t_block: int = 512,
                      compute_dtype=jnp.bfloat16):
    """att = qg @ dequant(K): (B,H,r,D) x (B,H,Dw,T) -> (B,H,r,T) f32.

    k_scale/k_mn: (B, H, T//gs, D).  Contract of the reference's
    `cuda_bmm_fA_qB_outer(group_size, fA, qB, scales, zeros, bits)`
    (`quant/matmul.py:178`), with our packed layouts (core/quant.py).

    n_quant (i32 scalar, default T): number of valid tokens.  Blocks past
    it skip compute entirely (the cache is statically sized at max_seq_len
    but typically part-full; the fp16 baseline kernel has the same
    gating); positions >= n_quant come back as -1e30 logits.
    """
    B, H, r, D = qg.shape
    T = k_codes.shape[-1]
    gs = group_size
    t_block = min(t_block, T)
    assert T % t_block == 0 and t_block % gs == 0
    Dw = k_codes.shape[2]
    BH = B * H
    nq = jnp.asarray(T if n_quant is None else n_quant,
                     jnp.int32).reshape(1)

    kernel = functools.partial(_qk_kernel, bits=bits, gs=gs,
                               t_block=t_block, cdt=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T // t_block),
        in_specs=[
            pl.BlockSpec((1, r, D), lambda b, t, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dw, t_block), lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // gs, D), lambda b, t, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // gs, D), lambda b, t, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, t_block), lambda b, t, *_: (b, 0, t),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, r, T), jnp.float32),
        interpret=_use_interpret(),
    )(
        nq,
        qg.astype(compute_dtype).reshape(BH, r, D),
        k_codes.reshape(BH, Dw, T),
        k_scale.astype(compute_dtype).reshape(BH, T // gs, D),
        k_mn.astype(compute_dtype).reshape(BH, T // gs, D),
    )
    return out.reshape(B, H, r, T)


# ---------------------------------------------------------------------------
# P @ V over the packed value store
# ---------------------------------------------------------------------------

def _pv_kernel(nq_ref, p_ref, w_ref, s_ref, m_ref, o_ref, *, bits: int,
               gs: int, t_block: int, cdt):
    # p (1, r, Tblk) | w (1, Dw, Tblk) | s,m (1, Dg, Tblk) | o (1, r, D)
    kw = _dot_kw(cdt)
    t_idx = pl.program_id(1)
    nq = nq_ref[0]
    t0 = t_idx * t_block

    @pl.when(t_idx == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(t0 < nq)
    def _live():
        p = p_ref[0].astype(cdt)                      # (r, Tblk)
        vals, scale, mn = _unpack_deq(
            w_ref[0], s_ref[0].astype(cdt), m_ref[0].astype(cdt), bits, cdt)
        D = vals.shape[0]
        dg = scale.shape[0]
        if dg == 1:
            # single group spanning all channels (tiny head_dim): the
            # one-hot expansion degenerates to a broadcast.  All math in
            # f32 — Mosaic mis-lowers bf16 dots at these degenerate
            # shapes ('vector.broadcast' with a dtype change)
            f32 = jnp.float32
            scale_exp = jnp.broadcast_to(scale.astype(f32),
                                         (D, scale.shape[1]))
            acc = jax.lax.dot_general(
                p.astype(f32), vals.astype(f32) * scale_exp,
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            pmn = jax.lax.dot_general(
                p.astype(f32), mn.astype(f32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            acc += jnp.broadcast_to(pmn, (p.shape[0], D))
        else:
            expand = _group_expand_rows(dg, D, cdt)   # (Dg, D)
            # scale_exp (D, Tblk) = E^T @ scale (tiny matmul)
            scale_exp = jax.lax.dot_general(
                expand, scale.astype(cdt), (((0,), (0,)), ((), ())),
                **kw).astype(cdt)
            # out_blk (r, D) = p @ (vals*scale_exp)^T (NT, contract Tblk)
            acc = jax.lax.dot_general(p, vals * scale_exp,
                                      (((1,), (1,)), ((), ())), **kw)
            pmn = jax.lax.dot_general(p, mn.astype(cdt),
                                      (((1,), (1,)), ((), ())), **kw)
            acc += jnp.dot(pmn.astype(cdt), expand, **kw)
        o_ref[0] += acc


@functools.partial(jax.jit,
                   static_argnames=("group_size", "bits", "t_block",
                                    "compute_dtype"))
def pv_dequant_matmul(p, v_codes, v_scale, v_mn, group_size: int, bits: int,
                      n_quant=None, t_block: int = 512,
                      compute_dtype=jnp.bfloat16):
    """out = p @ dequant(V): (B,H,r,T) x (B,H,Dw,T) -> (B,H,r,D) f32.

    v_scale/v_mn: (B, H, D//gs, T).  p must already be zero beyond the
    valid token count (softmax of -inf-masked logits guarantees this);
    n_quant additionally skips whole blocks past the valid region.
    Equivalent of the reference's value-side `cuda_bmm_fA_qB_outer` call
    (`models/llama_kivi.py:382-383`).

    NOTE on bf16 p: softmax probabilities lose ~2^-8 relative when cast -
    same order as the fp16 kernels in the reference (fp16 has 2^-10).
    """
    B, H, r, T = p.shape
    Dw = v_codes.shape[2]
    fpi = 32 // bits
    D = Dw * fpi
    dg = D // group_size
    t_block = min(t_block, T)
    assert T % t_block == 0
    BH = B * H
    nq = jnp.asarray(T if n_quant is None else n_quant,
                     jnp.int32).reshape(1)

    kernel = functools.partial(_pv_kernel, bits=bits, gs=group_size,
                               t_block=t_block, cdt=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T // t_block),
        in_specs=[
            pl.BlockSpec((1, r, t_block), lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dw, t_block), lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, t_block), lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, t_block), lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, D), lambda b, t, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, r, D), jnp.float32),
        interpret=_use_interpret(),
    )(
        nq,
        p.astype(compute_dtype).reshape(BH, r, T),
        v_codes.reshape(BH, Dw, T),
        v_scale.astype(compute_dtype).reshape(BH, dg, T),
        v_mn.astype(compute_dtype).reshape(BH, dg, T),
    )
    return out.reshape(B, H, r, D)

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
    return dict(preferred_element_type=jnp.float32)


def _unpack_codes(words, bits: int, compute_dtype):
    """words (Dw, Tblk) u32 -> (D, Tblk) codes, channels in natural order.

    NOTE: Mosaic has no direct u32->float cast; go through i32, concatenate
    the planes while still integer, and do ONE wide cast (codes are
    < 2**bits so the value is preserved; integers < 256 are exact in bf16).
    Measured on v5e: the shift+mask sweep over the word tile is the VPU
    floor of this kernel (~2 vreg-ops per output element); see
    docs/kernels.md for the optimization ledger.
    """
    fpi = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    planes = [((words >> jnp.uint32(j * bits)) & mask).astype(jnp.int32)
              for j in range(fpi)]
    return jnp.concatenate(planes, axis=0).astype(compute_dtype)


def _group_expand_rows(n_groups: int, n: int, dtype):
    """One-hot E (n_groups, n): E[g, i] = 1 iff i // gs == g."""
    gs = n // n_groups
    gid = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n), 0)
    iid = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n), 1) // gs
    return (gid == iid).astype(dtype)


# ---------------------------------------------------------------------------
# QK^T over the packed key store
# ---------------------------------------------------------------------------

def _qk_kernel(q_ref, w_ref, s_ref, m_ref, o_ref, *, bits: int, gs: int,
               cdt):
    # q (1, r, D) | w (1, Dw, Tblk) u32 | s,m (1, D, Tgb)
    kw = _dot_kw(cdt)
    q = q_ref[0].astype(cdt)                        # (r, D)
    codes = _unpack_codes(w_ref[0], bits, cdt)      # (D, Tblk)
    scale = s_ref[0].astype(cdt)                    # (D, Tgb)
    mn = m_ref[0].astype(cdt)
    tgb, tblk = scale.shape[1], codes.shape[1]
    expand = _group_expand_rows(tgb, tblk, cdt)     # (Tgb, Tblk)
    scale_exp = jnp.dot(scale, expand, **kw).astype(cdt)  # (D, Tblk)
    att = jnp.dot(q, codes * scale_exp, **kw)       # f32 accum
    qmn = jnp.dot(q, mn, **kw)                      # (r, Tgb)
    att += jnp.dot(qmn.astype(cdt), expand, **kw)
    o_ref[0] = att


@functools.partial(jax.jit,
                   static_argnames=("group_size", "bits", "t_block",
                                    "compute_dtype"))
def qk_dequant_matmul(qg, k_codes, k_scale, k_mn, group_size: int, bits: int,
                      t_block: int = 2048, compute_dtype=jnp.bfloat16):
    """att = qg @ dequant(K): (B,H,r,D) x (B,H,Dw,T) -> (B,H,r,T) f32.

    k_scale/k_mn: (B, H, D, T//gs).  Contract of the reference's
    `cuda_bmm_fA_qB_outer(group_size, fA, qB, scales, zeros, bits)`
    (`quant/matmul.py:178`), with our transposed plane-packed layout.
    """
    B, H, r, D = qg.shape
    T = k_codes.shape[-1]
    gs = group_size
    t_block = min(t_block, T)
    assert T % t_block == 0 and t_block % gs == 0
    tgb = t_block // gs
    Dw = k_codes.shape[2]
    BH = B * H

    grid = (BH, T // t_block)
    kernel = functools.partial(_qk_kernel, bits=bits, gs=gs,
                               cdt=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dw, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, tgb), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, tgb), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, t_block), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, r, T), jnp.float32),
        interpret=_use_interpret(),
    )(
        qg.astype(compute_dtype).reshape(BH, r, D),
        k_codes.reshape(BH, Dw, T),
        k_scale.astype(compute_dtype).reshape(BH, D, T // gs),
        k_mn.astype(compute_dtype).reshape(BH, D, T // gs),
    )
    return out.reshape(B, H, r, T)


# ---------------------------------------------------------------------------
# P @ V over the packed value store
# ---------------------------------------------------------------------------

def _pv_kernel(p_ref, w_ref, s_ref, m_ref, o_ref, *, bits: int, gs: int,
               cdt):
    # p (1, r, Tblk) | w (1, Dw, Tblk) | s,m (1, Dg, Tblk) | o (1, r, D)
    kw = _dot_kw(cdt)
    t_idx = pl.program_id(1)
    p = p_ref[0].astype(cdt)                          # (r, Tblk)
    codes = _unpack_codes(w_ref[0], bits, cdt)        # (D, Tblk)
    scale = s_ref[0].astype(cdt)                      # (Dg, Tblk)
    mn = m_ref[0].astype(cdt)
    D = codes.shape[0]
    dg = scale.shape[0]
    expand = _group_expand_rows(dg, D, cdt)           # (Dg, D)
    # scale_exp (D, Tblk) = E^T @ scale (tiny matmul)
    scale_exp = jax.lax.dot_general(
        expand, scale, (((0,), (0,)), ((), ())), **kw).astype(cdt)
    # out_blk (r, D) = p @ (codes * scale_exp)^T  (NT matmul, contract Tblk)
    acc = jax.lax.dot_general(p, codes * scale_exp,
                              (((1,), (1,)), ((), ())), **kw)
    pmn = jax.lax.dot_general(p, mn, (((1,), (1,)), ((), ())), **kw)
    acc += jnp.dot(pmn.astype(cdt), expand, **kw)

    @pl.when(t_idx == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_ref[0] += acc


@functools.partial(jax.jit,
                   static_argnames=("group_size", "bits", "t_block",
                                    "compute_dtype"))
def pv_dequant_matmul(p, v_codes, v_scale, v_mn, group_size: int, bits: int,
                      t_block: int = 2048, compute_dtype=jnp.bfloat16):
    """out = p @ dequant(V): (B,H,r,T) x (B,H,Dw,T) -> (B,H,r,D) f32.

    v_scale/v_mn: (B, H, D//gs, T).  p must already be zero beyond the
    valid token count (softmax of -inf-masked logits guarantees this).
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

    grid = (BH, T // t_block)
    kernel = functools.partial(_pv_kernel, bits=bits, gs=group_size,
                               cdt=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dw, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, D), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, r, D), jnp.float32),
        interpret=_use_interpret(),
    )(
        p.astype(compute_dtype).reshape(BH, r, T),
        v_codes.reshape(BH, Dw, T),
        v_scale.astype(compute_dtype).reshape(BH, dg, T),
        v_mn.astype(compute_dtype).reshape(BH, dg, T),
    )
    return out.reshape(B, H, r, D)

"""Flash-extend kernel (Pallas, TPU): chunked-prefill attention over the
quantized history with ONLINE softmax — no O(T1 * Tmax) logits in HBM.

`core.attention.extend_attention` attends three position ranges: the
packed quantized stores [0, n_k_quant), the fp key window, and the
suffix's causal self block.  The quantized half dominates memory (its
logits are (r*T1, Tmax)); this kernel computes it flash-style — one
(R, D) query block resident, chunk loop over the packed stores, running
(m, l, acc) — and returns the UNNORMALIZED partial state.  The window
(W lanes) and self (T1 lanes) halves stay in jnp where they are small,
and the caller merges the three by the standard flash combination.

The chunk body (3-op bitcast dequant, group->token scale expansion,
V-store/window cross-routing via the staged vstrip buffer) matches
fused_decode._kernel — this is that kernel's multi-query-row sibling,
minus the window phase.  The reference has no extend path at all (its
prefill is all-or-nothing, `models/llama_kivi.py:420-452`); its closest
kernel is the single-query fused GEMV (`quant/gemv_cuda.cu:348-427`).

Masks supported:
  * per-batch-row left-pad lower bound (positions < pad are garbage);
  * Mistral sliding window: each suffix query i (absolute position
    T0 + i) sees only positions > T0 + i - sliding_window, a PER-ROW
    lower bound inside the folded (r*T1) query block.
Chunks entirely below every row's lower bound, or entirely beyond
n_k_quant, skip their compute (`pl.when`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kivi_tpu.kernels.qk_pv import _unpack_deq

NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(cnt_ref, q_ref, kw_ref, ks_ref, km_ref, vw_ref, vs_ref, vm_ref,
            vwin_ref, o_ref, m_ref, l_ref, vpad_scr, *, k_bits: int,
            v_bits: int, gs: int, C: int, W: int, T1: int,
            sm_scale: float, sw: int, cdt):
    nkq = cnt_ref[0]
    nvq = cnt_ref[1]
    t0tot = cnt_ref[2]                 # tokens already cached (= seq_len)
    lo_pad = cnt_ref[3 + pl.program_id(0)]
    T = kw_ref.shape[-1]
    nt = T // C
    R = q_ref.shape[1]
    D = q_ref.shape[2]
    # precision pinned EXPLICITLY: under KIVI_TPU_REAL the test
    # conftest sets jax_default_matmul_precision=highest for the
    # jnp f32 oracles, and fp32-precision bf16 matmuls no longer
    # lower in Mosaic (r4 toolchain: 'Bad lhs type').  Kernel
    # accuracy is the quantization-noise class; bf16 MXU is the
    # design point.
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)

    q = q_ref[0]                                           # (R, D) cdt
    # K scale/zp planes arrive as (Tg, D) token-group ROWS (round-4
    # cache layout): contract q against the zp rows directly, transpose
    # the scale plane once for the per-chunk column slices
    qmn = jax.lax.dot_general(q, km_ref[0].astype(cdt),
                              (((1,), (1,)), ((), ())), **kw)  # (R, Tg)
    ksT = jnp.transpose(ks_ref[0], (1, 0)).astype(cdt)     # (D, Tg)
    cg = C // gs
    expand_c = (_iota((cg, C), 0)
                == _iota((cg, C), 1) // gs).astype(cdt)    # (cg, C)
    dgf = vs_ref.shape[1]
    ev = (_iota((dgf, D), 0)
          == _iota((dgf, D), 1) // gs).astype(cdt)         # (Dg, D)

    # per-row sliding-window lower bound: row = rr*T1 + i holds query
    # position t0tot + i
    qidx = _iota((R, 1), 0) % T1
    row_lo = (jnp.maximum(lo_pad, t0tot + qidx - (sw - 1))
              if sw else jnp.full((R, 1), lo_pad, jnp.int32))
    # loosest bound across rows (query i = 0), for chunk-level skip
    lo_min = jnp.maximum(lo_pad, t0tot - (sw - 1)) if sw else lo_pad

    m_ref[0] = jnp.full_like(m_ref[0], NEG_INF)
    l_ref[0] = jnp.zeros_like(l_ref[0])
    o_ref[0] = jnp.zeros_like(o_ref[0])
    vpad_scr[:] = jnp.zeros_like(vpad_scr)
    vpad_scr[pl.ds(C, W), :] = vwin_ref[0]

    def vstrip(start, n):
        """(n, D) rows of v_win for positions [start, start+n); see
        fused_decode._kernel.vstrip for the clamp rationale (OOB VMEM
        slices fault on real TPU)."""
        off = jnp.clip(start - nvq + C, 0, vpad_scr.shape[0] - n)
        off = pl.multiple_of(off, 8)
        return vpad_scr[pl.ds(off, n), :]

    def online(s, v_quant_cols, pos0, n):
        m_prev = m_ref[0][:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                             # (R, n) f32
        l_ref[0] = jnp.broadcast_to(
            l_ref[0][:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            l_ref[0].shape)
        m_ref[0] = jnp.broadcast_to(m_new, m_ref[0].shape)
        pos = pos0 + _iota((R, n), 1)
        pc = p.astype(cdt)
        acc = o_ref[0] * alpha
        acc += jax.lax.dot_general(
            jnp.where(pos < nvq, pc, 0).astype(cdt), v_quant_cols,
            (((1,), (1,)), ((), ())), **kw)
        acc += jnp.dot(jnp.where(pos >= nvq, pc, 0).astype(cdt),
                       vstrip(pos0, n).astype(cdt), **kw)
        o_ref[0] = acc

    for c in range(nt):
        t0 = c * C

        @pl.when(jnp.logical_and(t0 < nkq, t0 + C > lo_min))
        def _chunk(t0=t0, c=c):
            kvals, kscale, _ = _unpack_deq(
                kw_ref[0, :, pl.ds(t0, C)],
                ksT[:, c * cg:(c + 1) * cg],
                None, k_bits, cdt)
            s_exp = jnp.dot(kscale.astype(cdt), expand_c, **kw).astype(cdt)
            s = jnp.dot(q, kvals * s_exp, **kw)
            s += jnp.dot(qmn[:, c * cg:(c + 1) * cg].astype(cdt),
                         expand_c, **kw)
            s *= sm_scale
            pos = t0 + _iota((R, C), 1)
            s = jnp.where(jnp.logical_and(pos < nkq, pos >= row_lo),
                          s, NEG_INF)

            vvals, vscale, vmn = _unpack_deq(
                vw_ref[0, :, pl.ds(t0, C)],
                vs_ref[0, :, pl.ds(t0, C)].astype(cdt),
                vm_ref[0, :, pl.ds(t0, C)].astype(cdt), v_bits, cdt)
            vs_exp = jax.lax.dot_general(
                ev, vscale.astype(cdt), (((0,), (0,)), ((), ())),
                **kw).astype(cdt)
            vmn_exp = jax.lax.dot_general(
                ev, vmn.astype(cdt), (((0,), (0,)), ((), ())),
                **kw).astype(cdt)
            vcols = vvals * vs_exp + vmn_exp                 # (D, C)
            vcols = jnp.where(t0 + _iota((D, C), 1) < nvq, vcols, 0)
            online(s, vcols, t0, C)


@functools.partial(
    jax.jit, static_argnames=("group_size", "k_bits", "v_bits", "t1",
                              "chunk", "sliding_window", "compute_dtype"))
def flash_extend_qhist(qg, k_codes, k_scale, k_mn, v_codes, v_scale,
                       v_mn, v_win, n_k_quant, n_v_quant, seq_len, *,
                       group_size: int, k_bits: int, v_bits: int,
                       t1: int, chunk: int = 512,
                       sliding_window: int = 0,
                       compute_dtype=jnp.bfloat16, pad_len=None):
    """Partial flash state of the suffix queries vs the QUANTIZED
    history [0, n_k_quant).

    qg (B, H, R, D) with R = r * t1 folded rows (row rr*t1 + i = GQA
    sub-head rr, suffix query i); packed stores as in KiviLayerCache;
    v_win (B, H, W, D) backs V reads for K-quantized positions whose V
    still lives in the window.  Returns (acc, m, l): acc (B, H, R, D)
    f32 UNNORMALIZED, m/l (B, H, R) f32 running max / normalizer
    (sm_scale already applied to logits).  Rows that saw no valid
    position return (0, NEG_INF, 0) — the neutral element of the flash
    merge.  sliding_window=0 disables the per-row bound.
    """
    B, H, R, D = qg.shape
    assert R == (R // t1) * t1 and R <= 2048, "query fold too large"
    T = k_codes.shape[-1]
    W = v_win.shape[2]
    gs = group_size
    C = min(chunk, T)
    assert T % C == 0 and C % gs == 0 and W <= C
    BH = B * H
    KDw, VDw = k_codes.shape[2], v_codes.shape[2]
    lo = (jnp.zeros((B,), jnp.int32) if pad_len is None
          else jnp.asarray(pad_len, jnp.int32).reshape(B))
    cnt = jnp.concatenate([
        jnp.stack([jnp.asarray(n_k_quant, jnp.int32),
                   jnp.asarray(n_v_quant, jnp.int32),
                   jnp.asarray(seq_len, jnp.int32)]),
        jnp.repeat(lo, H),
    ])

    kernel = functools.partial(
        _kernel, k_bits=k_bits, v_bits=v_bits, gs=gs, C=C, W=W, T1=t1,
        sm_scale=1.0 / (D ** 0.5), sw=sliding_window, cdt=compute_dtype)
    full = lambda b, *_: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, R, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KDw, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // gs, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // gs, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VDw, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D // gs, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D // gs, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, D), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), full, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * C + W, D), compute_dtype),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, R, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((BH, R, 128), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(
        cnt,
        qg.astype(compute_dtype).reshape(BH, R, D),
        k_codes.reshape(BH, KDw, T),
        k_scale.astype(compute_dtype).reshape(BH, T // gs, D),
        k_mn.astype(compute_dtype).reshape(BH, T // gs, D),
        v_codes.reshape(BH, VDw, T),
        v_scale.astype(compute_dtype).reshape(BH, D // gs, T),
        v_mn.astype(compute_dtype).reshape(BH, D // gs, T),
        v_win.astype(compute_dtype).reshape(BH, W, D),
    )
    return (acc.reshape(B, H, R, D),
            m.reshape(B, H, R, 128)[..., 0],
            l.reshape(B, H, R, 128)[..., 0])

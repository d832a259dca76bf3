"""Fused KIVI decode attention (Pallas, TPU): the megakernel.

One kernel computes the ENTIRE single-token KIVI attention per
(batch, kv-head): QK over the packed 2/4-bit key store AND the fp key
window, one online softmax, PV over the packed value store, the value
window, and the cross-routing of probabilities for positions whose key
and value live in different stores (the K store flushes in
residual_length blocks while the V store flushes in v_flush blocks, so
the boundaries differ — reference semantics `models/llama_kivi.py:
115-129,167-172` compute this with concatenated softmax halves).

Replaces the split pipeline (qk_dequant_matmul -> XLA softmax + prob
routing -> pv_dequant_matmul) with zero HBM round-trips for the logits
and probabilities, one VMEM residency for all cache rows of the head,
chunk-level gating on the valid length (dead chunks cost nothing), and
the 3-op bitcast dequant (see qk_pv._unpack_bitcast).

Position layout (cache invariant: n_k_quant + n_k_win == seq_len ==
n_v_quant + n_v_win):
  keys:   pos <  n_k_quant      -> packed store row pos
          pos >= n_k_quant      -> k_win row pos - n_k_quant
  values: pos <  n_v_quant      -> packed store row pos
          pos >= n_v_quant      -> v_win row pos - n_v_quant
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


def _row_iota(rows, cols, dim=1):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, cols), dim)


def _kernel(cnt_ref, q_ref, kw_ref, ks_ref, km_ref, vw_ref, vs_ref, vm_ref,
            kwin_ref, vwin_ref, o_ref, m_scr, l_scr, acc_scr, vpad_scr, *,
            k_bits: int, v_bits: int, gs: int, C: int, W: int,
            sm_scale: float, cdt):
    nkq = cnt_ref[0]
    nkw = cnt_ref[1]
    nvq = cnt_ref[2]
    lo = cnt_ref[3 + pl.program_id(0)]   # row's left-pad lower bound
    t = nkq + nkw                     # total tokens (current pos = t-1)
    T = kw_ref.shape[-1]
    nt = T // C
    r = q_ref.shape[1]
    D = q_ref.shape[2]
    # precision pinned EXPLICITLY: under KIVI_TPU_REAL the test
    # conftest sets jax_default_matmul_precision=highest for the
    # jnp f32 oracles, and fp32-precision bf16 matmuls no longer
    # lower in Mosaic (r4 toolchain: 'Bad lhs type').  Kernel
    # accuracy is the quantization-noise class; bf16 MXU is the
    # design point.
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)

    q = q_ref[0]                                           # (r, D) cdt
    # zero-point projections, hoisted once (tiny).  K scale/zp planes
    # arrive as (Tg, D) token-group ROWS (round-4 cache layout);
    # contract q against the zp rows directly and transpose the scale
    # plane once for the per-chunk column slices.
    qmn = jax.lax.dot_general(q, km_ref[0].astype(cdt),
                              (((1,), (1,)), ((), ())), **kw)  # (r, Tg)
    ksT = jnp.transpose(ks_ref[0], (1, 0)).astype(cdt)     # (D, Tg)
    cg = C // gs
    # group one-hots, hoisted: chunk-local token groups and V channels
    expand_c = (_row_iota(cg, C, 0)
                == _row_iota(cg, C, 1) // gs).astype(cdt)  # (cg, C)
    dgf = vs_ref.shape[1]
    ev = (_row_iota(dgf, D, 0)
          == _row_iota(dgf, D, 1) // gs).astype(cdt)       # (Dg, D)

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)
    # v_win staged at static offset C of the (2C + W) pad buffer; chunk c
    # reads rows [t0 - nvq + C, +C) so "before the window" resolves to
    # the zero padding.
    vpad_scr[:] = jnp.zeros_like(vpad_scr)
    vpad_scr[pl.ds(C, W), :] = vwin_ref[0]

    def vstrip(start, n):
        """(n, D) rows of v_win for positions [start, start+n)."""
        # Chunks entirely before the window produce raw offsets far
        # outside the pad buffer (down to C - nvq < 0); their reads are
        # zero-weighted, so clamping into bounds is free — and required:
        # OOB VMEM slices fault on TPU and read garbage in interpret.
        # Both clip bounds and the raw offset are multiples of 8 (nvq is
        # v_flush-aligned; C, W multiples of 8), but Mosaic can't prove
        # it, hence the multiple_of.
        off = jnp.clip(start - nvq + C, 0, vpad_scr.shape[0] - n)
        off = pl.multiple_of(off, 8)
        return vpad_scr[pl.ds(off, n), :]

    def online(s, v_quant_cols, pos0, n):
        """One online-softmax update with logits s (r, n) for positions
        [pos0, pos0+n); v_quant_cols: (D, n) dequantized value columns
        (already zero where pos >= nvq)."""
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                             # (r, n) f32
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        pos = pos0 + _row_iota(r, n)
        pc = p.astype(cdt)
        acc = acc_scr[:] * alpha
        # quantized-V half: columns already zeroed beyond nvq
        acc += jax.lax.dot_general(
            jnp.where(pos < nvq, pc, 0).astype(cdt), v_quant_cols,
            (((1,), (1,)), ((), ())), **kw)
        # window-V half
        acc += jnp.dot(jnp.where(pos >= nvq, pc, 0).astype(cdt),
                       vstrip(pos0, n).astype(cdt), **kw)
        acc_scr[:] = acc

    # ---- chunk loop over the packed K region ----------------------------
    for c in range(nt):
        t0 = c * C

        @pl.when(jnp.logical_and(t0 < nkq, t0 + C > lo))
        def _chunk(t0=t0, c=c):
            # chunk-local (static) slices of scales/zps: (D, cg), (r, cg)
            kvals, kscale, _ = _unpack_deq(
                kw_ref[0, :, pl.ds(t0, C)],
                ksT[:, c * cg:(c + 1) * cg],
                None, k_bits, cdt)
            s_exp = jnp.dot(kscale.astype(cdt), expand_c, **kw).astype(cdt)
            s = jnp.dot(q, kvals * s_exp, **kw)
            s += jnp.dot(qmn[:, c * cg:(c + 1) * cg].astype(cdt),
                         expand_c, **kw)
            s *= sm_scale
            pos = t0 + _row_iota(r, C)
            s = jnp.where(jnp.logical_and(pos < nkq, pos >= lo),
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
            cpos = _row_iota(D, C)
            vcols = jnp.where(t0 + cpos < nvq, vcols, 0)
            online(s, vcols, t0, C)

    # ---- fp key window phase --------------------------------------------
    kwin = kwin_ref[0].astype(cdt)                           # (W, D)
    s_w = jax.lax.dot_general(q, kwin, (((1,), (1,)), ((), ())), **kw)
    s_w *= sm_scale
    pos_w = nkq + _row_iota(r, W)
    s_w = jnp.where(jnp.logical_and(pos_w < t, pos_w >= lo), s_w, NEG_INF)
    # quantized V for window positions that still live in the V store
    # (pos in [nkq, nvq), possible when the V store is ahead of K's):
    # aligned dynamic lane slice at nkq (nkq % W == 0 by construction).
    # K flushes in W-blocks so nkq is W-aligned; clamp for the full-cache
    # edge (nkq == T would slice past the store end)
    nkq_a = pl.multiple_of(jnp.minimum(nkq, T - W), W)
    vvals, vscale, vmn = _unpack_deq(
        vw_ref[0, :, pl.ds(nkq_a, W)],
        vs_ref[0, :, pl.ds(nkq_a, W)].astype(cdt),
        vm_ref[0, :, pl.ds(nkq_a, W)].astype(cdt), v_bits, cdt)
    vs_exp = jax.lax.dot_general(
        ev, vscale.astype(cdt), (((0,), (0,)), ((), ())), **kw).astype(cdt)
    vmn_exp = jax.lax.dot_general(
        ev, vmn.astype(cdt), (((0,), (0,)), ((), ())), **kw).astype(cdt)
    vcols = vvals * vs_exp + vmn_exp
    vcols = jnp.where(nkq + _row_iota(D, W) < nvq, vcols, 0)
    online(s_w, vcols, nkq, W)

    l = l_scr[:, :1]
    o_ref[0] = acc_scr[:] / jnp.where(l > 0, l, 1.0)


@functools.partial(
    jax.jit, static_argnames=("group_size", "k_bits", "v_bits", "chunk",
                              "compute_dtype"))
def fused_decode_attention(qg, k_codes, k_scale, k_mn, v_codes, v_scale,
                           v_mn, k_win, v_win, n_k_quant, n_k_win,
                           n_v_quant, *, group_size: int, k_bits: int,
                           v_bits: int, chunk: int = 512,
                           compute_dtype=jnp.bfloat16, pad_len=None):
    """Full KIVI decode attention for one new token.

    qg (B,H,r,D); packed stores as in KiviLayerCache; k_win/v_win
    (B,H,W,D).  Returns (B,H,r,D) f32, softmax over all `seq_len`
    positions.  sm_scale = D**-0.5 applied to logits.

    pad_len: optional (B,) i32 left-padding per batch row; positions
    < pad_len[b] are masked and fully-padded chunks skip their compute.
    """
    B, H, r, D = qg.shape
    T = k_codes.shape[-1]
    W = k_win.shape[2]
    gs = group_size
    C = min(chunk, T)
    assert T % C == 0 and C % gs == 0 and W <= C
    BH = B * H
    KDw, VDw = k_codes.shape[2], v_codes.shape[2]
    lo = (jnp.zeros((B,), jnp.int32) if pad_len is None
          else jnp.asarray(pad_len, jnp.int32).reshape(B))
    cnt = jnp.concatenate([
        jnp.stack([jnp.asarray(n_k_quant, jnp.int32),
                   jnp.asarray(n_k_win, jnp.int32),
                   jnp.asarray(n_v_quant, jnp.int32)]),
        jnp.repeat(lo, H),          # per-program (b*H + h) lower bound
    ])

    kernel = functools.partial(
        _kernel, k_bits=k_bits, v_bits=v_bits, gs=gs, C=C, W=W,
        sm_scale=1.0 / (D ** 0.5), cdt=compute_dtype)
    full = lambda b, *_: (b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, r, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KDw, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // gs, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T // gs, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VDw, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D // gs, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D // gs, T), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, D), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, D), full, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r, 128), jnp.float32),
            pltpu.VMEM((r, 128), jnp.float32),
            pltpu.VMEM((r, D), jnp.float32),
            pltpu.VMEM((2 * C + W, D), compute_dtype),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, r, D), jnp.float32),
        interpret=_use_interpret(),
    )(
        cnt,
        qg.astype(compute_dtype).reshape(BH, r, D),
        k_codes.reshape(BH, KDw, T),
        k_scale.astype(compute_dtype).reshape(BH, T // gs, D),
        k_mn.astype(compute_dtype).reshape(BH, T // gs, D),
        v_codes.reshape(BH, VDw, T),
        v_scale.astype(compute_dtype).reshape(BH, D // gs, T),
        v_mn.astype(compute_dtype).reshape(BH, D // gs, T),
        k_win.astype(compute_dtype).reshape(BH, W, D),
        v_win.astype(compute_dtype).reshape(BH, W, D),
    )
    return out.reshape(B, H, r, D)

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


# ---------------------------------------------------------------------------
# FULL extend megakernel (round 5): quantized history + fp window + causal
# self block in ONE kernel, chunks pipelined on the grid with dead-chunk
# DMA elision.  Replaces the qhist-partial + jnp window/self merge whose
# O(B*T1*(W+T1)) HBM logit temporaries pinned chunked prefill to
# 128-token chunks (VERDICT r4 #2); the jnp path remains the oracle and
# the unaligned-geometry fallback.
# ---------------------------------------------------------------------------



def _full_kernel(cnt_ref, q_ref, kw_ref, ks_ref, km_ref, vw_ref, vs_ref,
                 vm_ref, kwin_ref, vwin_ref, knew_ref, vnew_ref, o_ref,
                 m_scr, l_scr, acc_scr, vpad_scr, *, k_bits: int,
                 v_bits: int, gs: int, C: int, W: int, T1: int, nt: int,
                 r: int, sm_scale: float, sw: int, cdt):
    nkq = cnt_ref[0]
    nvq = cnt_ref[1]
    t0tot = cnt_ref[2]                 # tokens already cached (= seq_len)
    nkwin = cnt_ref[3]
    lo_pad = cnt_ref[4 + pl.program_id(0)]
    it = pl.program_id(1)
    Hg = kw_ref.shape[1]               # folded KV-head group
    RT = r * T1                        # query rows per KV head
    D = q_ref.shape[3]
    cg = C // gs
    # precision pinned explicitly (see module _kernel note)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)

    # per-row lower bound: row rr*T1 + i holds query position t0tot + i
    qidx = _iota((RT, 1), 0) % T1
    row_lo = (jnp.maximum(lo_pad, t0tot + qidx - (sw - 1))
              if sw else jnp.full((RT, 1), lo_pad, jnp.int32))
    lo_min = jnp.maximum(lo_pad, t0tot - (sw - 1)) if sw else lo_pad

    dgf = vs_ref.shape[2]
    ev = (_iota((dgf, D), 0)
          == _iota((dgf, D), 1) // gs).astype(cdt)         # (Dg, D)

    @pl.when(it == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        vpad_scr[:] = jnp.zeros_like(vpad_scr)

    def stage_window(h):
        """Stage head h's value window at static offset C of the
        zero-padded strip buffer (re-staged per folded head)."""
        vpad_scr[pl.ds(C, W), :] = vwin_ref[0, h]

    def vstrip(start, n):
        """(n, D) rows of v_win for positions [start, start+n), clamped
        into the zero-padded staging buffer (OOB VMEM slices fault on
        real TPU; clamped reads are zero-weighted)."""
        off = jnp.clip(start - nvq + C, 0, vpad_scr.shape[0] - n)
        off = pl.multiple_of(off, 8)
        return vpad_scr[pl.ds(off, n), :]

    def online(h, s, v_quant_cols, pos0, n):
        """Online-softmax update of head h's row block for positions
        [pos0, pos0+n) whose V lives in the quantized store (pos < nvq,
        columns v_quant_cols) or the fp window (vstrip rows)."""
        sl = slice(h * RT, (h + 1) * RT)
        m_prev = m_scr[sl][:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                             # (RT, n) f32
        l_scr[sl] = jnp.broadcast_to(
            l_scr[sl][:, :1] * alpha
            + jnp.sum(p, axis=-1, keepdims=True), (RT, 128))
        m_scr[sl] = jnp.broadcast_to(m_new, (RT, 128))
        pos = pos0 + _iota((RT, n), 1)
        pc = p.astype(cdt)
        acc = acc_scr[sl] * alpha
        acc += jax.lax.dot_general(
            jnp.where(pos < nvq, pc, 0).astype(cdt), v_quant_cols,
            (((1,), (1,)), ((), ())), **kw)
        acc += jnp.dot(jnp.where(pos >= nvq, pc, 0).astype(cdt),
                       vstrip(pos0, n).astype(cdt), **kw)
        acc_scr[sl] = acc

    def deq_vcols(words, vs_blk, vm_blk, pos0, n):
        """(D, n) dequantized V columns for store positions
        [pos0, pos0+n), zeroed beyond nvq."""
        vvals, vscale, vmn = _unpack_deq(
            words, vs_blk.astype(cdt), vm_blk.astype(cdt), v_bits, cdt)
        vs_exp = jax.lax.dot_general(
            ev, vscale.astype(cdt), (((0,), (0,)), ((), ())),
            **kw).astype(cdt)
        vmn_exp = jax.lax.dot_general(
            ev, vmn.astype(cdt), (((0,), (0,)), ((), ())),
            **kw).astype(cdt)
        vcols = vvals * vs_exp + vmn_exp                     # (D, n)
        return jnp.where(pos0 + _iota((D, n), 1) < nvq, vcols, 0)

    # ---- chunk steps (grid-pipelined; dead chunks elide their DMA) ------
    t0 = it * C

    @pl.when(jnp.logical_and(jnp.logical_and(it < nt, t0 < nkq),
                             t0 + C > lo_min))
    def _chunk():
        expand_c = (_iota((cg, C), 0)
                    == _iota((cg, C), 1) // gs).astype(cdt)   # (cg, C)
        need_strip = t0 + C > nvq
        for h in range(Hg):
            @pl.when(need_strip)
            def _stage(h=h):
                stage_window(h)
            ksT_c = jnp.transpose(ks_ref[0, h], (1, 0)).astype(cdt)
            kvals, kscale, _ = _unpack_deq(kw_ref[0, h], ksT_c, None,
                                           k_bits, cdt)
            s_exp = jnp.dot(kscale.astype(cdt), expand_c,
                            **kw).astype(cdt)
            q_h = q_ref[0, h]                                # (RT, D)
            s = jnp.dot(q_h, kvals * s_exp, **kw)
            qmn_h = jax.lax.dot_general(q_h, km_ref[0, h].astype(cdt),
                                        (((1,), (1,)), ((), ())), **kw)
            s += jnp.dot(qmn_h.astype(cdt), expand_c, **kw)
            s *= sm_scale
            pos = t0 + _iota((RT, C), 1)
            s = jnp.where(jnp.logical_and(pos < nkq, pos >= row_lo),
                          s, NEG_INF)
            online(h, s,
                   deq_vcols(vw_ref[0, h], vs_ref[0, h], vm_ref[0, h],
                             t0, C), t0, C)

    # ---- final step: fp key window + causal self block + normalize ------
    @pl.when(it == nt)
    def _final():
        @pl.when(nkwin > 0)
        def _window():
            # V for window positions still in the store (pos < nvq):
            # the final grid step's v blocks are PINNED to the block
            # holding [nkq, nkq+W) (nkq is W-aligned; W <= C and
            # C % W == 0 keep the span inside one block)
            in_blk = pl.multiple_of(nkq - (nkq // C) * C, 128)
            for h in range(Hg):
                stage_window(h)
                kwin = kwin_ref[0, h].astype(cdt)            # (W, D)
                q_h = q_ref[0, h]
                s_w = jax.lax.dot_general(q_h, kwin,
                                          (((1,), (1,)), ((), ())), **kw)
                s_w *= sm_scale
                pos_w = nkq + _iota((RT, W), 1)
                s_w = jnp.where(
                    jnp.logical_and(pos_w < nkq + nkwin,
                                    pos_w >= row_lo), s_w, NEG_INF)
                online(h, s_w,
                       deq_vcols(vw_ref[0, h, :, pl.ds(in_blk, W)],
                                 vs_ref[0, h, :, pl.ds(in_blk, W)],
                                 vm_ref[0, h, :, pl.ds(in_blk, W)],
                                 nkq, W),
                       nkq, W)

        # causal self block: always has the diagonal, so l > 0 and any
        # poisoned all-masked running state is killed by alpha == 0
        jj = _iota((RT, T1), 1)
        # causal (j <= i) with the pad diagonal exemption folded into
        # the predicate (mask-then-reopen NaNs under fusion - see
        # core.attention._extend_ws_logits); row_lo covers pad + SWA
        valid = jnp.logical_and(
            jj <= qidx,
            jnp.logical_or(jj + t0tot >= row_lo, jj == qidx))
        for h in range(Hg):
            sl = slice(h * RT, (h + 1) * RT)
            q_h = q_ref[0, h]
            knew = knew_ref[0, h].astype(cdt)                # (T1, D)
            s_s = jax.lax.dot_general(q_h, knew,
                                      (((1,), (1,)), ((), ())), **kw)
            s_s *= sm_scale
            s_s = jnp.where(valid, s_s, NEG_INF)
            m_prev = m_scr[sl][:, :1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s_s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s_s - m_new)
            l = (l_scr[sl][:, :1] * alpha
                 + jnp.sum(p, axis=-1, keepdims=True))
            acc = acc_scr[sl] * alpha + jnp.dot(
                p.astype(cdt), vnew_ref[0, h].astype(cdt), **kw)
            o_ref[0, h] = acc / jnp.where(l > 0, l, 1.0)


def extend_head_fold(Hkv: int, r: int, T1: int) -> int:
    """Largest KV-head fold with the folded query rows (Hg * r * T1)
    within the 2048-row scratch budget.  Folding exists to amortize the
    ~0.7 us per-program-per-grid-step overhead: at B=88, H=32 the
    unfolded grid is 2816 programs x nt+1 steps = ~18 ms of pure
    dispatch (measured r5); Hg=16 cuts it 16x."""
    hg = 1
    for cand in (2, 4, 8, 16, 32):
        if Hkv % cand == 0 and cand * r * T1 <= 2048:
            hg = cand
    return hg


def flash_extend_full_supported(Tmax: int, W: int, T1: int, r: int,
                                group_size: int, chunk: int = 512) -> bool:
    """Static legality of the full extend megakernel: 128-aligned
    window (the pinned window-V lane slice), chunk evenly splitting T
    and split by W (pinned span inside one block), and the folded query
    rows within the VMEM budget."""
    C = min(chunk, Tmax)
    return (W % 128 == 0 and C % group_size == 0 and Tmax % C == 0
            and C % W == 0 and W <= C and r * T1 <= 2048)


@functools.partial(
    jax.jit, static_argnames=("group_size", "k_bits", "v_bits", "t1",
                              "chunk", "sliding_window", "compute_dtype",
                              "head_fold"))
def flash_extend_attention(qg, k_codes, k_scale, k_mn, v_codes, v_scale,
                           v_mn, k_win, v_win, k_new, v_new, n_k_quant,
                           n_k_win, n_v_quant, seq_len, *,
                           group_size: int, k_bits: int, v_bits: int,
                           t1: int, chunk: int = 512,
                           sliding_window: int = 0,
                           compute_dtype=jnp.bfloat16, pad_len=None,
                           head_fold: int | None = None):
    """FULL extend attention in one kernel: suffix queries qg
    (B, H, R, D) with R = r * t1 folded rows attend the quantized
    history, the fp K/V windows, and their own causal self block
    (k_new/v_new (B, H, t1, D), not yet in the cache).  Returns the
    NORMALIZED (B, H, R, D) f32 output - no jnp merge, no O(T1*Tmax) or
    O(T1*(W+T1)) HBM logits.  Chunks ride the grid: dead chunks (beyond
    n_k_quant, or before the pad/SWA lower bound) clamp their index
    maps so Pallas skips their DMA - a partially filled cache streams
    only its live fraction (the qhist-partial kernel fetched the full
    store every call).  The final grid step pins the v-store block
    holding [n_k_quant, +W) for window positions whose V is quantized.
    head_fold KV heads share one program (extend_head_fold default) to
    amortize per-program grid-step dispatch.

    Reference: the extend path has no counterpart (`models/
    llama_kivi.py:420-452` prefills all-or-nothing); the two-half
    softmax semantics are `llama_kivi.py:115-129,167-172` generalized
    to T1 suffix rows.
    """
    B, H, R, D = qg.shape
    r = R // t1
    assert R == r * t1 and R <= 2048, "query fold too large"
    T = k_codes.shape[-1]
    W = v_win.shape[2]
    gs = group_size
    C = min(chunk, T)
    assert (T % C == 0 and C % gs == 0 and W <= C and W % 128 == 0
            and C % W == 0)
    Hg = head_fold if head_fold is not None else extend_head_fold(
        H, r, t1)
    assert H % Hg == 0 and Hg * r * t1 <= 2048
    ng = H // Hg
    KDw, VDw = k_codes.shape[2], v_codes.shape[2]
    cg = C // gs
    nt = T // C
    lo = (jnp.zeros((B,), jnp.int32) if pad_len is None
          else jnp.asarray(pad_len, jnp.int32).reshape(B))
    cnt = jnp.concatenate([
        jnp.stack([jnp.asarray(n_k_quant, jnp.int32),
                   jnp.asarray(n_v_quant, jnp.int32),
                   jnp.asarray(seq_len, jnp.int32),
                   jnp.asarray(n_k_win, jnp.int32)]),
        jnp.repeat(lo, ng),
    ])

    kernel = functools.partial(
        _full_kernel, k_bits=k_bits, v_bits=v_bits, gs=gs, C=C, W=W,
        T1=t1, nt=nt, r=r, sm_scale=1.0 / (D ** 0.5), sw=sliding_window,
        cdt=compute_dtype)

    full4 = lambda i, t, cnt: (i // ng, i % ng, 0, 0)

    def lo_blk(i, cnt):
        lo_b = cnt[4 + i]
        if sliding_window:
            lo_b = jnp.maximum(lo_b, cnt[2] - (sliding_window - 1))
        return lo_b // C

    def kblk(i, t, cnt):
        # dead chunks (tail beyond n_k_quant / front below the lower
        # bound) clamp to the nearest live block: consecutive equal
        # indices make Pallas elide the fetch
        return jnp.clip(
            jnp.maximum(jnp.minimum(t, (cnt[0] + C - 1) // C - 1),
                        lo_blk(i, cnt)), 0, nt - 1)

    def vblk(i, t, cnt):
        # chunk steps ride the K clamp; the final step pins the block
        # holding the window span [nkq, nkq + W)
        pin = jnp.minimum(cnt[0] // C, nt - 1)
        return jnp.where(t == nt, pin, kblk(i, t, cnt))

    kclamp = lambda i, t, cnt: (i // ng, i % ng, 0, kblk(i, t, cnt))
    ksc = lambda i, t, cnt: (i // ng, i % ng, kblk(i, t, cnt), 0)
    vclamp = lambda i, t, cnt: (i // ng, i % ng, 0, vblk(i, t, cnt))
    vsc = vclamp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * ng, nt + 1),
        in_specs=[
            pl.BlockSpec((1, Hg, R, D), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, KDw, C), kclamp,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, cg, D), ksc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, cg, D), ksc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, VDw, C), vclamp,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, D // gs, C), vsc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, D // gs, C), vsc,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, W, D), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, W, D), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, t1, D), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, t1, D), full4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hg, R, D), full4,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hg * R, 128), jnp.float32),
            pltpu.VMEM((Hg * R, 128), jnp.float32),
            pltpu.VMEM((Hg * R, D), jnp.float32),
            pltpu.VMEM((2 * C + W, D), compute_dtype),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, R, D), jnp.float32),
        interpret=_use_interpret(),
    )(
        cnt,
        qg.astype(compute_dtype),
        k_codes,
        k_scale.astype(compute_dtype),
        k_mn.astype(compute_dtype),
        v_codes,
        v_scale.astype(compute_dtype),
        v_mn.astype(compute_dtype),
        k_win.astype(compute_dtype),
        v_win.astype(compute_dtype),
        k_new.astype(compute_dtype),
        v_new.astype(compute_dtype),
    )
    return out


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

"""Head-folded fused KIVI decode attention (Pallas, TPU).

The per-(batch, kv-head) megakernel (fused_decode.py) runs one MXU row
per query head — for MHA models that is r=1 row per program: tiny MXU /
VPU utilization across B*H programs.  This kernel folds ALL KV heads of
a batch element into one program:

  * rows = HR = Hkv * r query heads (32 for Llama-2 MHA and for
    Llama-3/Mistral GQA alike) — full sublane utilization;
  * QK runs as ONE (HR, Hkv*D) x (Hkv*D, C) matmul with a
    BLOCK-DIAGONAL q (lane-tiled + head-masked) — off-head products are
    computed and discarded (the MXU was idle anyway; every vector op is
    32x wider);
  * the packed stores unpack for all heads at once: the bitcast crumb
    unpack of a (Hkv*Dw, C) word tile yields rows in the order
    rho(j, h, w, half) = j*(2*Hkv*Dw) + h*(2*Dw) + 2w + half; scale
    application uses per-j-block static slices of the NATURAL scale
    layout (each j-block is a contiguous reshape) and the output folds
    back to channel order through a constant one-hot P matmul — nothing
    is ever physically permuted;
  * cross-head softmax leakage is impossible: off-head logits are -inf.

Chunks ride the GRID (pipelined DMA); scratch carries the online softmax
across chunks; the final grid step resolves the fp windows and the
K/V store boundary strip.

Requirements (dispatcher falls back to fused_decode / split otherwise):
k/v bits in {2,4}, residual_length % 128 == 0, v_flush % 128 == 0
(128-lane-aligned n_v_quant for the strip slices), T % chunk == 0.

Reference semantics: `models/llama_kivi.py:115-129,167-172` (two-half
softmax), `quant/csrc/gemv_cuda.cu:276-280` (GQA head indexing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kivi_tpu.kernels.qk_pv import _unpack_bitcast

NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(cnt_ref, q_ref, kw_ref, ks_ref, km_ref, vw_ref, vs_ref, vm_ref,
            vwb_ref, vsb_ref, vmb_ref, kwin_ref, vwin_ref, o_ref,
            m_scr, l_scr, acc_scr, qbd_scr, qmn_scr, pwin_scr, maskv_scr,
            pfold_scr, ev_scr, p_scr, *,
            k_bits: int, v_bits: int, gs: int, C: int, W: int, r: int,
            T: int, sm_scale: float, cdt):
    nkq = cnt_ref[0]
    nkw = cnt_ref[1]
    nvq = cnt_ref[2]
    t_total = nkq + nkw
    it = pl.program_id(1)
    nt = T // C
    Hkv = kw_ref.shape[1]
    HR, D = q_ref.shape[1], q_ref.shape[2]
    HD = Hkv * D
    kdw2 = 2 * (D * k_bits // 32)   # rho rows per (j, head) block for K
    vdw2 = 2 * (D * v_bits // 32)
    njk = 16 // k_bits
    Dg = D // gs
    cg = C // gs
    Fk = float({2: 128, 4: 16}[k_bits])
    Fv = float({2: 128, 4: 16}[v_bits])
    kw = dict(preferred_element_type=jnp.float32)

    head_of_row = _iota((HR, 1), 0) // r          # (HR, 1)

    # ---- first grid step: per-program constants into scratch -------------
    @pl.when(it == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        pwin_scr[:] = jnp.zeros_like(pwin_scr)
        q = q_ref[0].astype(cdt) * cdt(sm_scale)  # fold sm_scale into q
        # block-diagonal q over K-rho columns: per j-block, lane-tile the
        # j-th channel slice Hkv times (tile order == h-major) and mask
        for j in range(njk):
            qj = pltpu.repeat(q[:, j * kdw2:(j + 1) * kdw2], Hkv, 1)
            col_h = _iota((HR, Hkv * kdw2), 1) // kdw2
            qbd_scr[:, j * Hkv * kdw2:(j + 1) * Hkv * kdw2] = jnp.where(
                col_h == head_of_row, qj, 0)
        # natural-order block-diagonal q for the zero-point projection
        q_nat = jnp.where(_iota((HR, HD), 1) // D == head_of_row,
                          pltpu.repeat(q, Hkv, 1), 0)
        Tg = km_ref.shape[-1]
        qmn_scr[:] = jnp.dot(q_nat, km_ref[0].reshape(HD, Tg).astype(cdt),
                             **kw)
        # V-rho row head mask (HR, HD)
        vrho_h = (_iota((HR, HD), 1) % (Hkv * vdw2)) // vdw2
        maskv_scr[:] = (vrho_h == head_of_row).astype(cdt)
        # P: one-hot (HD, D) folding V-rho rows to channel order
        rho = _iota((HD, D), 0)
        dd = (rho // (Hkv * vdw2)) * vdw2 + rho % vdw2
        pfold_scr[:] = (dd == _iota((HD, D), 1)).astype(cdt)
        # E: one-hot (Hkv*Dg, HD) expanding V scales over rho rows
        rho2 = _iota((Hkv * Dg, HD), 1)
        hh = (rho2 % (Hkv * vdw2)) // vdw2
        dd2 = (rho2 // (Hkv * vdw2)) * vdw2 + rho2 % vdw2
        ev_scr[:] = jnp.logical_and(
            hh == _iota((Hkv * Dg, HD), 0) // Dg,
            dd2 // gs == _iota((Hkv * Dg, HD), 0) % Dg).astype(cdt)

    def online(s):
        """Online softmax bookkeeping; returns p (f32) and alpha."""
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        pwin_scr[:] = pwin_scr[:] * alpha
        acc_scr[:] = acc_scr[:] * alpha
        return p

    def add_quant_v(p_cdt, vcols_rho):
        """acc += fold(p @ vcols^T): p (HR, n) cdt, vcols (HD, n) rho."""
        ow = jax.lax.dot_general(p_cdt, vcols_rho,
                                 (((1,), (1,)), ((), ())), **kw)
        ow = ow * maskv_scr[:].astype(jnp.float32)
        acc_scr[:] = acc_scr[:] + jnp.dot(ow.astype(cdt), pfold_scr[:],
                                          **kw)

    def deq_v_cols(words, vscale, vmn, pos0):
        """(Hkv*VDw, n) words -> (HD, n) rho-row V columns, zeroed where
        pos0 + col >= nvq."""
        n = words.shape[-1]
        vals = _unpack_bitcast(words, v_bits, cdt) - cdt(1.0)
        vs = jax.lax.dot_general(
            ev_scr[:], vscale.reshape(Hkv * Dg, n) * cdt(Fv),
            (((0,), (0,)), ((), ())), **kw).astype(cdt)
        vm = jax.lax.dot_general(
            ev_scr[:], vmn.reshape(Hkv * Dg, n),
            (((0,), (0,)), ((), ())), **kw).astype(cdt)
        vcols = vals * vs + vm
        live = pos0 + _iota((HD, n), 1) < nvq
        return jnp.where(live, vcols, 0.0)

    # ---- chunk steps ------------------------------------------------------
    # All chunk math runs in per-j-block pieces (rows Hkv*2Dw at a time):
    # materializing the full (HD, C) dequantized tiles blew the 16 MB VMEM
    # budget at T=4096; the per-block form keeps every temporary at
    # (Hkv*2Dw, C) while issuing the same total MXU work.
    @pl.when(jnp.logical_and(it < nt, it * C < nkq))
    def _chunk():
        t0 = it * C
        mask2 = jnp.uint32({2: 0x0003_0003, 4: 0x000F_000F}[k_bits])
        expo = jnp.uint32(0x3F80_3F80)
        kwords = kw_ref[0].reshape(Hkv * kw_ref.shape[2], C)
        Tg = km_ref.shape[-1]
        # global group -> chunk-column one-hot (Tg, C)
        Eg = (_iota((Tg, C), 0) == (t0 + _iota((Tg, C), 1)) // gs)
        Eg = Eg.astype(cdt)
        s = jnp.dot(qmn_scr[:].astype(cdt), Eg, **kw)        # zp term
        nb = Hkv * kdw2
        for j in range(njk):
            t = (kwords >> jnp.uint32(k_bits * j)) & mask2
            if k_bits == 4:
                t = t << jnp.uint32(3)
            vals_j = pltpu.bitcast(t | expo, jnp.bfloat16).astype(cdt)
            vals_j = vals_j - cdt(1.0)                       # (nb, C)
            sblk = ks_ref[0, :, j * kdw2:(j + 1) * kdw2, :]
            sblk = sblk.reshape(nb, Tg).astype(cdt) * cdt(Fk)
            sexp_j = jnp.dot(sblk, Eg, **kw).astype(cdt)
            s += jnp.dot(qbd_scr[:, j * nb:(j + 1) * nb].astype(cdt),
                         vals_j * sexp_j, **kw)
        pos_row = t0 + _iota((HR, C), 1)
        s = jnp.where(pos_row < nkq, s, NEG_INF)

        p = online(s)
        pc = p.astype(cdt)
        # V side, also per j-block
        mask2v = jnp.uint32({2: 0x0003_0003, 4: 0x000F_000F}[v_bits])
        vwords = vw_ref[0].reshape(Hkv * vw_ref.shape[2], C)
        vlive = (t0 + _iota((1, C), 1) < nvq).astype(cdt)    # (1, C)
        vscale = vs_ref[0].reshape(Hkv * Dg, C).astype(cdt) * cdt(Fv)
        vmn = vm_ref[0].reshape(Hkv * Dg, C).astype(cdt)
        nbv = Hkv * vdw2
        njv = 16 // v_bits
        acc_add = jnp.zeros_like(acc_scr)
        for j in range(njv):
            t = (vwords >> jnp.uint32(v_bits * j)) & mask2v
            if v_bits == 4:
                t = t << jnp.uint32(3)
            vals_j = pltpu.bitcast(t | expo, jnp.bfloat16).astype(cdt)
            vals_j = vals_j - cdt(1.0)                       # (nbv, C)
            Ej = ev_scr[:, j * nbv:(j + 1) * nbv]            # (HkvDg, nbv)
            vs_j = jax.lax.dot_general(
                Ej, vscale, (((0,), (0,)), ((), ())), **kw).astype(cdt)
            vm_j = jax.lax.dot_general(
                Ej, vmn, (((0,), (0,)), ((), ())), **kw).astype(cdt)
            vcols_j = (vals_j * vs_j + vm_j) * vlive
            ow_j = jax.lax.dot_general(pc, vcols_j,
                                       (((1,), (1,)), ((), ())), **kw)
            ow_j = ow_j * maskv_scr[:, j * nbv:(j + 1) * nbv].astype(
                jnp.float32)
            acc_add = acc_add + jnp.dot(
                ow_j.astype(cdt), pfold_scr[j * nbv:(j + 1) * nbv, :],
                **kw)
        acc_scr[:] = acc_scr[:] + acc_add

        # strip capture: probabilities of positions [nvq, nvq+W) live in
        # this chunk when it contains nvq (128-aligned lane slice)
        @pl.when(jnp.logical_and(t0 <= nvq, nvq < t0 + C))
        def _capture():
            off = pl.multiple_of(nvq - t0, 128)
            p_scr[:] = p
            pwin_scr[:, W:2 * W] = p_scr[:, pl.ds(off, W)]

    # ---- final step: fp key window + value-window/strip resolution -------
    @pl.when(it == nt)
    def _window():
        q = q_ref[0].astype(cdt) * cdt(sm_scale)
        kwin = kwin_ref[0].reshape(Hkv * W, D).astype(cdt)
        s_w = jax.lax.dot_general(q, kwin, (((1,), (1,)), ((), ())), **kw)
        col_h = _iota((HR, Hkv * W), 1) // W
        pos_w = nkq + _iota((HR, Hkv * W), 1) % W
        valid = jnp.logical_and(col_h == head_of_row, pos_w < t_total)
        s_w = jnp.where(valid, s_w, NEG_INF)
        p = online(s_w)                                      # (HR, Hkv*W)
        # fold window probs to own-head columns (off-head are exp(-inf)=0)
        p_own = jnp.zeros((HR, W), jnp.float32)
        for h in range(Hkv):
            p_own = p_own + p[:, h * W:(h + 1) * W]

        # quantized V for window positions still in the store
        # (pos in [nkq, nvq)): aligned W-slice of the pinned v block
        in_blk = pl.multiple_of(nkq - (nkq // C) * C, 128)
        vdw = vwb_ref.shape[2]
        vw_slice = vwb_ref[0, :, :, pl.ds(in_blk, W)].reshape(
            Hkv * vdw, W)
        vcols = deq_v_cols(
            vw_slice,
            vsb_ref[0, :, :, pl.ds(in_blk, W)].reshape(Hkv * Dg, W)
            .astype(cdt),
            vmb_ref[0, :, :, pl.ds(in_blk, W)].reshape(Hkv * Dg, W)
            .astype(cdt),
            nkq)
        add_quant_v(p_own.astype(cdt), vcols)

        # merge window probs into the strip buffer at their positions
        delta = nkq - nvq   # 128-aligned, in [-W, W]
        off2 = pl.multiple_of(W + delta, 128)
        pwin_scr[:, pl.ds(off2, W)] = (
            pwin_scr[:, pl.ds(off2, W)] + p_own)

        # value-window contribution: positions [nvq, nvq+W) <-> rows of
        # v_win; block-diagonal expand over heads, one dot
        pv = pwin_scr[:, W:2 * W].astype(cdt)                # (HR, W)
        pv_bd = jnp.where(_iota((HR, Hkv * W), 1) // W == head_of_row,
                          pltpu.repeat(pv, Hkv, 1), 0)
        vwin = vwin_ref[0].reshape(Hkv * W, D).astype(cdt)
        acc_scr[:] = acc_scr[:] + jnp.dot(pv_bd.astype(cdt), vwin, **kw)

        l = l_scr[:, :1]
        o_ref[0] = acc_scr[:] / jnp.where(l > 0, l, 1.0)


@functools.partial(
    jax.jit, static_argnames=("group_size", "k_bits", "v_bits", "chunk",
                              "compute_dtype"))
def fused_decode_attention_wide(qg, k_codes, k_scale, k_mn, v_codes,
                                v_scale, v_mn, k_win, v_win, n_k_quant,
                                n_k_win, n_v_quant, *, group_size: int,
                                k_bits: int, v_bits: int, chunk: int = 512,
                                compute_dtype=jnp.bfloat16):
    """qg (B,Hkv,r,D) + KiviLayerCache arrays -> (B,Hkv,r,D) f32."""
    B, Hkv, r, D = qg.shape
    T = k_codes.shape[-1]
    W = k_win.shape[2]
    gs = group_size
    C = min(chunk, T)
    assert T % C == 0 and C % gs == 0 and W % 128 == 0 and W <= C
    HR = Hkv * r
    KDw, VDw = k_codes.shape[2], v_codes.shape[2]
    Dg, Tg = D // gs, T // gs
    nt = T // C
    cnt = jnp.stack([jnp.asarray(n_k_quant, jnp.int32),
                     jnp.asarray(n_k_win, jnp.int32),
                     jnp.asarray(n_v_quant, jnp.int32)])

    kernel = functools.partial(
        _kernel, k_bits=k_bits, v_bits=v_bits, gs=gs, C=C, W=W, r=r, T=T,
        sm_scale=1.0 / (D ** 0.5), cdt=compute_dtype)
    full = lambda b, t, *_: (b, 0, 0)
    full4 = lambda b, t, *_: (b, 0, 0, 0)
    chunk4 = lambda b, t, *_: (b, 0, 0, jnp.minimum(t, nt - 1))
    # the window phase needs the v-store block containing [nkq, nkq+W):
    # pinned via scalar prefetch (clamped for the full-cache edge where
    # nkq == T would index one block past the store)
    pin4 = lambda b, t, cnt: (b, 0, 0, jnp.minimum(cnt[0] // C, nt - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt + 1),
        in_specs=[
            pl.BlockSpec((1, HR, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, KDw, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, D, Tg), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, D, Tg), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, VDw, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dg, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dg, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, VDw, C), pin4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dg, C), pin4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, Dg, C), pin4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, W, D), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, W, D), full4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HR, D), full, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HR, 128), jnp.float32),              # m
            pltpu.VMEM((HR, 128), jnp.float32),              # l
            pltpu.VMEM((HR, D), jnp.float32),                # acc
            pltpu.VMEM((HR, Hkv * D), compute_dtype),        # q block-diag
            pltpu.VMEM((HR, Tg), jnp.float32),               # qmn
            pltpu.VMEM((HR, 3 * W), jnp.float32),            # strip probs
            pltpu.VMEM((HR, Hkv * D), compute_dtype),        # V head mask
            pltpu.VMEM((Hkv * D, D), compute_dtype),         # P fold
            pltpu.VMEM((Hkv * Dg, Hkv * D), compute_dtype),  # E v-scale
            pltpu.VMEM((HR, C), jnp.float32),                # p staging
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HR, D), jnp.float32),
        interpret=_use_interpret(),
    )(
        cnt,
        qg.astype(compute_dtype).reshape(B, HR, D),
        k_codes, k_scale.astype(compute_dtype),
        k_mn.astype(compute_dtype),
        v_codes, v_scale.astype(compute_dtype),
        v_mn.astype(compute_dtype),
        v_codes, v_scale.astype(compute_dtype),
        v_mn.astype(compute_dtype),
        k_win.astype(compute_dtype), v_win.astype(compute_dtype),
    )
    return out.reshape(B, Hkv, r, D)

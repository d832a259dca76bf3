"""Head-folded fused KIVI decode attention (Pallas, TPU).

The per-(batch, kv-head) megakernel (fused_decode.py) runs one MXU row
per query head — for MHA models that is r=1 row per program: tiny MXU /
VPU utilization across B*H programs.  This kernel folds a GROUP of
head_fold KV heads into one program:

  * rows = HR = head_fold * r query heads (16 for Llama-2 MHA with the
    default fold, 32 for Llama-3/Mistral GQA) — real sublane
    utilization;
  * QK runs per folded head as a (cg*r, D) x (D, C) matmul whose query
    rows carry the K scales FOLDED IN: row (rr, g) is
    q_h[rr] * (F * k_scale_row[g]) — the cache stores K scales as
    (Tg, D) ROWS (round 4), so the chunk's cg scale rows arrive as
    their own streamed block, advancing and dead-chunk-eliding with the
    code stream (a partially filled cache reads only its live scale
    fraction; the old lane-major layout fetched whole 128-group
    superblocks — the FULL plane at 4K).  The group structure collapses
    back out of the product by a sublane reduction against a static
    group mask, with the zero-point term folded into the same collapse
    via a VPU lane-reduce (no zp projection, no select pass).  This
    deletes the group->token scale expansion entirely (a one-hot
    (Sg, C) dot per j-block in round 2's block-diagonal form — as many
    full MXU passes as the QK dot itself; scripts/profile_wide_32k.py);
  * the packed stores unpack for all folded heads at once: the bitcast
    crumb unpack of a (Hg*Dw, C) word tile yields rows in the order
    rho(j, h, w, half) = j*(2*Hg*Dw) + h*(2*Dw) + 2w + half, staged
    into a HEAD-MAJOR vals scratch so each head's contraction is one
    (D, C) tile; V scales apply on the PROBABILITY rows (see
    quant_v_contrib) with the output folded back to channel order
    through a constant one-hot P matmul — nothing is ever physically
    permuted;
  * dead chunks (beyond the valid cache length) cost neither compute
    nor DMA: their block indices clamp to the last live block, so the
    Pallas revisit-elision skips the fetch — a partially filled cache
    only reads its live fraction (the per-head kernel always reads the
    full T).

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

NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(cnt_ref, q_ref, kw_ref, ks_ref, km_ref, vw_ref, vs_ref, vm_ref,
            vwb_ref, vsb_ref, vmb_ref, kwin_ref, vwin_ref, o_ref,
            m_scr, l_scr, acc_scr, vals_scr,
            pwin_scr, maskv_scr, pfold_scr, maskg_scr, p_scr, *,
            k_bits: int, v_bits: int, gs: int, C: int, W: int, r: int,
            T: int, nt: int, sbg: int, sm_scale: float, cdt,
            ablate: str | None = None, v_subblock: int | None = None):
    # ablate: PROFILING hook (scripts/attribution_r5.py) — statically
    # removes one cost component so on-chip differencing attributes the
    # kernel's time.  Output is garbage under ablation; None = prod.
    #   "compute": empty chunk+window bodies (DMA + dispatch floor)
    #   "chunk":   skip the whole chunk body
    #   "kunpack": skip the K unpack/staging loop (QK reads stale scratch)
    #   "qk":      skip K unpack + QK dots (V path still runs)
    #   "vquant":  skip the quantized-V contribution
    #   "window":  skip the window/strip phase (normalize only)
    # nt: number of CHUNK grid steps — T//C for a full sweep, fewer
    # under a static live-fill bound (t_bound): the arrays keep their
    # full T blocks, the grid just never visits chunks the caller
    # guarantees are beyond every counter.
    nkq = cnt_ref[0]
    nkw = cnt_ref[1]
    nvq = cnt_ref[2]
    lo = cnt_ref[3 + pl.program_id(0)]   # row's left-pad lower bound
    t_total = nkq + nkw
    it = pl.program_id(1)
    Hkv = kw_ref.shape[1]            # the folded head-group size
    HR, D = q_ref.shape[1], q_ref.shape[2]
    HD = Hkv * D
    # rows per (j, head) block and j-block count: crumb layout (2/4-bit,
    # sublane-doubling bitcast) vs plane layout (8-bit, shift+mask+cast)
    kdw2 = 2 * (D * k_bits // 32) if k_bits in (2, 4) else D // 4
    vdw2 = 2 * (D * v_bits // 32) if v_bits in (2, 4) else D // 4
    njk = 16 // k_bits if k_bits in (2, 4) else 4
    njv = 16 // v_bits if v_bits in (2, 4) else 4
    nbv = Hkv * vdw2
    Dg = D // gs
    cg = C // gs
    Fk = float({2: 128, 4: 16, 8: 1}[k_bits])
    Fv = float({2: 128, 4: 16, 8: 1}[v_bits])
    expo = jnp.uint32(0x3F80_3F80)
    # precision pinned EXPLICITLY: under KIVI_TPU_REAL the test
    # conftest sets jax_default_matmul_precision=highest for the
    # jnp f32 oracles, and fp32-precision bf16 matmuls no longer
    # lower in Mosaic (r4 toolchain: 'Bad lhs type').  Kernel
    # accuracy is the quantization-noise class; bf16 MXU is the
    # design point.
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)

    def unpack_rows(words, bits, j):
        """j-th block of bf16 'value' rows from packed u32 word rows.

        2/4-bit crumbs: 3 int ops + free u32->bf16 bitcast (doubles the
        sublanes); rows are b - 1 = c/F EXACTLY — the explicit subtract
        (exact in bf16) is precision-load-bearing: folding the 1 into
        the zero point would multiply b = 1 + c/F by the scale in bf16,
        whose 2^-8 relative rounding is F/256 of the signal after the
        cancellation, ruinous at 2-bit (F=128).  8-bit planes:
        shift+mask+int cast; rows are the
        CENTERED codes c - 128 (exact in bf16, 8 significand bits), so
        the dequant affine is x = scale*(c-128) + (mn + 128*scale) with
        the 128*scale correction folded into the zero-point projection.
        Row count is `kdw2`/`vdw2` per head either way."""
        if bits in (2, 4):
            m = jnp.uint32({2: 0x0003_0003, 4: 0x000F_000F}[bits])
            t = (words >> jnp.uint32(bits * j)) & m
            if bits == 4:
                t = t << jnp.uint32(3)
            v = pltpu.bitcast(t | expo, jnp.bfloat16).astype(cdt)
            return v - cdt(1.0)
        t = ((words >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(
            jnp.int32)
        return (t - 128).astype(cdt)
    # V j-block channel span [j*vdw2, (j+1)*vdw2) sits in ONE quant group
    # when gs % vdw2 == 0: the dequant affine then moves to the
    # PROBABILITY rows (HR of them) instead of the value columns (nbv):
    # out = (p*F*scale).(b-1) + rowsum(p*mn).  Per-value work drops to
    # the crumb unpack plus one exact subtract.
    v_bcast = gs % vdw2 == 0

    head_of_row = _iota((HR, 1), 0) // r          # (HR, 1)

    # ---- first grid step: per-program state reset ------------------------
    @pl.when(it == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        pwin_scr[:] = jnp.zeros_like(pwin_scr)

    # program-INVARIANT scratch constants, built once per pallas_call:
    # the TPU grid runs sequentially row-major, and scratch persists
    # across program rows, so only the very first grid step pays the
    # iota/div/mod builds (measurable at serving geometry — hundreds of
    # programs per layer-step each otherwise rebuilding an (HD, D)
    # one-hot).
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, it == 0))
    def _init_shared():
        # V-rho row head mask (HR, Hkv*vdw2*njv == HD)
        vrho_h = (_iota((HR, HD), 1) % (Hkv * vdw2)) // vdw2
        maskv_scr[:] = (vrho_h == head_of_row).astype(cdt)
        # P: one-hot (HD, D) folding V-rho rows to channel order
        rho = _iota((HD, D), 0)
        dd = (rho // (Hkv * vdw2)) * vdw2 + rho % vdw2
        pfold_scr[:] = (dd == _iota((HD, D), 1)).astype(cdt)
        # group-collapse mask: column t's logit lives on sublane t//gs
        # of each per-head (cg, C) product block (scale-folded QK)
        maskg_scr[:] = (_iota((cg, C), 0)
                        == _iota((cg, C), 1) // gs).astype(jnp.float32)

    def online(s):
        """Online softmax bookkeeping; returns p (f32)."""
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

    # V-dot head sub-blocking (round 5 experiment, default OFF): the
    # one-dot form contracts (HR, n) x (n, Hkv*vdw2) — every query row
    # against EVERY folded head's value channels, issued MACs ∝ Hg^2
    # with only the own-head 1/Hg surviving the mask.  Splitting heads
    # into sub-blocks of hb cuts that to ∝ Hg*hb, but the measured
    # sweep (docs/artifacts/v_subblock_r5.txt) shows EVERY sub-block
    # width losing to the single dot — serving fill: single 0.765 ms,
    # hb=16 0.901, hb=8 2.09; the kernel is DMA-bound and the
    # redundant MACs ride idle MXU cycles while extra dot issues and
    # sub-tile row padding are pure cost.  The knob stays for future
    # geometries (e.g. much larger folds) where the quadratic term
    # could bite.
    if v_subblock is not None:
        hbv = v_subblock
        assert Hkv % hbv == 0
    else:
        hbv = Hkv

    def quant_v_contrib(p, words3, vs3, vm3, pos0):
        """(HR, D) quantized-V contribution for one n-column span.

        p (HR, n) f32 probabilities; words3 (Hkv, VDw, n) packed codes;
        vs3/vm3 (Hkv, Dg, n) scale/zp; positions pos0 + col, dead
        (>= nvq) columns contribute 0.
        """
        n = words3.shape[-1]
        vlive = (pos0 + _iota((1, n), 1) < nvq).astype(cdt)
        pc = p.astype(cdt) * vlive                 # dead cols masked ONCE
        p32 = pc.astype(jnp.float32)
        vwords = words3.reshape(Hkv * words3.shape[1], n)
        if not v_bcast:
            # one-hot rho-row expansion fallback (gs < vdw2)
            rho2 = _iota((Hkv * Dg, nbv), 1)
            hh = rho2 // vdw2
            dd2 = rho2 % vdw2  # channel offset inside the j-block
            vscale = vs3.reshape(Hkv * Dg, n).astype(cdt) * cdt(Fv)
            vmn = vm3.reshape(Hkv * Dg, n).astype(cdt)
        consts = []
        nbb = Hkv // hbv
        rb, cb = hbv * r, hbv * vdw2       # rows / value-cols per block
        row_acc = [jnp.zeros((rb, D), jnp.float32) for _ in range(nbb)]
        acc_add = None
        for j in range(njv):
            vals_j = unpack_rows(vwords, v_bits, j)
            if v_bcast:
                gj = j * vdw2 // gs
                # own-head scale/zp rows expanded over the r query rows
                vs_row = vs3[:, gj, :].astype(cdt) * cdt(Fv)
                vm_row = vm3[:, gj, :].astype(cdt)           # (Hkv, n)
                if v_bits == 8:
                    vm_row = vm_row + cdt(128.0) * vs_row
                if r > 1:
                    vs_row = jnp.repeat(vs_row, r, axis=0)
                    vm_row = jnp.repeat(vm_row, r, axis=0)   # (HR, n)
                p2 = pc * vs_row                             # (HR, n)
                consts.append(jnp.sum(
                    p32 * vm_row.astype(jnp.float32),
                    axis=-1, keepdims=True))                 # (HR, 1) f32
                for b in range(nbb):
                    ow_b = jax.lax.dot_general(
                        p2[b * rb:(b + 1) * rb, :].astype(cdt),
                        vals_j[b * cb:(b + 1) * cb, :],
                        (((1,), (1,)), ((), ())), **kw)      # (rb, cb)
                    col0 = j * nbv + b * cb
                    ow_b = ow_b * maskv_scr[
                        b * rb:(b + 1) * rb,
                        col0:col0 + cb].astype(jnp.float32)
                    row_acc[b] = row_acc[b] + jnp.dot(
                        ow_b.astype(cdt),
                        pfold_scr[col0:col0 + cb, :], **kw)
            else:
                ev_j = jnp.logical_and(
                    hh == _iota((Hkv * Dg, nbv), 0) // Dg,
                    (j * vdw2 + dd2) // gs
                    == _iota((Hkv * Dg, nbv), 0) % Dg).astype(cdt)
                vs_j = jax.lax.dot_general(
                    ev_j, vscale, (((0,), (0,)), ((), ())), **kw
                ).astype(cdt)
                vm_j = jax.lax.dot_general(
                    ev_j, vmn, (((0,), (0,)), ((), ())), **kw).astype(cdt)
                if v_bits == 8:
                    vm_j = vm_j + cdt(128.0) * vs_j
                vcols_j = (vals_j * vs_j + vm_j) * vlive
                ow_j = jax.lax.dot_general(pc, vcols_j,
                                           (((1,), (1,)), ((), ())), **kw)
                ow_j = ow_j * maskv_scr[:, j * nbv:(j + 1) * nbv].astype(
                    jnp.float32)
                fold_j = jnp.dot(ow_j.astype(cdt),
                                 pfold_scr[j * nbv:(j + 1) * nbv, :], **kw)
                acc_add = fold_j if acc_add is None else acc_add + fold_j
        if v_bcast:
            acc_add = (row_acc[0] if nbb == 1
                       else jnp.concatenate(row_acc, axis=0))
        if consts:
            acc_add = acc_add + jnp.concatenate(
                [jnp.broadcast_to(c, (HR, vdw2)) for c in consts], axis=1)
        return acc_add

    # ---- chunk steps ------------------------------------------------------
    # All chunk math runs in per-j-block pieces (rows Hkv*2Dw at a time):
    # materializing the full (HD, C) dequantized tiles blows the 16 MB
    # VMEM budget at T=4096; the per-block form keeps every temporary at
    # (Hkv*2Dw, C) while issuing the same total MXU work.
    run_chunk = ablate not in ("compute", "chunk")

    @pl.when(jnp.logical_and(
        jnp.logical_and(it < nt, it * C < nkq),
        jnp.logical_and((it + 1) * C > lo, run_chunk)))
    def _chunk():
        t0 = it * C
        kwords = kw_ref[0].reshape(Hkv * kw_ref.shape[2], C)

        # ---- scale-folded QK (round 3; scripts/profile_wide_32k.py) --
        # The r2 form expanded scales groups->tokens with a one-hot
        # (Sg, C) dot per j-block — as many full MXU passes as the QK
        # dot itself (0.68 of 1.78 ms measured at 32K).  Folding the
        # scale into the QUERY side deletes it: rows (g, rr) of
        # Qh = q_h[rr] * (F*scale_rows[g]) — and since round 4 the
        # cache stores K scales as (Tg, D) ROWS, the chunk's cg scale
        # rows ARRIVE in streamed SB-group blocks, so
        # there is no superblock transpose, no per-superblock zp
        # projection, and no (Sg, cg) select pass left at all; the
        # scale DMA advances with the code DMA and dead chunks elide
        # BOTH.  cg*r <= 128 keeps Qh inside one MXU row tile, so the
        # per-head (cg*r, D) x (D, C) dots cost exactly the bare QK
        # passes.  The group structure collapses back out of the
        # product by a sublane reduction against the static group mask.
        # unpack into HEAD-MAJOR scratch: one head's channels contiguous
        if ablate not in ("kunpack", "qk"):
            for j in range(njk):
                vals_j = unpack_rows(kwords, k_bits, j)
                for h in range(Hkv):
                    vals_scr[h * D + j * kdw2:h * D + (j + 1) * kdw2,
                             :] = vals_j[h * kdw2:(h + 1) * kdw2, :]
        if sbg == cg:
            sblk, zblk = ks_ref[0], km_ref[0]    # (Hg, cg, D)
            srows_of = lambda h: sblk[h]         # block == this chunk
            zrows_of = lambda h: zblk[h]
        else:
            # block spans several chunks (or the whole plane): slice
            # this chunk's rows off the REF (needs cg % 8 == 0,
            # enforced by wide_kernel_supported / the SB choice)
            boff = pl.multiple_of((it * cg) % sbg, 8)
            srows_of = lambda h: ks_ref[0, h, pl.ds(boff, cg), :]
            zrows_of = lambda h: km_ref[0, h, pl.ds(boff, cg), :]
        qn = q_ref[0].astype(cdt) * cdt(sm_scale)            # (HR, D)
        gmask = maskg_scr[:]
        if ablate == "qk":
            s0 = jnp.zeros((HR, C), jnp.float32)
            pos_row0 = t0 + _iota((HR, C), 1)
            p0 = online(jnp.where(
                jnp.logical_and(pos_row0 < nkq, pos_row0 >= lo),
                s0, NEG_INF))
            acc_scr[:] = acc_scr[:] + quant_v_contrib(
                p0, vw_ref[0], vs_ref[0], vm_ref[0], t0)
            return
        srows = []
        for h in range(Hkv):
            s_h = srows_of(h).astype(cdt) * cdt(Fk)          # (cg, D)
            z_h = zrows_of(h).astype(jnp.float32)
            if k_bits == 8:
                # centered 8-bit codes: x = scale*(c-128) + (mn+128*scale)
                z_h = z_h + 128.0 * srows_of(h).astype(jnp.float32)
            qh_parts = [s_h * qn[h * r + rr:h * r + rr + 1, :]
                        for rr in range(r)]
            Qh = (qh_parts[0] if r == 1
                  else jnp.concatenate(qh_parts, axis=0))    # (r*cg, D)
            sh = jnp.dot(Qh, vals_scr[h * D:(h + 1) * D, :], **kw)
            # The zero-point term of row rr / group g is the per-(g, rr)
            # constant q_h[rr]·zp_h[g], added to every column of sublane
            # g BEFORE the group collapse — a VPU lane-reduce replaces
            # the old per-superblock (HR, HD)x(HD, Sg) projection and
            # its per-chunk (HR, Sg)x(Sg, C) select pass.
            for rr in range(r):
                q32 = qn[h * r + rr:h * r + rr + 1, :].astype(jnp.float32)
                zq = jnp.sum(z_h * q32, axis=1, keepdims=True)  # (cg, 1)
                srows.append(jnp.sum(
                    (sh[rr * cg:(rr + 1) * cg, :] + zq) * gmask,
                    axis=0, keepdims=True))
        s = jnp.concatenate(srows, axis=0)                   # (HR, C)
        pos_row = t0 + _iota((HR, C), 1)
        s = jnp.where(jnp.logical_and(pos_row < nkq, pos_row >= lo),
                      s, NEG_INF)

        p = online(s)
        if ablate != "vquant":
            acc_scr[:] = acc_scr[:] + quant_v_contrib(
                p, vw_ref[0], vs_ref[0], vm_ref[0], t0)

        # strip capture: probabilities of positions [nvq, nvq+W).  The
        # strip start is 128-aligned (v_flush % 128 == 0) but the strip
        # may SPAN a chunk boundary (v_flush < W lets nvq mod C reach
        # C - v_flush), so it is captured in 128-lane segments, each
        # from the chunk that holds it.  Every dynamic offset stays in
        # [0, C-128].  Segments at positions >= nkq capture exact zeros
        # (their logits were -inf); the fp window adds those
        # probabilities in _window.  Segments captured in an earlier
        # chunk ride the online-softmax rescale (pwin_scr *= alpha),
        # keeping all strip entries on the running max.
        @pl.when(jnp.logical_and(t0 < nvq + W, nvq < t0 + C))
        def _stage():
            p_scr[:] = p

        for s_i in range(W // 128):
            seg = nvq + 128 * s_i

            @pl.when(jnp.logical_and(t0 <= seg, seg < t0 + C))
            def _capture(s_i=s_i, seg=seg):
                off = pl.multiple_of(seg - t0, 128)
                pwin_scr[:, W + 128 * s_i:W + 128 * (s_i + 1)] = (
                    p_scr[:, pl.ds(off, 128)])

    # ---- final step: fp key window + value-window/strip resolution -------
    if ablate in ("compute", "window"):
        @pl.when(it == nt)
        def _norm_only():
            l = l_scr[:, :1]
            o_ref[0] = acc_scr[:] / jnp.where(l > 0, l, 1.0)
        return

    @pl.when(it == nt)
    def _window():
        q = q_ref[0].astype(cdt) * cdt(sm_scale)
        kwin = kwin_ref[0].reshape(Hkv * W, D).astype(cdt)
        s_w = jax.lax.dot_general(q, kwin, (((1,), (1,)), ((), ())), **kw)
        col_h = _iota((HR, Hkv * W), 1) // W
        pos_w = nkq + _iota((HR, Hkv * W), 1) % W
        valid = jnp.logical_and(col_h == head_of_row, pos_w < t_total)
        valid = jnp.logical_and(valid, pos_w >= lo)
        s_w = jnp.where(valid, s_w, NEG_INF)
        p = online(s_w)                                      # (HR, Hkv*W)
        # fold window probs to own-head columns (off-head are exp(-inf)=0)
        p_own = jnp.zeros((HR, W), jnp.float32)
        for h in range(Hkv):
            p_own = p_own + p[:, h * W:(h + 1) * W]

        # quantized V for window positions still in the store
        # (pos in [nkq, nvq)): aligned W-slice of the pinned v block.
        # At v_flush == W the K and V quantized watermarks move in
        # lockstep (nvq <= nkq always), the span is provably EMPTY and
        # the dispatcher drops the three pinned operands entirely —
        # their per-program fetch is ~15% of the live bytes at serving
        # fills, all zero-weighted.
        if vwb_ref is not None:
            in_blk = pl.multiple_of(nkq - (nkq // C) * C, 128)
            acc_scr[:] = acc_scr[:] + quant_v_contrib(
                p_own,
                vwb_ref[0, :, :, pl.ds(in_blk, W)],
                vsb_ref[0, :, :, pl.ds(in_blk, W)],
                vmb_ref[0, :, :, pl.ds(in_blk, W)],
                nkq)

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


def wide_kernel_supported(Tmax: int, W: int, v_flush: int, k_bits: int,
                          v_bits: int, chunk: int = 512,
                          group_size: int = 32, r: int = 1) -> bool:
    """Static legality of fused_decode_attention_wide for a cache
    geometry: 2/4-bit stores, 128-aligned window and value flush (the
    strip capture slices in 128-lane segments), the chunk evenly split
    by both T and W (window-phase pinned-block slices must stay inside
    one chunk), and the scale-folded QK's row/alignment bounds —
    cg*r <= 128 (the per-head Q block must fit one MXU row tile) and
    the chunk-base sublane slice of the (Tg, D) scale-row plane
    8-aligned in the non-blocked fallback (cg % 8 == 0, or a
    single-chunk cache where the base is always 0)."""
    C = min(chunk, Tmax)
    if C % group_size != 0:
        return False
    cg = C // group_size
    return (k_bits in (2, 4, 8) and v_bits in (2, 4, 8)
            and W % 128 == 0 and v_flush % 128 == 0
            and Tmax % C == 0 and C % W == 0 and W <= C
            and cg * r <= 128 and (cg % 8 == 0 or Tmax == C))


def choose_chunk(Tmax: int, W: int, v_flush: int, k_bits: int,
                 v_bits: int, *, group_size: int = 32, r: int = 1,
                 long_context: int = 8192) -> int:
    """Chunk size for the wide kernel: C=512 everywhere since round 5.

    C=512 always won the short-context serving regime end-to-end; the
    r4 long-context C=1024 advantage (halved per-chunk fixed work, 32K
    1.90 -> 1.34 ms under the Hg=16 fold) is superseded by the Hg=32
    fold, which amortizes the same fixed work over twice the rows at
    C=512 and measures at or below C=1024-Hg16 in interleaved A/B
    (16K full: 1.12 vs 1.61 ms; 32K full: 1.49 vs 1.66;
    /tmp sweeps behind docs/artifacts/v_subblock_r5.txt).  C=1024 is
    also operationally fragile on the current toolchain: its much
    larger unrolled Mosaic program intermittently kills the remote
    compile helper (HTTP 500 streaks across all helper ports) and
    Hg=32 at C=1024 is over the scoped-VMEM budget, so the fold would
    have to shrink exactly where it buys the most."""
    del long_context
    return 512


def default_head_fold(Hkv: int, r: int, D: int, Tg: int,
                      chunk: int = 512) -> int:
    """Largest Hg dividing Hkv with Hg*r <= 32 rows and the per-chunk
    dequant temporaries (the (Hg*D, C) scaled-values tile and its
    j-block parts, ~4*Hg*D*C bytes) bounded to ~16 MiB of scoped VMEM
    (the pallas_call raises Mosaic's default scoped-vmem limit to
    24 MiB — that limit, not hardware, was why Hg=32 "failed to
    compile" through round 4: the error is `exceeded scoped vmem limit
    by 356K`, scripts/attribution_r5.py probe).  Hg=32 at C=512 is the
    round-5 serving-regime winner: 1.33 -> 0.77 ms at B=72 fill=1280,
    3.84 -> 2.89 ms at the full 4K cache (docs/artifacts/
    v_subblock_r5.txt) — half the programs, each amortizing window
    phase and per-chunk fixed work over 32 MXU rows.  At C=1024 the
    16 MiB bound folds back to Hg=16 automatically.

    Since the chunked-scale layout the bound is CONTEXT-LENGTH-
    INDEPENDENT (Tg is accepted for call-site compatibility but no
    longer governs): the same fold that wins at 4K stays legal at 32K,
    where the old full-width scale planes collapsed it to Hg<=2."""
    hg = 1
    for cand in (2, 4, 8, 16, 32):
        # 12 MiB: admits Hg=32 at C=512 and Hg=16 at C=1024 (both
        # 8.4 MiB), rejects Hg=32 at C=1024 (16.8 MiB — reliably over
        # the 24 MiB scoped limit once blocks and scratch stack up)
        if (Hkv % cand == 0 and cand * r <= 32
                and 4 * cand * D * chunk <= (12 << 20)):
            hg = cand
    return hg


@functools.partial(
    jax.jit, static_argnames=("group_size", "k_bits", "v_bits", "chunk",
                              "compute_dtype", "head_fold", "t_bound",
                              "scale_block", "no_pinned_v", "_ablate",
                              "v_subblock"))
def fused_decode_attention_wide(qg, k_codes, k_scale, k_mn, v_codes,
                                v_scale, v_mn, k_win, v_win, n_k_quant,
                                n_k_win, n_v_quant, *, group_size: int,
                                k_bits: int, v_bits: int, chunk: int = 512,
                                compute_dtype=jnp.bfloat16,
                                head_fold: int | None = None,
                                pad_len=None,
                                t_bound: int | None = None,
                                scale_block: int | None = None,
                                no_pinned_v: bool = False,
                                _ablate: str | None = None,
                                v_subblock: int | None = None):
    """qg (B,Hkv,r,D) + KiviLayerCache arrays -> (B,Hkv,r,D) f32.

    head_fold (Hg): KV heads folded into one program (must divide Hkv).
    Each program owns Hg*r query rows; grid is (B * Hkv/Hg, T/C + 1).
    pad_len: optional (B,) i32 left-padding per batch row — positions
    < pad_len[b] are masked, fully-padded chunks skip compute AND DMA
    (their block index clamps forward to the first live block).

    t_bound: optional STATIC live-fill upper bound (multiple of C,
    <= T): the grid runs t_bound//C chunk steps instead of T//C —
    arrays keep their full T-block layout (so the superblock geometry
    and all index maps are unchanged), the grid simply never visits
    trailing chunks.  CALLER CONTRACT: every counter must satisfy
    n_k_quant <= t_bound AND n_v_quant + W <= t_bound for every call
    under this compilation (the engine derives it from
    prompt_len + steps); violating it silently truncates attention.
    Dead grid steps are DMA-elided but still dispatched — at serving
    fills (~1/3 of a 4K cache) they cost ~28% of the kernel
    (docs/artifacts: probe_serving_fill), which is what this bound
    removes.
    """
    B, Hkv, r, D = qg.shape
    T = k_codes.shape[-1]
    W = k_win.shape[2]
    gs = group_size
    C = min(chunk, T)
    # C % W == 0 keeps the _window pinned-block slice [nkq mod C, +W)
    # inside one chunk (nkq is always a multiple of W).
    assert T % C == 0 and C % gs == 0 and W % 128 == 0 and C % W == 0
    KDw, VDw = k_codes.shape[2], v_codes.shape[2]
    Dg, Tg = D // gs, T // gs
    nt = T // C                       # ARRAY chunk-block count
    ntb = nt if t_bound is None else min(t_bound, T) // C
    assert 1 <= ntb <= nt and (t_bound is None or t_bound % C == 0)
    Hg = head_fold if head_fold is not None else default_head_fold(
        Hkv, r, D, Tg)
    assert Hkv % Hg == 0
    ng = Hkv // Hg
    HR = Hg * r
    lo = (jnp.zeros((B,), jnp.int32) if pad_len is None
          else jnp.asarray(pad_len, jnp.int32).reshape(B))
    cnt = jnp.concatenate([
        jnp.stack([jnp.asarray(n_k_quant, jnp.int32),
                   jnp.asarray(n_k_win, jnp.int32),
                   jnp.asarray(n_v_quant, jnp.int32)]),
        jnp.repeat(lo, ng),         # per-program (b*ng + g) lower bound
    ])

    cg_ = C // gs
    # K scale/zp planes are (B, Hkv, Tg, D): one (D,) row per token
    # group, token-group axis on SUBLANES (round 4).  The scale stream
    # advances in SB-group blocks riding the same dead-chunk clamp as
    # the codes, so a partially filled cache reads only ~its live scale
    # fraction (the old lane-major layout forced a whole 128-group
    # superblock fetch at any fill — the FULL plane at 4K contexts).
    # SB is a granularity/DMA-issue tradeoff (scripts/scale_block_sweep
    # on v5e): per-chunk blocks (SB == cg_) win short grids — 4K full
    # cache 1.97 ms vs the r3 superblock form's 3.3-3.4 — but at 32
    # chunks the two extra DMA issues per step dominate (32K SB=cg 2.10
    # vs SB=4cg 1.36 ms), so long grids fetch 4 chunks of scale rows
    # per block.  SB must cover whole chunks (SB % cg_ == 0, slices
    # 8-aligned via cg_ % 8 == 0) or be the whole plane; resident VMEM
    # is 2*2*Hg*SB*D*2 bytes (double-buffered scale+zp), so SB stays
    # small next to the code blocks (SB=256 at 32K failed to fit).
    # stile must reflect the dtype actually staged into VMEM — the
    # operand passed to pallas_call is k_scale.astype(compute_dtype),
    # not the cache dtype (an f32 scale cache with cg_ ≡ 8 mod 16 would
    # otherwise pick an 8-sublane block on a bf16 operand).
    stile = 8 if jnp.dtype(compute_dtype) == jnp.dtype(jnp.float32) else 16
    if scale_block is not None:
        SB = scale_block
    elif cg_ % stile == 0:
        # 4 chunks per block when the grid is long AND it divides the
        # plane (T need not be a power of two: T = 10*C has Tg % 4cg
        # != 0 — fall back through 2cg to cg)
        SB = cg_
        if nt > 8:
            for mult in (4, 2):
                if Tg % (mult * cg_) == 0:
                    SB = mult * cg_
                    break
    else:
        SB = Tg
    assert (SB == Tg or (Tg % SB == 0 and SB % cg_ == 0
                         and (SB == cg_ or cg_ % 8 == 0))), (SB, cg_, Tg)
    kernel = functools.partial(
        _kernel, k_bits=k_bits, v_bits=v_bits, gs=gs, C=C, W=W, r=r, T=T,
        nt=ntb, sbg=SB, sm_scale=1.0 / (D ** 0.5),
        cdt=compute_dtype, ablate=_ablate, v_subblock=v_subblock)
    full = lambda i, t, *_: (i, 0, 0)
    full4 = lambda i, t, *_: (i // ng, i % ng, 0, 0)
    # Dead chunks clamp to the last live block (tail) / first live block
    # (left-padded front): consecutive equal block indices make Pallas
    # skip the fetch, so a partially filled or left-padded cache DMAs
    # only its live fraction.
    cclamp = lambda i, t, cnt: jnp.clip(
        jnp.maximum(jnp.minimum(t, (cnt[0] + C - 1) // C - 1),
                    cnt[3 + i] // C), 0, nt - 1)
    chunk4 = lambda i, t, cnt: (i // ng, i % ng, 0, cclamp(i, t, cnt))
    # the window phase needs the v-store block containing [nkq, nkq+W):
    # pinned via scalar prefetch (clamped for the full-cache edge where
    # nkq == T would index one block past the store)
    pin4 = lambda i, t, cnt: (i // ng, i % ng, 0,
                              jnp.minimum(cnt[0] // C, nt - 1))
    scale4 = ((lambda i, t, cnt:
               (i // ng, i % ng, cclamp(i, t, cnt) * cg_ // SB, 0))
              if SB != Tg else full4)

    # With v_flush == W the window-phase pinned V block is provably
    # dead (nvq <= nkq, span [nkq, nvq) empty): drop the three pinned
    # operands so neither their DMA nor their contribution exists.
    if no_pinned_v:
        inner = kernel

        def kernel(cnt, q, kw_, ks, km, vw, vs, vm, kwin, vwin, o, *scr):
            inner(cnt, q, kw_, ks, km, vw, vs, vm, None, None, None,
                  kwin, vwin, o, *scr)

        pin_specs, pin_ops = [], []
    else:
        pin_specs = [
            pl.BlockSpec((1, Hg, VDw, C), pin4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, Dg, C), pin4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, Dg, C), pin4, memory_space=pltpu.VMEM),
        ]
        pin_ops = [v_codes, v_scale.astype(compute_dtype),
                   v_mn.astype(compute_dtype)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * ng, ntb + 1),
        in_specs=[
            pl.BlockSpec((1, HR, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, KDw, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, SB, D), scale4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, SB, D), scale4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, VDw, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, Dg, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, Dg, C), chunk4, memory_space=pltpu.VMEM),
            *pin_specs,
            pl.BlockSpec((1, Hg, W, D), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, W, D), full4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HR, D), full, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HR, 128), jnp.float32),              # m
            pltpu.VMEM((HR, 128), jnp.float32),              # l
            pltpu.VMEM((HR, D), jnp.float32),                # acc
            pltpu.VMEM((Hg * D, C), compute_dtype),          # head-major K
            pltpu.VMEM((HR, 3 * W), jnp.float32),            # strip probs
            pltpu.VMEM((HR, Hg * D), compute_dtype),         # V head mask
            pltpu.VMEM((Hg * D, D), compute_dtype),          # P fold
            pltpu.VMEM((cg_, C), jnp.float32),               # group mask
            pltpu.VMEM((HR, C), jnp.float32),                # p staging
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * ng, HR, D), jnp.float32),
        interpret=_use_interpret(),
        # Mosaic's DEFAULT scoped-vmem limit rejects the Hg=32 fold by
        # 356K; v5e has headroom and the raised cap measures faster at
        # every geometry swept (docs/artifacts/v_subblock_r5.txt)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(
        cnt,
        qg.astype(compute_dtype).reshape(B * ng, HR, D),
        k_codes, k_scale.astype(compute_dtype),
        k_mn.astype(compute_dtype),
        v_codes, v_scale.astype(compute_dtype),
        v_mn.astype(compute_dtype),
        *pin_ops,
        k_win.astype(compute_dtype), v_win.astype(compute_dtype),
    )
    return out.reshape(B, Hkv, r, D)

"""On-chip ablation profiler for the wide decode kernel at 32K.

The round-2 ledger row (docs/kernels.md): MHA B=4, T=32768, fill=32640,
Hg=16, C=512 -> 3.50 ms/call, ~94 GiB/s of packed cache vs a ~570 GB/s
measured chip floor.  Round-3 target: <= 2.0 ms/call.

This script measures a TRIMMED copy of the kernel's chunk phase (no
window/strip resolution -- full fill, so the chunk loop is ~99% of the
work) under ablations, to attribute time between:

  * the K-scale group->token one-hot expand dot  (expand=dot)
  * candidate replacements: select-then-interleave-repeat (expand=repeat)
    and select-then-static-segment-broadcast      (expand=segments)
  * the block-diagonal QK contraction             (qk=0)
  * the V path                                    (vpath=0)
  * the crumb bitcast unpack                      (unpack=0)

Numbers are timing-only: ablated variants compute garbage.  The
untrimmed production kernel is measured first as the anchor.

Usage: timeout 3600 python scripts/profile_wide_32k.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kivi_tpu.utils.timing import bench_fn

NEG_INF = -1e30


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(cnt_ref, q_ref, kw_ref, ks_ref, km_ref, vw_ref, vs_ref, vm_ref,
            o_ref, m_scr, l_scr, acc_scr, qbd_scr, qnat_scr, qzp_scr,
            st_scr, vals_scr, *,
            k_bits, v_bits, gs, C, r, T, sm_scale, cdt,
            expand, do_qk, do_vpath, do_unpack):
    nkq = cnt_ref[0]
    it = pl.program_id(1)
    Hkv = kw_ref.shape[1]
    HR, D = q_ref.shape[1], q_ref.shape[2]
    HD = Hkv * D
    kdw2 = 2 * (D * k_bits // 32)
    vdw2 = 2 * (D * v_bits // 32)
    njk = 16 // k_bits
    njv = 16 // v_bits
    nbv = Hkv * vdw2
    cg = C // gs
    Fk = float({2: 128, 4: 16}[k_bits])
    Fv = float({2: 128, 4: 16}[v_bits])
    expo = jnp.uint32(0x3F80_3F80)
    kw = dict(preferred_element_type=jnp.float32)
    head_of_row = _iota((HR, 1), 0) // r

    @pl.when(it == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        q = q_ref[0].astype(cdt) * cdt(sm_scale)
        for j in range(njk):
            qj = pltpu.repeat(q[:, j * kdw2:(j + 1) * kdw2], Hkv, 1)
            col_h = _iota((HR, Hkv * kdw2), 1) // kdw2
            qbd_scr[:, j * Hkv * kdw2:(j + 1) * Hkv * kdw2] = jnp.where(
                col_h == head_of_row, qj, 0)
        qnat_scr[:] = jnp.where(_iota((HR, HD), 1) // D == head_of_row,
                                pltpu.repeat(q, Hkv, 1), 0)

    def online(s):
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        acc_scr[:] = acc_scr[:] * alpha
        return p

    @pl.when(jnp.logical_and(it * C < nkq, True))
    def _chunk():
        t0 = it * C
        mask2 = jnp.uint32({2: 0x0003_0003, 4: 0x000F_000F}[k_bits])
        kwords = kw_ref[0].reshape(Hkv * kw_ref.shape[2], C)
        Sg = km_ref.shape[-1]
        base = (it * cg) % Sg

        @pl.when(base == 0)
        def _qzp_super():
            qzp_scr[:] = jnp.dot(qnat_scr[:].astype(cdt),
                                 km_ref[0].reshape(HD, Sg).astype(cdt),
                                 **kw)
            if expand == "qfold":
                # transpose the scale superblock ONCE per superblock
                # (16 MXU tile-transposes, amortized over Sg//cg chunks)
                st_scr[:] = jnp.transpose(
                    ks_ref[0].reshape(HD, Sg), (1, 0)).astype(cdt) * cdt(Fk)

        if expand == "qfold":
            # scale folded into the query side: no group->token expand.
            # zp term as today (tiny select dot) ...
            sel_e = (_iota((Sg, C), 0)
                     == base + _iota((Sg, C), 1) // gs).astype(cdt)
            s = jnp.dot(qzp_scr[:].astype(cdt), sel_e, **kw)
            # ... unpack into a HEAD-MAJOR scratch (channel rows of one
            # head contiguous) ...
            mask2q = jnp.uint32({2: 0x0003_0003, 4: 0x000F_000F}[k_bits])
            for j in range(njk):
                t = (kwords >> jnp.uint32(k_bits * j)) & mask2q
                if k_bits == 4:
                    t = t << jnp.uint32(3)
                vj = pltpu.bitcast(t | expo, jnp.bfloat16).astype(cdt)
                vj = vj - cdt(1.0)
                for h in range(Hkv):
                    vals_scr[h * D + j * kdw2:h * D + (j + 1) * kdw2, :] = (
                        vj[h * kdw2:(h + 1) * kdw2, :])
            # ... per-head (cg*r, D) x (D, C) dots with the chunk's
            # scale rows sliced from the TRANSPOSED superblock, then a
            # group-mask sublane collapse
            boff = pl.multiple_of(base, 8)
            sblkT = st_scr[pl.ds(boff, cg), :]            # (cg, HD)
            qn = q_ref[0].astype(cdt) * cdt(sm_scale)     # (HR, D)
            gmask = (_iota((cg, C), 0)
                     == _iota((cg, C), 1) // gs).astype(jnp.float32)
            rows = []
            for h in range(Hkv):
                Qh = sblkT[:, h * D:(h + 1) * D] * qn[h:h + 1, :]
                sh = jnp.dot(Qh, vals_scr[h * D:(h + 1) * D, :], **kw)
                rows.append(jnp.sum(sh * gmask, axis=0, keepdims=True))
            s = s + jnp.concatenate(rows, axis=0)         # (HR, C)
        elif expand in ("dot", "none"):
            sel_e = (_iota((Sg, C), 0)
                     == base + _iota((Sg, C), 1) // gs).astype(cdt)
            s = jnp.dot(qzp_scr[:].astype(cdt), sel_e, **kw)
        else:
            # select the chunk's cg groups to static lanes [0, cg)
            sel_s = (_iota((Sg, cg), 0)
                     == base + _iota((Sg, cg), 1)).astype(cdt)
            zsel = jnp.dot(qzp_scr[:].astype(cdt), sel_s, **kw)  # (HR, cg)
            if expand == "repeat":
                s = jnp.repeat(zsel, gs, axis=1)
            else:
                parts = [jnp.broadcast_to(zsel[:, g:g + 1], (HR, gs))
                         for g in range(cg)]
                s = jnp.concatenate(parts, axis=1)

        nb = Hkv * kdw2
        if expand != "qfold":
            vs_parts = []
            for j in range(njk):
                if do_unpack:
                    t = (kwords >> jnp.uint32(k_bits * j)) & mask2
                    if k_bits == 4:
                        t = t << jnp.uint32(3)
                    vals_j = pltpu.bitcast(t | expo,
                                           jnp.bfloat16).astype(cdt)
                    vals_j = vals_j - cdt(1.0)
                else:
                    vals_j = pltpu.bitcast(kwords, jnp.bfloat16).astype(cdt)
                sblk = ks_ref[0, :, j * kdw2:(j + 1) * kdw2, :]
                sblk = sblk.reshape(nb, Sg).astype(cdt) * cdt(Fk)
                if expand == "dot":
                    sexp_j = jnp.dot(sblk, sel_e, **kw).astype(cdt)
                elif expand == "none":
                    sexp_j = jnp.broadcast_to(sblk[:, :1],
                                              (nb, C)).astype(cdt)
                else:
                    ssel = jnp.dot(sblk, sel_s, **kw).astype(cdt)
                    if expand == "repeat":
                        sexp_j = jnp.repeat(ssel, gs, axis=1)
                    else:
                        segs = [jnp.broadcast_to(ssel[:, g:g + 1], (nb, gs))
                                for g in range(cg)]
                        sexp_j = jnp.concatenate(segs, axis=1)
                vs_parts.append(vals_j * sexp_j)
            vsc = jnp.concatenate(vs_parts, axis=0)
            if do_qk:
                s += jnp.dot(qbd_scr[:].astype(cdt), vsc, **kw)
            else:
                s += jnp.sum(vsc[:HR]).astype(jnp.float32)
        pos_row = t0 + _iota((HR, C), 1)
        s = jnp.where(pos_row < nkq, s, NEG_INF)

        p = online(s)

        if do_vpath:
            pc = p.astype(cdt)
            mask2v = jnp.uint32({2: 0x0003_0003, 4: 0x000F_000F}[v_bits])
            # the u32->bf16 bitcast doubles sublanes: (Hkv*VDw, C) words
            # unpack to (nbv = 2*Hkv*VDw, C) bf16 rows
            vwords = vw_ref[0].reshape(Hkv * vw_ref.shape[2], C)
            acc_add = jnp.zeros((HR, D), jnp.float32)
            for j in range(njv):
                t = (vwords >> jnp.uint32(v_bits * j)) & mask2v
                if v_bits == 4:
                    t = t << jnp.uint32(3)
                vals_j = pltpu.bitcast(t | expo, jnp.bfloat16).astype(cdt)
                vals_j = vals_j - cdt(1.0)
                gj = j * vdw2 // gs
                vs_row = vs_ref[0, :, gj, :].astype(cdt) * cdt(Fv)
                vm_row = vm_ref[0, :, gj, :].astype(cdt)
                if r > 1:
                    vs_row = jnp.repeat(vs_row, r, axis=0)
                    vm_row = jnp.repeat(vm_row, r, axis=0)
                p2 = pc * vs_row
                ow_j = jax.lax.dot_general(p2.astype(cdt), vals_j,
                                           (((1,), (1,)), ((), ())), **kw)
                acc_add = acc_add + jnp.pad(
                    ow_j[:, :vdw2], ((0, 0), (0, D - vdw2)))
                acc_add = acc_add + jnp.broadcast_to(
                    jnp.sum(p * vm_row.astype(jnp.float32), axis=-1,
                            keepdims=True), (HR, D))
            acc_scr[:] = acc_scr[:] + acc_add
        else:
            acc_scr[:] = acc_scr[:] + jnp.broadcast_to(
                p[:, :1].astype(jnp.float32), (HR, D))

    @pl.when(it == T // C)
    def _fin():
        l = l_scr[:, :1]
        o_ref[0] = acc_scr[:] / jnp.where(l > 0, l, 1.0)


@functools.partial(
    jax.jit, static_argnames=("gs", "k_bits", "v_bits", "C", "Hg",
                              "expand", "do_qk", "do_vpath", "do_unpack"))
def trimmed(qg, k_codes, k_scale, k_mn, v_codes, v_scale, v_mn, nkq, *,
            gs, k_bits, v_bits, C, Hg, expand="dot", do_qk=True,
            do_vpath=True, do_unpack=True):
    B, Hkv, r, D = qg.shape
    T = k_codes.shape[-1]
    KDw, VDw = k_codes.shape[2], v_codes.shape[2]
    Dg, Tg = D // gs, T // gs
    nt = T // C
    ng = Hkv // Hg
    HR = Hg * r
    cnt = jnp.stack([jnp.asarray(nkq, jnp.int32)])
    kernel = functools.partial(
        _kernel, k_bits=k_bits, v_bits=v_bits, gs=gs, C=C, r=r, T=T,
        sm_scale=1.0 / (D ** 0.5), cdt=jnp.bfloat16, expand=expand,
        do_qk=do_qk, do_vpath=do_vpath, do_unpack=do_unpack)
    full = lambda i, t, *_: (i, 0, 0)
    chunk4 = lambda i, t, cnt: (
        i // ng, i % ng, 0,
        jnp.clip(jnp.minimum(t, (cnt[0] + C - 1) // C - 1), 0, nt - 1))
    cg_ = C // gs
    Sg = 128 if (Tg >= 128 and Tg % 128 == 0) else Tg
    scale4 = lambda i, t, cnt: (
        i // ng, i % ng, 0,
        jnp.clip(jnp.minimum(t, (cnt[0] + C - 1) // C - 1),
                 0, nt - 1) * cg_ // Sg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * ng, nt + 1),
        in_specs=[
            pl.BlockSpec((1, HR, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, KDw, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, D, Sg), scale4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, D, Sg), scale4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, VDw, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, Dg, C), chunk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg, Dg, C), chunk4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HR, D), full, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HR, 128), jnp.float32),
            pltpu.VMEM((HR, 128), jnp.float32),
            pltpu.VMEM((HR, D), jnp.float32),
            pltpu.VMEM((HR, Hg * D), jnp.bfloat16),
            pltpu.VMEM((HR, Hg * D), jnp.bfloat16),
            pltpu.VMEM((HR, Sg), jnp.float32),
            pltpu.VMEM((Sg, Hg * D), jnp.bfloat16),     # transposed scales
            pltpu.VMEM((Hg * D, C), jnp.bfloat16),      # head-major vals
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * ng, HR, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(cnt, qg.astype(jnp.bfloat16).reshape(B * ng, HR, D),
      k_codes, k_scale.astype(jnp.bfloat16), k_mn.astype(jnp.bfloat16),
      v_codes, v_scale.astype(jnp.bfloat16), v_mn.astype(jnp.bfloat16))
    return out.reshape(B, Hkv, r, D)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-anchor", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode equality of variants vs expand=dot")
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--T", type=int, default=32768)
    ap.add_argument("--fill", type=int, default=32640)
    ap.add_argument("--C", type=int, default=512)
    ap.add_argument("--Hg", type=int, default=16)
    args = ap.parse_args()

    B, Hkv, r, D, gs, W = args.B, 32, 1, 128, 32, 128
    T, fill = args.T, args.fill
    kb = vb = 2
    kdw, vdw = D * kb // 32, D * vb // 32
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    u = lambda k, sh: jax.random.randint(
        k, sh, 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    f = lambda k, sh: (jax.random.uniform(k, sh, jnp.float32, 0.01, 0.1)
                       .astype(jnp.bfloat16))
    qg = jax.random.normal(ks[0], (B, Hkv, r, D), jnp.float32)
    k_codes = u(ks[1], (B, Hkv, kdw, T))
    k_scale, k_mn = f(ks[2], (B, Hkv, D, T // gs)), f(ks[3],
                                                      (B, Hkv, D, T // gs))
    v_codes = u(ks[4], (B, Hkv, vdw, T))
    v_scale, v_mn = f(ks[5], (B, Hkv, D // gs, T)), f(ks[6],
                                                      (B, Hkv, D // gs, T))
    k_win = f(ks[7], (B, Hkv, W, D))
    v_win = k_win

    iters = 5 if args.quick else 20
    print(f"backend={jax.default_backend()} B={B} T={T} fill={fill} "
          f"C={args.C} Hg={args.Hg} iters={iters}", flush=True)

    if args.check:
        import numpy as np
        ref = trimmed(qg, k_codes, k_scale, k_mn, v_codes, v_scale, v_mn,
                      jnp.int32(fill), gs=gs, k_bits=kb, v_bits=vb,
                      C=args.C, Hg=args.Hg, expand="dot")
        got = trimmed(qg, k_codes, k_scale, k_mn, v_codes, v_scale, v_mn,
                      jnp.int32(fill), gs=gs, k_bits=kb, v_bits=vb,
                      C=args.C, Hg=args.Hg, expand="qfold")
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"qfold vs dot max err: {err:.3e}", flush=True)
        assert err < 3e-2, err
        return

    # anchor: the production kernel
    from kivi_tpu.kernels.fused_decode_wide import fused_decode_attention_wide
    if not args.skip_anchor:
        t0 = time.perf_counter()
        prod = lambda q, kc, ksc, km, vc, vsc, vm, kwn, vwn: (
            fused_decode_attention_wide(
                q, kc, ksc, km, vc, vsc, vm, kwn, vwn,
                jnp.int32(fill), jnp.int32(128), jnp.int32(fill),
                group_size=gs, k_bits=kb, v_bits=vb, chunk=args.C,
                head_fold=args.Hg))
        ms = bench_fn(prod, qg, k_codes, k_scale, k_mn, v_codes, v_scale,
                      v_mn, k_win, v_win, iters=iters) * 1e3
        print(f"production kernel: {ms:7.3f} ms  (compile+bench "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)

        # cross-check with chained eager dispatches (includes ~0.3-0.5 ms
        # per-dispatch tunnel overhead; differencing cancels only the
        # final readback) — resolves bench_fn anomalies at this geometry
        def direct_ms(n_lo, n_hi):
            def run(n):
                q = qg
                t0 = time.perf_counter()
                for _ in range(n):
                    out = prod(q, k_codes, k_scale, k_mn, v_codes,
                               v_scale, v_mn, k_win, v_win)
                    q = q + (jnp.sum(out) * 1e-30).astype(q.dtype)
                float(jnp.sum(q))
                return time.perf_counter() - t0
            run(2)  # warm
            lo, hi = run(n_lo), run(n_hi)
            return (hi - lo) / (n_hi - n_lo) * 1e3
        print(f"production direct-chained: {direct_ms(5, 25):7.3f} ms "
              f"(incl dispatch overhead)", flush=True)

    variants = [
        ("trim full (expand=dot)", dict()),
        ("expand=qfold (scale into Q rows)", dict(expand="qfold")),
        ("expand=none", dict(expand="none")),
        ("dma only (all off)",
         dict(do_qk=False, do_vpath=False, do_unpack=False,
              expand="none")),
    ]
    for name, kwv in variants:
        t0 = time.perf_counter()
        try:
            fn = lambda q, kc, ksc, km, vc, vsc, vm, kwv=kwv: trimmed(
                q, kc, ksc, km, vc, vsc, vm,
                jnp.int32(fill), gs=gs, k_bits=kb, v_bits=vb, C=args.C,
                Hg=args.Hg, **kwv)
            ms = bench_fn(fn, qg, k_codes, k_scale, k_mn, v_codes,
                          v_scale, v_mn, iters=iters) * 1e3
            print(f"{name:36s} {ms:7.3f} ms  (compile+bench "
                  f"{time.perf_counter() - t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

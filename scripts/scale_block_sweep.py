"""Sweep the wide kernel's K-scale block size SB (groups per streamed
scale block) at the three ledger geometries.  SB == cg fetches exactly
the live scale rows but issues two extra DMAs per chunk step; larger SB
amortizes the issues at the cost of fetch granularity; SB == Tg is one
plane fetch per program (the r3 DMA pattern, but still row-major and
free of the select/projection passes).

Usage: timeout 1800 python scripts/scale_block_sweep.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_validate_r4 import mk_cache  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.kernels.fused_decode_wide import (
        choose_chunk, fused_decode_attention_wide)
    from kivi_tpu.utils.timing import bench_fn
    import jax.tree_util as jtu

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    D = 128

    def tile_to(cache, b_from, b_to):
        f = b_to // b_from
        return jtu.tree_map(
            lambda a: (jnp.tile(a, (f,) + (1,) * (a.ndim - 1))
                       if getattr(a, "ndim", 0) >= 1
                       and a.shape[0] == b_from else a), cache)

    # (name, B_mk, B, Tmax, fill, t_bound)
    geos = [
        ("serving-fill B=72 f=1280", 8, 72, 4096, 1280, 2048),
        ("4K full B=32", 4, 32, 4096, 3968, None),
        ("32K B=4 f=32640", 4, 4, 32768, 32640, None),
    ]
    for name, b0, B, Tmax, fill, tb in geos:
        cache = mk_cache(b0, 32, D, Tmax, fill, 0, qcfg)
        if B != b0:
            cache = tile_to(cache, b0, B)
        q = jax.random.normal(jax.random.PRNGKey(3), (B, 32, 1, D),
                              jnp.float32)
        C = choose_chunk(Tmax, 128, 128, 2, 2)
        cg = C // 32
        Tg = Tmax // 32
        sbs = sorted({cg, 2 * cg, 4 * cg, 8 * cg, Tg} & {
            sb for sb in (cg, 2 * cg, 4 * cg, 8 * cg, Tg)
            if sb <= Tg and Tg % sb == 0})
        row = []
        for sb in sbs:
            # resident scale VMEM is 2 * Hg*sb*D bytes (bf16): skip
            # blocks that blow the ~16M scoped budget next to the code
            # blocks (32K SB=Tg measured 16.69M > 16M)
            # 2 (double-buffer) * 2 (scale+zp) * Hg=16 * sb * D * 2B
            if 2 * 2 * 16 * sb * D * 2 > (10 << 20):
                row.append(f"SB={sb}: skip(vmem)")
                continue
            g = jax.jit(lambda q, c, sb=sb: fused_decode_attention_wide(
                q.reshape(B, 32, 1, D), c.k_codes, c.k_scale, c.k_mn,
                c.v_codes, c.v_scale, c.v_mn, c.k_win, c.v_win,
                c.n_k_quant, c.n_k_win, c.n_v_quant, group_size=32,
                k_bits=2, v_bits=2, chunk=C, t_bound=tb, scale_block=sb))
            try:
                ms = bench_fn(g, q, cache) * 1e3
                row.append(f"SB={sb}: {ms:.3f}")
            except Exception as e:
                row.append(f"SB={sb}: FAIL({type(e).__name__})")
            print(f"  {name} " + row[-1], flush=True)
        print(f"{name} (C={C}): " + " | ".join(row), flush=True)


if __name__ == "__main__":
    main()

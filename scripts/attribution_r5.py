"""Wide-kernel cost attribution by STATIC ABLATION (round 5, on-chip).

The r4 serving-fill probe showed the kernel at ~290 GB/s of its live
working set vs the chip's ~570 GB/s copy floor (docs/artifacts/
serving_fill_probe_r4.txt) and named suspects (fp-window phase,
per-chunk fixed work, small-DMA issue).  This script measures them
directly: `fused_decode_attention_wide(_ablate=...)` statically removes
one cost component at a time and the difference to the full kernel is
that component's cost.

Components:
  full      production kernel
  window    - window/strip phase        (cost = full - window)
  vquant    - quantized-V contribution  (cost = full - vquant)
  qk        - K unpack + QK dots        (cost = full - qk)
  kunpack   - K unpack/staging only     (cost = full - kunpack)
  chunk     - whole chunk body          (window + DMA + dispatch)
  compute   empty bodies                (DMA + dispatch floor)

Geometries: the bench serving regime (T=4096 fill=1280 B=72) and the
near-full 4K cache (fill=3968), Hg=16 C=512 bits 2/2 vf=128 (production
dispatch: no_pinned_v=True, t_bound as the engine derives it).

Usage: timeout 1800 python scripts/attribution_r5.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kivi_tpu.kernels.fused_decode_wide import fused_decode_attention_wide
from kivi_tpu.utils.timing import bench_fn


def make_args(B, T, kb=2, vb=2, Hkv=32, r=1, D=128, gs=32, W=128, seed=0):
    """Random operands in the PRODUCTION (round-4+) layouts: K scales
    as (B, Hkv, Tg, D) token-group rows."""
    kdw, vdw = D * kb // 32, D * vb // 32
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    u = lambda k, sh: jax.random.randint(
        k, sh, 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    f = lambda k, sh: (jax.random.uniform(k, sh, jnp.float32, 0.01, 0.1)
                       .astype(jnp.bfloat16))
    qg = jax.random.normal(ks[0], (B, Hkv, r, D), jnp.float32)
    return (qg, u(ks[1], (B, Hkv, kdw, T)),
            f(ks[2], (B, Hkv, T // gs, D)), f(ks[3], (B, Hkv, T // gs, D)),
            u(ks[4], (B, Hkv, vdw, T)),
            f(ks[5], (B, Hkv, D // gs, T)), f(ks[6], (B, Hkv, D // gs, T)),
            f(ks[7], (B, Hkv, W, D)), f(ks[7], (B, Hkv, W, D)))


ABLATIONS = ("full", "window", "vquant", "qk", "kunpack", "chunk",
             "compute")


def main():
    gs, W = 32, 128
    rows = [
        (4096, 1280, 72, 2048),    # serving fill, engine t_bound
        (4096, 3968, 72, None),    # near-full cache
    ]
    iters, rounds = 10, 4
    print(f"backend={jax.default_backend()} iters={iters} "
          f"rounds={rounds}", flush=True)
    for T, fill, B, tb in rows:
        args = make_args(B, T)
        best = {}
        for rnd in range(rounds):
            for ab in ABLATIONS:
                fn = lambda *a: fused_decode_attention_wide(
                    *a, jnp.int32(fill), jnp.int32(128), jnp.int32(fill),
                    group_size=gs, k_bits=2, v_bits=2, chunk=512,
                    head_fold=16, t_bound=tb, no_pinned_v=True,
                    _ablate=None if ab == "full" else ab)
                try:
                    ms = bench_fn(fn, *args, iters=iters, repeats=2) * 1e3
                    best[ab] = min(best.get(ab, 1e9), ms)
                except Exception as e:
                    print(f"T={T} fill={fill} {ab}: FAIL "
                          f"{type(e).__name__} {str(e)[:160]}", flush=True)
                    best[ab] = float("nan")
        base = best.get("full", float("nan"))
        print(f"\n# T={T} fill={fill} B={B} t_bound={tb}", flush=True)
        for ab in ABLATIONS:
            ms = best.get(ab, float("nan"))
            delta = "" if ab == "full" else f"  (component {base-ms:+.3f})"
            print(f"  {ab:8s} {ms:7.3f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()

"""Attribute wide-kernel time at the SERVING regime (fill << Tmax).

bench.py's headline geometry decodes at fill ~1280 in a T=4096 cache:
5 of 8 chunk grid-steps are dead (DMA-elided but still dispatched) and
every program still runs the window/strip phase.  This probe measures:

  * T=4096 fill=1280  (production: dead steps + window)
  * T=2048 fill=1280  (same arrays sliced to T'=2048: what a static
    live-chunk grid bound would buy — dead steps drop 5 -> 1)
  * T=1536 fill=1280  (tightest 512-multiple bound: zero dead steps)

All on the SAME data (sliced), B=72, Hg=16, C=512, bits 2/2.

Usage: timeout 900 python scripts/probe_serving_fill.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from kivi_tpu.kernels.fused_decode_wide import fused_decode_attention_wide
from kivi_tpu.utils.timing import bench_fn
from scripts.chunk_sweep import make_args


def main():
    gs, W, fill, B = 32, 128, 1280, 72
    (qg, kc, ksc, km, vc, vsc, vm, kwn, vwn) = make_args(B, 4096)
    rows = []
    for Tb in (4096, 2048, 1536):
        a = (qg, kc[..., :Tb], ksc[..., :Tb // gs], km[..., :Tb // gs],
             vc[..., :Tb], vsc[..., :Tb], vm[..., :Tb], kwn, vwn)
        fn = lambda *x: fused_decode_attention_wide(
            *x, jnp.int32(fill), jnp.int32(128), jnp.int32(fill),
            group_size=gs, k_bits=2, v_bits=2, chunk=512, head_fold=16)
        rows.append((Tb, a, fn))
    best = {Tb: 1e9 for Tb, _, _ in rows}
    for _ in range(3):                      # interleaved rounds, keep min
        for Tb, a, fn in rows:
            best[Tb] = min(best[Tb],
                           bench_fn(fn, *a, iters=10, repeats=2) * 1e3)
    for Tb, ms in best.items():
        print(f"T={Tb:5d} fill={fill} B={B}  {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

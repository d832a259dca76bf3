"""On-chip production wide-kernel sweep over (T, fill, B) x chunk.

Picks the `choose_chunk` long-context threshold: C=1024 halves per-chunk
fixed work but loses slightly in the 4K serving regime end-to-end
(docs/kernels.md).  Prints ms/call by fori-loop differencing
(utils/timing.bench_fn — the only honest timer at ms scale over the
tunnel).

Usage: timeout 1800 python scripts/chunk_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kivi_tpu.kernels.fused_decode_wide import fused_decode_attention_wide
from kivi_tpu.utils.timing import bench_fn


def make_args(B, T, kb=2, vb=2, Hkv=32, r=1, D=128, gs=32, W=128, seed=0):
    kdw, vdw = D * kb // 32, D * vb // 32
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    u = lambda k, sh: jax.random.randint(
        k, sh, 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    f = lambda k, sh: (jax.random.uniform(k, sh, jnp.float32, 0.01, 0.1)
                       .astype(jnp.bfloat16))
    qg = jax.random.normal(ks[0], (B, Hkv, r, D), jnp.float32)
    return (qg, u(ks[1], (B, Hkv, kdw, T)),
            f(ks[2], (B, Hkv, D, T // gs)), f(ks[3], (B, Hkv, D, T // gs)),
            u(ks[4], (B, Hkv, vdw, T)),
            f(ks[5], (B, Hkv, D // gs, T)), f(ks[6], (B, Hkv, D // gs, T)),
            f(ks[7], (B, Hkv, W, D)), f(ks[7], (B, Hkv, W, D)))


def main():
    gs, W = 32, 128
    rows = [
        # (T, fill, B)   serving-ish fill and near-full fill
        (4096, 1280, 72),
        (16384, 16256, 8),
        (32768, 32640, 4),
    ]
    iters = 10
    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    # The tunneled chip shows MINUTES-long contention windows (the same
    # config measured 1.48 and 2.35 ms in back-to-back runs), so A/B
    # rounds are INTERLEAVED and each side keeps its minimum — a
    # contention window then hurts both sides or shows up as an
    # inflated round that the min discards.
    rounds = 4
    for T, fill, B in rows:
        args = make_args(B, T)
        best = {}
        for rnd in range(rounds):
            for C in (512, 1024):
                fn = lambda *a: fused_decode_attention_wide(
                    *a, jnp.int32(fill), jnp.int32(128), jnp.int32(fill),
                    group_size=gs, k_bits=2, v_bits=2, chunk=C,
                    head_fold=16)
                try:
                    ms = bench_fn(fn, *args, iters=iters, repeats=2) * 1e3
                    best[C] = min(best.get(C, 1e9), ms)
                except Exception as e:
                    print(f"T={T:6d} C={C:5d} FAILED {type(e).__name__}: "
                          f"{str(e)[:160]}", flush=True)
                    best[C] = float("nan")
        for C, ms in sorted(best.items()):
            print(f"T={T:6d} fill={fill:6d} B={B:3d} C={C:5d} "
                  f"{ms:7.3f} ms (min of {rounds} interleaved rounds)",
                  flush=True)


if __name__ == "__main__":
    main()

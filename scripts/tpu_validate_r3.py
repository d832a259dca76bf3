"""On-chip validation of the round-3 scale-folded (qfold) wide kernel.

The qfold rewrite (fused_decode_wide.py) deletes the group->token
K-scale expand dot by folding scales into per-head query rows sliced
from a transposed per-superblock scratch.  Interpret mode cannot prove
the Mosaic lowering (transposes, sublane-dynamic slices, head-major
scatter stores), so this runs the production dispatch path against the
jnp oracle on the real chip across the cache phases that exercise every
kernel branch, then times the ledger geometries.

Usage: timeout 1800 python scripts/tpu_validate_r3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) * 0)


def check(name, ok):
    print(f"[{'PASS' if ok else 'FAIL'}] {name}", flush=True)
    return ok


def mk_cache(B, H, D, Tmax, prompt, steps, qcfg, seed=0):
    from kivi_tpu.cache.kivi_cache import (decode_append, init_layer_cache,
                                           prefill_ingest)
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    cache = init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(ks[0], (B, H, prompt, D), jnp.bfloat16)
    v = jax.random.normal(ks[1], (B, H, prompt, D), jnp.bfloat16)
    cache = jax.jit(lambda c, k, v: prefill_ingest(c, k, v, qcfg))(
        cache, k, v)
    step = jax.jit(lambda c, kn, vn: decode_append(c, kn, vn, qcfg))
    for i in range(steps):
        kn = jax.random.normal(jax.random.fold_in(ks[2], i), (B, H, 1, D),
                               jnp.float32)
        vn = jax.random.normal(jax.random.fold_in(ks[3], i), (B, H, 1, D),
                               jnp.float32)
        cache = step(cache, kn, vn)
    return cache


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.core.attention import decode_attention

    all_ok = True
    D = 128
    timing_only = "--timing-only" in sys.argv

    # ---- correctness: dispatch path vs jnp oracle across phases --------
    cases = [] if timing_only else [
        # name, B, H, r, Tmax, prompt, steps, qcfg kwargs, call kwargs
        ("gqa r=4 @3800", 2, 8, 4, 4096, 3800, 0, {}, {}),
        ("gqa r=4 pad", 2, 8, 4, 4096, 3800, 0, {},
         {"pad_len": jnp.asarray([70, 300], jnp.int32)}),
        ("gqa r=4 swa", 2, 8, 4, 4096, 3800, 0, {},
         {"sliding_window": 1024}),
        ("mha flush-cross", 2, 8, 1, 1024, 600, 130, {}, {}),
        ("mha 4-bit", 2, 8, 1, 1024, 600, 60, {"k_bits": 4, "v_bits": 4},
         {}),
        ("gqa 8-bit", 2, 8, 4, 1024, 600, 60, {"k_bits": 8, "v_bits": 8},
         {}),
        ("gqa k8 v2", 2, 8, 4, 1024, 600, 60, {"k_bits": 8}, {}),
        ("strip-spans-chunks", 1, 2, 4, 1024, 640, 90,
         {"residual_length": 256}, {}),
    ]
    for name, B, H, r, Tmax, prompt, steps, qkw, ckw in cases:
        base = dict(k_bits=2, v_bits=2, group_size=32,
                    residual_length=128, v_flush=128)
        base.update(qkw)
        qcfg = QuantConfig(**base)
        cache = mk_cache(B, H, D, Tmax, prompt, steps, qcfg)
        q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                              jnp.float32)
        want = decode_attention(q, cache, qcfg, impl="jnp", **ckw)
        got = decode_attention(q, cache, qcfg, impl="pallas", **ckw)
        err = float(jnp.max(jnp.abs(got - want)))
        all_ok &= check(f"qfold {name} (max err {err:.2e})", err < 5e-2)

    # ---- timing: ledger geometries --------------------------------------
    # 4K serving regime (ledger: wide kernel 3.28 -> 3.40 ms at B=32 MHA
    # full cache with the r2 superblock form)
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    cache = mk_cache(4, 32, D, 4096, 3968, 0, qcfg)
    # batch 32 by tiling the batch axis (keeps ingest time down)
    import jax.tree_util as jtu
    cache = jtu.tree_map(
        lambda a: (jnp.tile(a, (8,) + (1,) * (a.ndim - 1))
                   if getattr(a, "ndim", 0) >= 1 and a.shape[0] == 4
                   else a), cache)
    q = jax.random.normal(jax.random.PRNGKey(3), (32, 32, 1, D),
                          jnp.float32)
    # cache as ARGUMENT: closed-over multi-GB arrays serialize into the
    # compile request (remote compile helper rejects with HTTP 413)
    g = jax.jit(lambda q, c: decode_attention(q, c, qcfg, impl="pallas"))
    sync(g(q, cache))
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(q, cache)
    sync(out)
    print(f"  4K full-cache MHA B=32: "
          f"{1e3 * (time.perf_counter() - t0) / reps:.3f} ms/call "
          f"(r2 ledger: 3.40)", flush=True)

    print("ALL OK" if all_ok else "FAILURES", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()

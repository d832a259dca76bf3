"""On-chip validation of the round-4 transposed K-scale layout.

Round 4 stores K scales/zps as (Tg, D) token-group ROWS (one (D,) row
per group) instead of lane-major (D, Tg) planes.  The wide kernel then
streams scales at chunk granularity (per-chunk (cg, D) blocks riding
the dead-chunk clamp — a partially filled cache reads only its live
scale fraction, where the old layout fetched the FULL plane at 4K) and
folds the zero-point term into the existing group collapse via a VPU
lane-reduce, deleting the per-superblock transpose + zp projection +
per-chunk select pass.  fused_decode / flash_extend / qk_pv transpose
the plane back in-kernel (compat paths).

Interpret mode cannot prove the Mosaic lowering (sublane-blocked scale
DMA, in-kernel plane transposes), so this runs the production dispatch
against the jnp oracle on the real chip, then times the ledger
geometries A/B-style against the kernel-level ledger rows.

Usage: timeout 1800 python scripts/tpu_validate_r4.py [--timing-only]
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
    from kivi_tpu.core.attention import decode_attention, extend_attention
    from kivi_tpu.utils.timing import bench_fn

    all_ok = True
    D = 128
    timing_only = "--timing-only" in sys.argv

    # ---- decode dispatch vs jnp oracle across phases -------------------
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
        # low fill exercises the chunk-granular scale elision + t_bound
        ("mha low-fill t_bound", 2, 8, 1, 4096, 1200, 90, {},
         {"fill_bound": 1300}),
    ]
    for name, B, H, r, Tmax, prompt, steps, qkw, ckw in cases:
        base = dict(k_bits=2, v_bits=2, group_size=32,
                    residual_length=128, v_flush=128)
        base.update(qkw)
        qcfg = QuantConfig(**base)
        cache = mk_cache(B, H, D, Tmax, prompt, steps, qcfg)
        q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                              jnp.float32)
        ckw_o = {k: v for k, v in ckw.items() if k != "fill_bound"}
        want = decode_attention(q, cache, qcfg, impl="jnp", **ckw_o)
        got = decode_attention(q, cache, qcfg, impl="pallas", **ckw)
        err = float(jnp.max(jnp.abs(got - want)))
        all_ok &= check(f"scale-rows {name} (max err {err:.2e})",
                        err < 5e-2)

    # ---- per-head kernel (wide-unsupported geometry: v_flush != 128) ---
    if not timing_only:
        qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                           residual_length=128, v_flush=32)
        cache = mk_cache(2, 8, D, 1024, 700, 40, qcfg)
        q = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 1, D),
                              jnp.float32)
        want = decode_attention(q, cache, qcfg, impl="jnp")
        got = decode_attention(q, cache, qcfg, impl="pallas")
        err = float(jnp.max(jnp.abs(got - want)))
        all_ok &= check(f"per-head kernel v_flush=32 (max err {err:.2e})",
                        err < 5e-2)

        # ---- flash-extend (in-kernel plane transpose) ------------------
        qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                           residual_length=128, v_flush=128)
        B, H, r, T1 = 2, 8, 4, 256
        cache = mk_cache(B, H, D, 4096, 1800, 0, qcfg)
        q = jax.random.normal(jax.random.PRNGKey(11), (B, H * r, T1, D),
                              jnp.float32)
        kn = jax.random.normal(jax.random.PRNGKey(12), (B, H, T1, D),
                               jnp.bfloat16)
        vn = jax.random.normal(jax.random.PRNGKey(13), (B, H, T1, D),
                               jnp.bfloat16)
        want = extend_attention(q, kn, vn, cache, qcfg, impl="jnp")
        got = extend_attention(q, kn, vn, cache, qcfg, impl="pallas")
        err = float(jnp.max(jnp.abs(got - want)))
        all_ok &= check(f"flash-extend 256q/1800hist (max err {err:.2e})",
                        err < 5e-2)

    # ---- timing: ledger geometries -------------------------------------
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    import jax.tree_util as jtu

    def tile_to(cache, b_from, b_to):
        f = b_to // b_from
        return jtu.tree_map(
            lambda a: (jnp.tile(a, (f,) + (1,) * (a.ndim - 1))
                       if getattr(a, "ndim", 0) >= 1
                       and a.shape[0] == b_from else a), cache)

    # serving fill (ledger r4: 1.99 ms with t_bound=2048 at B=72)
    cache = mk_cache(8, 32, D, 4096, 1280, 0, qcfg)
    cache = tile_to(cache, 8, 72)
    q = jax.random.normal(jax.random.PRNGKey(3), (72, 32, 1, D),
                          jnp.float32)
    for tb in (None, 2048):
        g = jax.jit(lambda q, c: decode_attention(
            q, c, qcfg, impl="pallas", fill_bound=None if tb is None
            else tb - 512))
        ms = bench_fn(g, q, cache) * 1e3
        print(f"  serving-fill B=72 fill=1280 t_bound={tb}: "
              f"{ms:.3f} ms/call (r4 pre-change: "
              f"{'2.267' if tb is None else '1.990'})", flush=True)

    # 4K full cache MHA B=32 (ledger r3: 3.3-3.4 ms)
    cache = mk_cache(4, 32, D, 4096, 3968, 0, qcfg)
    cache = tile_to(cache, 4, 32)
    q = jax.random.normal(jax.random.PRNGKey(4), (32, 32, 1, D),
                          jnp.float32)
    g = jax.jit(lambda q, c: decode_attention(q, c, qcfg, impl="pallas"))
    ms = bench_fn(g, q, cache) * 1e3
    print(f"  4K full-cache MHA B=32: {ms:.3f} ms/call "
          f"(r3 ledger: 3.3-3.4)", flush=True)

    # 32K MHA B=4 (ledger r4: 1.458 ms at C=1024)
    cache = mk_cache(4, 32, D, 32768, 32640, 0, qcfg)
    q = jax.random.normal(jax.random.PRNGKey(6), (4, 32, 1, D),
                          jnp.float32)
    t0 = time.perf_counter()
    g = jax.jit(lambda q, c: decode_attention(q, c, qcfg, impl="pallas"))
    sync(g(q, cache))
    print(f"  32K compile: {time.perf_counter() - t0:.1f}s", flush=True)
    ms = bench_fn(g, q, cache) * 1e3
    print(f"  32K MHA B=4 fill=32640: {ms:.3f} ms/call "
          f"(r4 ledger: 1.458)", flush=True)

    print("ALL OK" if all_ok else "FAILURES", flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()

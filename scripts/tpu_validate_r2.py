"""Real-chip validation of the round-2 kernel work (run when the axon
tunnel is up; everything below was built/tested in interpret mode
during a tunnel outage and interpret mode hides Mosaic lowering bugs).

Checks, in order (each prints PASS/FAIL + timing):
  1. flash-extend kernel vs the jnp extend oracle at real geometry
     (GQA r=4, D=128, multi-chunk history, pad + sliding window).
  2. wide-kernel one-hot K-scale expansion (commit e55bacc) A/B:
     correctness vs split oracle + decode step timing at bench-like
     geometry, to confirm the fused form is not a regression.
  3. chunked prefill on chip: engine.prefill_chunked at 4K, compile
     count and wall time vs one-shot prefill.

Usage:  timeout 1800 python scripts/tpu_validate_r2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) * 0)


def check(name, ok):
    print(f"[{'PASS' if ok else 'FAIL'}] {name}", flush=True)
    return ok


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from kivi_tpu.cache.kivi_cache import (decode_append, init_layer_cache,
                                           prefill_ingest)
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.core.attention import extend_attention

    all_ok = True

    # ---- 1. flash-extend vs jnp oracle, real geometry ------------------
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    B, H, D, Tmax, r, T1 = 2, 4, 128, 4096, 4, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    cache = init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(ks[0], (B, H, 1800, D), jnp.bfloat16)
    v = jax.random.normal(ks[1], (B, H, 1800, D), jnp.bfloat16)
    cache = jax.jit(lambda c, k, v: prefill_ingest(c, k, v, qcfg))(
        cache, k, v)
    q = jax.random.normal(ks[2], (B, H * r, T1, D), jnp.float32)
    kn = jax.random.normal(ks[3], (B, H, T1, D), jnp.float32)
    vn = jax.random.normal(ks[4], (B, H, T1, D), jnp.float32)
    for kw in ({}, {"pad_len": jnp.asarray([70, 300], jnp.int32)},
               {"sliding_window": 1024}):
        want = extend_attention(q, kn, vn, cache, qcfg, impl="jnp", **kw)
        got = extend_attention(q, kn, vn, cache, qcfg, impl="pallas",
                               **kw)
        err = float(jnp.max(jnp.abs(got - want)))
        all_ok &= check(f"flash-extend {kw or 'plain'} (max err {err:.2e})",
                        err < 5e-2)
    f = jax.jit(lambda q: extend_attention(q, kn, vn, cache, qcfg,
                                           impl="pallas"))
    sync(f(q))
    t0 = time.perf_counter(); sync(f(q))
    print(f"  flash-extend {T1} queries vs {1800} history: "
          f"{1e3 * (time.perf_counter() - t0):.2f} ms", flush=True)

    # ---- 2. wide-kernel one-hot fusion A/B ------------------------------
    from kivi_tpu.core.attention import decode_attention
    qcfg2 = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                        residual_length=128, v_flush=128)
    B2, H2, r2 = 8, 8, 4
    cache2 = init_layer_cache(B2, H2, D, 4096, qcfg2)
    k2 = jax.random.normal(ks[0], (B2, H2, 3800, D), jnp.bfloat16)
    cache2 = jax.jit(lambda c, k, v: prefill_ingest(c, k, v, qcfg2))(
        cache2, k2, k2)
    q2 = jax.random.normal(ks[1], (B2, H2 * r2, 1, D), jnp.float32)
    want = decode_attention(q2, cache2, qcfg2, impl="jnp")
    got = decode_attention(q2, cache2, qcfg2, impl="pallas")
    err = float(jnp.max(jnp.abs(got - want)))
    all_ok &= check(f"wide-kernel one-hot fusion (max err {err:.2e})",
                    err < 5e-2)
    g = jax.jit(lambda q: decode_attention(q, cache2, qcfg2,
                                           impl="pallas"))
    sync(g(q2))
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(q2)
    sync(out)
    print(f"  wide-kernel decode B={B2} GQA r={r2} @3800 fill: "
          f"{1e3 * (time.perf_counter() - t0) / reps:.3f} ms/call "
          f"(compare docs/kernels.md ledger before trusting e55bacc)",
          flush=True)

    # ---- 3. chunked prefill on chip -------------------------------------
    from kivi_tpu.config import ModelConfig
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.engine import Engine
    cfg = ModelConfig(vocab_size=32000, hidden_size=1024,
                      intermediate_size=2816, num_layers=4, num_heads=8,
                      num_kv_heads=8, head_dim=128,
                      max_position_embeddings=4096)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(cfg=cfg, qcfg=qcfg2, params=params, max_seq_len=4096,
                 batch_size=1, impl="pallas")
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 3000), 1, 32000,
                              jnp.int32)
    t0 = time.perf_counter()
    logits, caches = eng.prefill_chunked(toks, chunk_size=512)
    sync(logits)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    logits, _ = eng.prefill_chunked(toks, chunk_size=512)
    sync(logits)
    t_warm = time.perf_counter() - t0
    ok = bool(np.isfinite(np.asarray(logits)).all())
    all_ok &= check(f"chunked prefill 3000 tok (cold {t_cold:.1f} s, "
                    f"warm {1e3 * t_warm:.0f} ms, "
                    f"{eng._extend._cache_size()} extend compiles)", ok)

    print("ALL OK" if all_ok else "FAILURES PRESENT", flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())

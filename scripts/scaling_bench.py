"""Scaling-efficiency bench: decode tokens/s per chip across mesh sizes.

BASELINE.md acceptance: >=85% tokens/s scaling efficiency going
1 chip -> 1 host -> N hosts.  This driver measures it the standard SPMD
way: fix the PER-CHIP workload (weak scaling — batch grows with the
data axis), run the same jitted decode scan over (1, 2, 4, ..., N)-chip
meshes, and report tokens/s/chip relative to the 1-chip run.

On the single-chip build image this degenerates to the n=1 row (the
driver validates plumbing on a virtual CPU mesh instead:
`--platform cpu --virtual 8`); on a pod slice it produces the real
efficiency table.  Multi-host: launch one copy per host under
`jax.distributed` (parallel/multihost.py) — jax.devices() is then
global and the mesh sweep spans hosts automatically.

Usage:
  python scripts/scaling_bench.py [--batch-per-chip 8] [--ctx 2048]
      [--steps 128] [--platform cpu --virtual 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="TP width (fixed); the sweep grows the data axis")
    ap.add_argument("--platform", default="",
                    help="override jax platform (e.g. cpu for virtual)")
    ap.add_argument("--virtual", type=int, default=0,
                    help="virtual CPU device count (needs --platform cpu)")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from kivi_tpu.config import ModelConfig, QuantConfig
    from kivi_tpu.models import modeling
    from kivi_tpu.parallel import make_mesh, shard_caches, shard_params, shard_tokens
    from kivi_tpu.serving.engine import Engine

    cfg = ModelConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.hidden * 11008 // 4096,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.heads, head_dim=args.hidden // args.heads,
        rope_theta=10000.0, max_position_embeddings=args.ctx)
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    params = jax.block_until_ready(
        modeling.init_params(cfg, jax.random.PRNGKey(0)))

    n_dev = len(jax.devices())
    tp = args.model_parallel
    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64, 128, 256)
             if n * tp <= n_dev]
    rows = []
    for n in sizes:
        mesh = make_mesh(n, tp)
        B = args.batch_per_chip * n
        eng = Engine(cfg=cfg, qcfg=qcfg, params=shard_params(
            params, cfg, mesh), max_seq_len=args.ctx, batch_size=B,
            impl=impl)
        tokens = shard_tokens(jax.random.randint(
            jax.random.PRNGKey(1), (B, args.prompt), 0, cfg.vocab_size,
            jnp.int32), mesh)
        caches = shard_caches(eng.init_caches(), qcfg, mesh)
        first, caches = eng.prefill(tokens, caches)
        pos = jnp.full((B, 1), args.prompt, jnp.int32)
        rng = jax.random.PRNGKey(0)
        out, caches = eng._decode_scan(eng.params, first, pos, caches,
                                       rng, steps=args.steps,
                                       prompt_len=args.prompt)
        float(jnp.sum(out.astype(jnp.float32)))       # sync (compile+warm)
        t0 = time.perf_counter()
        out, caches = eng._decode_scan(
            eng.params, out[:, -1:],
            jnp.full((B, 1), args.prompt + args.steps, jnp.int32), caches,
            rng, steps=args.steps, prompt_len=args.prompt + args.steps)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        tps = B * args.steps / dt
        rows.append((n * tp, tps, tps / (n * tp)))
        del caches, eng
        print(f"chips={n * tp:4d} batch={B:5d}: {tps:10,.0f} tok/s "
              f"({tps / (n * tp):,.0f} /chip)", file=sys.stderr)

    base = rows[0][2]
    for chips, tps, per in rows:
        print(f"efficiency @ {chips} chips: {per / base * 100:.1f}%",
              file=sys.stderr)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(rows[-1][2] / base, 4),
        "unit": "frac_of_1chip_per_chip_tps",
        "chips": rows[-1][0],
    }))


if __name__ == "__main__":
    main()

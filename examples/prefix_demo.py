"""Prefix caching + chunked prefill demo — runs ANYWHERE (no weights).

Serving scenario the reference cannot express (its prefill is
all-or-nothing inside HF generate, `example.py:43`): a long SHARED
system prompt is prefilled ONCE at batch 1 (optionally in fixed-size
chunks — two compiles for any length), snapshotted, and reused across
request batches, each of which prefills only its own short suffix.
Prints the measured amortization: per-batch latency with the snapshot
vs re-prefilling prefix+suffix every time.

Usage:
  python examples/prefix_demo.py                       # tiny, random
  python examples/prefix_demo.py --preset llama2-7b --impl pallas \
      --prefix-len 2048 --batches 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    from kivi_tpu.cli import add_engine_flags, add_quant_flags, load_model
    add_quant_flags(ap)
    add_engine_flags(ap)
    ap.add_argument("--prefix-len", type=int, default=512)
    ap.add_argument("--suffix-len", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=0,
                    help="prefill the prefix in chunks of this size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kivi_tpu.cli import EngineArgs, quant_config_from_args
    from kivi_tpu.config import tiny_config
    from kivi_tpu.serving.engine import Engine

    def device_sync(tree):
        # true completion = scalar readback (block_until_ready only
        # acknowledges enqueue over the axon tunnel; see utils/timing.py)
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)) * 0)

    qcfg = quant_config_from_args(args)
    if args.model_dir or args.preset:
        eargs = EngineArgs(model_dir=args.model_dir, preset=args.preset,
                           max_seq_len=args.max_seq_len,
                           batch_size=args.batch_size, impl=args.impl,
                           mesh_data=args.mesh_data,
                           mesh_model=args.mesh_model)
        cfg, params = load_model(eargs)
    else:
        from kivi_tpu.models import modeling
        cfg = tiny_config()
        params = modeling.init_params(cfg, jax.random.PRNGKey(0))

    B = args.batch_size
    need = args.prefix_len + args.suffix_len + args.max_new
    max_seq = max(args.max_seq_len, need)
    eng = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=max_seq,
                 batch_size=B, impl=args.impl)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.integers(1, cfg.vocab_size, args.prefix_len),
                         jnp.int32)
    suffixes = [jnp.asarray(rng.integers(
        1, cfg.vocab_size, (B, args.suffix_len)), jnp.int32)
        for _ in range(args.batches)]

    # ---- snapshot path: prefix prefilled once ------------------------
    t0 = time.perf_counter()
    snap = eng.prefill_prefix(prefix, chunk_size=args.chunk or None)
    device_sync(snap.caches[0].k_codes if qcfg.quantize_kv
                else snap.caches[0].k)
    t_snap = time.perf_counter() - t0
    # warm the suffix-extend + decode compiles before timing
    eng.generate(suffixes[0], args.max_new, prefix=snap)
    t0 = time.perf_counter()
    outs_a = [eng.generate(s, args.max_new, prefix=snap)
              for s in suffixes]
    device_sync(outs_a[-1])
    t_reuse = time.perf_counter() - t0

    # ---- baseline: re-prefill prefix + suffix per batch --------------
    full = [jnp.concatenate(
        [jnp.broadcast_to(prefix, (B, args.prefix_len)), s], axis=1)
        for s in suffixes]
    eng.generate(full[0], args.max_new)            # warm
    t0 = time.perf_counter()
    outs_b = [eng.generate(f, args.max_new) for f in full]
    device_sync(outs_b[-1])
    t_full = time.perf_counter() - t0

    per_a = 1e3 * t_reuse / args.batches
    per_b = 1e3 * t_full / args.batches
    print(f"prefix snapshot build (once, cold incl. compile): "
          f"{1e3 * t_snap:8.1f} ms"
          f"{'  (chunked)' if args.chunk else ''}")
    print(f"per-batch with snapshot:      {per_a:8.1f} ms")
    print(f"per-batch full re-prefill:    {per_b:8.1f} ms")
    print(f"amortized speedup:            {per_b / per_a:8.2f}x over "
          f"{args.batches} batches of {B}x{args.suffix_len}-token "
          f"suffixes behind a {args.prefix_len}-token shared prefix")


if __name__ == "__main__":
    main()

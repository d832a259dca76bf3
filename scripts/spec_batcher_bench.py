"""On-chip throughput A/B: SpeculativeBatcher vs plain ContinuousBatcher.

Completes the speculative evidence table (docs/serving.md): the B=1
rows measured the engine paths; this measures the SERVING path — S
continuous-batching slots decoding together, plain bucketed decode vs
the batched speculative iteration (4 fixed-shape dispatches/iteration
regardless of S/acceptance — serving/spec_batcher.py).

Model class matches the r4/r5 B=1 table (8-layer 512-hidden random
model, examples/speculative_demo.py `_cfg`) so the rows compose; the
draft is the same geometry at 2 layers.  Greedy, so SpeculativeBatcher
output is token-equal to the plain batcher's (tests/test_spec_batcher)
— equality is re-asserted here on the first request.

Usage (TPU):
  python scripts/spec_batcher_bench.py [--slots 4] [--k 4] [--gen 96] \
      [--json docs/artifacts/spec_batcher_bench_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling
from kivi_tpu.serving.batcher import ContinuousBatcher, Request
from kivi_tpu.serving.spec_batcher import SpeculativeBatcher


def _cfg(layers: int) -> ModelConfig:
    return ModelConfig(vocab_size=2048, hidden_size=512,
                       intermediate_size=1024, num_layers=layers,
                       num_heads=8, num_kv_heads=8, head_dim=64,
                       max_position_embeddings=4096)


def _requests(n, gen, rng):
    return [Request(uid=i,
                    prompt=[int(t) for t in
                            rng.integers(1, 2048, size=int(rng.integers(
                                90, 128)))],
                    max_new_tokens=gen)
            for i in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--reqs", type=int, default=8)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--gen", type=int, default=96)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--draft-layers", type=int, default=2)
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # cross-path greedy equality on random weights needs exact matmuls
    # (same rationale as tests/conftest.py under KIVI_TPU_REAL)
    jax.config.update("jax_default_matmul_precision", "highest")

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    tcfg, dcfg = _cfg(args.layers), _cfg(args.draft_layers)
    tparams = modeling.init_params(tcfg, jax.random.PRNGKey(0))
    dparams = modeling.init_params(dcfg, jax.random.PRNGKey(1))
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    max_seq = 512
    buckets = (128,)
    print(f"backend={jax.default_backend()} S={args.slots} k={args.k} "
          f"target={args.layers}L draft={args.draft_layers}L "
          f"gen={args.gen} reqs={args.reqs}", file=sys.stderr)

    plain = ContinuousBatcher(tcfg, qcfg, tparams, args.slots, max_seq,
                              impl=impl, prompt_buckets=buckets)
    spec = SpeculativeBatcher(tcfg, qcfg, tparams, dcfg, qcfg, dparams,
                              args.slots, max_seq, k=args.k, impl=impl,
                              prompt_buckets=buckets)

    res = {}
    for name, batcher in (("plain", plain), ("spec", spec)):
        rng = np.random.default_rng(5)          # same requests for both
        warm = batcher.run(_requests(2, args.gen, rng))  # compiles
        rng = np.random.default_rng(6)
        reqs = _requests(args.reqs, args.gen, rng)
        t0 = time.perf_counter()
        out = batcher.run(reqs)
        dt = time.perf_counter() - t0
        ntok = sum(len(r.tokens) for r in out.values())
        res[name] = {"tok_s": round(ntok / dt, 1), "tokens": ntok,
                     "wall_s": round(dt, 2)}
        res[name + "_first"] = [int(t) for t in out[0].tokens[:24]]
        print(f"{name:5s}: {ntok} tokens in {dt:.2f}s -> "
              f"{ntok / dt:7.1f} tok/s", file=sys.stderr)

    assert res["plain_first"] == res["spec_first"], "token equality"
    res["speedup"] = round(res["spec"]["tok_s"] / res["plain"]["tok_s"], 3)
    res.update(slots=args.slots, k=args.k, gen=args.gen,
               layers=args.layers, draft_layers=args.draft_layers)
    for key in ("plain_first", "spec_first"):
        del res[key]
    print(json.dumps(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

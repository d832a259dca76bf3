"""Batched speculative serving throughput: SpeculativeBatcher vs the
plain ContinuousBatcher at the acceptance BOUNDS reachable without real
weights (same methodology as speculative_demo.py, but aggregate tok/s
across S continuous-batching slots instead of B=1 latency).

  * upper bound — draft == target: every proposal accepted up to the
    per-slot boundary clamp;
  * lower bound — random 1/4-depth draft (acceptance ~0): pure
    overhead, one token per slot per iteration plus wasted draft work.

Usage: python examples/spec_batch_demo.py [--layers 8] [--slots 4]
       [--gen 128] [--k 4]
"""

import argparse
import sys
import time

import jax
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling
from kivi_tpu.serving.batcher import ContinuousBatcher, Request
from kivi_tpu.serving.spec_batcher import SpeculativeBatcher


def _cfg(layers: int) -> ModelConfig:
    return ModelConfig(vocab_size=2048, hidden_size=512,
                       intermediate_size=1024, num_layers=layers,
                       num_heads=8, num_kv_heads=8, head_dim=64,
                       max_position_embeddings=4096)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--prompt", type=int, default=160)
    args = ap.parse_args()

    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    max_seq = 1 << (args.prompt + args.gen
                    + qcfg.residual_length + 1).bit_length()
    cfg = _cfg(args.layers)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    prompts = [list(rng.randint(1, 2048, size=args.prompt - 3 * i))
               for i in range(args.slots)]

    def reqs():
        return [Request(uid=i, prompt=p, max_new_tokens=args.gen)
                for i, p in enumerate(prompts)]

    def run(bat):
        # warm run compiles everything (admission buckets + step jits)
        bat.run(reqs())
        t0 = time.perf_counter()
        res = bat.run(reqs())
        n = sum(len(r.tokens) for r in res.values())
        return n / (time.perf_counter() - t0)

    plain = ContinuousBatcher(cfg, qcfg, params, num_slots=args.slots,
                              max_seq_len=max_seq, impl=impl)
    tps0 = run(plain)
    print(f"plain batcher      : {tps0:8.1f} tok/s total",
          file=sys.stderr)

    for name, seed, layers in (("upper (perfect)", 0, args.layers),
                               ("lower (random) ", 7,
                                max(1, args.layers // 4))):
        dcfg = _cfg(layers)
        dparams = (params if layers == args.layers and seed == 0
                   else modeling.init_params(dcfg, jax.random.PRNGKey(seed)))
        bat = SpeculativeBatcher(cfg, qcfg, params, dcfg, qcfg, dparams,
                                 num_slots=args.slots, max_seq_len=max_seq,
                                 k=args.k, impl=impl)
        tps = run(bat)
        it = max(bat.stats["iterations"], 1)
        print(f"spec {name}: {tps:8.1f} tok/s total  "
              f"(x{tps / tps0:4.2f} vs plain, {bat.stats['accepted'] / it:.2f} "
              f"accepted/iter, stats {bat.stats})", file=sys.stderr)


if __name__ == "__main__":
    main()

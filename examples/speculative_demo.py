"""Speculative decoding demo / latency harness.

Measures B=1 decode latency of `SpeculativeEngine` against the plain
engine at the acceptance-rate BOUNDS reachable without real weights:

  * upper bound — draft == target (every proposal accepted): the best
    case k+1 tokens per (draft scan + verify extend) pair;
  * lower bound — a random 1/4-depth draft (acceptance ~0): pure
    overhead, one token per iteration plus wasted draft work.

With real checkpoints the operating point sits between the bounds
(paper-typical acceptance 2-4 of k=4 with a distilled draft).  On a
random-weight model only the bounds are meaningful — this harness
exists so the real-chip A/B is one command when weights/tunnel allow.

Usage: python examples/speculative_demo.py [--layers 8] [--gen 128]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine
from kivi_tpu.serving.speculative import SpeculativeEngine


def _cfg(layers: int) -> ModelConfig:
    return ModelConfig(vocab_size=2048, hidden_size=512,
                       intermediate_size=1024, num_layers=layers,
                       num_heads=8, num_kv_heads=8, head_dim=64,
                       max_position_embeddings=4096)


def _eng(cfg, qcfg, seed, max_seq):
    params = modeling.init_params(cfg, jax.random.PRNGKey(seed))
    return Engine(cfg=cfg, qcfg=qcfg, params=params,
                  max_seq_len=max_seq,
                  batch_size=1,
                  impl="pallas" if jax.default_backend() == "tpu"
                  else "jnp")


def _time(fn):
    # host readback is the only real sync over the axon tunnel
    # (kivi_tpu/utils/timing.py rule) — the WARM run must sync too or
    # its tail overlaps the timed run
    float(np.asarray(fn()).sum())      # warm (compiles) + sync
    t0 = time.perf_counter()
    out = fn()
    float(np.asarray(out).sum())
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--prompt", type=int, default=160)
    args = ap.parse_args()

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    # room for the full residual window on top of prompt+gen (a cache
    # smaller than residual_length cannot hold one flush)
    max_seq = 1 << (args.prompt + args.gen
                    + qcfg.residual_length + 1).bit_length()
    tgt = _eng(_cfg(args.layers), qcfg, 0, max_seq)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, args.prompt),
                              1, 2048, jnp.int32)

    t_plain = _time(lambda: tgt.generate(toks, args.gen))
    plain_tps = args.gen / t_plain
    print(f"plain engine      : {plain_tps:8.1f} tok/s", file=sys.stderr)

    # B=1 decode is WEIGHT-STREAMING bound (the engine's fused scan
    # measures at the HBM floor), so speculation only wins when the
    # draft's weights are much smaller than the target's: tokens/iter =
    # acc+1, weight bytes/iter = (k+1)*draft + target.  An equal-size
    # draft loses even at full acceptance; the host loop additionally
    # pays dispatch round trips per iteration (ruinous over the
    # tunnel), which generate_device removes entirely.
    for name, drf_seed, drf_layers in (
            ("upper (perfect)", 0, args.layers),
            ("lower (random) ", 7, max(1, args.layers // 4))):
        drf = _eng(_cfg(drf_layers), qcfg, drf_seed, max_seq)
        spec = SpeculativeEngine(tgt, drf, k=args.k)
        t = _time(lambda: spec.generate(toks, args.gen))
        acc = np.mean(spec.last_acceptance) if spec.last_acceptance else 0
        td = _time(lambda: spec.generate_device(toks, args.gen))
        wfrac = (args.k + 1) * drf_layers / args.layers + 1
        model = (acc + 1) / wfrac
        print(f"spec {name}: host {args.gen / t:7.1f} tok/s "
              f"(x{t_plain / t:4.2f}) | device {args.gen / td:7.1f} tok/s "
              f"(x{t_plain / td:4.2f}) | acceptance {acc:.2f}/{args.k}, "
              f"weight-model x{model:.2f}, stats {spec.stats}",
              file=sys.stderr)


if __name__ == "__main__":
    main()

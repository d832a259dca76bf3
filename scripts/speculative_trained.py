"""Speculative decoding A/B on TRAINED models (round 3).

The bounds harness (examples/speculative_demo.py) brackets the win with
draft==target (upper) and a random draft (lower).  This script measures
the REAL operating point: target = the 4-layer in-image byte LM
(scripts/train_tiny_lm.py), draft = a 1-layer model trained on the same
corpus, prompts = held-out validation text.  Reports acceptance rate,
tok/s A/B vs the plain engine, and verifies greedy token-equality.

Usage:
  python scripts/train_tiny_lm.py --steps 3000 --batch 16 --seq 1024 \
      --out evalsuite_runs/tiny_lm
  python scripts/train_tiny_lm.py --steps 3000 --batch 16 --seq 1024 \
      --layers 1 --out evalsuite_runs/tiny_lm_draft
  python scripts/speculative_trained.py [--k 8] [--gen 256] [--prompts 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="evalsuite_runs/tiny_lm")
    ap.add_argument("--draft", default="evalsuite_runs/tiny_lm_draft")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=256)
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # verify rides extend-attention, plain decode rides decode-attention:
    # two mathematically-equal f32 programs whose argmax can flip on
    # near-ties under the TPU default (bf16 MXU passes).  True f32
    # matmuls restore the token-equality the CPU suite pins (same fix
    # as tests/conftest.py under KIVI_TPU_REAL).
    jax.config.update("jax_default_matmul_precision", "highest")

    from kivi_tpu.config import QuantConfig
    from kivi_tpu.models.checkpoint import load_checkpoint
    from kivi_tpu.serving.engine import Engine
    from kivi_tpu.serving.speculative import SpeculativeEngine

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    tcfg, tparams = load_checkpoint(args.target)
    dcfg, dparams = load_checkpoint(args.draft)
    max_seq = args.prompt_len + args.gen + args.k + 64
    max_seq = ((max_seq + 127) // 128) * 128
    target = Engine(cfg=tcfg, qcfg=qcfg, params=tparams,
                    max_seq_len=max_seq, batch_size=1)
    draft = Engine(cfg=dcfg, qcfg=qcfg, params=dparams,
                   max_seq_len=max_seq, batch_size=1)
    spec = SpeculativeEngine(target, draft, k=args.k)

    val = np.load(os.path.join(args.target, "val_bytes.npy"))
    rng = np.random.default_rng(7)
    starts = rng.integers(0, len(val) - args.prompt_len - 1,
                          size=args.prompts)
    prompts = [jnp.asarray(val[s:s + args.prompt_len],
                           jnp.int32)[None, :] for s in starts]
    print(f"backend={jax.default_backend()} target={tcfg.num_layers}L "
          f"draft={dcfg.num_layers}L k={args.k} gen={args.gen} "
          f"prompts={args.prompts}x{args.prompt_len}", file=sys.stderr)

    # warm both paths on prompt 0 (compiles) + token-equality check
    base = np.asarray(target.generate(prompts[0], args.gen))[0]
    got = np.asarray(spec.generate(prompts[0], args.gen))[0]
    n = min(len(base), len(got))
    agree = float(np.mean(base[:n] == got[:n]))
    print(f"greedy token agreement vs target: {agree:.1%}",
          file=sys.stderr)
    assert agree >= 0.99, (agree, base[:n], got[:n])

    t_plain = t_spec = 0.0
    n_plain = n_spec = 0
    blocks_all = []
    for p in prompts:
        t0 = time.perf_counter()
        out = target.generate(p, args.gen)
        n_plain += int(np.asarray(out).shape[1])
        t_plain += time.perf_counter() - t0

        t0 = time.perf_counter()
        blocks = [np.asarray(b) for b in spec.generate_stream(p, args.gen)]
        t_spec += time.perf_counter() - t0
        n_spec += sum(b.size for b in blocks)
        blocks_all.append([b.size for b in blocks])

    # block sizes after the first (time-to-first-token) block are
    # accepted+1 per iteration -> acceptance = mean(block - 1)
    iter_blocks = [b for bl in blocks_all for b in bl[1:]]
    acc = float(np.mean([b - 1 for b in iter_blocks])) if iter_blocks else 0
    plain_tps = n_plain / t_plain
    spec_tps = n_spec / t_spec

    # device-resident loop (ONE while-loop dispatch per generation):
    # the host loop above is dispatch-RTT bound over the tunnel
    # (docs/serving.md); this is speculation's best on-chip showing
    t_dev = n_dev = 0
    for i, p in enumerate(prompts):
        t0 = time.perf_counter()
        out = spec.generate_device(p, args.gen)
        n = int(np.asarray(out).shape[1])
        if i == 0:        # first call pays the while-loop compile
            t0 = time.perf_counter()
            out = spec.generate_device(p, args.gen)
            n = int(np.asarray(out).shape[1])
        t_dev += time.perf_counter() - t0
        n_dev += n
    dev_tps = n_dev / t_dev

    res = {
        "k": args.k, "gen": args.gen, "prompts": args.prompts,
        "plain_tok_s": round(plain_tps, 1),
        "spec_host_tok_s": round(spec_tps, 1),
        "spec_device_tok_s": round(dev_tps, 1),
        "speedup_host": round(spec_tps / plain_tps, 3),
        "speedup_device": round(dev_tps / plain_tps, 3),
        "accepted_per_iter": round(acc, 2),
        "acceptance_rate": round(acc / args.k, 3),
        "stats": spec.stats,
    }
    print(f"plain       : {plain_tps:7.1f} tok/s", file=sys.stderr)
    print(f"spec host   : {spec_tps:7.1f} tok/s "
          f"({res['speedup_host']}x), accepted {acc:.2f}/{args.k} "
          f"per iteration (rate {res['acceptance_rate']:.1%}), "
          f"stats {spec.stats}", file=sys.stderr)
    print(f"spec device : {dev_tps:7.1f} tok/s "
          f"({res['speedup_device']}x)", file=sys.stderr)
    print(json.dumps(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

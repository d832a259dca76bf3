"""Accuracy of KIVI cache quantization on a TRAINED in-image LM.

Round 2's proxy (examples/accuracy_proxy.py) measured logit-KL on
random weights — methodologically sound but its greedy-agreement column
was meaningless (near-flat logits, agreement ~10% at 2-bit measured
tie-flipping noise; docs/accuracy.md says so).  This script runs the
same teacher-forced pipeline on the byte-level LM trained by
scripts/train_tiny_lm.py, whose logits are confident, and reports the
two numbers the reference's LongBench tables stand in for
(`/root/reference/docs/long_bench.md:7-49`):

  * perplexity delta (bits/byte) on held-out REAL text, decoded
    teacher-forced so every step's logits read the quantized cache;
  * greedy-agreement vs the fp16-cache trajectory (+ logit KL).

The decode span crosses >=3 K-flush and V-flush boundaries.

Usage: python scripts/accuracy_trained.py --ckpt evalsuite_runs/tiny_lm
       [--platform cpu] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "examples"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="evalsuite_runs/tiny_lm")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=768,
                    help="teacher-forced prompt length (bytes)")
    ap.add_argument("--steps", type=int, default=384,
                    help="decode span (crosses >=3 flush boundaries)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from accuracy_proxy import (compare, teacher_forced_greedy,
                                teacher_forced_logits)

    from kivi_tpu.config import QuantConfig
    from kivi_tpu.models.checkpoint import load_checkpoint

    cfg, params = load_checkpoint(args.ckpt)
    val = np.load(os.path.join(args.ckpt, "val_bytes.npy"))
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    print(f"# ckpt={args.ckpt} backend={jax.default_backend()} impl={impl} "
          f"ctx={args.ctx} steps={args.steps} batch={args.batch}",
          file=sys.stderr)

    # non-overlapping val windows: prompt + true continuation
    B, T0, S = args.batch, args.ctx, args.steps
    span = T0 + S
    rng = np.random.default_rng(args.seed)
    starts = rng.choice(len(val) - span - 1, size=B, replace=False)
    windows = np.stack([val[s:s + span] for s in starts]).astype(np.int32)
    prompt = jnp.asarray(windows[:, :T0])
    true_cont = jnp.asarray(windows[:, T0:])          # (B, S) real text

    fp16 = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=128)
    # fp16 greedy trajectory = the forced stream for agreement/KL
    forced = teacher_forced_greedy(params, cfg, fp16, prompt, S,
                                   impl)["tokens"]

    def ppl_bits(logits, targets):
        """bits/byte of `targets` under per-step logits (B, S, V)."""
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)
        return float(jnp.mean(nll)) / float(np.log(2))

    results = {}
    # teacher-forced on REAL text -> perplexity; on the fp16 trajectory
    # -> agreement/KL.  logits[:, t] predicts forced[:, t].
    base_real = teacher_forced_logits(params, cfg, fp16, prompt,
                                      true_cont, impl)[:, :-1]
    base_traj = teacher_forced_logits(params, cfg, fp16, prompt, forced,
                                      impl)[:, :-1]
    bits0 = ppl_bits(base_real, true_cont)
    results["fp16"] = {"bits_per_byte": bits0}
    print(f"fp16-cache: {bits0:.4f} bits/byte on held-out text")

    for kb, vb in ((8, 8), (4, 4), (2, 4), (2, 2)):
        qcfg = QuantConfig(k_bits=kb, v_bits=vb, group_size=32,
                           residual_length=128, v_flush=128)
        lg_real = teacher_forced_logits(params, cfg, qcfg, prompt,
                                        true_cont, impl)[:, :-1]
        bits = ppl_bits(lg_real, true_cont)
        lg_traj = teacher_forced_logits(params, cfg, qcfg, prompt, forced,
                                        impl)[:, :-1]
        kl, agree, conf_agree = compare(base_traj.astype(jnp.float32),
                                        lg_traj.astype(jnp.float32))
        results[f"kivi-{kb}/{vb}"] = {
            "bits_per_byte": bits, "delta_bits": bits - bits0,
            "greedy_agree_pct": float(agree.mean() * 100),
            "confident_agree_pct": conf_agree * 100,
            "kl_mean": float(kl.mean()),
            "kl_p95": float(np.percentile(kl, 95)),
        }
        print(f"kivi-{kb}/{vb}: {bits:.4f} bits/byte "
              f"(Δ {bits - bits0:+.4f}) | greedy agree "
              f"{agree.mean() * 100:.2f}% (confident "
              f"{conf_agree * 100:.2f}%) | KL mean {kl.mean():.4f} "
              f"p95 {np.percentile(kl, 95):.4f}")

    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        meta = {"ckpt": args.ckpt, "ctx": T0, "steps": S, "batch": B,
                "impl": impl, "backend": jax.default_backend()}
        with open(args.json, "w") as f:
            json.dump({"meta": meta, "results": results}, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()

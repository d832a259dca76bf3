"""Passkey recall on the trained byte LM: the in-image analogue of the
reference's long-context retrieval signals.

The reference's sharpest quantization signature is long-range
retrieval: PassageRetrieval drops 89.33 -> 80.83 at 2-bit on the GQA
model while 4-bit is lossless (`/root/reference/docs/long_bench.md:47`),
and its passkey demo (`long_context_example.py`) expects exact 5-digit
recall through the quantized cache.  No real checkpoints exist in this
image, but the trained byte LM (scripts/train_tiny_lm.py, 47 MiB of
code/markdown) has generic verbatim-copy (induction) circuits — so a
passkey planted in held-out text and re-cued at the end measures
EXACTLY the reference's signature mechanism: the cue must match the
marker's quantized keys across hundreds of tokens and copy the digits.

    <val text> ... \n##PASSKEY=dddddd\n ... <val text> ... \n##PASSKEY=

Exact-match of the generated digit bytes, swept over plant depths, at
fp16 / KIVI-4 / KIVI-2 through the production engine (prefill_ingest
quantizes the prompt; decode rides the fused kernels).  Run with an
MHA and a GQA byte LM (train_tiny_lm --kv-heads) to reproduce the
"2-bit degrades retrieval, worst under GQA; 4-bit ~lossless" class.

Usage (TPU, after training the byte LMs):
  python scripts/passkey_recall.py --models evalsuite_runs/tiny_lm \
      evalsuite_runs/tiny_lm_gqa --json docs/artifacts/passkey_recall_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MARKER = b"\n##PASSKEY="
NDIG = 6


def build_examples(val: np.ndarray, rng: np.random.Generator, n: int,
                   ctx: int, depth_frac: float):
    """n prompts of equal length: held-out text with the passkey line
    planted at ~depth_frac of the context, re-cued at the end.
    Returns (prompts (n, L) int32, answers (n, NDIG) int32)."""
    plant = MARKER + b"0" * NDIG + b"\n"          # sizing template
    cue = MARKER
    body = ctx - len(plant) - len(cue)
    prompts, answers = [], []
    for _ in range(n):
        digits = rng.integers(ord("0"), ord("9") + 1, size=NDIG)
        key = MARKER + bytes(int(d) for d in digits) + b"\n"
        s = int(rng.integers(0, len(val) - body - 1))
        text = np.asarray(val[s:s + body], np.int32)
        at = int(depth_frac * body)
        toks = np.concatenate([
            text[:at], np.frombuffer(key, np.uint8).astype(np.int32),
            text[at:],
            np.frombuffer(cue, np.uint8).astype(np.int32)])
        prompts.append(toks)
        answers.append(digits.astype(np.int32))
    return np.stack(prompts), np.stack(answers)


def main():
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.models.checkpoint import load_checkpoint
    from kivi_tpu.serving.engine import Engine

    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=["evalsuite_runs/tiny_lm"])
    ap.add_argument("--ctx", type=int, default=1000,
                    help="prompt length; must stay inside the training "
                         "seq length (RoPE OOD beyond it)")
    ap.add_argument("--examples", type=int, default=48)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--depths", type=float, nargs="+",
                    default=[0.2, 0.5, 0.8])
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "highest")

    qcfgs = {
        "fp16": QuantConfig(k_bits=16, v_bits=16),
        "kivi4": QuantConfig(k_bits=4, v_bits=4, group_size=32,
                             residual_length=128, v_flush=128),
        "kivi2": QuantConfig(k_bits=2, v_bits=2, group_size=32,
                             residual_length=128, v_flush=128),
    }
    res = {}
    for mdir in args.models:
        cfg, params = load_checkpoint(mdir)
        val = np.load(os.path.join(mdir, "val_bytes.npy"))
        name = os.path.basename(mdir.rstrip("/"))
        arch = f"{name}(kv{cfg.num_kv_heads}/{cfg.num_heads})"
        for qname, qcfg in qcfgs.items():
            # cache invariants: max_seq_len must divide by the decode
            # kernels' chunk (512) — which also covers group_size and
            # the 128-token residual window
            max_seq = ((args.ctx + 64 + 511) // 512) * 512
            eng = Engine(cfg=cfg, qcfg=qcfg, params=params,
                         max_seq_len=max_seq,
                         batch_size=args.batch,
                         impl="pallas" if qcfg.quantize_kv else "jnp")
            per_depth = {}
            for depth in args.depths:
                rng = np.random.default_rng(args.seed)
                prompts, answers = build_examples(
                    val, rng, args.examples, args.ctx, depth)
                hits = toks = 0
                for i in range(0, len(prompts), args.batch):
                    p = prompts[i:i + args.batch]
                    a = answers[i:i + args.batch]
                    if len(p) < args.batch:
                        break
                    out = np.asarray(eng.generate(
                        jnp.asarray(p, jnp.int32), NDIG))
                    hits += int((out == a).all(axis=1).sum())
                    toks += int((out == a).sum())
                n_ex = (len(prompts) // args.batch) * args.batch
                per_depth[str(depth)] = {
                    "exact": round(hits / n_ex, 4),
                    "digit_acc": round(toks / (n_ex * NDIG), 4),
                    "n": n_ex,
                }
                print(f"{arch} {qname:5s} depth {depth}: "
                      f"exact {hits}/{n_ex}  digit "
                      f"{toks/(n_ex*NDIG):.1%}", file=sys.stderr)
            res[f"{arch}_{qname}"] = per_depth
    print(json.dumps(res))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

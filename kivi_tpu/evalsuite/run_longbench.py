"""LongBench end-to-end runner (reference `pred_long_bench.py` +
`eval_long_bench.py` CLI equivalent).

Air-gapped design: datasets come from local jsonl files
(`--data-dir/<task>.jsonl`, LongBench record format) and the model from a
local HF checkpoint directory.  Prompt-length buckets keep the number of
distinct jit compilations small (the reference pays a fresh CUDA graph
per shape implicitly; XLA compilation is explicit, so we bucket).

Usage:
  python -m kivi_tpu.evalsuite.run_longbench predict \
      --model-dir /ckpt/llama2-7b --data-dir /data/longbench \
      --out-dir pred/llama2-7b-k2v2 --tasks hotpotqa,triviaqa \
      --k-bits 2 --v-bits 2 --group-size 32 --residual 128
  python -m kivi_tpu.evalsuite.run_longbench score --pred-dir pred/...
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _bucket(n: int, buckets=(1024, 2048, 4096, 8192, 16384, 32768)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def cmd_predict(args):
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from kivi_tpu.cli import quant_config_from_args
    from kivi_tpu.evalsuite.longbench import (REFERENCE_TASKS, load_jsonl,
                                              predict_task)
    from kivi_tpu.models.hf_loader import load_hf_checkpoint
    from kivi_tpu.serving.engine import Engine

    qcfg = quant_config_from_args(args)
    cfg, params = load_hf_checkpoint(args.model_dir)
    tok = AutoTokenizer.from_pretrained(args.model_dir)
    max_prompt = args.max_len - 512

    engines = {}

    def generate_fn(prompt: str, max_new: int) -> str:
        # PROMPT length is bucketed too (left-pad + mask): prefill
        # compiles once per (prompt bucket, cache bucket) pair, <= 6
        # compiles across a whole LongBench task, instead of one 20-40 s
        # compile per distinct prompt length.  --prefill-chunk C rounds
        # the prompt up to a multiple of C instead and prefills through
        # the chunked extend path: TWO compilations per cache bucket
        # cover every prompt length, with far less pad overhead than
        # power-of-two buckets (KIVI-approximate past the first chunk).
        ids = tok.encode(prompt)
        C = args.prefill_chunk
        pbucket = (((len(ids) + C - 1) // C) * C if C
                   else _bucket(len(ids)))
        cache_len = _bucket(pbucket + max_new)
        if cache_len not in engines:
            engines[cache_len] = Engine(
                cfg=cfg, qcfg=qcfg, params=params, max_seq_len=cache_len,
                batch_size=1, impl=args.impl)
        eng = engines[cache_len]
        pad = pbucket - len(ids)
        out = eng.generate(jnp.asarray([[0] * pad + ids], jnp.int32),
                           min(max_new, cache_len - pbucket),
                           eos_token_id=tok.eos_token_id,
                           pad_lens=[pad],
                           prefill_chunk_size=C or None)
        return tok.decode(list(out[0]), skip_special_tokens=True)

    tasks = (args.tasks.split(",") if args.tasks else REFERENCE_TASKS)
    for task in tasks:
        path = os.path.join(args.data_dir, f"{task}.jsonl")
        if not os.path.exists(path):
            print(f"[skip] {path} not found", file=sys.stderr)
            continue
        data = load_jsonl(path)
        if args.limit:
            data = data[:args.limit]
        predict_task(task, data, generate_fn, tok, max_prompt,
                     model_name=args.model_name or args.model_dir,
                     out_path=os.path.join(args.out_dir, f"{task}.jsonl"),
                     progress=True)


def cmd_score(args):
    from kivi_tpu.evalsuite.longbench import score_dir
    results = score_dir(args.pred_dir, use_e=args.e)
    print(json.dumps(results, indent=2))


def main(argv=None):
    # In this deployment jax may be pre-imported with a tunneled-TPU
    # platform before any env var can take effect; KIVI_TPU_PLATFORM
    # (e.g. "cpu") flips the backend through jax.config, the only
    # mechanism that still works post-import.
    plat = os.environ.get("KIVI_TPU_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    ap = argparse.ArgumentParser(prog="run_longbench")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict")
    from kivi_tpu.cli import add_quant_flags
    p.add_argument("--model-dir", required=True)
    p.add_argument("--model-name", default="")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--tasks", default="")
    add_quant_flags(p)          # one flag surface (kivi_tpu/cli.py)
    p.add_argument("--max-len", type=int, default=32768)
    p.add_argument("--prefill-chunk", type=int, default=0,
                   help="prefill in chunks of this many tokens (0 = "
                        "one-shot per prompt bucket)")
    p.add_argument("--impl", default="pallas")
    p.add_argument("--limit", type=int, default=0)
    p.set_defaults(fn=cmd_predict)

    s = sub.add_parser("score")
    s.add_argument("--pred-dir", required=True)
    s.add_argument("--e", action="store_true")
    s.set_defaults(fn=cmd_score)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

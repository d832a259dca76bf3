"""Minimal end-to-end generation demo — runs ANYWHERE (no weights needed).

The quickest way to see the engine work: a tiny random-weight model (or a
real checkpoint via --model-dir) prefills a prompt and greedily decodes
with the 2-bit KIVI cache, printing tokens and timing.  The analogue of
the reference's `example.py` minus the HF download (air-gapped image).

Usage:
  python examples/generate_demo.py                     # tiny, random
  python examples/generate_demo.py --preset llama2-7b  # full geometry
  python examples/generate_demo.py --model-dir /ckpt/llama-2-7b \
      --prompt "The capital of France is"
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
    ap.add_argument("--prompt", default="")
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kivi_tpu.cli import EngineArgs, quant_config_from_args
    from kivi_tpu.config import tiny_config
    from kivi_tpu.serving.engine import Engine

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

    tok = None
    if args.model_dir:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model_dir)
        ids = tok.encode(args.prompt or "The capital of France is")
    else:
        ids = list(range(1, 17))    # random-weight model: any ids work

    impl = args.impl if jax.default_backend() == "tpu" else "jnp"
    eng = Engine(cfg=cfg, qcfg=qcfg, params=params,
                 max_seq_len=max(args.max_seq_len,
                                 len(ids) + args.max_new + 1),
                 batch_size=1, impl=impl)
    t0 = time.perf_counter()
    out = eng.generate(jnp.asarray([ids], jnp.int32), args.max_new,
                       temperature=args.temperature, top_k=args.top_k,
                       top_p=args.top_p,
                       eos_token_id=tok.eos_token_id if tok else None)
    toks = [int(t) for t in out[0]]
    dt = time.perf_counter() - t0
    print(f"# backend={jax.default_backend()} impl={impl} "
          f"k{qcfg.k_bits}v{qcfg.v_bits} | {len(toks)} tokens in {dt:.2f}s"
          f" (incl. compile)", file=sys.stderr)
    print(tok.decode(toks, skip_special_tokens=True) if tok else toks)


if __name__ == "__main__":
    main()

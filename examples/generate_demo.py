"""End-to-end generation demo (analogue of the reference's `example.py`).

Runs greedy generation with a 2-bit KIVI KV cache and compares the output
tokens against the fp-cache baseline.  Uses a random-weight model by
default (no checkpoint download in this environment); pass --model-dir to
run a real HF Llama/Mistral checkpoint.

Usage:
  python examples/generate_demo.py [--impl pallas|jnp] [--bits 2]
      [--model-dir /path/to/hf/llama] [--prompt "..."]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas", choices=["pallas", "jnp"])
    ap.add_argument("--bits", type=int, default=2)
    ap.add_argument("--group-size", type=int, default=32)
    ap.add_argument("--residual", type=int, default=128)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--max-new", type=int, default=32)
    args = ap.parse_args()

    qcfg = QuantConfig(k_bits=args.bits, v_bits=args.bits,
                       group_size=args.group_size,
                       residual_length=args.residual)
    fp = QuantConfig(k_bits=16, v_bits=16, group_size=args.group_size,
                     residual_length=args.residual)

    if args.model_dir:
        from kivi_tpu.models.hf_loader import load_hf_checkpoint
        from transformers import AutoTokenizer
        cfg, params = load_hf_checkpoint(args.model_dir)
        tok = AutoTokenizer.from_pretrained(args.model_dir)
        prompt = args.prompt or "The capital of France is"
        ids = tok(prompt, return_tensors="np")["input_ids"]
        tokens = jnp.asarray(ids, jnp.int32)
    else:
        # random-weight model with KIVI-friendly geometry (head_dim 128)
        cfg = tiny_config(num_layers=4, hidden_size=256, num_heads=4,
                          num_kv_heads=2, head_dim=128, vocab_size=512,
                          intermediate_size=512)
        params = modeling.init_params(cfg, jax.random.PRNGKey(0))
        tok = None
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, 512, (1, 160)), jnp.int32)

    print(f"device: {jax.devices()[0]}  impl={args.impl}  "
          f"k/v bits={args.bits}  gs={qcfg.group_size}  "
          f"residual={qcfg.residual_length}")

    outs = {}
    for name, q in (("kivi", qcfg), ("fp16-cache", fp)):
        eng = Engine(cfg, q, params, max_seq_len=1024,
                     batch_size=tokens.shape[0],
                     impl=args.impl if name == "kivi" else "jnp")
        t0 = time.time()
        out = eng.generate(tokens, args.max_new)
        out = np.asarray(out)
        outs[name] = out
        dt = time.time() - t0
        text = (tok.decode(out[0]) if tok else out[0].tolist())
        print(f"[{name:>10}] {dt:6.1f}s  -> {text}")

    agree = (outs["kivi"] == outs["fp16-cache"]).mean()
    print(f"token agreement kivi vs fp: {agree:.0%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Passkey retrieval demo (analogue of the reference's
`long_context_example.py` + `passkey_examples.jsonl`).

Hides a random 5-digit passkey inside ~N tokens of filler and asks the
model to recall it with a 2-bit KIVI cache.  The prompts are generated
programmatically (the environment is air-gapped; the reference ships a
static jsonl with the same structure).

Usage:
  python examples/passkey_demo.py --model-dir /path/to/hf/llama \
      [--context-len 12000] [--n-examples 4] [--k-bits 2] [--v-bits 2]
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILLER = ("The grass is green. The sky is blue. The sun is yellow. "
          "Here we go. There and back again. ")
PREFIX = ("There is an important piece of info hidden inside a lot of "
          "irrelevant text. Find it and memorize it. I will quiz you "
          "about the important information there.\n")
QUESTION = ("\nWhat is the pass key? The pass key is ")


def build_prompt(passkey: int, target_tokens: int, chars_per_tok=4):
    """~target_tokens of filler with the passkey sentence in the middle."""
    needle = (f" The pass key is {passkey}. Remember it. "
              f"{passkey} is the pass key. ")
    n_fill = max(1, (target_tokens * chars_per_tok) // len(FILLER))
    half = n_fill // 2
    return PREFIX + FILLER * half + needle + FILLER * (n_fill - half) + QUESTION


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True,
                    help="local HF llama/mistral checkpoint directory")
    ap.add_argument("--context-len", type=int, default=12000)
    ap.add_argument("--n-examples", type=int, default=4)
    from kivi_tpu.cli import add_quant_flags
    add_quant_flags(ap)         # one flag surface (kivi_tpu/cli.py)
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from kivi_tpu.cli import quant_config_from_args
    from kivi_tpu.models.hf_loader import load_hf_checkpoint
    from kivi_tpu.serving.engine import Engine

    qcfg = quant_config_from_args(args)
    cfg, params = load_hf_checkpoint(args.model_dir)
    tok = AutoTokenizer.from_pretrained(args.model_dir)

    rng = random.Random(args.seed)
    n_correct = 0
    for i in range(args.n_examples):
        passkey = rng.randint(10000, 99999)
        prompt = build_prompt(passkey, args.context_len)
        ids = tok.encode(prompt)
        print(f"[{i}] prompt {len(ids)} tokens, passkey {passkey}")
        eng = Engine(cfg=cfg, qcfg=qcfg, params=params,
                     max_seq_len=len(ids) + 64, batch_size=1,
                     impl=args.impl)
        out = eng.generate(jnp.asarray([ids], jnp.int32), 16)
        text = tok.decode(list(out[0]), skip_special_tokens=True)
        ok = str(passkey) in text
        n_correct += ok
        print(f"    -> {text.strip()!r}  {'OK' if ok else 'MISS'}")
    print(f"passkey recall: {n_correct}/{args.n_examples}")


if __name__ == "__main__":
    main()

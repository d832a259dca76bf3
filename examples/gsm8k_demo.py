"""GSM8K few-shot demo (analogue of the reference's `example.py`:
5-shot grade-school-math prompt, greedy decode, 2-bit KIVI cache).

The few-shot examples below are hand-written in the GSM8K style (the
environment is air-gapped, so no dataset download).

Usage:
  python examples/gsm8k_demo.py --model-dir /path/to/hf/llama \
      [--k-bits 2] [--v-bits 2] [--max-new 96]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEW_SHOT = """Answer the question step by step.

Question: Lena has 3 boxes of pens with 12 pens each. She gives away 9 pens. How many pens does she have left?
Answer: Lena starts with 3 * 12 = 36 pens. After giving away 9 she has 36 - 9 = 27 pens. The answer is 27.

Question: A train travels 60 miles per hour for 2 hours and then 40 miles per hour for 3 hours. How far does it travel?
Answer: First leg: 60 * 2 = 120 miles. Second leg: 40 * 3 = 120 miles. Total: 120 + 120 = 240 miles. The answer is 240.

Question: Sam buys 4 sandwiches at $5 each and pays with a $50 bill. How much change does he get?
Answer: The sandwiches cost 4 * 5 = $20. Change: 50 - 20 = $30. The answer is 30.

Question: A farm has 15 cows and twice as many chickens. How many animals are there in total?
Answer: There are 15 * 2 = 30 chickens. Total animals: 15 + 30 = 45. The answer is 45.

Question: Mia reads 8 pages a day for 6 days, then 12 pages a day for 2 days. How many pages has she read?
Answer: First: 8 * 6 = 48 pages. Then: 12 * 2 = 24 pages. Total: 48 + 24 = 72 pages. The answer is 72.

Question: {question}
Answer:"""

DEFAULT_QUESTION = ("Tom has 7 bags with 9 marbles each. He loses 5 "
                    "marbles and then buys 2 more bags of 9. How many "
                    "marbles does he have?")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--question", action="append", default=None,
                    help="repeatable; several questions share the "
                         "few-shot header via a prefix snapshot")
    from kivi_tpu.cli import add_quant_flags
    add_quant_flags(ap)         # one flag surface (kivi_tpu/cli.py)
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--impl", default="pallas")
    args = ap.parse_args()
    questions = args.question or [DEFAULT_QUESTION]

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from kivi_tpu.cli import quant_config_from_args
    from kivi_tpu.models.hf_loader import load_hf_checkpoint
    from kivi_tpu.serving.engine import Engine

    qcfg = quant_config_from_args(args)
    cfg, params = load_hf_checkpoint(args.model_dir)
    tok = AutoTokenizer.from_pretrained(args.model_dir)

    # the 5-shot header is identical for every question: prefill it ONCE
    # as a prefix snapshot, then each question prefills only its own
    # "Question: ...\nAnswer:" suffix
    header, qtail = FEW_SHOT.split("{question}")
    head_ids = tok.encode(header)
    longest = max(len(tok.encode(q + qtail, add_special_tokens=False))
                  for q in questions)
    need = len(head_ids) + longest + args.max_new + 8
    gs = qcfg.group_size                # cache length must be gs-aligned
    eng = Engine(cfg=cfg, qcfg=qcfg, params=params,
                 max_seq_len=(need + gs - 1) // gs * gs,
                 batch_size=1, impl=args.impl)
    snap = eng.prefill_prefix(jnp.asarray(head_ids, jnp.int32))
    for q in questions:
        sfx = tok.encode(q + qtail, add_special_tokens=False)
        out = eng.generate(jnp.asarray([sfx], jnp.int32), args.max_new,
                           eos_token_id=tok.eos_token_id, prefix=snap)
        print(f"Question: {q}")
        print("Answer:" + tok.decode(list(out[0]),
                                     skip_special_tokens=True))
        print()


if __name__ == "__main__":
    main()

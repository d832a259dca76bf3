"""Decode-step attribution at bench geometry by depth slope.

step(L) = a*L + b over layer counts: `a` = per-layer cost (attention
kernel + layer matmuls + window append), `b` = per-step fixed cost
(embed, lm_head, sampling, scan bookkeeping, dispatch).  The
serving-fill probe (docs/artifacts/serving_fill_probe_r4.txt) accounts
~22.5 of 28.4 ms/step at B=88; this separates whether the missing ~6 ms
is per-layer (kernel-adjacent, attackable in Pallas) or per-step glue.

Usage: timeout 1800 python scripts/profile_step_r4.py [--batch 88]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=88)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--layers", type=int, default=0,
                    help="single depth (one process per depth avoids "
                         "the previous engine's buffers OOMing the next)")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    from kivi_tpu.config import ModelConfig, QuantConfig
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.engine import Engine

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    B, CTX, PROMPT, STEPS = args.batch, 4096, 1024, args.steps
    rows = []
    for L in ((args.layers,) if args.layers else (2, 8)):
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_layers=L, num_heads=32, num_kv_heads=32, head_dim=128,
            rope_theta=10000.0, max_position_embeddings=4096)
        params = modeling.init_params(cfg, jax.random.PRNGKey(0))
        eng = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=CTX,
                     batch_size=B, impl="pallas")
        tokens = jax.random.randint(jax.random.PRNGKey(1), (B, PROMPT), 0,
                                    cfg.vocab_size, jnp.int32)
        logits, caches = eng.prefill_chunked(tokens, 128)
        first = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        float(jnp.sum(first.astype(jnp.float32)))
        pos = jnp.full((B, 1), PROMPT, jnp.int32)
        rng = jax.random.PRNGKey(0)
        out, caches = eng._decode_scan(params, first, pos, caches, rng,
                                       steps=STEPS, temperature=0.0,
                                       prompt_len=PROMPT)
        float(jnp.sum(out.astype(jnp.float32)))          # compile+warm
        best = 1e9
        for _ in range(3):
            pos2 = jnp.full((B, 1), PROMPT + STEPS, jnp.int32)
            t0 = time.perf_counter()
            out2, caches = eng._decode_scan(params, out[:, -1:], pos2,
                                            caches, rng, steps=STEPS,
                                            temperature=0.0,
                                            prompt_len=PROMPT + STEPS)
            float(jnp.sum(out2.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
            out = out2
        ms = best * 1e3 / STEPS
        rows.append((L, ms))
        print(f"L={L}: {ms:.3f} ms/step", flush=True)
        del caches, eng, params

    if len(rows) == 2:
        (l0, m0), (l1, m1) = rows
        a = (m1 - m0) / (l1 - l0)
        b = m0 - a * l0
        print(f"per-layer a = {a:.3f} ms, per-step fixed b = {b:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()

"""Memory + speed microbenchmark at a FIXED batch — the analogue of the
reference's `mem_spd_test.py` (/root/reference/mem_spd_test.py:8-13,52-71:
bs=96, prompt ~160 tokens, 338 generated, prints wall-ms per run and the
peak memory).  bench.py is the max-batch headline; this script answers
"same batch, how much faster/smaller is the KIVI cache".

Usage:  python examples/mem_spd.py [--batch 96] [--prompt 160] [--gen 338]
        (defaults mirror the reference; add --layers to shrink the model)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine
from kivi_tpu.utils.profiling import kv_cache_report, memory_snapshot


def run(cfg, qcfg, params, batch, prompt, gen, repeats, impl):
    # cache sized for the warmup + every timed repeat (each continues
    # decoding from the previous cache state)
    ctx = 1 << (prompt + (repeats + 1) * gen + 1).bit_length()
    eng = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=ctx,
                 batch_size=batch, impl=impl)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (batch, prompt), 0,
                                cfg.vocab_size, jnp.int32)
    first, caches = eng.prefill(tokens)
    pos = jnp.full((batch, 1), prompt, jnp.int32)
    rng = jax.random.PRNGKey(0)
    out, caches = eng._decode_scan(params, first, pos, caches, rng,
                                   steps=gen, temperature=0.0,
                                   prompt_len=prompt)   # compile + warm
    float(jnp.sum(out.astype(jnp.float32)))
    times = []
    for i in range(repeats):
        # prompt_len must track the TRUE fill (prompt + completed gens)
        # or the static flush schedule fires at the wrong window phase;
        # _decode_scan canonicalizes it so repeats reuse the same trace
        # whenever the schedule phase repeats.
        fill = prompt + (i + 1) * gen
        t0 = time.perf_counter()
        out, caches = eng._decode_scan(params, out[:, -1:],
                                       jnp.full((batch, 1), fill, jnp.int32),
                                       caches, rng, steps=gen,
                                       temperature=0.0, prompt_len=fill)
        float(jnp.sum(out.astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    del caches
    mem = memory_snapshot()
    peak = mem.get("peak_bytes_in_use") if mem else None
    return min(times), peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--prompt", type=int, default=160)
    ap.add_argument("--gen", type=int, default=338)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--layers", type=int, default=8,
                    help="Llama-2-7b geometry at this depth")
    from kivi_tpu.cli import add_quant_flags
    add_quant_flags(ap)         # one flag surface (kivi_tpu/cli.py)
    # v_flush=128 admits the head-folded wide decode kernel (CLAUDE.md:
    # any other value silently costs ~2x decode throughput)
    ap.set_defaults(v_flush=128)
    args = ap.parse_args()

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=args.layers, num_heads=32, num_kv_heads=32,
        head_dim=128, rope_theta=10000.0, max_position_embeddings=4096)
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    params = jax.block_until_ready(
        modeling.init_params(cfg, jax.random.PRNGKey(0)))

    from kivi_tpu.cli import quant_config_from_args
    kivi = quant_config_from_args(args)
    fp16 = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=args.residual)
    rep = kv_cache_report(cfg, kivi, args.batch, 1024)
    print(f"cache/seq: kivi {rep['kivi_bytes_per_seq']/2**20:.1f} MiB, "
          f"fp16 {rep['fp16_bytes_per_seq']/2**20:.1f} MiB "
          f"({rep['memory_reduction']:.2f}x reduction)")

    for name, qcfg in (("kivi", kivi), ("fp16-cache", fp16)):
        dt, peak = run(cfg, qcfg, params, args.batch, args.prompt,
                       args.gen, args.repeats, impl)
        tps = args.batch * args.gen / dt
        peak_s = f", peak mem {peak/2**30:.2f} GiB" if peak else ""
        print(f"[{name:>10}] {dt*1e3:8.1f} ms / {args.gen} steps "
              f"@ batch {args.batch} -> {tps:,.0f} tok/s{peak_s}")


if __name__ == "__main__":
    main()

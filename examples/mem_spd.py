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
    ctx = 1 << (prompt + gen + 1).bit_length()
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
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, caches = eng._decode_scan(params, out[:, -1:],
                                       pos + gen, caches, rng, steps=gen,
                                       temperature=0.0, prompt_len=prompt)
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
    ap.add_argument("--k-bits", type=int, default=2)
    ap.add_argument("--v-bits", type=int, default=2)
    args = ap.parse_args()

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=args.layers, num_heads=32, num_kv_heads=32,
        head_dim=128, rope_theta=10000.0, max_position_embeddings=4096)
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    params = jax.block_until_ready(
        modeling.init_params(cfg, jax.random.PRNGKey(0)))

    kivi = QuantConfig(k_bits=args.k_bits, v_bits=args.v_bits,
                       group_size=32, residual_length=128, v_flush=128)
    fp16 = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=128)
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

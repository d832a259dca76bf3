"""Serving-layer bench: continuous-batcher step cost vs the engine.

The engine's decode scan is the per-token floor (static flush schedule,
one batch, no admission machinery).  The batcher adds what real serving
needs — per-slot divergent window phases, masked flushes, per-request
sampling, admission/retirement — and this bench measures what that
costs: batcher ms/step at S fully-active slots vs engine ms/step at
batch S, plus steady-state tokens/s under request churn (slots retiring
and being re-admitted mid-run).

The reference has no serving layer at all (SURVEY.md: "It is NOT a
serving framework"), so there is no reference number to match — the
figure of merit is batcher overhead over the engine floor, which the
masked slice-write cache updates (cache/kivi_cache.decode_append_masked)
keep flat in context length.

Usage (real chip):
  python examples/serving_bench.py --slots 8 --ctx 2048 --layers 4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    from kivi_tpu.cli import add_quant_flags
    add_quant_flags(ap)
    # v_flush=128 admits the head-folded wide decode kernel — without
    # it the timed numbers measure the ~2x-slower per-head path
    # (CLAUDE.md perf rule; mem_spd.py sets the same default)
    ap.set_defaults(v_flush=128)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--churn-requests", type=int, default=24)
    ap.add_argument("--hidden", type=int, default=4096,
                    help="model width (shrink for CPU smoke runs)")
    ap.add_argument("--heads", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kivi_tpu.cli import quant_config_from_args
    from kivi_tpu.config import ModelConfig
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.batcher import ContinuousBatcher, Request
    from kivi_tpu.serving.engine import Engine

    on_tpu = jax.default_backend() == "tpu"
    impl = "pallas" if on_tpu else "jnp"
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=args.hidden,
        intermediate_size=args.hidden * 11008 // 4096,
        num_layers=args.layers, num_heads=args.heads,
        num_kv_heads=args.heads, head_dim=args.hidden // args.heads,
        max_position_embeddings=args.ctx)
    qcfg = quant_config_from_args(args)
    S, T, P = args.slots, args.ctx, args.prompt
    params = modeling.init_params(cfg, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    rng = np.random.RandomState(0)

    def sync(x):
        return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))

    # ---- engine floor: ms/step at batch S ---------------------------------
    eng = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=T,
                 batch_size=S, impl=impl)
    toks = jnp.asarray(rng.randint(1, cfg.vocab_size, (S, P)), jnp.int32)
    first, caches = eng.prefill(toks)
    sync(first)
    key = jax.random.PRNGKey(0)
    pos = jnp.full((S, 1), P, jnp.int32)
    out, caches = eng._decode_scan(params, first, pos, caches, key,
                                   steps=args.steps, temperature=0.0,
                                   prompt_len=P)     # compile + warm
    sync(out)
    t0 = time.perf_counter()
    out, caches = eng._decode_scan(params, out[:, -1:],
                                   jnp.full((S, 1), P + args.steps,
                                            jnp.int32),
                                   caches, key, steps=args.steps,
                                   temperature=0.0,
                                   prompt_len=P + args.steps)
    sync(out)
    eng_ms = (time.perf_counter() - t0) / args.steps * 1e3
    del caches, eng
    log(f"engine floor: {eng_ms:.3f} ms/step at batch {S}")

    # ---- batcher: all slots active, same fill -----------------------------
    bat = ContinuousBatcher(cfg, qcfg, params, num_slots=S, max_seq_len=T,
                            impl=impl, prompt_buckets=(P,))
    for i in range(S):
        bat.submit(Request(uid=i,
                           prompt=list(rng.randint(1, cfg.vocab_size, P)),
                           max_new_tokens=T - P - 8))
    bat.step()                       # admit (compiles prefill + decode)
    for _ in range(8):
        bat.step()                   # warm the decode program
    sync(bat.cur_tok)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        bat.step()
    sync(bat.cur_tok)
    bat_ms = (time.perf_counter() - t0) / args.steps * 1e3
    log(f"batcher: {bat_ms:.3f} ms/step at {S} active slots "
        f"({bat_ms / eng_ms:.2f}x the engine floor)")

    # ---- churn: steady-state tokens/s with retire + re-admit --------------
    bat2 = ContinuousBatcher(cfg, qcfg, params, num_slots=S, max_seq_len=T,
                             impl=impl, prompt_buckets=(P,))
    gen_lens = rng.randint(args.steps // 2, args.steps * 2,
                           args.churn_requests)
    reqs = [Request(uid=i,
                    prompt=list(rng.randint(1, cfg.vocab_size, P)),
                    max_new_tokens=int(g))
            for i, g in enumerate(gen_lens)]
    for r in reqs[:S]:
        bat2.submit(r)
    bat2.step()
    sync(bat2.cur_tok)               # compiled
    for r in reqs[S:]:
        bat2.submit(r)
    t0 = time.perf_counter()
    nsteps = 0
    while bat2.queue or bat2.active.any():
        bat2.step()
        nsteps += 1
    sync(bat2.cur_tok)
    dt = time.perf_counter() - t0
    total = sum(len(r.tokens) for r in bat2.results.values())
    log(f"churn: {len(reqs)} requests, {total} tokens in {dt:.2f}s over "
        f"{nsteps} steps -> {total / dt:,.0f} tok/s "
        f"(slot occupancy {total / (nsteps * S):.2f})")

    del bat2

    # ---- shared-prefix admission: warm latency vs full re-prefill ---------
    # every request = P-qlen shared system-prompt tokens + its own qlen
    # question; the prefix batcher pays only the question at admission.
    qlen = 64
    eng1 = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=T,
                  batch_size=1, impl=impl)
    sysp = jnp.asarray(rng.randint(1, cfg.vocab_size, P - qlen), jnp.int32)
    snap = eng1.prefill_prefix(sysp)
    del eng1

    def admit_ms(bat, mk_prompt, n=6):
        for i in range(n + 1):
            bat.submit(Request(uid=100 + i, prompt=mk_prompt(),
                               max_new_tokens=4))
        bat._admit()                      # warm (compiles)
        bat.active[:] = False             # free the slots (timing only)
        t0 = time.perf_counter()
        for _ in range(n):
            bat._admit()                  # one queued request per call
            bat.active[:] = False
        return (time.perf_counter() - t0) / n * 1e3

    batp = ContinuousBatcher(cfg, qcfg, params, num_slots=1,
                             max_seq_len=T, impl=impl,
                             prefill_chunk=128, prefix=snap)
    pre_ms = admit_ms(
        batp, lambda: list(rng.randint(1, cfg.vocab_size, qlen)))
    del batp
    batf = ContinuousBatcher(cfg, qcfg, params, num_slots=1,
                             max_seq_len=T, impl=impl,
                             prompt_buckets=(P,))
    full_ms = admit_ms(
        batf, lambda: list(np.asarray(sysp))
        + list(rng.randint(1, cfg.vocab_size, qlen)))
    del batf
    log(f"admission: {pre_ms:.1f} ms behind the {P - qlen}-token shared "
        f"prefix vs {full_ms:.1f} ms full re-prefill "
        f"({full_ms / pre_ms:.1f}x)")

    print(f"{{\"engine_ms_step\": {eng_ms:.3f}, "
          f"\"batcher_ms_step\": {bat_ms:.3f}, "
          f"\"batcher_overhead_x\": {bat_ms / eng_ms:.3f}, "
          f"\"churn_tok_s\": {total / dt:.0f}, "
          f"\"admit_prefix_ms\": {pre_ms:.1f}, "
          f"\"admit_full_ms\": {full_ms:.1f}}}")


if __name__ == "__main__":
    main()

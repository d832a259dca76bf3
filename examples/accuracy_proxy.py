"""Model-level accuracy proxy: logit KL + greedy agreement, fp16 cache
vs KIVI-2/4, across window-flush boundaries at long context.

Real checkpoints are unavailable in this image (zero egress), so the
reference's LongBench deltas (`docs/long_bench.md:7-49`) cannot be
reproduced directly.  This is the strongest available proxy: a model
whose KEY projection is engineered to emit the per-channel outlier
structure real LLMs show (reference `vis/vis.ipynb`, synthesized by
`evalsuite/synth.outlier_profile`), teacher-forced decoding so every
config sees the SAME token stream, and per-step logit comparison so the
measurement isolates CACHE fidelity (not trajectory divergence).

The decode span crosses >= 3 key-flush and value-flush boundaries; a
correct streaming implementation shows no error spike at a flush (the
quantized tail simply grows), which the per-bucket table makes visible.

Usage: python examples/accuracy_proxy.py [--ctx 4096] [--steps 384]
Measured numbers live in docs/accuracy.md.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling


def outlier_params(cfg: ModelConfig, key) -> dict:
    """init_params with each layer's K projection scaled per output
    channel by an outlier profile — the cached K then shows persistent
    channel outliers like a real LLM's."""
    from kivi_tpu.evalsuite.synth import outlier_profile
    params = modeling.init_params(cfg, key)
    L = cfg.num_layers
    Hkv, D = cfg.num_kv_heads, cfg.head_dim
    profs = jax.vmap(lambda k: outlier_profile(k, Hkv * D))(
        jax.random.split(jax.random.fold_in(key, 99), L))     # (L, Hkv*D)
    wk = params["layers"]["wk"] * profs[:, None, :].astype(
        params["layers"]["wk"].dtype)
    params["layers"]["wk"] = wk
    return params


def teacher_forced_logits(params, cfg, qcfg, prompt, forced, impl):
    """Prefill `prompt` (B, T0) then decode the FIXED `forced` (B, S)
    token stream, returning all logits (B, S+1, V) f32 — position 0 is
    the prefill's next-token logits."""
    B, T0 = prompt.shape

    @jax.jit
    def run(params, prompt, forced):
        caches = modeling.init_caches(cfg, qcfg, B, cfg.max_position_embeddings)
        positions = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32),
                                     (B, T0))
        lg0, caches = modeling.forward(params, prompt, caches, cfg, qcfg,
                                       positions, mode="prefill",
                                       impl=impl, last_only=True)

        def body(carry, tok):
            caches, pos = carry
            lg, caches = modeling.forward(
                params, tok[:, None], caches, cfg, qcfg, pos[:, None],
                mode="decode", impl=impl)
            return (caches, pos + 1), lg[:, -1, :]

        (_, _), lgs = jax.lax.scan(
            body, (caches, jnp.full((B,), T0, jnp.int32)),
            jnp.swapaxes(forced, 0, 1))
        return jnp.concatenate([lg0, jnp.swapaxes(lgs, 0, 1)], axis=1)

    return run(params, prompt, forced)


def compare(base, test):
    """Per-step KL(base || test), greedy agreement, and agreement on the
    CONFIDENT half of steps (fp16 top1-top2 margin above median — on a
    random-weight model raw logits are nearly flat, so unconditioned
    argmax agreement mostly measures tie-flipping noise)."""
    lp = jax.nn.log_softmax(base, axis=-1)
    lq = jax.nn.log_softmax(test, axis=-1)
    kl = jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)       # (B, S)
    agree = jnp.argmax(base, -1) == jnp.argmax(test, -1)
    top2 = jax.lax.top_k(base, 2)[0]
    margin = top2[..., 0] - top2[..., 1]                  # (B, S)
    conf = margin >= jnp.median(margin)
    conf_agree = jnp.sum(agree & conf) / jnp.sum(conf)
    return np.asarray(kl), np.asarray(agree), float(conf_agree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=384)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=8,
                    help="8 = MHA (LongChat-like); 2 = GQA r=4 "
                         "(Mistral-like, the reference's harder case)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=args.layers, num_heads=8, num_kv_heads=args.kv_heads,
        head_dim=128,
        rope_theta=10000.0, max_position_embeddings=args.ctx)
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    key = jax.random.PRNGKey(args.seed)
    params = outlier_params(cfg, key)

    # prefill length 128-aligned (quant-pack kernel block requirement)
    T0 = (args.ctx - args.steps - 1) // 128 * 128
    B, S = args.batch, args.steps
    prompt = jax.random.randint(jax.random.fold_in(key, 1), (B, T0), 1,
                                cfg.vocab_size, jnp.int32)

    fp16 = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=128)
    # the fp16 greedy trajectory is the forced stream for every config
    forced = teacher_forced_greedy(params, cfg, fp16, prompt, S,
                                   impl)["tokens"]

    print(f"# ctx={args.ctx} T0={T0} steps={S} layers={args.layers} "
          f"impl={impl} backend={jax.default_backend()}", file=sys.stderr)
    base_lg = teacher_forced_logits(params, cfg, fp16, prompt, forced, impl)
    k_flush = [i for i in range(S) if (T0 + i) % 128 == 0]
    print(f"# flush-aligned steps (W=128): {k_flush}", file=sys.stderr)

    lg22 = None
    for kb, vb in ((4, 4), (2, 4), (2, 2)):
        qcfg = QuantConfig(k_bits=kb, v_bits=vb, group_size=32,
                           residual_length=128, v_flush=128)
        lg = teacher_forced_logits(params, cfg, qcfg, prompt, forced, impl)
        if (kb, vb) == (2, 2):
            lg22 = lg
        kl, agree, conf_agree = compare(base_lg.astype(jnp.float32),
                                        lg.astype(jnp.float32))
        n_b = 4
        bs = np.array_split(np.arange(kl.shape[1]), n_b)
        buckets = " ".join(f"{kl[:, b].mean():.4f}" for b in bs)
        print(f"kivi-{kb}/{vb}: KL mean {kl.mean():.4f} p95 "
              f"{np.percentile(kl, 95):.4f} max {kl.max():.4f} | "
              f"greedy agree {agree.mean() * 100:.2f}% "
              f"(confident half {conf_agree * 100:.2f}%) | "
              f"KL by quarter [{buckets}]")

    # ---- chunked prefill accuracy class (kivi-2/2) ----------------------
    # chunks past the first attend already-quantized history where the
    # one-shot prefill sees the whole prompt exact; this measures what
    # that costs on top of quantization itself.
    qcfg22 = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                         residual_length=128, v_flush=128)
    lg_ch = teacher_forced_logits_chunked(params, cfg, qcfg22, prompt,
                                          forced, impl, chunk=512)
    for name, ref in (("vs fp16", base_lg), ("vs one-shot kivi-2/2",
                                             lg22)):
        kl, agree, conf_agree = compare(ref.astype(jnp.float32),
                                        lg_ch.astype(jnp.float32))
        print(f"kivi-2/2 chunked prefill (512) {name}: KL mean "
              f"{kl.mean():.4f} p95 {np.percentile(kl, 95):.4f} | "
              f"greedy agree {agree.mean() * 100:.2f}% "
              f"(confident half {conf_agree * 100:.2f}%)")


def teacher_forced_logits_chunked(params, cfg, qcfg, prompt, forced,
                                  impl, chunk):
    """teacher_forced_logits with the prefill run through the extend
    path in `chunk`-token pieces (the whole chunk loop unrolls inside
    one trace, so prev_len is static per piece)."""
    B, T0 = prompt.shape

    @jax.jit
    def run(params, prompt, forced):
        caches = modeling.init_caches(cfg, qcfg, B,
                                      cfg.max_position_embeddings)
        lg0 = None
        for t0 in range(0, T0, chunk):
            T1 = min(chunk, T0 - t0)
            positions = jnp.broadcast_to(
                t0 + jnp.arange(T1, dtype=jnp.int32), (B, T1))
            lg0, caches = modeling.forward(
                params, prompt[:, t0:t0 + T1], caches, cfg, qcfg,
                positions, mode="extend", impl=impl, last_only=True,
                prev_len=t0)

        def body(carry, tok):
            caches, pos = carry
            lg, caches = modeling.forward(
                params, tok[:, None], caches, cfg, qcfg, pos[:, None],
                mode="decode", impl=impl)
            return (caches, pos + 1), lg[:, -1, :]

        (_, _), lgs = jax.lax.scan(
            body, (caches, jnp.full((B,), T0, jnp.int32)),
            jnp.swapaxes(forced, 0, 1))
        return jnp.concatenate([lg0, jnp.swapaxes(lgs, 0, 1)], axis=1)

    return run(params, prompt, forced)


def teacher_forced_greedy(params, cfg, qcfg, prompt, steps, impl):
    """Greedy rollout under `qcfg`, returning the generated tokens."""
    B, T0 = prompt.shape

    @jax.jit
    def run(params, prompt):
        caches = modeling.init_caches(cfg, qcfg, B, cfg.max_position_embeddings)
        positions = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32),
                                     (B, T0))
        lg0, caches = modeling.forward(params, prompt, caches, cfg, qcfg,
                                       positions, mode="prefill",
                                       impl=impl, last_only=True)
        tok0 = jnp.argmax(lg0[:, -1], -1).astype(jnp.int32)

        def body(carry, _):
            caches, pos, tok = carry
            lg, caches = modeling.forward(
                params, tok[:, None], caches, cfg, qcfg, pos[:, None],
                mode="decode", impl=impl)
            nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
            return (caches, pos + 1, nxt), nxt

        (_, _, _), toks = jax.lax.scan(
            body, (caches, jnp.full((B,), T0, jnp.int32), tok0),
            None, length=steps - 1)
        return jnp.concatenate([tok0[:, None],
                                jnp.swapaxes(toks, 0, 1)], axis=1)

    return {"tokens": run(params, prompt)}


if __name__ == "__main__":
    main()

"""Train a small byte-level Llama-geometry LM on in-image text.

Why this exists: the image has zero egress and no checkpoints, so the
reference's LongBench deltas (`/root/reference/docs/long_bench.md:7-49`)
cannot be reproduced on real weights.  Round 2's accuracy proxy used
random weights, whose near-flat logits make greedy-agreement numbers
meaningless (docs/accuracy.md).  Training is NOT blocked by egress:
this script trains a ~13M-param model (the repo's own `modeling.py`
geometry: RMSNorm + RoPE + SwiGLU, head_dim=128 so the eval rides the
real KIVI kernels) on Python/Markdown text already in the image, to
CONFIDENT logits — then `scripts/accuracy_trained.py` measures fp16 vs
KIVI-2/4 token agreement and perplexity deltas through the existing
teacher-forced pipeline on non-flat logits.

Byte-level vocab (256) — no tokenizer files needed.  The forward here
is a cache-free causal re-expression of `modeling._decoder_layer` (the
inference path needs a cache pytree; grad does not), sharing rms_norm /
rope / swiglu so the trained tree loads straight into the Engine.

Usage (TPU, ~2-4 min; CPU works but is ~50x slower):
  python scripts/train_tiny_lm.py --steps 3000 \
      --out evalsuite_runs/tiny_lm
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kivi_tpu.config import ModelConfig
from kivi_tpu.models import modeling
from kivi_tpu.models.checkpoint import save_checkpoint

TINY_LM = ModelConfig(
    vocab_size=256, hidden_size=512, intermediate_size=1408,
    num_layers=4, num_heads=4, num_kv_heads=4, head_dim=128,
    max_position_embeddings=2048)


# ---------------------------------------------------------------------------
# corpus: in-image source text
# ---------------------------------------------------------------------------

def build_corpus(max_bytes: int = 48 << 20, val_frac: float = 0.02):
    """Concatenated bytes of .py/.md files from the repo and big
    installed packages (jax, numpy, transformers): plentiful, highly
    structured text a 13M model learns to predict confidently."""
    roots = ["/root/repo"]
    for pkg in ("jax", "numpy", "transformers", "flax", "optax"):
        try:
            mod = __import__(pkg)
            roots.append(os.path.dirname(mod.__file__))
        except Exception:
            pass
    chunks, total = [], 0
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(d for d in dirnames
                                 if d not in (".git", "__pycache__"))
            for fn in sorted(filenames):
                if not fn.endswith((".py", ".md")):
                    continue
                try:
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        data = f.read()
                except OSError:
                    continue
                if not data:
                    continue
                chunks.append(data)
                total += len(data)
                if total >= max_bytes:
                    break
            if total >= max_bytes:
                break
        if total >= max_bytes:
            break
    corpus = np.frombuffer(b"\n\n".join(chunks), dtype=np.uint8)
    n_val = int(len(corpus) * val_frac)
    return corpus[:-n_val], corpus[-n_val:]


def sample_batch(rng: np.random.Generator, corpus: np.ndarray, batch: int,
                 seq: int, passkey_frac: float = 0.0,
                 passkey_weight: float = 1.0):
    """Returns (rows, loss_weights).  Weights are 1 everywhere except
    planted answer digits (`passkey_weight`): the 6 answer tokens are
    ~0.3% of the LM loss mass, far too dilute for the retrieval circuit
    to form against 47 MiB of ordinary next-byte signal."""
    starts = rng.integers(0, len(corpus) - seq - 1, size=batch)
    rows = np.stack([corpus[s:s + seq] for s in starts]).astype(np.int32)
    w = np.ones((batch, seq), np.float32)
    if passkey_frac > 0.0:
        # Plant the passkey-recall curriculum (scripts/passkey_recall.py
        # format) in a fraction of rows: a `\n##PASSKEY=dddddd\n` line at
        # a RANDOM depth (no positional shortcut), re-cued at the tail —
        # the 6 random digits make content-based retrieval the only way
        # to reduce loss on the answer tokens.  The reference's passkey
        # demo (`long_context_example.py`) assumes a model that already
        # has this circuit; a 13M byte LM must be taught it.
        marker = np.frombuffer(b"\n##PASSKEY=", np.uint8).astype(np.int32)
        for i in range(batch):
            if rng.random() >= passkey_frac:
                continue
            digits = rng.integers(ord("0"), ord("9") + 1, size=6)
            key = np.concatenate([marker, digits, [ord("\n")]])
            tail = np.concatenate([marker, digits])
            at = int(rng.integers(0, seq - len(key) - len(tail) - 1))
            rows[i, at:at + len(key)] = key
            rows[i, seq - len(tail):] = tail
            w[i, seq - 6:] = passkey_weight
    return rows, w


# ---------------------------------------------------------------------------
# cache-free training forward (same params tree as modeling.forward)
# ---------------------------------------------------------------------------

def train_forward(params: dict, tokens: jax.Array, cfg: ModelConfig
                  ) -> jax.Array:
    """tokens (B, T) -> logits (B, T, V) f32; plain causal attention."""
    B, T = tokens.shape
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][tokens].astype(jnp.bfloat16)
    positions = jnp.arange(T, dtype=jnp.int32)
    cos, sin = modeling.rope_cos_sin(positions, D, cfg.rope_theta)
    cos, sin = cos[None, None], sin[None, None]
    causal = jnp.tril(jnp.ones((T, T), jnp.bool_))

    for i in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        h = modeling.rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        q = (h @ lp["wq"]).reshape(B, T, Hq, D).transpose(0, 2, 1, 3)
        k = (h @ lp["wk"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        v = (h @ lp["wv"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        q = modeling.apply_rope(q, cos, sin)
        k = modeling.apply_rope(k, cos, sin)
        if Hq != Hkv:
            k = jnp.repeat(k, Hq // Hkv, axis=1)
            v = jnp.repeat(v, Hq // Hkv, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        s = jnp.where(causal, s * D ** -0.5, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, Hq * D)
        x = x + (o @ lp["wo"]).astype(x.dtype)
        h = modeling.rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps)
        x = x + modeling.swiglu_mlp(h, lp["wg"], lp["wu"],
                                    lp["wd"]).astype(x.dtype)
    x = modeling.rms_norm(x, params["ln_f"], cfg.rms_norm_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


def loss_fn(params, tokens, cfg, weights=None):
    logits = train_forward(params, tokens, cfg)
    tgt = tokens[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    if weights is None:
        return jnp.mean(nll)
    w = weights[:, 1:]
    return jnp.sum(nll * w) / jnp.sum(w)


def main():
    import optax

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--scan", type=int, default=25,
                    help="microsteps fused per dispatch (tunnel RTT)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--layers", type=int, default=None,
                    help="override depth (e.g. a shallow speculative draft)")
    ap.add_argument("--kv-heads", type=int, default=None,
                    help="override num_kv_heads (GQA byte LM for the "
                         "retrieval-sensitivity axis)")
    ap.add_argument("--passkey-frac", type=float, default=0.0,
                    help="fraction of training rows with a planted "
                         "passkey + tail re-cue (retrieval curriculum)")
    ap.add_argument("--passkey-weight", type=float, default=50.0,
                    help="loss weight on planted answer digits")
    ap.add_argument("--init-from", type=str, default=None,
                    help="checkpoint dir to finetune from (must match "
                         "the requested geometry)")
    ap.add_argument("--out", type=str, default="evalsuite_runs/tiny_lm")
    ap.add_argument("--platform", type=str, default=None,
                    help="cpu|tpu (env JAX_PLATFORMS is too late: jax "
                         "arrives pre-imported under the axon preload)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = TINY_LM
    import dataclasses
    if args.layers is not None:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    if args.kv_heads is not None:
        cfg = dataclasses.replace(cfg, num_kv_heads=args.kv_heads)
    train, val = build_corpus()
    print(f"corpus: train {len(train) / 2**20:.1f} MiB, "
          f"val {len(val) / 2**20:.1f} MiB, backend "
          f"{jax.default_backend()}", file=sys.stderr)

    key = jax.random.PRNGKey(args.seed)
    params = modeling.init_params(cfg, key, dtype=jnp.float32)
    if args.init_from:
        from kivi_tpu.models.checkpoint import load_checkpoint
        icfg, iparams = load_checkpoint(args.init_from)
        assert dataclasses.asdict(icfg) == dataclasses.asdict(cfg), \
            (icfg, cfg)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), iparams)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params / 1e6:.1f}M", file=sys.stderr)

    warmup = min(100, args.steps // 2)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1),
        end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, b1=0.9, b2=0.95,
                                  weight_decay=0.01))
    opt_state = opt.init(params)

    @jax.jit
    def train_steps(params, opt_state, batches, weights):
        def one(carry, tw):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, tw[0], cfg,
                                                      tw[1])
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), (batches, weights))
        return params, opt_state, losses

    @jax.jit
    def val_loss(params, tokens):
        return loss_fn(params, tokens, cfg)

    rng = np.random.default_rng(args.seed)
    vbatch = jnp.asarray(sample_batch(rng, val, 16, args.seq)[0])
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        k = min(args.scan, args.steps - done)
        bw = [sample_batch(rng, train, args.batch, args.seq,
                           args.passkey_frac, args.passkey_weight)
              for _ in range(k)]
        batches = jnp.asarray(np.stack([b for b, _ in bw]))
        weights = jnp.asarray(np.stack([w for _, w in bw]))
        params, opt_state, losses = train_steps(params, opt_state, batches,
                                                weights)
        done += k
        if done % (args.scan * 8) == 0 or done >= args.steps:
            vl = float(val_loss(params, vbatch))
            tl = float(losses[-1])
            print(f"step {done:5d} | train {tl:.4f} | val {vl:.4f} "
                  f"({vl / np.log(2):.3f} bits/byte) | "
                  f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params)
    os.makedirs(args.out, exist_ok=True)
    import shutil
    pdir = os.path.join(args.out, "params")
    if os.path.isdir(pdir):
        shutil.rmtree(pdir)
    save_checkpoint(args.out, params, cfg)
    # hold-out text for the accuracy eval (fixed, committed alongside)
    np.save(os.path.join(args.out, "val_bytes.npy"), val)
    print(f"saved checkpoint + val bytes to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

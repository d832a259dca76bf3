"""KV-cache magnitude visualizer (analogue of the reference's
`vis/vis.ipynb`): per-layer |K| / |V| surfaces over (token, channel).

The per-CHANNEL outlier structure of keys vs the per-TOKEN structure of
values is the empirical motivation for KIVI's quantization axes (keys
per-channel, values per-token).  This script runs a prompt through the
model, captures each layer's post-RoPE K and V, and renders 3-D
magnitude surfaces (PNG per layer) plus an npz dump of the raw stats.

Usage:
  python examples/vis_kv_magnitude.py [--model-dir ...] [--layers 0,15,31]
      [--seq-len 256] [--out-dir vis_out]
Random-weight tiny model by default (air-gapped environments).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture_kv(params, cfg, tokens):
    """Returns lists of per-layer (K, V) arrays (B, H, T, D), post-RoPE."""
    import jax
    import jax.numpy as jnp
    from kivi_tpu.models import modeling

    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cos, sin = modeling.rope_cos_sin(positions, cfg.head_dim,
                                     cfg.rope_theta, cfg.rope_scaling)
    cos, sin = cos[:, None, :, :], sin[:, None, :, :]

    x = params["embed"][tokens]
    kvs = []
    for i in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i], params["layers"])
        h = modeling.rms_norm(x, lp["ln_attn"], cfg.rms_norm_eps)
        k = (h @ lp["wk"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        k = k.transpose(0, 2, 1, 3)
        v = (h @ lp["wv"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        v = v.transpose(0, 2, 1, 3)
        k = modeling.apply_rope(k, cos, sin).astype(jnp.float32)
        kvs.append((np.asarray(k), np.asarray(v, dtype=np.float32)))
        # advance the residual stream with full attention
        from kivi_tpu.core.attention import prefill_attention
        q = (h @ lp["wq"]).reshape(B, T, cfg.num_heads, cfg.head_dim)
        q = modeling.apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
        out = prefill_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, -1).astype(x.dtype)
        x = x + out @ lp["wo"]
        x = x + modeling.swiglu_mlp(
            modeling.rms_norm(x, lp["ln_mlp"], cfg.rms_norm_eps),
            lp["wg"], lp["wu"], lp["wd"])
    return kvs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--layers", default="")
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--head", type=int, default=0)
    ap.add_argument("--out-dir", default="vis_out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kivi_tpu.models import modeling

    if args.model_dir:
        from kivi_tpu.models.hf_loader import load_hf_checkpoint_native
        cfg, params = load_hf_checkpoint_native(args.model_dir)
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model_dir)
        text = ("The quick brown fox jumps over the lazy dog. " * 64)
        ids = tok.encode(text)[:args.seq_len]
        tokens = jnp.asarray([ids], jnp.int32)
    else:
        from kivi_tpu.config import tiny_config
        cfg = tiny_config(num_layers=4)
        params = modeling.init_params(cfg, jax.random.PRNGKey(0))
        tokens = jax.random.randint(jax.random.PRNGKey(1),
                                    (1, args.seq_len), 0, cfg.vocab_size,
                                    jnp.int32)

    layers = ([int(x) for x in args.layers.split(",") if x]
              or list(range(min(cfg.num_layers, 4))))
    kvs = capture_kv(params, cfg, tokens)

    os.makedirs(args.out_dir, exist_ok=True)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stats = {}
    for li in layers:
        k, v = kvs[li]
        ka = np.abs(k[0, args.head])   # (T, D)
        va = np.abs(v[0, args.head])
        stats[f"k_abs_l{li}"] = ka
        stats[f"v_abs_l{li}"] = va
        fig = plt.figure(figsize=(11, 4.2))
        for idx, (mat, name) in enumerate([(ka, "|K|"), (va, "|V|")]):
            ax = fig.add_subplot(1, 2, idx + 1, projection="3d")
            T, D = mat.shape
            tg, dg = np.meshgrid(np.arange(D), np.arange(T))
            ax.plot_surface(tg, dg, mat, cmap="coolwarm",
                            rstride=max(1, T // 64),
                            cstride=max(1, D // 64), linewidth=0)
            ax.set_xlabel("channel")
            ax.set_ylabel("token")
            ax.set_title(f"layer {li} head {args.head} {name}")
        path = os.path.join(args.out_dir, f"kv_l{li}.png")
        fig.savefig(path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        # the KIVI claim, quantified: channel-max spread for K vs token-max
        k_chan_spread = float(ka.max(0).std() / (ka.mean() + 1e-9))
        v_tok_spread = float(va.max(1).std() / (va.mean() + 1e-9))
        print(f"layer {li}: K per-channel outlier spread {k_chan_spread:.2f}"
              f" | V per-token spread {v_tok_spread:.2f} -> {path}")
    np.savez(os.path.join(args.out_dir, "kv_stats.npz"), **stats)


if __name__ == "__main__":
    main()

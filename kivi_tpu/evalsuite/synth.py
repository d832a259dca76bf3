"""Synthetic K/V tensors with the channel-outlier structure KIVI exploits.

The KIVI paper's motivating observation (reference `vis/vis.ipynb`, and
docs/long_bench.md's accuracy claims): in real LLMs the KEY cache has a
few channels whose magnitude is persistently 5-50x larger than the rest
(per-channel structure, stable across tokens), while the VALUE cache
shows no channel structure.  That is exactly why KIVI quantizes K
per-channel (groups along tokens) and V per-token (groups along
channels).

iid-normal tensors are the WORST case for grouped quantization and were
the only accuracy probe in round 1 (tolerance 0.55 at 2-bit — nearly
vacuous).  This module synthesizes K/V with the documented structure so
accuracy tests measure the regime the algorithm was designed for, and
`outlier_profile` lets a model's key projection be engineered to emit
such keys for end-to-end logit-KL proxies (examples/accuracy_proxy.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def outlier_profile(key, D: int, outlier_frac: float = 0.03,
                    outlier_scale: float = 12.0) -> jax.Array:
    """(D,) per-channel magnitude profile: lognormal body + a sparse set
    of channels boosted by ~outlier_scale (the vis.ipynb shape)."""
    k1, k2, k3 = jax.random.split(key, 3)
    body = jnp.exp(0.4 * jax.random.normal(k1, (D,)))
    n_out = max(1, int(round(D * outlier_frac)))
    idx = jax.random.choice(k2, D, (n_out,), replace=False)
    boost = outlier_scale * jnp.exp(
        0.3 * jax.random.normal(k3, (n_out,)))
    return body.at[idx].multiply(boost)


def structured_kv(key, B: int, H: int, T: int, D: int,
                  outlier_frac: float = 0.03,
                  outlier_scale: float = 12.0):
    """(k, v) of shape (B, H, T, D), f32.

    k: per-channel scaled noise + a persistent per-channel mean (the
       outlier channels are large in BOTH mean and spread, matching the
       magnitude plots); token axis is iid given the channel profile.
    v: iid normal (no channel structure — per-token groups see the same
       distribution everywhere).
    """
    ks = jax.random.split(key, 4)
    prof = jax.vmap(lambda k: outlier_profile(
        k, D, outlier_frac, outlier_scale))(
        jax.random.split(ks[0], H))                       # (H, D)
    mean = prof * jax.random.normal(ks[1], (H, D))        # persistent sign
    noise = jax.random.normal(ks[2], (B, H, T, D))
    k = mean[None, :, None, :] + prof[None, :, None, :] * 0.3 * noise
    v = jax.random.normal(ks[3], (B, H, T, D))
    return k.astype(jnp.float32), v.astype(jnp.float32)

"""Fake-quantization (simulate mode) utilities.

Semantics port of the reference's `models/utils_quant.py` quantizer
library (`SymQuantizer`/`AsymQuantizer`/grouped by-channel variants with
straight-through gradients, `/root/reference/models/utils_quant.py:
33-339`).  In the reference this is vestigial QAT leftovers; here it is
a small supported surface for accuracy experiments: quantize-dequantize
in one step (no packing, no cache) so any tensor path can be degraded to
b bits and its effect measured, with straight-through estimators so the
transforms stay differentiable under `jax.grad`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ste(x, q):
    """Straight-through: forward q, gradient of identity(x)."""
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_sym(x: jax.Array, bits: int, axis=None) -> jax.Array:
    """Symmetric: scale by max |x| (per-axis when given), round to
    signed b-bit grid (reference SymQuantizer, utils_quant.py:33-77)."""
    qmax = float(2 ** (bits - 1) - 1)
    amax = (jnp.max(jnp.abs(x)) if axis is None
            else jnp.max(jnp.abs(x), axis=axis, keepdims=True))
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax) * scale
    return _ste(x, q)


def fake_quant_asym(x: jax.Array, bits: int, axis=None) -> jax.Array:
    """Asymmetric min/max (reference AsymQuantizer, utils_quant.py:80-124)."""
    levels = float(2 ** bits - 1)
    mn = (jnp.min(x) if axis is None
          else jnp.min(x, axis=axis, keepdims=True))
    mx = (jnp.max(x) if axis is None
          else jnp.max(x, axis=axis, keepdims=True))
    scale = jnp.where(mx > mn, (mx - mn) / levels, 1.0)
    q = jnp.clip(jnp.round((x - mn) / scale), 0, levels) * scale + mn
    return _ste(x, q)


def fake_quant_grouped(x: jax.Array, bits: int, group_size: int,
                       axis: int = -1) -> jax.Array:
    """Grouped asymmetric along `axis` — the KIVI cache quantization as a
    one-shot transform (reference AsymGroupedQuantizer,
    utils_quant.py:127-200; equivalent to core.quant round-trip)."""
    axis = axis % x.ndim
    x_m = jnp.moveaxis(x, axis, -1)
    L = x_m.shape[-1]
    assert L % group_size == 0, (L, group_size)
    g = x_m.reshape(*x_m.shape[:-1], L // group_size, group_size)
    q = fake_quant_asym(g, bits, axis=-1)
    q = q.reshape(x_m.shape)
    return jnp.moveaxis(q, -1, axis)


def fake_quant_kv(k: jax.Array, v: jax.Array, k_bits: int, v_bits: int,
                  group_size: int):
    """KIVI axes as a simulate-mode pair: K per-channel (groups along
    tokens, axis -2), V per-token (groups along channels, axis -1).
    k, v: (..., T, D)."""
    kq = fake_quant_grouped(k, k_bits, group_size, axis=-2)
    vq = fake_quant_grouped(v, v_bits, group_size, axis=-1)
    return kq, vq

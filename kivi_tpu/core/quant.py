"""Canonical KIVI quantization semantics with a TPU-native packed layout.

Quantization semantics follow the reference exactly
(`/root/reference/quant/new_pack.py:8-48`):

  * asymmetric, group-wise:  scale = (max - min) / (2**bits - 1),  zp = min
  * codes = clamp(round((x - min) / scale), 0, 2**bits - 1)
  * keys are quantized PER-CHANNEL: statistics over tokens within a channel
    (the key cache is handled transposed, groups along the token axis)
  * values are quantized PER-TOKEN: statistics over channels within a token
    (groups along the head_dim axis)

The *bit layout* is deliberately NOT the reference's (which packs 32/bits
consecutive codes of the grouped axis into one int32, little-endian —
`quant/new_pack.py:86-107`).  That layout forces a lane-interleave on TPU
unpack.  Ours is chosen for the (sublane x 128-lane) VMEM tiling:

  PLANE-PACKED ALONG head_dim (D):  with fpi = 32//bits planes and
  Dw = D // fpi words, channel d = j*Dw + w lives in word w at bits
  [j*bits, (j+1)*bits).  Unpacking plane j yields the CONTIGUOUS channel
  block [j*Dw, (j+1)*Dw) — a shift+mask plus an aligned sublane write,
  no cross-lane shuffle anywhere.

Both K and V stores are kept "transposed", token axis last (lanes):

  k_codes (B, H, Dw, T) u32   k_scale/k_mn (B, H, T//gs, D)
  v_codes (B, H, Dw, T) u32   v_scale/v_mn (B, H, D//gs, T)

so that streaming append = a column (lane-offset) write, and the last axis
of every stored array is the large, 128-aligned token axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def planes_per_word(bits: int) -> int:
    assert bits in (2, 4, 8)
    return 32 // bits


def num_words(head_dim: int, bits: int) -> int:
    fpi = planes_per_word(bits)
    assert head_dim % fpi == 0, (head_dim, bits)
    return head_dim // fpi


# ---------------------------------------------------------------------------
# Group quantization along the last axis (shared by K and V paths).
# ---------------------------------------------------------------------------

def quantize_last(x: jax.Array, group_size: int, bits: int):
    """Asymmetric group quantization along the last axis.

    Returns (codes u32 same shape as x, scale f32 (..., L//gs),
    mn f32 (..., L//gs)).  Semantics == reference
    `quant/new_pack.py:14-26` (keys) / `:36-46` (values).
    """
    L = x.shape[-1]
    assert L % group_size == 0, (L, group_size)
    G = L // group_size
    max_int = (1 << bits) - 1
    xg = x.reshape(*x.shape[:-1], G, group_size).astype(jnp.float32)
    mn = jnp.min(xg, axis=-1)
    mx = jnp.max(xg, axis=-1)
    scale = (mx - mn) / max_int
    # Guard constant groups (reference divides unguarded; a 0 scale would
    # produce NaNs under XLA).  codes become 0 and dequant returns mn exactly.
    safe = jnp.where(scale > 0, scale, 1.0)
    codes = jnp.clip(
        jnp.round((xg - mn[..., None]) / safe[..., None]), 0, max_int
    ).astype(jnp.uint32)
    return codes.reshape(x.shape), scale, mn


def dequantize_last(codes: jax.Array, scale: jax.Array, mn: jax.Array,
                    group_size: int) -> jax.Array:
    """Inverse of quantize_last (f32 out)."""
    L = codes.shape[-1]
    G = L // group_size
    cg = codes.reshape(*codes.shape[:-1], G, group_size).astype(jnp.float32)
    out = cg * scale[..., None].astype(jnp.float32) + mn[..., None].astype(jnp.float32)
    return out.reshape(codes.shape)


# ---------------------------------------------------------------------------
# Plane packing along an axis (the head_dim axis in practice).
# ---------------------------------------------------------------------------

def pack_planar(codes: jax.Array, bits: int, axis: int) -> jax.Array:
    """Plane-pack `codes` (u32, values < 2**bits) along `axis`.

    Axis length D becomes D//fpi words; element d = j*Dw + w goes to word w
    bits [j*bits, (j+1)*bits).
    """
    fpi = planes_per_word(bits)
    axis = axis % codes.ndim
    D = codes.shape[axis]
    Dw = D // fpi
    assert D % fpi == 0
    c = jnp.moveaxis(codes, axis, -1).astype(jnp.uint32)
    c = c.reshape(*c.shape[:-1], fpi, Dw)  # plane index j major
    shifts = (jnp.arange(fpi, dtype=jnp.uint32) * bits)[..., None]
    words = jnp.sum(
        c << shifts, axis=-2, dtype=jnp.uint32
    )  # OR of disjoint bit-fields == sum
    return jnp.moveaxis(words, -1, axis)


def unpack_planar(words: jax.Array, bits: int, axis: int) -> jax.Array:
    """Inverse of pack_planar; returns u32 codes."""
    fpi = planes_per_word(bits)
    axis = axis % words.ndim
    mask = jnp.uint32((1 << bits) - 1)
    w = jnp.moveaxis(words, axis, -1).astype(jnp.uint32)
    shifts = jnp.arange(fpi, dtype=jnp.uint32)[:, None] * bits
    planes = (w[..., None, :] >> shifts) & mask  # (..., fpi, Dw)
    codes = planes.reshape(*w.shape[:-1], -1)
    return jnp.moveaxis(codes, -1, axis)


# ---------------------------------------------------------------------------
# Crumb packing (bits 2/4): the bitcast-dequant layout.
#
# Designed so the TPU decode kernel can unpack with THREE integer ops per
# u32 word-tile and one free bitcast — no int->float casts:
#     t = ((w >> (2j)) & 0x0003_0003) | 0x3F80_3F80   (2-bit; 4-bit analog)
#     b = bitcast(t, bf16)      # == 1 + code * 2^-7, affine in code
# A u32->bf16 bitcast on TPU splits each 32-bit lane into (lo16, hi16)
# on adjacent sublanes, so the layout interleaves channels accordingly:
# with Dw = D*bits//32 words, channel d = j*(2*Dw) + 2*w + h lives in
# word w, u16 half h, bits [16*h + bits*j, 16*h + bits*(j+1)).
# The dequant affine is x = scale2 * b + mn2 with scale2 = scale * F,
# mn2 = mn - scale2, F = 2^7 / (2^bits - ... exactly F = 128 for 2-bit
# (b-1 = c/128) and F = 16 for 4-bit (code placed at mantissa bits 6:3).
# ---------------------------------------------------------------------------

def crumb_factor(bits: int) -> int:
    """x = (F*scale) * b + (mn - F*scale) where b is the bitcast bf16."""
    return {2: 128, 4: 16}[bits]


def pack_crumbs(codes: jax.Array, bits: int, axis: int) -> jax.Array:
    """Crumb-pack codes (u32, < 2**bits) along `axis` (bits 2 or 4)."""
    assert bits in (2, 4)
    fpi = 32 // bits          # codes per word
    nj = 16 // bits           # crumb positions per u16 half
    axis = axis % codes.ndim
    D = codes.shape[axis]
    Dw = D // fpi
    assert D % fpi == 0
    c = jnp.moveaxis(codes, axis, -2).astype(jnp.uint32)
    lead = c.shape[:-2]
    T = c.shape[-1]
    c = c.reshape(*lead, nj, Dw, 2, T)  # d = j*(2Dw) + 2w + h
    j = jnp.arange(nj, dtype=jnp.uint32)[:, None, None, None]
    h = jnp.arange(2, dtype=jnp.uint32)[None, None, :, None]
    words = jnp.sum(c << (16 * h + bits * j), axis=(-4, -2),
                    dtype=jnp.uint32)
    return jnp.moveaxis(words, -2, axis)


def unpack_crumbs(words: jax.Array, bits: int, axis: int) -> jax.Array:
    """Inverse of pack_crumbs; returns u32 codes."""
    assert bits in (2, 4)
    nj = 16 // bits
    mask = jnp.uint32((1 << bits) - 1)
    w = jnp.moveaxis(words, axis % words.ndim, -2)
    lead, Dw, T = w.shape[:-2], w.shape[-2], w.shape[-1]
    j = jnp.arange(nj, dtype=jnp.uint32)[:, None, None, None]
    h = jnp.arange(2, dtype=jnp.uint32)[None, None, :, None]
    c = (w[..., None, :, None, :] >> (16 * h + bits * j)) & mask
    c = c.reshape(*lead, nj * Dw * 2, T)
    return jnp.moveaxis(c, -2, axis % words.ndim)


def pack_codes(codes: jax.Array, bits: int, axis: int) -> jax.Array:
    """Canonical storage layout: crumb-packed for 2/4-bit (bitcast
    dequant), plane-packed for 8-bit."""
    if bits in (2, 4):
        return pack_crumbs(codes, bits, axis)
    return pack_planar(codes, bits, axis)


def unpack_codes(words: jax.Array, bits: int, axis: int) -> jax.Array:
    if bits in (2, 4):
        return unpack_crumbs(words, bits, axis)
    return unpack_planar(words, bits, axis)


# ---------------------------------------------------------------------------
# K / V block quantizers (the jnp reference implementations; the Pallas
# kernels in kivi_tpu.kernels must match these bit-for-bit).
# ---------------------------------------------------------------------------

def quantize_k_block(k_t: jax.Array, group_size: int, bits: int):
    """Quantize a transposed key block.

    k_t: (B, H, D, T) with T % group_size == 0 (per-channel: groups along T,
    reference `models/llama_kivi.py:133-135`).

    Returns:
      k_codes (B, H, Dw, T) u32, k_scale (B, H, T//gs, D) f32,
      k_mn (B, H, T//gs, D) f32 — token-GROUP axis on SUBLANES (round 4).
      The codes keep the token axis last (lane-aligned streaming appends),
      but the scale planes store one (D,) ROW per token group: the decode
      kernels stream scales at chunk granularity (a (C//gs, D) block per
      chunk, riding the same dead-chunk clamp as the codes — a
      partially-filled cache reads only its live scale fraction, where
      the old lane-major plane forced a full 128-group superblock fetch)
      and the scale-folded QK slices its per-chunk scale rows directly
      off the block with no in-kernel transpose.
    """
    codes, scale, mn = quantize_last(k_t, group_size, bits)  # scale (B,H,D,Tg)
    words = pack_codes(codes, bits, axis=-2)
    return (words, jnp.swapaxes(scale, -1, -2),
            jnp.swapaxes(mn, -1, -2))


def dequantize_k(k_codes, k_scale, k_mn, group_size: int, bits: int):
    """(B,H,Dw,T) u32 -> (B,H,D,T) f32 keys (transposed layout).
    k_scale/k_mn: (B, H, T//gs, D)."""
    codes = unpack_codes(k_codes, bits, axis=-2)  # (B,H,D,T)
    return dequantize_last(codes,
                           jnp.swapaxes(k_scale, -1, -2).astype(jnp.float32),
                           jnp.swapaxes(k_mn, -1, -2).astype(jnp.float32),
                           group_size)


def quantize_v_block(v: jax.Array, group_size: int, bits: int):
    """Quantize a value block.

    v: (B, H, T, D) with D % group_size == 0 (per-token: groups along D,
    reference `models/llama_kivi.py:176-178`).

    Returns:
      v_codes (B, H, Dw, T) u32, v_scale (B, H, D//gs, T) f32,
      v_mn (B, H, D//gs, T) f32.
    """
    codes, scale, mn = quantize_last(v, group_size, bits)  # scale (B,H,T,Dg)
    words = pack_codes(codes, bits, axis=-1)  # (B,H,T,Dw)
    return (jnp.swapaxes(words, -1, -2),
            jnp.swapaxes(scale, -1, -2),
            jnp.swapaxes(mn, -1, -2))


def dequantize_v(v_codes, v_scale, v_mn, group_size: int, bits: int):
    """(B,H,Dw,T) u32 -> (B,H,T,D) f32 values (natural layout)."""
    words = jnp.swapaxes(v_codes, -1, -2)  # (B,H,T,Dw)
    codes = unpack_codes(words, bits, axis=-1)  # (B,H,T,D)
    scale = jnp.swapaxes(v_scale, -1, -2).astype(jnp.float32)  # (B,H,T,Dg)
    mn = jnp.swapaxes(v_mn, -1, -2).astype(jnp.float32)
    return dequantize_last(codes, scale, mn, group_size)

"""Streaming quantize+pack kernels (Pallas, TPU).

TPU-native equivalent of the reference's single quantization entry point
`triton_quantize_and_pack_along_last_dim` (`/root/reference/quant/
new_pack.py:217-252`): per-group min/max -> scale/zero-point -> round ->
bit-pack, all in VMEM in one pass over the data (the reference needs two
Triton launches plus torch glue).

Two variants for the two KIVI statistics axes, both consuming the
TRANSPOSED (.., D, T) layout the cache stores:
  * `quantize_pack_k`: groups along T (per-channel key stats,
    reference `models/llama_kivi.py:133-135`);
  * `quantize_pack_v`: groups along D (per-token value stats,
    reference `models/llama_kivi.py:176-178`).

Outputs land directly in the cache's native layouts (core/quant.py):
codes plane-packed (Dw, T) u32, K scales (T//gs, D), V scales (D//gs, T).
Group expansion uses small one-hot matmuls on the MXU rather than lane
interleaves (same trick as the dequant matmuls in qk_pv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _onehot(n_groups: int, n: int):
    gid = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n), 0)
    iid = jax.lax.broadcasted_iota(jnp.int32, (n_groups, n), 1) // (n // n_groups)
    return (gid == iid).astype(jnp.float32)


def _pack_rows(codes_i32, bits: int):
    """(D, T) i32 codes -> (D//fpi, T) u32 words in the canonical layout
    (core.quant.pack_codes): crumb layout for 2/4-bit, planes for 8."""
    fpi = 32 // bits
    D = codes_i32.shape[0]
    Dw = D // fpi
    if bits == 8:
        c = codes_i32.astype(jnp.uint32)
        acc = c[0:Dw, :]
        for j in range(1, fpi):
            acc = acc | (c[j * Dw:(j + 1) * Dw, :] << jnp.uint32(j * bits))
        return acc
    # crumb layout: channel d = j*(2Dw) + 2w + h -> word w bits
    # [16h + bits*j).  Accumulate the 16-bit halves on sign-free i32
    # sublane pairs, then ONE u16 cast + a free 16->32 bitcast merges
    # row pairs (2w, 2w+1) into (lo16, hi16) of word w.
    nj = 16 // bits
    two_dw = 2 * Dw
    acc = codes_i32[0:two_dw, :]
    for j in range(1, nj):
        acc = acc | (codes_i32[j * two_dw:(j + 1) * two_dw, :]
                     << jnp.int32(bits * j))
    return pltpu.bitcast(acc.astype(jnp.uint16), jnp.uint32)


def _quant_k_kernel(x_ref, s_ref, m_ref, w_ref, *, bits: int, gs: int):
    """Round+pack given precomputed group stats.

    K groups lie along the LANE axis; Mosaic cannot shape-cast a lane
    split (D, T) -> (D, G, gs), so the min/max reduction happens in XLA
    in the wrapper (one fused reduce) and this kernel handles the
    expand / round / pack — the same two-pass split as the reference's
    `_minmax_along_last_dim` + `_pack_along_last_dim` Triton launches
    (`quant/new_pack.py:230-251`)."""
    x = x_ref[0].astype(jnp.float32)            # (D, Tblk)
    T = x.shape[1]
    G = s_ref.shape[-1]
    max_int = float((1 << bits) - 1)
    scale = s_ref[0]                            # (D, G)
    mn = m_ref[0]
    safe = jnp.where(scale > 0, scale, 1.0)
    expand = _onehot(G, T)                      # (G, Tblk)
    # one-hot selection must be EXACT: default TPU matmul precision runs
    # f32 dots as single-pass bf16 and perturbs rounding by one code
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    mn_exp = jnp.dot(mn, expand, **kw)
    inv_exp = jnp.dot(1.0 / safe, expand, **kw)
    codes = jnp.clip(jnp.round((x - mn_exp) * inv_exp), 0.0, max_int)
    w_ref[0] = _pack_rows(codes.astype(jnp.int32), bits)


def _quant_v_kernel(x_ref, w_ref, s_ref, m_ref, *, bits: int, gs: int):
    x = x_ref[0].astype(jnp.float32)            # (D, Tblk)
    D, T = x.shape
    G = D // gs
    max_int = float((1 << bits) - 1)
    xg = x.reshape(G, gs, T)
    mn = jnp.min(xg, axis=1)                    # (G, Tblk)
    mx = jnp.max(xg, axis=1)
    scale = (mx - mn) / max_int
    safe = jnp.where(scale > 0, scale, 1.0)
    expand = _onehot(G, D)                      # (G, D)
    # (D, Tblk) = expand^T @ stats
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)  # exact selection
    mn_exp = jax.lax.dot_general(
        expand, mn, (((0,), (0,)), ((), ())), **kw)
    inv_exp = jax.lax.dot_general(
        expand, 1.0 / safe, (((0,), (0,)), ((), ())), **kw)
    codes = jnp.clip(jnp.round((x - mn_exp) * inv_exp), 0.0, max_int)
    w_ref[0] = _pack_rows(codes.astype(jnp.int32), bits)
    s_ref[0] = scale
    m_ref[0] = mn


@functools.partial(jax.jit, static_argnames=("group_size", "bits", "t_block"))
def quantize_pack_k(k_t, group_size: int, bits: int, t_block: int = 2048):
    """k_t (B,H,D,T) -> (codes (B,H,Dw,T) u32, scale/mn (B,H,T//gs,D) f32).

    Bit-for-bit contract of core.quant.quantize_k_block.  Group stats in
    XLA (lane-split reduce), expand/round/pack in Pallas."""
    B, H, D, T = k_t.shape
    gs = group_size
    BH = B * H
    Dw = D // (32 // bits)
    t_block = min(t_block, T)
    if T % t_block:
        # T not divisible by the preferred block (e.g. a 3584-token
        # prefill flush): fall back to the largest divisor of T that is
        # a multiple of gs, at worst one full-array block
        t_block = next(tb for tb in range(t_block, gs - 1, -gs)
                       if T % tb == 0)
    assert T % t_block == 0 and t_block % gs == 0
    G = T // gs
    # Mosaic requires a block's trailing dim to be 128-divisible or equal
    # to the array dim; the scale block's trailing dim is t_block//gs, so
    # an odd chunking must collapse to one full block on real TPU
    # (interpret mode allows any chunking — CPU tests keep covering it)
    if not _use_interpret() and t_block != T and (t_block // gs) % 128:
        t_block = T

    # stats reduce in the INPUT dtype (min/max are exact in bf16), stats
    # themselves in f32 - never materialize a whole-array f32 copy (at
    # prefill scale that transient is GBs)
    xg = k_t.reshape(BH, D, G, gs)
    mn = jnp.min(xg, axis=-1).astype(jnp.float32)
    mx = jnp.max(xg, axis=-1).astype(jnp.float32)
    scale = (mx - mn) / ((1 << bits) - 1)

    tgb = t_block // gs
    sspec = pl.BlockSpec((1, D, tgb), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM)
    words = pl.pallas_call(
        functools.partial(_quant_k_kernel, bits=bits, gs=gs),
        grid=(BH, T // t_block),
        in_specs=[
            pl.BlockSpec((1, D, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            sspec, sspec,
        ],
        out_specs=pl.BlockSpec((1, Dw, t_block), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Dw, T), jnp.uint32),
        interpret=_use_interpret(),
    )(k_t.reshape(BH, D, T), scale, mn)
    # scale planes store one (D,) row per token group (round 4; see
    # core.quant.quantize_k_block) — the kernel consumes the (D, G)
    # stats it needs, the cache stores the (G, D) transpose
    return (words.reshape(B, H, Dw, T),
            jnp.swapaxes(scale.reshape(B, H, D, G), -1, -2),
            jnp.swapaxes(mn.reshape(B, H, D, G), -1, -2))


@functools.partial(jax.jit, static_argnames=("group_size", "bits", "t_block"))
def quantize_pack_v(v_t, group_size: int, bits: int, t_block: int = 2048):
    """v_t (B,H,D,T) -> (codes (B,H,Dw,T) u32, scale/mn (B,H,D//gs,T) f32).

    Bit-for-bit contract of core.quant.quantize_v_block (which takes the
    natural (B,H,T,D); this kernel consumes the transposed layout).
    Fully fused: V groups lie along sublanes, which Mosaic shape-casts."""
    B, H, D, T = v_t.shape
    gs = group_size
    BH = B * H
    Dw = D // (32 // bits)
    Dg = D // gs
    t_block = min(t_block, T)
    if T % t_block:
        # see quantize_pack_k: odd flush lengths fall back to the
        # largest divisor (V flushes are gs-multiples by construction)
        t_block = next(tb for tb in range(t_block, gs - 1, -gs)
                       if T % tb == 0)
    assert T % t_block == 0
    # same Mosaic trailing-dim rule as quantize_pack_k, here on t_block
    # itself (every block's trailing dim is t_block)
    if not _use_interpret() and t_block != T and t_block % 128:
        t_block = T
    sspec = pl.BlockSpec((1, Dg, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM)
    words, scale, mn = pl.pallas_call(
        functools.partial(_quant_v_kernel, bits=bits, gs=gs),
        grid=(BH, T // t_block),
        in_specs=[pl.BlockSpec((1, D, t_block), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, Dw, t_block), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            sspec, sspec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Dw, T), jnp.uint32),
            jax.ShapeDtypeStruct((BH, Dg, T), jnp.float32),
            jax.ShapeDtypeStruct((BH, Dg, T), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(v_t.reshape(BH, D, T))
    return (words.reshape(B, H, Dw, T), scale.reshape(B, H, Dg, T),
            mn.reshape(B, H, Dg, T))

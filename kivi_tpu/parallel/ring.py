"""Ring attention: sequence-parallel causal prefill over a mesh axis.

The reference scales context only by flash-attn on ONE GPU
(`/root/reference/models/llama_kivi.py:420-423`); SURVEY.md §5.7 marks
context parallelism as the TPU-native stretch goal.  This module is
that layer: the prompt's token axis is sharded over a mesh axis, each
device holds one contiguous T/n block of Q/K/V, and attention runs as
an n-step ring — every step each device contracts its Q block against
the K/V block it currently holds, folds the result into an online
softmax accumulator (the flash recurrence), and rotates the K/V block
to its ring neighbour with `lax.ppermute` (ICI neighbour exchange, the
collective the TPU torus is built for).

Causality makes half the ring dead for the average device: block j
contributes to block i only when j <= i.  Dead steps skip the O(Tl²)
contraction through `lax.cond` — shard_map gives every device its own
predicate, so device i does i+1 real steps (compute stays load-
imbalanced like classic ring attention; a striped layout would balance
it but complicates the KIVI cache's contiguous-block ingest, which
wants token order preserved).

Numerics: accumulation in f32 with the online max/denom (flash)
recurrence.  Every (q, k) pair is visited exactly once, but device i
folds blocks in reverse ring order (i, i-1, …, 0), so agreement with
one-device attention is fp32-ULP-level, not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from kivi_tpu.parallel.mesh import DATA_AXIS

_NEG = -1e30  # matches core/attention.py's mask value (finite: keeps
              # fully-masked rows NaN-free through exp/renorm)


def _block_attn(q, k, v, qpos, kpos, pad_len, sliding_window, scale):
    """One ring step's contraction: q (B,Hkv,r,Tl,D) f32 against
    k/v (B,Hkv,S,D); returns (scores-exp u (..,Tl,S) f32 pre-normalized
    by the local max, local max m (..,Tl), weighted values (..,Tl,D))."""
    s = jnp.einsum("bhrtd,bhsd->bhrts", q, k.astype(jnp.float32)) * scale
    mask = kpos[None, :] <= qpos[:, None]            # causal
    if sliding_window is not None:
        mask &= kpos[None, :] > qpos[:, None] - sliding_window
    # left-pad: positions [0, pad) are garbage for that row (pad == 0
    # rows mask nothing — one code path for ragged and square batches)
    mask = (mask[None, None, None]
            & (kpos[None, None, None, None, :]
               >= pad_len[:, None, None, None, None]))
    s = jnp.where(mask, s, _NEG)
    m = jnp.max(s, axis=-1)
    u = jnp.exp(s - m[..., None])
    pv = jnp.einsum("bhrts,bhsd->bhrtd", u, v.astype(jnp.float32))
    return u.sum(-1), m, pv


def ring_attention(q, k, v, mesh: Mesh, *, axis: str = DATA_AXIS,
                   sliding_window=None, pad_len=None, positions=None,
                   score_chunk=None):
    """Causal self-attention with the TOKEN axis sharded over `axis`.

    q: (B, Hq, T, D), k/v: (B, Hkv, T, D) — global views whose T axis is
    sharded over mesh axis `axis` in contiguous blocks (device i holds
    slots [i*Tl, (i+1)*Tl)).  GQA by head-group fold (Hq = r * Hkv).
    pad_len: optional (B,) i32 left-pad (replicated).  Returns
    (B, Hq, T, D) in q.dtype, T sharded the same way.

    positions: optional (T,) i32 — the TRUE token index living in each
    slot, sharded like the token axis.  Masking (causal / window / pad)
    is computed from these, so any token permutation is handled
    exactly: each K/V block rides the ring WITH its position vector.
    None means slot i holds token i (contiguous layout).  The zigzag
    layout from `zigzag_perm` uses this to balance the causal load:
    contiguous blocks make device i do i+1 live steps (the last device
    serializes the whole ring), striping pairs block j with block
    2n-1-j so every device does ~(n+1) half-blocks of work.

    Matches one-device causal attention on the gathered arrays to fp32
    tolerance (tests/test_ring.py pins this on an 8-device CPU mesh).
    """
    n = mesh.shape[axis]
    B, Hq, T, D = q.shape
    # score_chunk bounds the materialized logits: each ring step scores
    # q (Tl) against K in chunks of <= score_chunk (largest divisor of
    # Tl), so peak f32 score memory is B*Hq*Tl*score_chunk instead of
    # B*Hq*Tl*Tl — at 32K over 8 chips the unchunked block would be
    # ~2 GB/layer/step.  The online recurrence composes across chunks
    # exactly as it does across blocks.  Default 1024.
    Hkv = k.shape[1]
    r = Hq // Hkv
    scale = 1.0 / (D ** 0.5)

    def local(q_blk, k_blk, v_blk, pad, pos_blk):
        Tl = q_blk.shape[2]
        qg = q_blk.astype(jnp.float32).reshape(B, Hkv, r, Tl, D)
        qpos = pos_blk
        # pcast-to-varying: the accumulators start as device-invariant zeros but
        # become device-varying inside the loop — mark them up front so
        # the two lax.cond branches agree under the VMA checker
        acc = jax.lax.pcast(jnp.zeros((B, Hkv, r, Tl, D), jnp.float32),
                            (axis,), to="varying")
        m_run = jax.lax.pcast(jnp.full((B, Hkv, r, Tl), _NEG, jnp.float32),
                              (axis,), to="varying")
        l_run = jax.lax.pcast(jnp.zeros((B, Hkv, r, Tl), jnp.float32),
                              (axis,), to="varying")
        perm = [(i, (i + 1) % n) for i in range(n)]

        req = score_chunk if score_chunk else 1024
        C = next(c for c in range(min(req, Tl), 0, -1) if Tl % c == 0)
        n_chunks = Tl // C

        def step(t, carry):
            acc, m_run, l_run, kb, vb, kpos = carry

            def one_chunk(c, carry3):
                acc2, m2, l2 = carry3
                kc = jax.lax.dynamic_slice_in_dim(kb, c * C, C, axis=2)
                vc = jax.lax.dynamic_slice_in_dim(vb, c * C, C, axis=2)
                pc = jax.lax.dynamic_slice_in_dim(kpos, c * C, C, axis=0)
                u_sum, m_loc, pv = _block_attn(
                    qg, kc, vc, qpos, pc, pad, sliding_window, scale)
                m_new = jnp.maximum(m2, m_loc)
                a = jnp.exp(m2 - m_new)      # rescale old accumulator
                b = jnp.exp(m_loc - m_new)   # rescale this chunk
                return (acc2 * a[..., None] + pv * b[..., None],
                        m_new, l2 * a + u_sum * b)

            def live(_):
                if n_chunks == 1:
                    return one_chunk(0, (acc, m_run, l_run))
                return jax.lax.fori_loop(0, n_chunks, one_chunk,
                                         (acc, m_run, l_run))

            # dead when every key in this block is past my newest
            # query, or (sliding window) before every query's window
            alive = jnp.min(kpos) <= jnp.max(qpos)
            if sliding_window is not None:
                alive &= jnp.max(kpos) > jnp.min(qpos) - sliding_window
            acc, m_run, l_run = jax.lax.cond(
                alive, live, lambda _: (acc, m_run, l_run), None)
            kb, vb, kpos = jax.lax.ppermute((kb, vb, kpos), axis, perm)
            return acc, m_run, l_run, kb, vb, kpos

        carry = (acc, m_run, l_run, k_blk, v_blk, qpos)
        acc, m_run, l_run, *_ = jax.lax.fori_loop(0, n, step, carry)
        out = acc / jnp.maximum(l_run[..., None], 1e-30)
        return out.reshape(B, Hq, Tl, D).astype(q_blk.dtype)

    spec = P(None, None, axis, None)
    pad_arg = (jnp.asarray(pad_len, jnp.int32).reshape(B)
               if pad_len is not None else jnp.zeros((B,), jnp.int32))
    pos_arg = (jnp.asarray(positions, jnp.int32).reshape(T)
               if positions is not None
               else jnp.arange(T, dtype=jnp.int32))
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, spec, P(), P(axis)),
                   out_specs=spec)
    return fn(q, k, v, pad_arg, pos_arg)


def zigzag_perm(T: int, n: int):
    """Load-balancing permutation for an n-device ring over T tokens:
    2n half-blocks, device i holds halves (i, 2n-1-i), so each device's
    causal work is ~constant instead of proportional to its rank.

    Returns (perm, inv) as int32 numpy arrays: `x_striped = x[perm]`
    lays out the striped order, `x = x_striped[inv]` undoes it, and
    `perm` itself is the per-slot true-position vector to pass as
    ring_attention(positions=...).  Requires T % (2 * n) == 0."""
    import numpy as np

    if T % (2 * n):
        raise ValueError(f"T={T} not divisible by 2*n={2 * n}")
    h = T // (2 * n)
    blocks = []
    for i in range(n):
        blocks.append(np.arange(i * h, (i + 1) * h))
        j = 2 * n - 1 - i
        blocks.append(np.arange(j * h, (j + 1) * h))
    perm = np.concatenate(blocks).astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)
    return perm, inv

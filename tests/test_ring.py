"""Ring attention (parallel/ring.py) vs single-device causal attention.

The oracle is a plain jnp causal softmax-attention on the gathered
arrays; the ring must match it to fp32 tolerance on an 8-device mesh
(accumulation order differs per device — reverse ring order — so
bitwise equality is not expected, ULP-level agreement is).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from kivi_tpu.parallel.ring import ring_attention


def _mesh(n=8, axis="data"):
    if len(jax.devices()) < n:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _oracle(q, k, v, sliding_window=None, pad_len=None):
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    r = Hq // Hkv
    kq = jnp.repeat(k, r, axis=1).astype(jnp.float32)
    vq = jnp.repeat(v, r, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32), kq)
    s = s / (D ** 0.5)
    pos = jnp.arange(T)
    mask = pos[None, :] <= pos[:, None]
    if sliding_window is not None:
        mask &= pos[None, :] > pos[:, None] - sliding_window
    mask = mask[None, None]
    if pad_len is not None:
        mask = mask & (pos[None, None, None, :]
                       >= jnp.asarray(pad_len)[:, None, None, None])
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, vq).astype(q.dtype)


def _rand(B, Hq, Hkv, T, D, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, T, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("r", [1, 4])
def test_ring_matches_oracle(r):
    mesh = _mesh()
    Hkv = 2
    q, k, v = _rand(2, Hkv * r, Hkv, 64, 16)
    got = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_oracle(q, k, v)),
                               rtol=2e-5, atol=2e-5)


def test_ring_sliding_window():
    mesh = _mesh()
    q, k, v = _rand(1, 4, 4, 64, 16, seed=1)
    w = 24   # spans fewer than all blocks: dead-block skip must respect it
    got = ring_attention(q, k, v, mesh, sliding_window=w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(q, k, v, sliding_window=w)),
        rtol=2e-5, atol=2e-5)


def test_ring_left_pad():
    mesh = _mesh()
    q, k, v = _rand(3, 2, 2, 64, 16, seed=2)
    pad = jnp.asarray([0, 5, 17], jnp.int32)
    got = ring_attention(q, k, v, mesh, pad_len=pad)
    want = _oracle(q, k, v, pad_len=pad)
    # pad rows' own query outputs are garbage-by-convention in both
    # implementations; compare real positions only
    got, want = np.asarray(got), np.asarray(want)
    for b in range(3):
        np.testing.assert_allclose(got[b, :, int(pad[b]):],
                                   want[b, :, int(pad[b]):],
                                   rtol=2e-5, atol=2e-5)


def test_ring_bf16_inputs():
    mesh = _mesh()
    q, k, v = _rand(2, 4, 2, 64, 32, seed=3)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = ring_attention(q, k, v, mesh)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(_oracle(q, k, v), np.float32),
        rtol=3e-2, atol=3e-2)


def test_ring_score_chunking_matches_oracle():
    """score_chunk smaller than the block: the online recurrence must
    compose across chunks exactly as across blocks (bounded-logit-
    memory path for 32K prompts)."""
    mesh = _mesh()
    q, k, v = _rand(2, 4, 2, 64, 16, seed=7)
    want = np.asarray(_oracle(q, k, v))
    for chunk in (1, 3, 4):   # 3 does not divide Tl=8 -> falls to 2
        got = ring_attention(q, k, v, mesh, score_chunk=chunk)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5, err_msg=chunk)
    got = ring_attention(q, k, v, mesh, score_chunk=4, sliding_window=24,
                         pad_len=jnp.asarray([0, 6], jnp.int32))
    want = np.asarray(_oracle(q, k, v, sliding_window=24,
                              pad_len=jnp.asarray([0, 6], jnp.int32)))
    for b, p in enumerate((0, 6)):
        np.testing.assert_allclose(np.asarray(got)[b, :, p:],
                                   want[b, :, p:], rtol=2e-5, atol=2e-5)


def test_ring_zigzag_matches_oracle():
    """Striped layout: inputs permuted by zigzag_perm, positions passed
    explicitly — un-permuted output must equal the contiguous oracle
    (the permutation only rebalances the causal load)."""
    from kivi_tpu.parallel.ring import zigzag_perm

    mesh = _mesh()
    q, k, v = _rand(2, 4, 2, 64, 16, seed=5)
    perm, inv = zigzag_perm(64, 8)
    got_z = ring_attention(q[:, :, perm], k[:, :, perm], v[:, :, perm],
                           mesh, positions=perm)
    got = np.asarray(got_z)[:, :, inv]
    np.testing.assert_allclose(got, np.asarray(_oracle(q, k, v)),
                               rtol=2e-5, atol=2e-5)


def test_ring_zigzag_sliding_window_and_pad():
    from kivi_tpu.parallel.ring import zigzag_perm

    mesh = _mesh()
    q, k, v = _rand(2, 4, 4, 64, 16, seed=6)
    perm, inv = zigzag_perm(64, 8)
    pad = jnp.asarray([0, 9], jnp.int32)
    got_z = ring_attention(q[:, :, perm], k[:, :, perm], v[:, :, perm],
                           mesh, positions=perm, sliding_window=20,
                           pad_len=pad)
    got = np.asarray(got_z)[:, :, inv]
    want = np.asarray(_oracle(q, k, v, sliding_window=20, pad_len=pad))
    for b in range(2):
        np.testing.assert_allclose(got[b, :, int(pad[b]):],
                                   want[b, :, int(pad[b]):],
                                   rtol=2e-5, atol=2e-5)


def test_ring_zigzag_with_score_chunking():
    """Striped layout + chunked scores together (the 32K operating
    point): per-chunk position slices must ride the permuted layout."""
    from kivi_tpu.parallel.ring import zigzag_perm

    mesh = _mesh()
    q, k, v = _rand(1, 2, 2, 64, 16, seed=8)
    perm, inv = zigzag_perm(64, 8)
    got_z = ring_attention(q[:, :, perm], k[:, :, perm], v[:, :, perm],
                           mesh, positions=perm, score_chunk=2)
    got = np.asarray(got_z)[:, :, inv]
    np.testing.assert_allclose(got, np.asarray(_oracle(q, k, v)),
                               rtol=2e-5, atol=2e-5)


def test_zigzag_perm_properties():
    from kivi_tpu.parallel.ring import zigzag_perm

    perm, inv = zigzag_perm(96, 4)
    assert (perm[inv] == np.arange(96)).all()
    # device 0's shard holds halves 0 and 7 (first + last tokens)
    shard0 = perm[:24]
    assert shard0[0] == 0 and shard0[-1] == 95
    with pytest.raises(ValueError, match="divisible"):
        zigzag_perm(60, 8)


def test_engine_seqpar_prefill_matches_one_shot():
    """Full-model sequence-parallel prefill (Engine.prefill_seqpar) vs
    the ordinary one-shot prefill: same logits to fp32 tolerance, and a
    teacher-forced decode step off both caches agrees — the SP path is
    the exact-attention accuracy class, not the chunked one."""
    from kivi_tpu.config import QuantConfig, tiny_config
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.engine import Engine

    mesh = _mesh()
    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 1,
                              cfg.vocab_size, jnp.int32)

    def eng():
        e = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=256,
                   batch_size=2)
        e.cache_dtype = jnp.float32
        return e

    e1, e2 = eng(), eng()
    lg1, c1 = e1._prefill(params, toks, e1.init_caches(), None)
    lg2, c2 = e2.prefill_seqpar(toks, mesh)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=2e-4, atol=2e-4)
    # teacher-forced decode step on both caches
    nxt = jnp.argmax(lg1, -1)[:, None].astype(jnp.int32)
    pos = jnp.full((2, 1), 64, jnp.int32)
    d1, _ = e1._decode(params, nxt, pos, c1, None)
    d2, _ = e2._decode(params, nxt, pos, c2, None)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=2e-4, atol=2e-4)


def test_engine_seqpar_striped_matches_one_shot():
    """striped=True (zigzag layout): same logits and a matching teacher-
    forced decode step — the permutation is internal, caches come back
    in true token order."""
    from kivi_tpu.config import QuantConfig, tiny_config
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.engine import Engine

    mesh = _mesh()
    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 64), 1,
                              cfg.vocab_size, jnp.int32)

    def eng():
        e = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=256,
                   batch_size=2)
        e.cache_dtype = jnp.float32
        return e

    e1, e2 = eng(), eng()
    lg1, c1 = e1._prefill(params, toks, e1.init_caches(), None)
    lg2, c2 = e2.prefill_seqpar(toks, mesh, striped=True)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=2e-4, atol=2e-4)
    nxt = jnp.argmax(lg1, -1)[:, None].astype(jnp.int32)
    pos = jnp.full((2, 1), 64, jnp.int32)
    d1, _ = e1._decode(params, nxt, pos, c1, None)
    d2, _ = e2._decode(params, nxt, pos, c2, None)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=2e-4, atol=2e-4)


def test_engine_seqpar_striped_with_pad():
    from kivi_tpu.config import QuantConfig, tiny_config
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.engine import Engine

    mesh = _mesh()
    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=8, v_bits=8, group_size=32,
                       residual_length=32)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(3), (2, 64), 1,
                              cfg.vocab_size, jnp.int32)
    pads = [0, 11]

    def eng():
        e = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=256,
                   batch_size=2)
        e.cache_dtype = jnp.float32
        return e

    e1, e2 = eng(), eng()
    lg1, _ = e1._prefill(params, toks, e1.init_caches(),
                         jnp.asarray(pads, jnp.int32))
    lg2, _ = e2.prefill_seqpar(toks, mesh, pad_lens=pads, striped=True)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=2e-4, atol=2e-4)


def test_seqpar_rejects_indivisible_length():
    from kivi_tpu.config import QuantConfig, tiny_config
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.engine import Engine

    mesh = _mesh()
    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    e = Engine(cfg=cfg, qcfg=qcfg,
               params=modeling.init_params(cfg, jax.random.PRNGKey(0)),
               max_seq_len=256, batch_size=1)
    with pytest.raises(ValueError, match="not divisible"):
        e.prefill_seqpar(jnp.ones((1, 60), jnp.int32), mesh)


def test_ring_under_jit_with_sharded_inputs():
    """jit(ring) with T-sharded operands: the composition the engine
    uses — shard_map nests inside jit, inputs land pre-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh()
    q, k, v = _rand(2, 4, 4, 64, 16, seed=4)
    sh = NamedSharding(mesh, P(None, None, "data", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    fn = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))
    got = fn(qs, ks, vs)
    assert got.sharding.spec == P(None, None, "data", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_oracle(q, k, v)),
                               rtol=2e-5, atol=2e-5)

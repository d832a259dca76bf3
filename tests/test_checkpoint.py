"""Native checkpoint round trip (models/checkpoint.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kivi_tpu.config import tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.models.checkpoint import load_checkpoint, save_checkpoint

CFG = tiny_config()


def test_checkpoint_roundtrip(tmp_path):
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    save_checkpoint(str(tmp_path / "ck"), params, CFG)
    cfg2, params2 = load_checkpoint(str(tmp_path / "ck"))
    assert cfg2 == CFG
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_restore_sharded(tmp_path):
    """Restore straight into the (data, model) mesh sharding and run a
    forward step on the restored tree."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.parallel import auto_mesh_shape, make_mesh

    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    save_checkpoint(str(tmp_path / "ck"), params, CFG)

    nd, nm = auto_mesh_shape(8, CFG.num_kv_heads)
    mesh = make_mesh(nd, nm)
    cfg2, params2 = load_checkpoint(str(tmp_path / "ck"), mesh=mesh)
    # every leaf landed sharded on the mesh
    for leaf in jax.tree_util.tree_leaves(params2):
        assert leaf.sharding.mesh.shape == mesh.shape
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    B, T = nd * 2, 16
    toks = jnp.ones((B, T), jnp.int32)
    caches = modeling.init_caches(cfg2, qcfg, B, 64, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = modeling.forward(params2, toks, caches, cfg2, qcfg, pos,
                                 mode="prefill")
    assert np.isfinite(np.asarray(logits)).all()


def test_prefix_snapshot_roundtrip(tmp_path):
    """A cached system prompt survives a process restart: save/load the
    PrefixSnapshot and generation from the restored snapshot must be
    token-equal (the restored arrays ARE the saved arrays)."""
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.serving.engine import (Engine, load_prefix_snapshot,
                                         save_prefix_snapshot)

    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    eng = Engine(cfg=CFG, qcfg=qcfg, params=params, max_seq_len=256,
                 batch_size=2)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.integers(1, CFG.vocab_size, 70), jnp.int32)
    snap = eng.prefill_prefix(prefix)
    save_prefix_snapshot(str(tmp_path / "snap"), snap)
    back = load_prefix_snapshot(str(tmp_path / "snap"))

    assert back.length == snap.length
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        snap.caches, back.caches)
    for a, b in zip(jax.tree_util.tree_leaves(snap.caches),
                    jax.tree_util.tree_leaves(back.caches)):
        assert a.dtype == b.dtype

    suffix = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 9)),
                         jnp.int32)
    want = np.asarray(eng.generate(suffix, 8, prefix=snap))
    got = np.asarray(eng.generate(suffix, 8, prefix=back))
    np.testing.assert_array_equal(got, want)


def test_prefix_snapshot_roundtrip_fp(tmp_path):
    """fp16-cache snapshots round trip too (FpLayerCache rebuild)."""
    from kivi_tpu.config import QuantConfig
    from kivi_tpu.serving.engine import (Engine, load_prefix_snapshot,
                                         save_prefix_snapshot)

    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=32,
                       residual_length=32)
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    eng = Engine(cfg=CFG, qcfg=qcfg, params=params, max_seq_len=128,
                 batch_size=1)
    prefix = jnp.arange(1, 41, dtype=jnp.int32)
    snap = eng.prefill_prefix(prefix)
    save_prefix_snapshot(str(tmp_path / "snap"), snap)
    back = load_prefix_snapshot(str(tmp_path / "snap"))
    from kivi_tpu.cache.fp_cache import FpLayerCache
    assert all(isinstance(c, FpLayerCache) for c in back.caches)
    want = np.asarray(eng.generate(jnp.asarray([[5, 6]], jnp.int32), 6,
                                   prefix=snap))
    got = np.asarray(eng.generate(jnp.asarray([[5, 6]], jnp.int32), 6,
                                  prefix=back))
    np.testing.assert_array_equal(got, want)

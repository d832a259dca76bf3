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

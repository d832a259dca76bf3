"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh.

SURVEY.md §4: multi-chip tests run on CPU via
XLA_FLAGS=--xla_force_host_platform_device_count (set in conftest.py).
The reference has nothing distributed; the oracle is our own single-
device engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.parallel import (
    auto_mesh_shape, make_mesh, shard_caches, shard_params, shard_tokens,
)
from kivi_tpu.serving.engine import Engine

CFG = tiny_config(num_heads=8, num_kv_heads=4, head_dim=32, hidden_size=128)
QCFG = QuantConfig(k_bits=2, v_bits=2, group_size=32, residual_length=64)


def test_auto_mesh_shape():
    assert auto_mesh_shape(8, 4) == (2, 4)
    assert auto_mesh_shape(8, 32) == (1, 8)
    assert auto_mesh_shape(4, 6) == (2, 2)
    assert auto_mesh_shape(1, 8) == (1, 1)


@pytest.mark.parametrize("quant", [True, False])
def test_sharded_generate_matches_single_device(quant):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    qcfg = QCFG if quant else QuantConfig(k_bits=16, v_bits=16,
                                          group_size=32, residual_length=64)
    B, T, STEPS, MAX = 4, 48, 8, 256
    params = modeling.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0,
                                CFG.vocab_size, jnp.int32)

    # Teacher-forced step-by-step logits comparison: free-running greedy on
    # a random-weight model diverges at argmax ties under different bf16
    # reduction orders, so feed both engines the same token stream and
    # demand close logits at every step.
    eng = Engine(cfg=CFG, qcfg=qcfg, params=params, max_seq_len=MAX,
                 batch_size=B)
    caches_r = eng.init_caches()
    logits_r, caches_r = eng._prefill(params, tokens, caches_r)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, CFG, mesh)
    st = shard_tokens(tokens, mesh)
    caches_s = shard_caches(eng.init_caches(), qcfg, mesh)
    logits_s, caches_s = eng._prefill(sp, st, caches_s)

    step_tok = jax.random.randint(jax.random.PRNGKey(2), (STEPS, B, 1), 0,
                                  CFG.vocab_size, jnp.int32)
    for i in range(STEPS):
        np.testing.assert_allclose(np.asarray(logits_s),
                                   np.asarray(logits_r),
                                   rtol=0.05, atol=0.05)
        pos = jnp.full((B, 1), T + i, jnp.int32)
        logits_r, caches_r = eng._decode(params, step_tok[i], pos, caches_r)
        logits_s, caches_s = eng._decode(sp, step_tok[i], pos, caches_s)


def test_sharded_prefill_logits_close():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    B, T, MAX = 4, 48, 128
    params = modeling.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0,
                                CFG.vocab_size, jnp.int32)
    eng = Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=MAX,
                 batch_size=B)
    logits_ref, _ = eng._prefill(params, tokens, eng.init_caches())

    mesh = make_mesh(2, 4)
    sp = shard_params(params, CFG, mesh)
    st = shard_tokens(tokens, mesh)
    caches = shard_caches(eng.init_caches(), QCFG, mesh)
    logits_s, _ = eng._prefill(sp, st, caches)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_ref),
                               rtol=0.05, atol=0.05)


def test_sharded_prefix_extend_matches_single_device():
    """Prefix-cache serving under GSPMD: a batch-1 snapshot broadcast
    across the data axis and sharded over the (data, model) mesh must
    produce the same extend-step logits as the replicated run (TP over
    KV heads slices the packed stores; the suffix-extend contraction
    rides the same shardings as decode)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from kivi_tpu.cache.kivi_cache import broadcast_rows

    B, T1, MAX = 4, 16, 256
    params = modeling.init_params(CFG, jax.random.PRNGKey(0))
    eng = Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=MAX,
                 batch_size=B)
    prefix = jax.random.randint(jax.random.PRNGKey(3), (40,), 1,
                                CFG.vocab_size, jnp.int32)
    snap = eng.prefill_prefix(prefix)
    suffix = jax.random.randint(jax.random.PRNGKey(4), (B, T1), 1,
                                CFG.vocab_size, jnp.int32)

    caches_r = [broadcast_rows(c, B) for c in snap.caches]
    logits_r, _ = eng._extend_call(params, suffix, caches_r, snap.length)

    mesh = make_mesh(2, 4)
    sp = shard_params(params, CFG, mesh)
    st = shard_tokens(suffix, mesh)
    caches_s = shard_caches([broadcast_rows(c, B) for c in snap.caches],
                            QCFG, mesh)
    logits_s, _ = eng._extend_call(sp, st, caches_s, snap.length)
    np.testing.assert_allclose(np.asarray(logits_s),
                               np.asarray(logits_r),
                               rtol=0.05, atol=0.05)

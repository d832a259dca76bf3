"""Fused decode megakernel vs the split jnp oracle.

Sweeps cache states with every phase relationship between the K and V
stores (fresh window, K ahead of V, V ahead of K, just-flushed) — the
cross-routing of probabilities between stores is the hard part
(reference semantics `models/llama_kivi.py:115-129,167-172`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kivi_tpu.cache.kivi_cache import (decode_append, init_layer_cache,
                                       prefill_ingest)
from kivi_tpu.config import QuantConfig
from kivi_tpu.core.attention import decode_attention


def _mk_cache(T_prompt, steps, qcfg, B=2, H=2, D=128, Tmax=1024, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    cache = init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(ks[0], (B, H, T_prompt, D), jnp.float32)
    v = jax.random.normal(ks[1], (B, H, T_prompt, D), jnp.float32)
    cache = prefill_ingest(cache, k, v, qcfg)
    step = jax.jit(lambda c, kn, vn: decode_append(c, kn, vn, qcfg))
    for i in range(steps):
        kn = jax.random.normal(jax.random.fold_in(ks[2], i), (B, H, 1, D),
                               jnp.float32)
        vn = jax.random.normal(jax.random.fold_in(ks[3], i), (B, H, 1, D),
                               jnp.float32)
        cache = step(cache, kn, vn)
    return cache


@pytest.mark.parametrize("bits", [(2, 2), (4, 4), (2, 4)])
@pytest.mark.parametrize("tprompt,steps", [
    (40, 0),     # prompt only: nothing quantized yet (all-window)
    (128, 0),    # K store just flushed a whole block
    (200, 60),   # mid-stream: both stores active, V ahead of K
    (128, 128),  # K flush boundary reached during decode
    (190, 140),  # several V flushes + K flushes
])
def test_fused_matches_split(bits, tprompt, steps):
    kb, vb = bits
    qcfg = QuantConfig(k_bits=kb, v_bits=vb, group_size=32,
                       residual_length=128)
    B, H, r, D = 2, 2, 4, 128
    cache = _mk_cache(tprompt, steps, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H * r, 1, D),
                          jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = decode_attention(q, cache, qcfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_fused_mha_r1():
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128)
    B, H, D = 1, 4, 128
    cache = _mk_cache(200, 10, qcfg, B=B, H=H, D=D)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, 1, D), jnp.float32)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    got = decode_attention(q, cache, qcfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)

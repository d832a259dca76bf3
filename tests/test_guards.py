"""Engine debug mode: checkify float guards (SURVEY.md §5.2).

A NaN smuggled into the weights must surface as a Python error at the
engine call site when debug=True, and the guards must be silent (and
absent from the trace) on healthy inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax._src.checkify import JaxRuntimeError

from kivi_tpu.config import QuantConfig, tiny_config
from kivi_tpu.models import modeling
from kivi_tpu.serving.engine import Engine

CFG = tiny_config()
QCFG = QuantConfig(k_bits=2, v_bits=2, group_size=32, residual_length=32)


def _engine(params, debug):
    return Engine(cfg=CFG, qcfg=QCFG, params=params, max_seq_len=128,
                  batch_size=1, debug=debug)


def test_debug_clean_run_matches_plain():
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    toks = jnp.asarray(np.random.RandomState(0).randint(
        1, CFG.vocab_size, size=(1, 16)), jnp.int32)
    with jax.default_matmul_precision("highest"):
        want = np.asarray(_engine(params, False).generate(toks, 6))
        got = np.asarray(_engine(params, True).generate(toks, 6))
    np.testing.assert_array_equal(got, want)


def test_debug_catches_nan_weights():
    params = modeling.init_params(CFG, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    params["layers"]["wq"] = params["layers"]["wq"].at[0, 0, 0].set(
        jnp.nan)
    toks = jnp.ones((1, 16), jnp.int32)
    eng = _engine(params, True)
    with pytest.raises((JaxRuntimeError, ValueError), match="nan"):
        eng.generate(toks, 4)


def _wide_cache(prompt_len, qcfg, B=1, H=4, D=128, Tmax=1024):
    from kivi_tpu.cache.kivi_cache import init_layer_cache, prefill_ingest
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    cache = init_layer_cache(B, H, D, Tmax, qcfg)
    k = jax.random.normal(ks[0], (B, H, prompt_len, D), jnp.float32)
    v = jax.random.normal(ks[1], (B, H, prompt_len, D), jnp.float32)
    return prefill_ingest(cache, k, v, qcfg)


def test_debug_catches_violated_t_bound():
    """A fill_bound below the cache's live fill must RAISE under debug
    (production silently truncates attention — the documented caller
    contract of the wide kernel's t_bound).  user_checks-only wrap:
    what the Engine uses for impl='pallas' on TPU — float
    instrumentation of Pallas kernel bodies trips a Mosaic relayout
    bug on the current toolchain (guards.checked_jit docstring)."""
    from jax.experimental import checkify
    from kivi_tpu.core.attention import decode_attention
    from kivi_tpu.utils.guards import checked_jit
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, r, D = 1, 4, 2, 128
    cache = _wide_cache(700, qcfg, B=B, H=H, D=D)   # n_k_quant = 640
    q = jax.random.normal(jax.random.PRNGKey(2), (B, H * r, 1, D),
                          jnp.float32)
    bad = checked_jit(lambda qq, cc: decode_attention(
        qq, cc, qcfg, impl="pallas", fill_bound=0),   # t_bound -> 512
        errors=checkify.user_checks)
    with pytest.raises(JaxRuntimeError, match="t_bound violated"):
        bad(q, cache)


def test_debug_valid_t_bound_passes_and_matches():
    from jax.experimental import checkify
    from kivi_tpu.core.attention import decode_attention
    from kivi_tpu.utils.guards import checked_jit
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=128, v_flush=128)
    B, H, r, D = 1, 4, 2, 128
    cache = _wide_cache(300, qcfg, B=B, H=H, D=D)   # n_k_quant = 256
    q = jax.random.normal(jax.random.PRNGKey(2), (B, H * r, 1, D),
                          jnp.float32)
    ok = checked_jit(lambda qq, cc: decode_attention(
        qq, cc, qcfg, impl="pallas", fill_bound=300),
        errors=checkify.user_checks)
    ref = decode_attention(q, cache, qcfg, impl="jnp")
    np.testing.assert_allclose(np.asarray(ok(q, cache)), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_plain_mode_has_no_guard_overhead_trace():
    """Without debug the jitted program contains no checkify plumbing
    (the error-state carry would show up as extra outputs)."""
    params = modeling.init_params(CFG, jax.random.PRNGKey(0))
    eng = _engine(params, False)
    toks = jnp.ones((1, 16), jnp.int32)
    caches = eng.init_caches()
    lowered = jax.jit(
        lambda p, t, c: eng._prefill_fn(p, t, c, cfg=CFG, qcfg=QCFG,
                                        impl="jnp")).lower(
        params, toks, caches)
    assert "check" not in lowered.as_text()[:2000].lower()

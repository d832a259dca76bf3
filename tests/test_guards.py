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

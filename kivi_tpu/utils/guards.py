"""Debug-mode numerical guards (SURVEY.md §5.2).

The hot path stays guard-free: every engine program is traced once and
anything inside `jit`/`scan` costs every step.  With `Engine(debug=True)`
the jitted entry points are wrapped in `jax.experimental.checkify` with
float checks, so a NaN/Inf born anywhere in the traced computation
(softmax over an all-masked row, a zero-scale quantization group, a
poisoned weight) raises a Python error at the call site that names the
failing primitive, instead of silently propagating garbage tokens.

This is the TPU-native analogue of torch's anomaly detection — the
reference has no equivalent; debugging there is print-and-pray.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

ERRORS = checkify.float_checks


def checked_jit(fn, **jit_kwargs):
    """jax.jit(fn) with float checkify instrumentation; the wrapper
    re-raises any captured error eagerly after each call.

    Donation is dropped: checkify reads values the donated buffers
    would alias, and debug mode is not the place to optimize HBM.
    """
    jit_kwargs.pop("donate_argnums", None)
    cfn = checkify.checkify(fn, errors=ERRORS)
    jfn = jax.jit(cfn, **jit_kwargs)

    @functools.wraps(fn)
    def run(*args, **kwargs):
        err, out = jfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run

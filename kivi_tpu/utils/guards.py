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

import contextvars
import functools

import jax
from jax.experimental import checkify

ERRORS = checkify.float_checks | checkify.user_checks

# True exactly while a checked_jit-wrapped program is being TRACED, so
# invariant checks (debug_check below) are staged only into debug-mode
# programs.  A plain jit tracing concurrently (a second, non-debug
# Engine in the same process) never sees the flag: it is a context
# variable scoped to the checkified trace, not a global.
_TRACING_CHECKED = contextvars.ContextVar("kivi_tracing_checked",
                                          default=False)


def debug_check(pred, msg: str, **fmt):
    """checkify.check(pred, msg) staged ONLY when tracing under
    checked_jit (Engine(debug=True)); a no-op — zero trace residue —
    in production programs.  Use for caller contracts whose violation
    is otherwise silent (the wide kernel's t_bound fill bound)."""
    if _TRACING_CHECKED.get():
        checkify.check(pred, msg, **fmt)


def checked_jit(fn, errors=None, **jit_kwargs):
    """jax.jit(fn) with checkify instrumentation (default: float +
    user checks); the wrapper re-raises any captured error eagerly
    after each call.

    errors: override the check set.  The current TPU toolchain fails
    Mosaic lowering when checkify's float instrumentation rewrites a
    Pallas kernel BODY (`Invalid relayout ... i1` — same bug class the
    compile helper shows intermittently), so callers running Pallas
    kernels under debug on real TPU should pass
    `checkify.user_checks`: explicit debug_check contracts (staged
    OUTSIDE kernels) still fire, kernel bodies stay untouched.  The
    Engine selects this automatically (impl='pallas' on a tpu
    backend).

    Donation is dropped: checkify reads values the donated buffers
    would alias, and debug mode is not the place to optimize HBM.
    """
    jit_kwargs.pop("donate_argnums", None)
    if errors is None:
        errors = ERRORS

    @functools.wraps(fn)
    def flagged(*args, **kwargs):
        token = _TRACING_CHECKED.set(True)
        try:
            return fn(*args, **kwargs)
        finally:
            _TRACING_CHECKED.reset(token)

    cfn = checkify.checkify(flagged, errors=errors)
    jfn = jax.jit(cfn, **jit_kwargs)

    @functools.wraps(fn)
    def run(*args, **kwargs):
        err, out = jfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run

"""Test configuration: run on CPU with 8 virtual devices by default.

The standard JAX way to test pjit/shard_map logic without a pod
(SURVEY.md section 4).  Set KIVI_TPU_REAL=1 to run the suite against the
real attached TPU chip instead (single device).

Note: in this environment jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon, so env vars alone are too late — we must flip the
platform through jax.config before any backend is initialized.
"""

import gc
import os

import pytest

if not os.environ.get("KIVI_TPU_REAL"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # On the real chip, f32 einsums default to bf16 MXU passes (~1e-2
    # relative error) — but the suite's jnp ORACLE paths are the
    # ground truth the kernels are pinned against, and cross-path
    # equivalence tests (extend-vs-decode, speculative-vs-target)
    # compare two differently-structured f32 computations at 1e-5
    # tolerances.  Force true f32 matmuls for tests; production code
    # is explicit-bf16 where it wants bf16, so this only firms up the
    # oracles.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite JIT-compiles thousands of programs in one process;
    letting them all accumulate has produced segfaults inside XLA's
    CPU compiler late in the run (LLVM JIT code-memory exhaustion).
    Per-module clearing caps the live-executable count at one module's
    worth; cross-module compile reuse was negligible anyway (modules
    use distinct shapes/configs)."""
    yield
    import jax

    gc.collect()
    jax.clear_caches()

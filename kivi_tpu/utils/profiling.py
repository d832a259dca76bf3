"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference has only manual CUDA-synchronized timing
(`/root/reference/quant/timeit_v2.py`) and peak-memory readbacks
(`mem_spd_test.py:62,70`).  TPU-native equivalents:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard/XProf trace of every XLA/Mosaic kernel;
  * `annotate(name)` — TraceAnnotation so engine phases (prefill,
    decode, flush) are labeled inside the trace;
  * `memory_snapshot()` — live/peak HBM from device memory stats where
    the runtime exposes them (the tunneled axon runtime does not; falls
    back to analytic pytree accounting);
  * `pytree_bytes(tree)` — analytic bytes of a params/cache pytree, the
    basis of bench.py's memory model.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the context into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a profiler trace."""
    return jax.profiler.TraceAnnotation(name)


def pytree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


def memory_snapshot(device=None) -> Optional[dict]:
    """Device memory stats, or None when the runtime hides them."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {k: v for k, v in stats.items()
            if "bytes" in k or "limit" in k}


def kv_cache_report(cfg, qcfg, batch: int, max_seq_len: int) -> dict:
    """Analytic cache-memory model: bytes/sequence for the KIVI cache vs
    an fp16 cache, and the implied max-batch multiplier — the TPU
    counterpart of the reference's peak-memory claim (README.md:29)."""
    from kivi_tpu.models import modeling
    from kivi_tpu.config import QuantConfig
    import dataclasses as dc

    kivi = jax.eval_shape(
        lambda: modeling.init_caches(cfg, qcfg, batch, max_seq_len))
    fp = jax.eval_shape(lambda: modeling.init_caches(
        cfg, dc.replace(qcfg, k_bits=16, v_bits=16), batch, max_seq_len))

    def nbytes(t):
        return sum(l.size * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(t))

    kb, fb = nbytes(kivi), nbytes(fp)
    return {
        "kivi_bytes": kb,
        "fp16_bytes": fb,
        "memory_reduction": fb / kb,
        "kivi_bytes_per_seq": kb // batch,
        "fp16_bytes_per_seq": fb // batch,
    }

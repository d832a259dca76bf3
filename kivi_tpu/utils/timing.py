"""Device-honest benchmarking utilities.

The reference uses a timeit fork with `torch.cuda.synchronize()` bracketing
(`/root/reference/quant/timeit_v2.py:197-256`).  The TPU/axon analogue has
two twists:

  * `block_until_ready()` over the tunneled runtime acknowledges ENQUEUE,
    not completion — only a host readback truly synchronizes;
  * per-dispatch overhead (~0.2-0.5 ms) and readback RTT (~29 ms) would
    swamp sub-millisecond kernels.

So: run the op in a `lax.fori_loop` INSIDE one jit with a data dependence
between iterations (so XLA cannot hoist it), bracket with a single scalar
readback, and difference two iteration counts to cancel all constant
overheads.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def bench_loop(step: Callable, init_state, iters: int = 50,
               warmup_iters: int = 5, repeats: int = 3) -> float:
    """Return seconds per iteration of `step` (state -> state).

    `step` must return a pytree of the same structure as `init_state` and
    every iteration must consume the previous state (data dependence).

    Each of the two loop lengths is measured `repeats` times and the
    MINIMUM is differenced: tunnel stalls and chip contention are
    additive-positive noise (observed: the same 32K kernel measuring
    1.48 then 2.35 ms minutes apart on single-shot differencing), so
    min-of-repeats recovers the uncontended time for each length and
    the difference stays honest.
    """

    def run(n_static, state):
        def body(_, s):
            return step(s)
        return jax.lax.fori_loop(0, n_static, body, state)

    # Donate the state so multi-GB benchmark states (e.g. KV caches) are
    # not double-buffered across the jit boundary; feed each invocation
    # a fresh copy since donation consumes the argument.
    run_w = jax.jit(lambda s: run(warmup_iters, s), donate_argnums=(0,))
    run_n = jax.jit(lambda s: run(warmup_iters + iters, s),
                    donate_argnums=(0,))

    def fresh():
        return jax.tree_util.tree_map(jnp.copy, init_state)

    def sync(tree):
        # force true completion via scalar readback of one leaf
        leaf = jax.tree_util.tree_leaves(tree)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)) * 0)

    # compile both programs
    sync(run_w(fresh()))
    sync(run_n(fresh()))

    def measure(run):
        s = fresh()
        t0 = time.perf_counter()
        sync(run(s))
        return time.perf_counter() - t0

    t_w = min(measure(run_w) for _ in range(repeats))
    t_n = min(measure(run_n) for _ in range(repeats))

    return max(t_n - t_w, 1e-9) / iters


def bench_fn(fn: Callable, *args, iters: int = 50, repeats: int = 3) -> float:
    """Benchmark fn(*args) -> array, feeding a scalar derived from the
    output back into the first argument to enforce data dependence."""

    def step(state):
        first, rest = state
        out = fn(first, *rest)
        # Non-zero multiplier: a literal *0.0 would let XLA's algebraic
        # simplifier fold the feedback and dead-code-eliminate fn entirely.
        leaf = jax.tree_util.tree_leaves(out)[0]
        feedback = jnp.sum(leaf.astype(jnp.float32)) * 1e-30
        return (first + feedback.astype(first.dtype), rest)

    return bench_loop(step, (args[0], tuple(args[1:])), iters=iters,
                      repeats=repeats)

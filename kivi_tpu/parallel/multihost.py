"""Multi-host runtime: process bootstrap + global mesh over a pod slice.

The reference is single-process (SURVEY.md §3: "no inter-process or
inter-node control transfer anywhere").  On TPU pods the runtime layer
is standard JAX multi-controller SPMD: every host runs the same program,
`jax.distributed.initialize()` wires the processes, and one global Mesh
spans all chips — TP ("model") axes land on ICI within a slice, the DP
("data") axis stretches across hosts over DCN (scaling-book recipe:
fast-collective axes innermost).

Data feeding follows the standard recipe: each host feeds its LOCAL
batch shard and `jax.make_array_from_process_local_data` assembles the
global array.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kivi_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, auto_mesh_shape


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire up multi-controller JAX.  On TPU pod VMs all arguments are
    discovered from the metadata server; pass them explicitly only for
    manual (e.g. GPU/CPU) bring-up."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(num_kv_heads: int, n_model: Optional[int] = None) -> Mesh:
    """A (data, model) mesh over every chip in the job.

    `model` (tensor parallelism over KV heads) is kept within a single
    host's chips when possible so its per-layer collectives ride ICI;
    `data` takes the rest (crossing hosts over DCN is fine for DP — one
    gradient/batch boundary per step, not per layer)."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    local = jax.local_device_count()
    if n_model is None:
        _, n_model = auto_mesh_shape(min(local, n), num_kv_heads)
    assert n % n_model == 0
    arr = devices.reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def feed_batch(mesh: Mesh, local_tokens: np.ndarray) -> jax.Array:
    """Assemble the global (B, T) token batch from this host's shard."""
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    return jax.make_array_from_process_local_data(sharding, local_tokens)

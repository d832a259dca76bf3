"""Multi-chip parallelism: mesh construction + sharding specs.

New first-class subsystem relative to the reference, which has no
distributed backend at all (SURVEY.md §2.2 parallelism census).
"""

from kivi_tpu.parallel.elastic import (
    ElasticBatcher,
    Heartbeat,
    StepWatchdog,
    surviving_mesh,
)
from kivi_tpu.parallel.ring import ring_attention
from kivi_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    auto_mesh_shape,
    cache_pspecs,
    make_mesh,
    param_pspecs,
    shard_caches,
    shard_params,
    shard_tokens,
    token_pspec,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "ElasticBatcher", "Heartbeat",
    "StepWatchdog", "auto_mesh_shape", "cache_pspecs", "make_mesh",
    "param_pspecs", "ring_attention", "shard_caches", "shard_params",
    "shard_tokens", "surviving_mesh", "token_pspec",
]

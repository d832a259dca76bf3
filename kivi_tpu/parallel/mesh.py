"""Device mesh + sharding specs: the multi-chip layer of kivi-tpu.

The reference has NO distributed backend (SURVEY.md §2.2 parallelism
census: no torch.distributed anywhere; multi-GPU = HF accelerate
`device_map="auto"` naive layer placement).  On TPU this subsystem is
first-class: a 2-D `jax.sharding.Mesh` with axes

  * ``data``  — batch data parallelism (DCN across hosts, ICI within),
  * ``model`` — tensor parallelism over attention heads / MLP columns
    (Megatron-style; rides ICI).

Shardings are GSPMD-driven: we annotate the params / cache / activation
pytrees with `NamedSharding`s and jit the unchanged functional model —
XLA inserts the all-reduces (one psum after o_proj, one after down_proj
per layer).  The quantized KV stores, scales and zero-points are sharded
along the KV-head axis, so packed int32 words never cross chips
(SURVEY.md §5.8).

Constraints: mesh `model` size must divide num_kv_heads (8 for
Llama-3-8B / Mistral-7B, 32 for Llama-2-7B) and `data` must divide batch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kivi_tpu.config import ModelConfig, QuantConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """Build a (data, model) mesh.  TP ("model") is the fast-varying axis
    so TP groups map to ICI-adjacent devices under the default device
    enumeration (scaling-book recipe: collectives that fire every layer
    ride the innermost/fastest axis)."""
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def auto_mesh_shape(n_devices: int, num_kv_heads: int) -> tuple[int, int]:
    """Pick (n_data, n_model): the largest model axis that divides both
    the device count and the KV head count; the remainder goes to data."""
    n_model = 1
    for cand in range(min(n_devices, num_kv_heads), 0, -1):
        if n_devices % cand == 0 and num_kv_heads % cand == 0:
            n_model = cand
            break
    return n_devices // n_model, n_model


# ---------------------------------------------------------------------------
# Partition specs for every pytree the engine touches.
# ---------------------------------------------------------------------------

def param_pspecs(cfg: ModelConfig) -> dict:
    """PartitionSpec tree matching modeling.init_params' structure.

    Attention QKV are column-parallel (heads on `model`), o_proj row-
    parallel; MLP gate/up column-parallel, down row-parallel; lm_head
    column-parallel over vocab.  Embedding and norms replicated.
    """
    layers = {
        "ln_attn": P(),
        "ln_mlp": P(),
        "wq": P(None, None, MODEL_AXIS),
        "wk": P(None, None, MODEL_AXIS),
        "wv": P(None, None, MODEL_AXIS),
        "wo": P(None, MODEL_AXIS, None),
        "wg": P(None, None, MODEL_AXIS),
        "wu": P(None, None, MODEL_AXIS),
        "wd": P(None, MODEL_AXIS, None),
    }
    return {
        "embed": P(),
        "layers": layers,
        "ln_f": P(),
        "lm_head": P(None, MODEL_AXIS),
    }


def cache_pspecs(qcfg: QuantConfig) -> object:
    """PartitionSpec tree for ONE layer's cache (caches are a list of
    per-layer pytrees; apply per element).

    Every cache array is (B, H, ...): batch on `data`, KV heads on
    `model`.  Counters are replicated.
    """
    arr = P(DATA_AXIS, MODEL_AXIS)  # trailing dims unsharded
    if qcfg.quantize_kv:
        from kivi_tpu.cache.kivi_cache import KiviLayerCache
        return KiviLayerCache(
            k_codes=arr, k_scale=arr, k_mn=arr,
            v_codes=arr, v_scale=arr, v_mn=arr,
            k_win=arr, v_win=arr,
            n_k_quant=P(), n_k_win=P(),
            n_v_quant=P(), n_v_win=P(),
        )
    from kivi_tpu.cache.fp_cache import FpLayerCache
    return FpLayerCache(k=arr, v=arr, length=P())


def token_pspec() -> P:
    return P(DATA_AXIS, None)


def _to_shardings(mesh: Mesh, pspecs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    return jax.device_put(params, _to_shardings(mesh, param_pspecs(cfg)))


def shard_caches(caches, qcfg: QuantConfig, mesh: Mesh):
    spec = _to_shardings(mesh, cache_pspecs(qcfg))
    return [jax.device_put(c, spec) for c in caches]


def shard_tokens(tokens: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(tokens, NamedSharding(mesh, token_pspec()))

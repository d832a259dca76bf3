"""Native checkpoint save/load (orbax) — the framework's own format.

The reference never saves anything: its checkpoint story is one-way HF
`from_pretrained` (SURVEY.md §5.4).  A serving deployment needs a round
trip — convert an HF checkpoint once (`load_hf_checkpoint` +
`save_checkpoint`), then restart/scale from the native format, restoring
DIRECTLY into the target mesh sharding so a 70B-class model never
materializes unsharded host-side.

Layout of a checkpoint directory:
  <dir>/config.json   — ModelConfig fields (plain JSON)
  <dir>/params/       — orbax StandardCheckpointer tree of the params
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax

from kivi_tpu.config import ModelConfig


def save_checkpoint(path: str, params, cfg: ModelConfig) -> None:
    """Write params + config.  `path` must not already hold a params
    tree (orbax refuses to overwrite — delete or version externally)."""
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "params"), params)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, mesh=None
                    ) -> Tuple[ModelConfig, dict]:
    """Restore (cfg, params).  With `mesh`, every weight is restored
    straight into its `parallel.mesh.param_pspecs` sharding (orbax reads
    each host's shard from disk — no full replicated copy first)."""
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "config.json")) as f:
        cfg = ModelConfig(**json.load(f))

    ckptr = ocp.StandardCheckpointer()
    pdir = os.path.join(os.path.abspath(path), "params")
    if mesh is None:
        # Restore to shape/dtype targets, NOT the recorded shardings: a
        # bare restore() replays the SAVING platform's device metadata,
        # so a TPU-saved checkpoint would refuse to load on a CPU host
        # ("Device TPU v5 lite0 was not found in jax.local_devices()").
        meta = ckptr.metadata(pdir).item_metadata.tree
        dev = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        target = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                           sharding=dev), meta)
        params = ckptr.restore(pdir, target)
    else:
        from jax.sharding import NamedSharding
        from kivi_tpu.parallel.mesh import param_pspecs

        # Shapes AND dtypes come from the checkpoint's own metadata —
        # re-deriving them from init_params would silently cast (its
        # default dtype need not match what was saved).
        meta = ckptr.metadata(pdir).item_metadata.tree
        specs = param_pspecs(cfg)

        def tgt(m, spec):
            return jax.ShapeDtypeStruct(
                tuple(m.shape), m.dtype,
                sharding=NamedSharding(mesh, spec))
        target = jax.tree_util.tree_map(tgt, meta, specs)
        params = ckptr.restore(pdir, target)
    return cfg, params


def convert_hf(hf_dir: str, out_dir: str, dtype=None) -> ModelConfig:
    """One-shot HF safetensors -> native checkpoint conversion."""
    import jax.numpy as jnp

    from kivi_tpu.models.hf_loader import load_hf_checkpoint

    cfg, params = load_hf_checkpoint(
        hf_dir, dtype=dtype if dtype is not None else jnp.bfloat16)
    save_checkpoint(out_dir, params, cfg)
    return cfg

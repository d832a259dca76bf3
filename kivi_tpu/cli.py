"""CLI flag system (reference `utils/process_args.py` equivalent).

One typed surface instead of the reference's three layers (HF dataclass
CLI + config-object attribute injection + JSON lookup tables,
`/root/reference/utils/process_args.py:15-144`).  Returns
(ModelConfig | preset name, QuantConfig, EngineArgs).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

from kivi_tpu.config import PRESETS, ModelConfig, QuantConfig


@dataclasses.dataclass(frozen=True)
class EngineArgs:
    model_dir: Optional[str]
    preset: Optional[str]
    max_seq_len: int
    batch_size: int
    impl: str
    mesh_data: int
    mesh_model: int


def add_quant_flags(ap: argparse.ArgumentParser):
    g = ap.add_argument_group("kivi quantization")
    g.add_argument("--k-bits", type=int, default=2,
                   help="key cache bits: 2/4/8, 16 = fp cache")
    g.add_argument("--v-bits", type=int, default=2)
    g.add_argument("--group-size", type=int, default=32)
    g.add_argument("--residual", type=int, default=128,
                   help="fp16 residual window length")
    g.add_argument("--v-flush", type=int, default=0,
                   help="value window flush block (0 = group-size). "
                        "128 admits the fastest (head-folded) decode "
                        "kernel and keeps values in fp longer than the "
                        "reference's 1-token slide")
    g.add_argument("--scale-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])


def add_engine_flags(ap: argparse.ArgumentParser):
    g = ap.add_argument_group("engine")
    g.add_argument("--model-dir", default=None,
                   help="local HF checkpoint directory")
    g.add_argument("--preset", default=None, choices=sorted(PRESETS),
                   help="architecture preset (random weights)")
    g.add_argument("--max-seq-len", type=int, default=4096)
    g.add_argument("--batch-size", type=int, default=1)
    g.add_argument("--impl", default="pallas", choices=["pallas", "jnp"])
    g.add_argument("--mesh-data", type=int, default=1)
    g.add_argument("--mesh-model", type=int, default=1)


def quant_config_from_args(args) -> QuantConfig:
    """Build a QuantConfig from a parser that used add_quant_flags."""
    return QuantConfig(k_bits=args.k_bits, v_bits=args.v_bits,
                       group_size=args.group_size,
                       residual_length=args.residual,
                       v_flush=getattr(args, "v_flush", 0),
                       scale_dtype=getattr(args, "scale_dtype", "bfloat16"))


def parse(argv=None, extra=None):
    ap = argparse.ArgumentParser()
    add_quant_flags(ap)
    add_engine_flags(ap)
    if extra:
        extra(ap)
    args = ap.parse_args(argv)
    qcfg = quant_config_from_args(args)
    eargs = EngineArgs(model_dir=args.model_dir, preset=args.preset,
                       max_seq_len=args.max_seq_len,
                       batch_size=args.batch_size, impl=args.impl,
                       mesh_data=args.mesh_data,
                       mesh_model=args.mesh_model)
    return args, qcfg, eargs


def load_model(eargs: EngineArgs):
    """(ModelConfig, params) from --model-dir or --preset."""
    if eargs.model_dir:
        from kivi_tpu.models.hf_loader import load_hf_checkpoint
        return load_hf_checkpoint(eargs.model_dir)
    import jax
    from kivi_tpu.models import modeling
    cfg = PRESETS[eargs.preset or "llama2-7b"]
    return cfg, modeling.init_params(cfg, jax.random.PRNGKey(0))

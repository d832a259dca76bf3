"""CLI flag surface (kivi_tpu/cli.py) — the one place quant/engine flags
live; run_longbench and every example build their configs through it."""

import pytest

from kivi_tpu import cli
from kivi_tpu.config import PRESETS, QuantConfig


def test_parse_defaults():
    args, qcfg, eargs = cli.parse([])
    assert qcfg == QuantConfig()
    assert eargs.impl == "pallas" and eargs.batch_size == 1
    assert eargs.model_dir is None and eargs.preset is None


def test_parse_quant_flags():
    _, qcfg, _ = cli.parse(["--k-bits", "4", "--v-bits", "4",
                            "--group-size", "64", "--residual", "256",
                            "--v-flush", "128",
                            "--scale-dtype", "float32"])
    assert qcfg == QuantConfig(k_bits=4, v_bits=4, group_size=64,
                               residual_length=256, v_flush=128,
                               scale_dtype="float32")


def test_parse_engine_flags_and_extra():
    seen = {}

    def extra(ap):
        ap.add_argument("--my-flag", type=int, default=3)

    args, _, eargs = cli.parse(["--preset", sorted(PRESETS)[0],
                                "--batch-size", "8", "--impl", "jnp",
                                "--my-flag", "7"], extra=extra)
    assert eargs.batch_size == 8 and eargs.impl == "jnp"
    assert args.my_flag == 7


def test_invalid_quant_flags_raise():
    with pytest.raises(ValueError):
        cli.parse(["--k-bits", "16", "--v-bits", "2"])   # mixed fp/quant


def test_load_model_preset(monkeypatch):
    import jax

    from kivi_tpu.config import tiny_config

    # every shipped preset is 7B-class (too big to init in a unit
    # test); register a tiny one through the same dict load_model reads
    monkeypatch.setitem(cli.PRESETS, "test-tiny", tiny_config())
    cfg, params = cli.load_model(cli.EngineArgs(
        model_dir=None, preset="test-tiny", max_seq_len=128, batch_size=1,
        impl="jnp", mesh_data=1, mesh_model=1))
    assert cfg == tiny_config()
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and all(l.size > 0 for l in leaves)

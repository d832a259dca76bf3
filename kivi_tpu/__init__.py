"""kivi-tpu: TPU-native KIVI 2/4-bit KV-cache inference engine.

Public surface (lazy imports keep `import kivi_tpu` light — jax loads
only when a symbol is touched):

    from kivi_tpu import Engine, QuantConfig, ModelConfig, PRESETS
    from kivi_tpu import ContinuousBatcher, Request
    from kivi_tpu.models.hf_loader import load_hf_checkpoint
"""

__version__ = "0.2.0"

_LAZY = {
    "QuantConfig": ("kivi_tpu.config", "QuantConfig"),
    "ModelConfig": ("kivi_tpu.config", "ModelConfig"),
    "PRESETS": ("kivi_tpu.config", "PRESETS"),
    "tiny_config": ("kivi_tpu.config", "tiny_config"),
    "Engine": ("kivi_tpu.serving.engine", "Engine"),
    "PrefixSnapshot": ("kivi_tpu.serving.engine", "PrefixSnapshot"),
    "save_prefix_snapshot": ("kivi_tpu.serving.engine",
                             "save_prefix_snapshot"),
    "load_prefix_snapshot": ("kivi_tpu.serving.engine",
                             "load_prefix_snapshot"),
    "ContinuousBatcher": ("kivi_tpu.serving.batcher", "ContinuousBatcher"),
    "Request": ("kivi_tpu.serving.batcher", "Request"),
    "ServingAPI": ("kivi_tpu.serving.api", "ServingAPI"),
    "SpeculativeEngine": ("kivi_tpu.serving.speculative",
                          "SpeculativeEngine"),
    "SpeculativeBatcher": ("kivi_tpu.serving.spec_batcher",
                           "SpeculativeBatcher"),
    "PrefixCache": ("kivi_tpu.serving.prefix_cache", "PrefixCache"),
}

__all__ = sorted(_LAZY) + ["__version__"]


def __getattr__(name):
    try:
        mod, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'kivi_tpu' has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(mod), attr)

"""kivi-tpu: TPU-native KIVI 2/4-bit KV-cache inference engine."""

__version__ = "0.1.0"

"""HF checkpoint -> kivi-tpu params pytree.

The reference delegates weight loading entirely to HF
`from_pretrained(..., low_cpu_mem_usage=True)` (`/root/reference/
example.py:22-28`).  Here we read safetensors shards directly into the
functional params pytree (no torch dependency on the load path), with the
name mapping for the Llama/Mistral families.  Works from
  * a directory of *.safetensors (+ optional index json), or
  * an in-memory dict of numpy arrays keyed by HF names (used by tests to
    compare against `transformers` with identical random weights).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from kivi_tpu.config import ModelConfig


def config_from_hf(hf_cfg: Mapping) -> ModelConfig:
    """Map an HF config dict (llama/mistral style) to ModelConfig."""
    rope_scaling = None
    rope_kind = "linear"
    rope_lo, rope_hi, rope_orig = 1.0, 4.0, 8192
    rs = hf_cfg.get("rope_scaling")
    if rs:
        kind = rs.get("rope_type", rs.get("type"))
        if kind == "linear":
            rope_scaling = float(rs["factor"])
        elif kind == "llama3":
            # Llama-3.1's frequency-dependent scheme (HF
            # modeling_rope_utils._compute_llama3_parameters)
            rope_scaling = float(rs["factor"])
            rope_kind = "llama3"
            rope_lo = float(rs.get("low_freq_factor", 1.0))
            rope_hi = float(rs.get("high_freq_factor", 4.0))
            rope_orig = int(rs.get("original_max_position_embeddings",
                                   8192))
        elif kind not in (None, "default"):
            raise ValueError(f"unsupported rope_scaling type {kind!r}")
    n_heads = hf_cfg["num_attention_heads"]
    return ModelConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=n_heads,
        num_kv_heads=hf_cfg.get("num_key_value_heads", n_heads),
        head_dim=(hf_cfg.get("head_dim")
                  or hf_cfg["hidden_size"] // n_heads),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        rope_scaling=rope_scaling,
        rope_scaling_kind=rope_kind,
        rope_low_freq_factor=rope_lo,
        rope_high_freq_factor=rope_hi,
        rope_original_max_position=rope_orig,
        sliding_window=hf_cfg.get("sliding_window"),
        tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
        max_position_embeddings=hf_cfg.get("max_position_embeddings", 4096),
    )


def params_from_state_dict(sd: Mapping[str, np.ndarray], cfg: ModelConfig,
                           dtype=jnp.bfloat16) -> dict:
    """Convert an HF llama/mistral state dict (numpy arrays) to our pytree.

    HF linear weights are (out, in); ours are (in, out) -> transpose.
    """
    def get(name):
        arr = sd[name]
        return np.asarray(arr)

    def lin(name):
        return jnp.asarray(get(name).T, dtype)

    L = cfg.num_layers
    layers = {k: [] for k in
              ("ln_attn", "ln_mlp", "wq", "wk", "wv", "wo", "wg", "wu", "wd")}
    for i in range(L):
        p = f"model.layers.{i}."
        layers["ln_attn"].append(jnp.asarray(get(p + "input_layernorm.weight"), dtype))
        layers["ln_mlp"].append(jnp.asarray(get(p + "post_attention_layernorm.weight"), dtype))
        layers["wq"].append(lin(p + "self_attn.q_proj.weight"))
        layers["wk"].append(lin(p + "self_attn.k_proj.weight"))
        layers["wv"].append(lin(p + "self_attn.v_proj.weight"))
        layers["wo"].append(lin(p + "self_attn.o_proj.weight"))
        layers["wg"].append(lin(p + "mlp.gate_proj.weight"))
        layers["wu"].append(lin(p + "mlp.up_proj.weight"))
        layers["wd"].append(lin(p + "mlp.down_proj.weight"))
    layers = {k: jnp.stack(v) for k, v in layers.items()}

    embed = jnp.asarray(get("model.embed_tokens.weight"), dtype)
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        lm_head = embed.T
    else:
        lm_head = lin("lm_head.weight")
    return {
        "embed": embed,
        "layers": layers,
        "ln_f": jnp.asarray(get("model.norm.weight"), dtype),
        "lm_head": lm_head,
    }


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16):
    """Load (ModelConfig, params) from a local HF model directory."""
    from safetensors import safe_open

    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))

    shards = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors"))
    sd: Dict[str, np.ndarray] = {}

    class _Lazy(dict):
        """Lazy per-tensor loads so peak host memory stays ~1 tensor."""

        def __init__(self, files):
            self.handles = [safe_open(os.path.join(path, s), framework="np")
                            for s in files]
            self.where = {}
            for h in self.handles:
                for k in h.keys():
                    self.where[k] = h

        def __getitem__(self, k):
            return self.where[k].get_tensor(k)

        def __contains__(self, k):
            return k in self.where

    sd = _Lazy(shards)
    return cfg, params_from_state_dict(sd, cfg, dtype)


def load_hf_checkpoint_native(path: str, dtype=jnp.bfloat16):
    """Like load_hf_checkpoint but through the C++ mmap reader
    (native/safetensors_reader.cpp + models/native_io.py): the IO layer
    hands back zero-copy views into the mapped shards, so host memory
    stays at ~one mapped page set rather than materialized copies."""
    from kivi_tpu.models import native_io

    if not native_io.available():
        return load_hf_checkpoint(path, dtype)

    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    shards = sorted(os.path.join(path, f) for f in os.listdir(path)
                    if f.endswith(".safetensors"))
    where = native_io.open_shards(shards)

    class _NativeSD(dict):
        def __getitem__(self, k):
            return where[k].get(k)

        def __contains__(self, k):
            return k in where

    return cfg, params_from_state_dict(_NativeSD(), cfg, dtype)

"""Model-level correctness: our functional transformer vs HF transformers.

The strongest equivalence check available without real checkpoints: build a
tiny random-weight HF Llama/Mistral, convert its state dict through our
loader, and compare logits (fp32, fp-cache path).  Then verify the KIVI
quantized path tracks the fp path closely (the reference's accuracy story,
`docs/long_bench.md`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
from transformers import LlamaConfig, LlamaForCausalLM
from transformers import MistralConfig, MistralForCausalLM

from kivi_tpu.config import ModelConfig, QuantConfig
from kivi_tpu.models import modeling
from kivi_tpu.models.hf_loader import params_from_state_dict, config_from_hf
from kivi_tpu.serving.engine import Engine


@pytest.fixture(autouse=True)
def _exact_matmul():
    """HF references are exact f32 (torch CPU); on real TPU the default
    matmul precision would run OUR f32 forwards as single-pass bf16 and
    blow the 2e-3 parity tolerance.  All tests here use the jnp path
    (no Pallas bf16 dots), so forcing exact f32 is safe."""
    with jax.default_matmul_precision("highest"):
        yield


def tiny_hf_llama(gqa=True, rope_scaling=None):
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2 if gqa else 4,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        rope_scaling=rope_scaling, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    return cfg, model


def to_ours(hf_cfg, model):
    cfg = config_from_hf(hf_cfg.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_state_dict(sd, cfg, dtype=jnp.float32)
    return cfg, params


@pytest.mark.parametrize("gqa", [True, False])
def test_prefill_logits_match_hf(gqa):
    hf_cfg, model = tiny_hf_llama(gqa)
    cfg, params = to_ours(hf_cfg, model)
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    B, T = 2, 24
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 128, (B, T))
    with torch.no_grad():
        ref = model(torch.tensor(toks)).logits.numpy()

    caches = modeling.init_caches(cfg, qcfg, B, 64, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = modeling.forward(params, jnp.asarray(toks), caches, cfg,
                                 qcfg, positions, mode="prefill")
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_decode_logits_match_hf_incremental():
    """Prefill T0 then decode 12 tokens teacher-forced; logits must match
    HF full-sequence forward at every step (fp cache path)."""
    hf_cfg, model = tiny_hf_llama(gqa=True)
    cfg, params = to_ours(hf_cfg, model)
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    B, T0, steps = 1, 8, 12
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 128, (B, T0 + steps))
    with torch.no_grad():
        ref = model(torch.tensor(toks)).logits.numpy()

    caches = modeling.init_caches(cfg, qcfg, B, 64, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32), (B, T0))
    logits, caches = modeling.forward(
        params, jnp.asarray(toks[:, :T0]), caches, cfg, qcfg, positions,
        mode="prefill")
    np.testing.assert_allclose(np.asarray(logits[:, -1]), ref[:, T0 - 1],
                               rtol=2e-3, atol=2e-3)
    for i in range(steps):
        t = T0 + i
        pos = jnp.full((B, 1), t, jnp.int32)
        logits, caches = modeling.forward(
            params, jnp.asarray(toks[:, t:t + 1]), caches, cfg, qcfg, pos,
            mode="decode")
        np.testing.assert_allclose(
            np.asarray(logits[:, -1]), ref[:, t], rtol=2e-3, atol=2e-3,
            err_msg=f"step {i}")


def test_rope_linear_scaling_matches_hf():
    hf_cfg, model = tiny_hf_llama(
        gqa=True, rope_scaling={"rope_type": "linear", "factor": 4.0})
    cfg, params = to_ours(hf_cfg, model)
    assert cfg.rope_scaling == 4.0
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    B, T = 1, 20
    toks = np.random.default_rng(2).integers(0, 128, (B, T))
    with torch.no_grad():
        ref = model(torch.tensor(toks)).logits.numpy()
    caches = modeling.init_caches(cfg, qcfg, B, 64, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = modeling.forward(params, jnp.asarray(toks), caches, cfg,
                                 qcfg, positions, mode="prefill")
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_rope_llama3_scaling_matches_hf():
    """Llama-3.1's frequency-dependent rope scaling (the GSM8K/passkey
    model in the reference's example.py) vs HF's
    _compute_llama3_parameters."""
    hf_cfg, model = tiny_hf_llama(
        gqa=True, rope_scaling={
            "rope_type": "llama3", "factor": 8.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64})
    cfg, params = to_ours(hf_cfg, model)
    assert cfg.rope_scaling_kind == "llama3" and cfg.rope_scaling == 8.0
    assert cfg.rope_original_max_position == 64
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    B, T = 1, 96   # run PAST original_max so the scaling matters
    toks = np.random.default_rng(3).integers(0, 128, (B, T))
    with torch.no_grad():
        ref = model(torch.tensor(toks)).logits.numpy()
    caches = modeling.init_caches(cfg, qcfg, B, 128, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = modeling.forward(params, jnp.asarray(toks), caches, cfg,
                                 qcfg, positions, mode="prefill")
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3,
                               atol=2e-3)


def test_rope_llama3_differs_from_unscaled():
    """Guard against the scaling silently not applying: beyond the
    original max position the scaled and unscaled angles must differ."""
    from kivi_tpu.config import ModelConfig
    base = dict(vocab_size=8, hidden_size=64, intermediate_size=64,
                num_layers=1, num_heads=2, num_kv_heads=2, head_dim=32,
                max_position_embeddings=256)
    cfg_s = ModelConfig(**base, rope_scaling=8.0,
                        rope_scaling_kind="llama3",
                        rope_original_max_position=64)
    pos = jnp.asarray([100])
    cos_s, _ = modeling.rope_cos_sin(pos, 32, 10000.0, cfg_s.rope_scaling,
                                     cfg=cfg_s)
    cos_u, _ = modeling.rope_cos_sin(pos, 32, 10000.0)
    assert float(jnp.max(jnp.abs(cos_s - cos_u))) > 1e-3


def test_mistral_matches_hf():
    cfg_hf = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, sliding_window=None,
        attn_implementation="eager")
    torch.manual_seed(3)
    model = MistralForCausalLM(cfg_hf).eval()
    cfg = config_from_hf(cfg_hf.to_dict())
    params = params_from_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg,
        dtype=jnp.float32)
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    B, T = 2, 16
    toks = np.random.default_rng(4).integers(0, 128, (B, T))
    with torch.no_grad():
        ref = model(torch.tensor(toks)).logits.numpy()
    caches = modeling.init_caches(cfg, qcfg, B, 64, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    logits, _ = modeling.forward(params, jnp.asarray(toks), caches, cfg,
                                 qcfg, positions, mode="prefill")
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_kivi_generation_tracks_fp():
    """End-to-end: greedy generation with 4-bit KIVI cache matches the fp
    cache generation for a while (random tiny model => logits are diffuse;
    exact match for many steps is not expected at 2-bit)."""
    hf_cfg, model = tiny_hf_llama(gqa=True)
    cfg, params = to_ours(hf_cfg, model)
    B, T0, new = 1, 24, 16
    toks = jnp.asarray(np.random.default_rng(5).integers(0, 128, (B, T0)))

    outs = {}
    for name, qcfg in {
        "fp": QuantConfig(k_bits=16, v_bits=16, group_size=16,
                          residual_length=16),
        "k8v8": QuantConfig(k_bits=8, v_bits=8, group_size=16,
                            residual_length=16),
    }.items():
        eng = Engine(cfg, qcfg, params, max_seq_len=64, batch_size=B)
        eng.cache_dtype = jnp.float32
        outs[name] = np.asarray(eng.generate(toks, new))
    # 8-bit KV is ~lossless: identical greedy tokens expected
    np.testing.assert_array_equal(outs["fp"], outs["k8v8"])


def test_engine_eos_padding():
    cfg = ModelConfig(vocab_size=32, hidden_size=32, intermediate_size=64,
                      num_layers=1, num_heads=2, num_kv_heads=2, head_dim=16,
                      max_position_embeddings=64)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    qcfg = QuantConfig(k_bits=16, v_bits=16, group_size=16,
                       residual_length=16)
    eng = Engine(cfg, qcfg, params, max_seq_len=64, batch_size=1)
    toks = jnp.asarray([[1, 2, 3, 4]])
    out = np.asarray(eng.generate(toks, 8, eos_token_id=7))
    hits = np.where(out[0] == 7)[0]
    if len(hits):
        assert (out[0][hits[0]:] == 7).all()


# ---------------------------------------------------------------------------
# native (C++ mmap) checkpoint loader vs the python safetensors loader
# ---------------------------------------------------------------------------

def test_native_loader_matches_python(tmp_path):
    import json
    import numpy as np
    from safetensors.numpy import save_file
    from kivi_tpu.config import tiny_config
    from kivi_tpu.models import native_io
    from kivi_tpu.models.hf_loader import (load_hf_checkpoint,
                                           load_hf_checkpoint_native)

    if not native_io.available():
        import pytest
        pytest.skip("native reader not built")

    cfg = tiny_config()
    rng = np.random.RandomState(0)
    sd = {}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = rng.randn(cfg.hidden_size).astype(np.float32)
        sd[p + "post_attention_layernorm.weight"] = rng.randn(cfg.hidden_size).astype(np.float32)
        sd[p + "self_attn.q_proj.weight"] = rng.randn(cfg.num_heads * cfg.head_dim, cfg.hidden_size).astype(np.float32)
        sd[p + "self_attn.k_proj.weight"] = rng.randn(cfg.num_kv_heads * cfg.head_dim, cfg.hidden_size).astype(np.float32)
        sd[p + "self_attn.v_proj.weight"] = rng.randn(cfg.num_kv_heads * cfg.head_dim, cfg.hidden_size).astype(np.float32)
        sd[p + "self_attn.o_proj.weight"] = rng.randn(cfg.hidden_size, cfg.num_heads * cfg.head_dim).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = rng.randn(cfg.intermediate_size, cfg.hidden_size).astype(np.float32)
        sd[p + "mlp.up_proj.weight"] = rng.randn(cfg.intermediate_size, cfg.hidden_size).astype(np.float32)
        sd[p + "mlp.down_proj.weight"] = rng.randn(cfg.hidden_size, cfg.intermediate_size).astype(np.float32)
    sd["model.embed_tokens.weight"] = rng.randn(cfg.vocab_size, cfg.hidden_size).astype(np.float32)
    sd["model.norm.weight"] = rng.randn(cfg.hidden_size).astype(np.float32)
    sd["lm_head.weight"] = rng.randn(cfg.vocab_size, cfg.hidden_size).astype(np.float32)

    d = str(tmp_path)
    save_file(sd, f"{d}/model.safetensors", metadata={"format": "pt"})
    with open(f"{d}/config.json", "w") as f:
        json.dump({
            "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "head_dim": cfg.head_dim,
            "max_position_embeddings": cfg.max_position_embeddings,
        }, f)

    cfg_p, params_p = load_hf_checkpoint(d)
    cfg_n, params_n = load_hf_checkpoint_native(d)
    assert cfg_p == cfg_n
    for (kp, vp), (kn, vn) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params_p),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(params_n),
                   key=lambda kv: str(kv[0]))):
        assert str(kp) == str(kn)
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vn))


def test_static_flush_schedule_matches_stepwise():
    """The engine's statically-scheduled decode (no per-step flush conds)
    must produce exactly the same tokens and cache state as step-by-step
    decoding with runtime flush conds."""
    import jax.numpy as jnp
    from kivi_tpu.config import QuantConfig, tiny_config
    from kivi_tpu.models import modeling
    from kivi_tpu.serving.engine import Engine

    cfg = tiny_config()
    qcfg = QuantConfig(k_bits=2, v_bits=2, group_size=32,
                       residual_length=32)
    params = modeling.init_params(cfg, jax.random.PRNGKey(0))
    # prompt lengths probing different window phases
    for T in (20, 32, 45, 70):
        B, steps = 2, 40
        tokens = jax.random.randint(jax.random.PRNGKey(T), (B, T), 0,
                                    cfg.vocab_size, jnp.int32)
        eng = Engine(cfg=cfg, qcfg=qcfg, params=params, max_seq_len=256,
                     batch_size=B)
        first, caches = eng.prefill(tokens)
        # oracle: stepwise decode with runtime conds
        tok = first
        toks_ref = [first]
        import copy
        caches_ref = caches
        for i in range(steps):
            pos = jnp.full((B, 1), T + i, jnp.int32)
            tok, caches_ref = eng.decode_step(tok, pos, caches_ref)
            toks_ref.append(tok)
        ref = jnp.concatenate(toks_ref[:-1], axis=1)

        first2, caches2 = eng.prefill(tokens)
        out = eng.generate(tokens, steps + 1)
        assert jnp.array_equal(out[:, :steps + 1],
                               jnp.concatenate([first, ref[:, 1:],
                                                toks_ref[-1]], axis=1)), T

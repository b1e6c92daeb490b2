"""Gemma family structural tests (sliding/full pattern, dual rope,
softcaps, norms)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from tests.test_model_forward import make_kv_pages, md_single_seq


def gemma3_config(**over):
    d = dict(
        architectures=["Gemma3ForCausalLM"],
        model_type="gemma3",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=6,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=512,
        sliding_window=16,
        rope_theta=1000000.0,
        eos_token_id=1,
        extra={"sliding_window_pattern": 6, "rope_local_base_freq": 10000.0,
               "query_pre_attn_scalar": 64},
    )
    d.update(over)
    cfg = ModelConfig(**{k: v for k, v in d.items() if k != "extra"})
    cfg.extra = d["extra"]
    return cfg


def gemma2_config():
    cfg = ModelConfig(
        architectures=["Gemma2ForCausalLM"],
        model_type="gemma2",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        max_position_embeddings=512,
        sliding_window=16,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        eos_token_id=1,
    )
    cfg.extra = {"query_pre_attn_scalar": 32}
    return cfg


def test_gemma3_layer_pattern():
    model = from_config(gemma3_config(), dtype=jnp.float32)
    windows = [s.sliding_window for s in model.attn_specs]
    # pattern 6: layers 0-4 sliding, layer 5 full
    assert windows == [16, 16, 16, 16, 16, None]
    assert all(s.qk_norm for s in model.attn_specs)
    assert model.norm_offset == 1.0
    assert model.embedding_multiplier == 8.0  # sqrt(64)


def test_gemma3_forward_and_incremental():
    model = from_config(gemma3_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "rope_cos_local" in params
    # local and global tables must differ (different base/scaling)
    assert not np.allclose(
        np.asarray(params["rope_cos"][100]), np.asarray(params["rope_cos_local"][100])
    )
    kv = make_kv_pages(model)
    ids = jax.random.randint(jax.random.PRNGKey(1), (12,), 0, 256)
    h_full, _ = model(params, ids, md_single_seq(12), kv)
    logits_full = model.compute_logits(params, h_full[-1:])

    kv = make_kv_pages(model)
    h, kv = model(params, ids[:8], md_single_seq(8), kv)
    for pos in range(8, 12):
        h, kv = model(params, ids[pos : pos + 1], md_single_seq(1, start_pos=pos), kv)
    logits_inc = model.compute_logits(params, h[-1:])
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_inc), rtol=3e-4, atol=3e-4
    )


def test_gemma2_softcaps_and_norms():
    model = from_config(gemma2_config(), dtype=jnp.float32)
    assert model.attn_specs[0].soft_cap == 50.0
    assert model.attn_specs[0].sliding_window == 16  # even layer sliding
    assert model.attn_specs[1].sliding_window is None
    assert model.attn_specs[0].sm_scale == 32**-0.5  # query_pre_attn_scalar
    assert model.extra_ffn_norms
    params = model.init_params(jax.random.PRNGKey(0))
    assert "pre_feedforward_layernorm" in params["layers"][0]
    kv = make_kv_pages(model)
    ids = jnp.arange(8, dtype=jnp.int32)
    hidden, _ = model(params, ids, md_single_seq(8), kv)
    logits = model.compute_logits(params, hidden[-1:])
    # final softcap bounds logits
    assert float(jnp.abs(logits).max()) <= 30.0

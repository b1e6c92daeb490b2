"""Hybrid SSM/attention tests: Bamba, NemotronH, FalconH1,
GraniteMoeHybrid — engine greedy decode must match fresh full-sequence
forwards (incremental recurrent+paged state == full prefill)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

from test_ssm import teacher_forced_check

_BASE = dict(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    tie_word_embeddings=True, eos_token_id=0, max_position_embeddings=128,
    mamba_d_state=8, mamba_d_conv=4, mamba_expand=2, mamba_n_heads=4,
)


def test_bamba_engine_matches_full_prefill():
    mc = ModelConfig.from_dict(
        dict(_BASE, architectures=["BambaForCausalLM"], model_type="bamba",
             attn_layer_indices=[1, 3])
    )
    m = from_config(mc, dtype=jnp.float32)
    assert m.kinds == ["mamba", "attention", "mamba", "attention"]
    teacher_forced_check(mc, [3, 1, 4, 1, 5], n=6)


def test_nemotron_h_engine_matches_full_prefill():
    mc = ModelConfig.from_dict(
        dict(_BASE, architectures=["NemotronHForCausalLM"],
             model_type="nemotron_h", hybrid_override_pattern="M-*-")
    )
    m = from_config(mc, dtype=jnp.float32)
    assert m.kinds == ["mamba", "mlp", "attention", "mlp"]
    teacher_forced_check(mc, [2, 7, 1], n=6)


def test_falcon_h1_engine_matches_full_prefill():
    mc = ModelConfig.from_dict(
        dict(_BASE, architectures=["FalconH1ForCausalLM"],
             model_type="falcon_h1",
             attention_in_multiplier=1.5, ssm_out_multiplier=0.5,
             key_multiplier=0.8, embedding_multiplier=2.0,
             lm_head_multiplier=0.5, mlp_multipliers=[1.2, 0.9])
    )
    m = from_config(mc, dtype=jnp.float32)
    assert all(k == "parallel" for k in m.kinds)
    info = m.kv_head_info
    assert "kv" in info[0] and "ssm" in info[0]
    teacher_forced_check(mc, [3, 1, 4], n=6)


def test_granite_moe_hybrid_engine_matches_full_prefill():
    mc = ModelConfig.from_dict(
        dict(_BASE, architectures=["GraniteMoeHybridForCausalLM"],
             model_type="granitemoehybrid",
             layer_types=["mamba", "attention", "mamba", "attention"],
             num_experts=4, num_experts_per_tok=2,
             shared_intermediate_size=64,
             embedding_multiplier=2.0, residual_multiplier=0.5,
             attention_multiplier=0.1, logits_scaling=2.0)
    )
    m = from_config(mc, dtype=jnp.float32)
    assert m.moe_spec is not None and m.moe_spec.num_experts == 4
    teacher_forced_check(mc, [9, 8, 7, 6], n=6)


def test_zamba2_engine_matches_full_prefill():
    mc = ModelConfig.from_dict(
        dict(_BASE, architectures=["Zamba2ForCausalLM"], model_type="zamba2",
             layers_block_type=["mamba", "hybrid", "mamba", "hybrid"],
             n_mamba_heads=4, attention_head_dim=16)
    )
    m = from_config(mc, dtype=jnp.float32)
    assert m.kinds == ["mamba", "hybrid", "mamba", "hybrid"]
    info = m.kv_head_info
    assert "kv" in info[1] and "kv" not in info[0]
    teacher_forced_check(mc, [4, 2, 6], n=6)


def test_granite_moe_hybrid_weight_translation():
    """GraniteMoe fused input/output_linear names land as stacked experts."""
    mc = ModelConfig.from_dict(
        dict(_BASE, architectures=["GraniteMoeHybridForCausalLM"],
             model_type="granitemoehybrid",
             layer_types=["mamba", "attention"], num_hidden_layers=2,
             num_experts=2, num_experts_per_tok=1, moe_intermediate_size=16)
    )
    m = from_config(mc, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    e, h, i = 2, 32, 16
    stream = [
        ("model.layers.0.block_sparse_moe.input_linear.weight",
         rng.normal(size=(e, 2 * i, h)).astype(np.float32)),
        ("model.layers.0.block_sparse_moe.output_linear.weight",
         rng.normal(size=(e, h, i)).astype(np.float32)),
        ("model.layers.0.block_sparse_moe.router.layer.weight",
         rng.normal(size=(e, h)).astype(np.float32)),
    ]
    params = m.load_weights(iter(stream))
    experts = params["layers"][0]["feed_forward"]["experts"]
    assert experts["gate_proj"]["weight"].shape == (e, h, i)
    assert experts["down_proj"]["weight"].shape == (e, i, h)
    assert params["layers"][0]["feed_forward"]["router"]["weight"].shape == (h, e)


def test_lfm2_engine_matches_full_prefill():
    mc = ModelConfig.from_dict(
        dict(architectures=["Lfm2ForCausalLM"], model_type="lfm2",
             vocab_size=128, hidden_size=32, intermediate_size=64,
             num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=2, tie_word_embeddings=True,
             eos_token_id=0, max_position_embeddings=128,
             layer_types=["short_conv", "full_attention", "short_conv",
                          "full_attention"],
             conv_L_cache=3)
    )
    m = from_config(mc, dtype=jnp.float32)
    assert m.kinds == ["conv", "attention", "conv", "attention"]
    info = m.kv_head_info
    assert info[0]["conv"] == (32, 2)
    assert isinstance(info[1], tuple)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "q_norm" in params["layers"][1]["self_attn"]
    assert "w1" in params["layers"][0]["feed_forward"]
    teacher_forced_check(mc, [5, 3, 9], n=6)


def test_lfm2_weight_names():
    mc = ModelConfig.from_dict(
        dict(architectures=["Lfm2ForCausalLM"], model_type="lfm2",
             vocab_size=64, hidden_size=32, intermediate_size=64,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, tie_word_embeddings=True,
             layer_types=["short_conv", "full_attention"], conv_L_cache=3)
    )
    m = from_config(mc, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h = 32
    stream = [
        ("model.embed_tokens.weight", rng.normal(size=(64, h)).astype(np.float32)),
        ("model.layers.0.operator_norm.weight", np.ones(h, np.float32)),
        ("model.layers.0.conv.in_proj.weight",
         rng.normal(size=(3 * h, h)).astype(np.float32)),
        ("model.layers.0.conv.conv.weight",
         rng.normal(size=(h, 1, 3)).astype(np.float32)),
        ("model.layers.0.conv.out_proj.weight",
         rng.normal(size=(h, h)).astype(np.float32)),
        ("model.layers.0.feed_forward.w1.weight",
         rng.normal(size=(128, h)).astype(np.float32)),
        ("model.layers.0.feed_forward.w2.weight",
         rng.normal(size=(h, 64)).astype(np.float32)),
        ("model.layers.1.self_attn.q_layernorm.weight", np.ones(8, np.float32)),
        ("model.layers.1.self_attn.out_proj.weight",
         rng.normal(size=(h, h)).astype(np.float32)),
    ]
    params = m.load_weights(iter(stream))
    assert params["layers"][0]["mamba"]["conv1d"]["weight"].shape == (h, 3)
    assert params["layers"][0]["feed_forward"]["w1"]["weight"].shape == (h, 128)
    assert float(jnp.abs(
        params["layers"][1]["self_attn"]["o_proj"]["weight"]).sum()) > 0

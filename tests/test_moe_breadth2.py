"""Tests for MoE breadth 2: Llama4, PhiMoE, Ernie4.5-MoE, Hunyuan,
MiniMax-M2 — structure assertions + full-vs-incremental equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from tests.test_misc_archs import _smoke, base


def test_llama4():
    cfg = base("Llama4ForCausalLM", "llama4", num_hidden_layers=4,
               head_dim=16)
    cfg.num_experts = 4
    cfg.num_experts_per_tok = 1
    cfg.moe_intermediate_size = 32
    cfg.extra = {"num_local_experts": 4, "interleave_moe_layer_step": 2,
                 "no_rope_layers": [1, 1, 1, 0],
                 "attention_chunk_size": 64}
    model = from_config(cfg, dtype=jnp.float32)
    # layer 3 is NoPE+global; rope layers are chunk-windowed
    assert model.attn_specs[3].rotary is None
    assert model.attn_specs[0].rotary is not None
    assert model.attn_specs[0].sliding_window == 64
    assert [model.is_moe_layer(i) for i in range(4)] == [False, True, False, True]
    params = model.init_params(jax.random.PRNGKey(0))
    assert "experts" in params["layers"][1]["mlp"]
    assert "shared_expert" in params["layers"][1]["mlp"]
    assert "experts" not in params["layers"][0]["mlp"]
    _smoke(cfg)


def test_llama4_fused_weights():
    cfg = base("Llama4ForCausalLM", "llama4", num_hidden_layers=2,
               head_dim=16)
    cfg.num_experts = 2
    cfg.moe_intermediate_size = 16
    cfg.extra = {"num_local_experts": 2, "interleave_moe_layer_step": 1,
                 "no_rope_layers": [1, 1]}
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    e, h, i = 2, 64, 16
    stream = [
        ("model.layers.0.feed_forward.experts.gate_up_proj",
         rng.normal(size=(e, h, 2 * i)).astype(np.float32)),
        ("model.layers.0.feed_forward.experts.down_proj",
         rng.normal(size=(e, i, h)).astype(np.float32)),
        ("model.layers.0.feed_forward.router.weight",
         rng.normal(size=(e, h)).astype(np.float32)),
    ]
    params = model.load_weights(iter(stream))
    ex = params["layers"][0]["mlp"]["experts"]
    assert ex["gate_proj"]["weight"].shape == (e, h, i)
    assert ex["down_proj"]["weight"].shape == (e, i, h)


def test_phimoe():
    cfg = base("PhiMoEForCausalLM", "phimoe", attention_bias=True)
    cfg.num_experts = 4
    cfg.num_experts_per_tok = 2
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    lp = params["layers"][0]
    assert "bias" in lp["input_layernorm"]  # LayerNorm, not RMSNorm
    assert "bias" in lp["self_attn"]["o_proj"]
    assert "bias" in params["lm_head"]
    assert not model.moe_spec.norm_topk_prob  # top-2 without renorm
    _smoke(cfg)


def test_ernie45():
    cfg = base("Ernie4_5ForCausalLM", "ernie4_5")
    _smoke(cfg)

    cfg = base("Ernie4_5_MoeForCausalLM", "ernie4_5_moe",
               num_hidden_layers=3)
    cfg.extra = {"moe_num_experts": 4, "moe_k": 2,
                 "moe_layer_start_index": 1, "moe_intermediate_size": 32,
                 "moe_num_shared_experts": 1}
    model = from_config(cfg, dtype=jnp.float32)
    assert [model.is_moe_layer(i) for i in range(3)] == [False, True, True]
    params = model.init_params(jax.random.PRNGKey(0))
    moe = params["layers"][1]["mlp"]
    assert "e_score_correction_bias" in moe
    assert "shared_expert" in moe
    _smoke(cfg)


def test_ernie45_moe_bias_names():
    cfg = base("Ernie4_5_MoeForCausalLM", "ernie4_5_moe",
               num_hidden_layers=1)
    cfg.extra = {"moe_num_experts": 2, "moe_k": 1,
                 "moe_layer_start_index": 0, "moe_intermediate_size": 16}
    model = from_config(cfg, dtype=jnp.float32)
    path, _ = model._param_path(
        "model.layers.0.mlp.moe_statics.e_score_correction_bias"
    )
    assert path == ["layers", 0, "mlp", "e_score_correction_bias"]


def test_hunyuan_dense():
    cfg = base("HunYuanDenseV1ForCausalLM", "hunyuan")
    cfg.extra = {"use_qk_norm": True}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].qk_norm
    path, _ = model._param_path(
        "model.layers.0.self_attn.query_layernorm.weight"
    )
    assert path == ["layers", 0, "self_attn", "q_norm"]
    _smoke(cfg)


def test_hunyuan_moe():
    cfg = base("HunYuanMoEV1ForCausalLM", "hunyuan")
    cfg.moe_intermediate_size = 32
    cfg.extra = {"use_qk_norm": False, "moe_topk": [2], "num_experts": 4,
                 "use_mixed_mlp_moe": 1, "num_shared_expert": [1]}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.moe_spec.num_experts == 4 and model.moe_spec.top_k == 2
    params = model.init_params(jax.random.PRNGKey(0))
    assert "shared_expert" in params["layers"][0]["mlp"]
    _smoke(cfg)


def test_minimax_m2():
    cfg = base("MiniMaxM2ForCausalLM", "minimax_m2", head_dim=32)
    cfg.num_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.extra = {"use_qk_norm": True, "rotary_dim": 16,
                 "scoring_func": "sigmoid", "num_local_experts": 4}
    model = from_config(cfg, dtype=jnp.float32)
    assert cfg.partial_rotary_factor == 0.5
    assert model.attn_specs[0].qk_norm
    params = model.init_params(jax.random.PRNGKey(0))
    assert "e_score_correction_bias" in params["layers"][0]["mlp"]
    _smoke(cfg)

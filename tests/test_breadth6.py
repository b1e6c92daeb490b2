"""Breadth batch 6: AfMoE."""

import jax
import jax.numpy as jnp

from vllm_rust_tpu.models import from_config

from tests.test_misc_archs import _smoke, base


def test_afmoe():
    cfg = base("AfmoeForCausalLM", "afmoe", num_hidden_layers=4,
               head_dim=16, sliding_window=8)
    cfg.moe_intermediate_size = 16
    cfg.extra = {"num_experts": 8, "num_experts_per_tok": 2,
                 "num_shared_experts": 1, "num_dense_layers": 1,
                 "route_scale": 1.5, "score_func": "sigmoid",
                 "route_norm": True, "n_group": 2, "topk_group": 1,
                 "mup_enabled": True,
                 "layer_types": ["sliding_attention", "global_attention",
                                 "sliding_attention", "global_attention"]}
    m = from_config(cfg, dtype=jnp.float32)
    # RoPE only on sliding layers; global layers are NoPE
    assert m.attn_specs[0].sliding_window == 8
    assert m.attn_specs[0].rotary is not None
    assert m.attn_specs[1].rotary is None
    assert m.attn_specs[1].sliding_window is None
    assert m.embedding_multiplier == 8.0  # sqrt(64)
    assert [m.is_moe_layer(i) for i in range(4)] == [False, True, True, True]
    params = m.init_params(jax.random.PRNGKey(0))
    sa = params["layers"][0]["self_attn"]
    assert "qkv_proj" in sa and sa["g_proj"]["weight"].shape == (64, 64)
    assert "post_self_attn_layernorm" in params["layers"][0]
    mlp = params["layers"][1]["mlp"]
    assert "e_score_correction_bias" in mlp
    assert mlp["shared_expert"]["gate_proj"]["weight"].shape == (64, 16)
    _smoke(cfg)


def test_afmoe_weight_names():
    cfg = base("AfmoeForCausalLM", "afmoe", num_hidden_layers=2,
               head_dim=16)
    cfg.moe_intermediate_size = 16
    cfg.extra = {"num_experts": 2, "num_experts_per_tok": 1,
                 "num_shared_experts": 1, "num_dense_layers": 2}
    m = from_config(cfg, dtype=jnp.float32)
    import numpy as np
    rng = np.random.default_rng(0)
    h = 64
    stream = [
        ("model.layers.0.self_attn.gate_proj.weight",
         rng.normal(size=(64, h)).astype(np.float32) * 0.05),
        ("model.layers.0.post_attention_layernorm.weight",
         np.ones(h, np.float32)),
        ("model.layers.0.pre_mlp_layernorm.weight",
         np.full(h, 2.0, np.float32)),
        ("model.layers.0.post_mlp_layernorm.weight",
         np.full(h, 3.0, np.float32)),
    ]
    params = m.load_weights(stream)
    lp = params["layers"][0]
    assert lp["self_attn"]["g_proj"]["weight"].shape == (h, 64)
    # ckpt post_attention_layernorm -> post-attn OUTPUT norm slot
    assert float(lp["post_self_attn_layernorm"][0]) == 1.0
    # ckpt pre_mlp_layernorm -> pre-MLP slot
    assert float(lp["post_attention_layernorm"][0]) == 2.0
    assert float(lp["post_mlp_layernorm"][0]) == 3.0

"""Phi-3 Vision, MiniCPM-V, Grok-1 tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from tests.test_misc_archs import _smoke, base


def test_phi3v():
    cfg = ModelConfig.from_dict(
        dict(architectures=["Phi3VForCausalLM"], model_type="phi3_v",
             vocab_size=128, hidden_size=48, intermediate_size=96,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, image_token_index=120,
             img_processor=dict(image_dim_out=32, image_size=28,
                                patch_size=14, num_hidden_layers=2,
                                num_attention_heads=4,
                                intermediate_size=64))
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 3, 28, 28)).astype(np.float32))
    out = model.encode_images(params, px)
    # 2x2 grid, 2x2 merge -> 1 token, text hidden 48
    assert out.shape == (1, 48)
    assert model.tokens_per_image == 1
    assert np.isfinite(np.asarray(out)).all()


def test_minicpmv():
    cfg = ModelConfig.from_dict(
        dict(architectures=["MiniCPMV"], model_type="minicpmv",
             vocab_size=128, hidden_size=48, intermediate_size=96,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, query_num=8, image_token_index=120,
             vision_config=dict(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=4,
                                image_size=28, patch_size=14))
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    px = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 3, 28, 28)).astype(np.float32))
    out = model.encode_images(params, px)
    assert out.shape == (8, 48)  # num_queries x text hidden
    assert model.tokens_per_image == 8
    assert np.isfinite(np.asarray(out)).all()


def test_minicpmv_resampler_weight_names():
    cfg = ModelConfig.from_dict(
        dict(architectures=["MiniCPMV"], model_type="minicpmv",
             vocab_size=64, hidden_size=32, intermediate_size=64,
             num_hidden_layers=1, num_attention_heads=4,
             num_key_value_heads=2, query_num=4,
             vision_config=dict(hidden_size=16, intermediate_size=32,
                                num_hidden_layers=1, num_attention_heads=2,
                                image_size=28, patch_size=14))
    )
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    h = 32
    stream = [
        ("resampler.query", rng.normal(size=(4, h)).astype(np.float32)),
        ("resampler.attn.in_proj_weight",
         rng.normal(size=(3 * h, h)).astype(np.float32)),
        ("resampler.attn.in_proj_bias",
         rng.normal(size=(3 * h,)).astype(np.float32)),
        ("resampler.attn.out_proj.weight",
         rng.normal(size=(h, h)).astype(np.float32)),
        ("resampler.kv_proj.weight",
         rng.normal(size=(h, 16)).astype(np.float32)),
        ("resampler.proj", rng.normal(size=(h, h)).astype(np.float32)),
    ]
    params = model.load_weights(iter(stream))
    p = params["projector"]
    assert p["q_proj"]["weight"].shape == (h, h)
    assert p["kv_proj"]["weight"].shape == (16, h)
    assert float(jnp.abs(p["query"]).sum()) > 0


def test_grok1():
    cfg = base("Grok1ForCausalLM", "grok-1", num_hidden_layers=2)
    cfg.num_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 32
    cfg.extra = {"num_local_experts": 4, "router_logit_softcapping": 30.0,
                 "attn_output_multiplier": 0.5,
                 "embedding_multiplier_scale": 2.0,
                 "output_multiplier_scale": 0.5}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.moe_spec.act == "gelu"
    params = model.init_params(jax.random.PRNGKey(0))
    assert "post_attn_norm" in params["layers"][0]
    assert "post_moe_norm" in params["layers"][0]
    # grok name translation
    path, _ = model._param_path("model.layers.0.pre_attn_norm.weight")
    assert path == ["layers", 0, "input_layernorm"]
    path, _ = model._param_path("model.layers.0.post_moe_norm.weight")
    assert path == ["layers", 0, "post_moe_norm"]
    _smoke(cfg)

"""Breadth batch 3: QWen v1, Dots1, BailingMoE."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from tests.test_misc_archs import _smoke, base


def test_qwen_v1():
    cfg = base("QWenLMHeadModel", "qwen", intermediate_size=192)
    cfg.extra = {"layer_norm_epsilon": 1e-6}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.config.intermediate_size == 96  # halved
    assert model.config.num_key_value_heads == 4  # MHA
    _smoke(cfg)


def test_qwen_v1_weight_names():
    cfg = base("QWenLMHeadModel", "qwen", intermediate_size=192,
               num_hidden_layers=1)
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h, nh, hd = 64, 4, 16
    stream = [
        ("transformer.wte.weight", rng.normal(size=(128, h)).astype(np.float32)),
        ("transformer.h.0.attn.c_attn.weight",
         rng.normal(size=(3 * h, h)).astype(np.float32)),
        ("transformer.h.0.attn.c_attn.bias",
         rng.normal(size=(3 * h,)).astype(np.float32)),
        ("transformer.h.0.attn.c_proj.weight",
         rng.normal(size=(h, h)).astype(np.float32)),
        ("transformer.h.0.mlp.w1.weight",
         rng.normal(size=(96, h)).astype(np.float32)),
        ("transformer.h.0.mlp.w2.weight",
         rng.normal(size=(96, h)).astype(np.float32)),
        ("transformer.h.0.mlp.c_proj.weight",
         rng.normal(size=(h, 96)).astype(np.float32)),
        ("transformer.h.0.ln_1.weight", np.ones(h, np.float32)),
        ("transformer.ln_f.weight", np.ones(h, np.float32)),
    ]
    params = model.load_weights(iter(stream))
    lp = params["layers"][0]
    assert lp["self_attn"]["q_proj"]["weight"].shape == (h, nh * hd)
    assert "bias" in lp["self_attn"]["q_proj"]
    # w2 -> gate, w1 -> up
    np.testing.assert_allclose(
        np.asarray(lp["mlp"]["gate_proj"]["weight"]),
        np.asarray(stream[5][1]).T, rtol=1e-6,
    )


def test_dots1():
    cfg = base("Dots1ForCausalLM", "dots1", num_hidden_layers=3, head_dim=16)
    cfg.num_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 16
    cfg.num_shared_experts = 1
    cfg.first_k_dense_replace = 1
    cfg.scoring_func = "sigmoid"
    cfg.routed_scaling_factor = 2.0
    model = from_config(cfg, dtype=jnp.float32)
    assert [model.is_moe_layer(i) for i in range(3)] == [False, True, True]
    params = model.init_params(jax.random.PRNGKey(0))
    assert "e_score_correction_bias" in params["layers"][1]["mlp"]
    assert "shared_expert" in params["layers"][1]["mlp"]
    assert "q_norm" in params["layers"][0]["self_attn"]
    _smoke(cfg)


def test_bailing_moe():
    cfg = base("BailingMoeForCausalLM", "bailing_moe", num_hidden_layers=2,
               head_dim=16)
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 16
    cfg.extra = {"num_experts": 4, "num_shared_experts": 1,
                 "use_qkv_bias": True, "use_qk_norm": False}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.moe_spec.num_experts == 4
    params = model.init_params(jax.random.PRNGKey(0))
    assert "bias" in params["layers"][0]["self_attn"]["q_proj"]
    assert "q_norm" not in params["layers"][0]["self_attn"]
    _smoke(cfg)

    # fused query_key_value + word_embeddings naming
    rng = np.random.default_rng(1)
    h, nh, nkv, hd = 64, 4, 2, 16
    qkv = rng.normal(size=((nh + 2 * nkv) * hd, h)).astype(np.float32)
    stream = [
        ("model.word_embeddings.weight",
         rng.normal(size=(128, h)).astype(np.float32)),
        ("model.layers.0.attention.query_key_value.weight", qkv),
        ("model.layers.0.attention.dense.weight",
         rng.normal(size=(h, nh * hd)).astype(np.float32)),
    ]
    params = model.load_weights(iter(stream))
    assert params["layers"][0]["self_attn"]["q_proj"]["weight"].shape == (
        h, nh * hd,
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["self_attn"]["k_proj"]["weight"]),
        qkv[nh * hd : (nh + nkv) * hd].T, rtol=1e-6,
    )


def test_jais():
    cfg = ModelConfig.from_dict(
        dict(architectures=["JAISLMHeadModel"], model_type="jais",
             vocab_size=128, n_embd=64, n_layer=2, n_head=4, n_inner=96,
             embeddings_scale=9.87, width_scale=0.11,
             position_embedding_type="alibi", eos_token_id=1)
    )
    model = from_config(cfg, dtype=jnp.float32)
    assert model.embeddings_scale == 9.87 and model.width_scale == 0.11
    params = model.init_params(jax.random.PRNGKey(0))
    assert "wpe" not in params  # alibi, no learned positions
    assert "c_fc2" in params["layers"][0]["mlp"]
    _smoke(cfg)


def test_apertus():
    cfg = base("ApertusForCausalLM", "apertus")
    cfg.extra = {"xielu_eps": 1e-6, "xielu_beta": 0.5}
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "gate_proj" not in params["layers"][0]["mlp"]  # ungated
    assert "q_norm" in params["layers"][0]["self_attn"]
    _smoke(cfg)


def test_arctic():
    cfg = base("ArcticForCausalLM", "arctic", num_hidden_layers=4,
               head_dim=16)
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 16
    cfg.extra = {"num_local_experts": 4, "moe_layer_frequency": 2,
                 "use_residual": True}
    model = from_config(cfg, dtype=jnp.float32)
    assert [model.is_moe_layer(i) for i in range(4)] == [
        False, True, False, True,
    ]
    params = model.init_params(jax.random.PRNGKey(0))
    assert "residual_mlp" in params["layers"][1]
    assert "residual_mlp" not in params["layers"][0]
    _smoke(cfg)


def test_qwen2_reward_model():
    cfg = ModelConfig.from_dict(
        dict(architectures=["Qwen2ForRewardModel"], model_type="qwen2",
             vocab_size=64, hidden_size=32, intermediate_size=64,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, num_labels=1)
    )
    model = from_config(cfg, dtype=jnp.float32)
    assert model.is_reward_model
    params = model.init_params(jax.random.PRNGKey(0))
    # forward + score over the last hidden state
    from tests.test_misc_archs import _smoke  # noqa: F401
    from tests.test_model_forward import make_kv_pages, md_single_seq

    ids = jax.random.randint(jax.random.PRNGKey(1), (6,), 0, 64)
    kv = make_kv_pages(model)
    h, _ = model(params, ids, md_single_seq(6), kv)
    s = model.score(params, h[-1:])
    assert s.shape == (1, 1)
    assert np.isfinite(np.asarray(s)).all()
    # score-head checkpoint names (score.0 / score.2 HF convention)
    rng = np.random.default_rng(0)
    stream = [
        ("score.0.weight", rng.normal(size=(32, 32)).astype(np.float32)),
        ("score.0.bias", rng.normal(size=(32,)).astype(np.float32)),
        ("score.2.weight", rng.normal(size=(1, 32)).astype(np.float32)),
    ]
    p2 = model.load_weights(iter(stream))
    assert p2["score"]["fc2"]["weight"].shape == (32, 1)

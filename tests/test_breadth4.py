"""Breadth batch 4: TeleFLM, InternLM2-VE, MiniCPM3, MiMo-V2-Flash,
ExaoneMoE, Pangu, Ouro, Step1, LFM2-MoE + reference-grouped aliases."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config, speculator_kind

from tests.test_misc_archs import _smoke, base


def test_teleflm_mup():
    cfg = base("TeleFLMForCausalLM", "teleflm")
    cfg.extra = {"use_mup": True, "input_mult": 2.0, "output_mult": 4.0,
                 "mup_scale_factor": 8.0}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.embedding_multiplier == 2.0
    assert cfg.logits_scaling == 2.0  # 8 / 4
    _smoke(cfg)


def test_internlm2_ve():
    cfg = base("InternLM2VEForCausalLM", "internlm2_ve")
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "mlp_ve" in params["layers"][0]
    _smoke(cfg)


def test_minicpm3():
    cfg = base("MiniCPM3ForCausalLM", "minicpm3", num_hidden_layers=2)
    cfg.extra = {"q_lora_rank": 32, "kv_lora_rank": 24,
                 "qk_nope_head_dim": 16, "qk_rope_head_dim": 8,
                 "v_head_dim": 16, "scale_emb": 2.0, "scale_depth": 1.4,
                 "dim_model_base": 32}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.kv_head_info[0] == (4, 24)  # MHA over qk_head_dim
    params = m.init_params(jax.random.PRNGKey(0))
    assert "kv_a_proj_with_mqa" in params["layers"][0]["self_attn"]
    _smoke(cfg)


def test_mimo_v2_flash():
    cfg = base("MiMoV2FlashForCausalLM", "mimo_v2", num_hidden_layers=4,
               head_dim=16)
    cfg.num_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 16
    cfg.extra = {"hybrid_layer_pattern": [0, 1, 0, 1], "sliding_window": 8,
                 "v_head_dim": 8, "v_scale": 1.5,
                 "moe_layer_freq": [0, 1, 1, 1]}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.attn_specs[0].sliding_window is None
    assert m.attn_specs[1].sliding_window == 8
    assert [m.is_moe_layer(i) for i in range(4)] == [False, True, True, True]
    params = m.init_params(jax.random.PRNGKey(0))
    assert params["layers"][0]["self_attn"]["v_proj"]["weight"].shape == (
        64, 2 * 8,
    )
    _smoke(cfg)


def test_exaone_moe():
    cfg = base("ExaoneMoeForCausalLM", "exaone_moe", num_hidden_layers=3)
    cfg.num_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 16
    cfg.norm_topk_prob = True
    cfg.extra = {"is_moe_layer": [False, True, True],
                 "num_shared_experts": 1, "routed_scaling_factor": 1.5}
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "experts" not in params["layers"][0]["mlp"]
    assert "shared_expert" in params["layers"][1]["mlp"]
    assert "q_norm" in params["layers"][0]["self_attn"]
    _smoke(cfg)


def test_pangu_dense_and_moe():
    cfg = base("PanguEmbeddedForCausalLM", "pangu")
    _smoke(cfg)

    cfg = base("PanguUltraMoEForCausalLM", "pangu", num_hidden_layers=3)
    cfg.extra = {"n_routed_experts": 4, "n_shared_experts": 1,
                 "first_k_dense_replace": 1, "routed_scaling_factor": 2.0,
                 "sandwich_norm": True, "norm_topk_prob": True}
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 16
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "pre_mlp_layernorm" in params["layers"][0]
    assert "experts" not in params["layers"][0]["mlp"]
    assert "shared_expert" in params["layers"][1]["mlp"]
    _smoke(cfg)


def test_ouro_multipass():
    cfg = base("OuroForCausalLM", "ouro")
    cfg.extra = {"total_ut_steps": 2}
    m = from_config(cfg, dtype=jnp.float32)
    assert len(m.kv_head_info) == 4  # 2 layers x 2 UT steps
    params = m.init_params(jax.random.PRNGKey(0))
    assert "input_layernorm_2" in params["layers"][0]
    assert "gate_up_proj" in params["layers"][0]["mlp"]
    assert "early_exit_gate" in params
    _smoke(cfg)


def test_step1_sqrt_alibi():
    cfg = base("Step1ForCausalLM", "step1")
    cfg.extra = {"num_attention_groups": 2}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.attn_specs[0].alibi_sqrt and m.attn_specs[0].use_alibi
    assert m.attn_specs[0].rotary is None
    assert m.config.num_key_value_heads == 2
    _smoke(cfg)


def test_lfm2_moe():
    cfg = ModelConfig.from_dict(
        dict(architectures=["Lfm2MoeForCausalLM"], model_type="lfm2_moe",
             vocab_size=128, hidden_size=32, intermediate_size=64,
             num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=2, head_dim=8, eos_token_id=1,
             max_position_embeddings=128, num_experts=4,
             num_experts_per_tok=2, moe_intermediate_size=16,
             num_dense_layers=2, use_expert_bias=True,
             layer_types=["conv", "full_attention", "conv",
                          "full_attention"])
    )
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "experts" not in params["layers"][0]["feed_forward"]
    assert "experts" in params["layers"][2]["feed_forward"]
    assert "e_score_correction_bias" in params["layers"][2]["feed_forward"]
    from tests.test_ssm import teacher_forced_check

    teacher_forced_check(cfg, [3, 1, 4], n=4)


def test_aliases_and_speculators():
    from vllm_rust_tpu.models import _populate, _REGISTRY

    _populate()
    for arch in ("Glm4MoeLiteForCausalLM", "GlmMoeDsaForCausalLM",
                 "NemotronHPuzzleForCausalLM", "PanguProMoEV2ForCausalLM",
                 "ExaoneMoEForCausalLM"):
        assert arch in _REGISTRY, arch
    for arch in ("Eagle3Qwen2_5vlForCausalLM", "EagleDeepseekV3ForCausalLM",
                 "ExaoneMoeMTP", "Step3p5MTP", "Glm4MoeLiteMTPModel",
                 "GlmOcrMTPModel", "OpenPanguMTPModel"):
        assert speculator_kind(arch) is not None, arch

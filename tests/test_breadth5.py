"""Breadth batch 5: Step3-Text, Step-3.5, LongCat-Flash, PLaMo-2/3,
IQuest LoopCoder."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

from tests.test_misc_archs import _smoke, base
from tests.test_ssm import teacher_forced_check


def test_step3_text():
    cfg = base("Step3TextForCausalLM", "step3_text", num_hidden_layers=3,
               head_dim=16)
    cfg.moe_intermediate_size = 16
    cfg.extra = {"share_q_dim": 32, "moe_num_experts": 4, "moe_top_k": 2,
                 "share_expert_dim": 24, "norm_expert_weight": True,
                 "moe_layers_enum": "1,2"}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.kv_head_info == [(1, 16)] * 3  # forced MQA
    assert [m.is_moe_layer(i) for i in range(3)] == [False, True, True]
    params = m.init_params(jax.random.PRNGKey(0))
    sa = params["layers"][0]["self_attn"]
    assert sa["qkv_proj"]["weight"].shape == (64, 32 + 2 * 16)
    assert sa["wq"]["weight"].shape == (32, 4 * 16)
    assert "shared_expert" in params["layers"][1]["mlp"]
    assert "shared_expert_gate" not in params["layers"][1]["mlp"]
    _smoke(cfg)


def test_step3_text_load_weights():
    cfg = base("Step3TextForCausalLM", "step3_text", num_hidden_layers=2,
               head_dim=16)
    cfg.moe_intermediate_size = 16
    cfg.extra = {"share_q_dim": 32, "moe_num_experts": 2, "moe_top_k": 1,
                 "share_expert_dim": 24}
    m = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h, sq, hd, nh = 64, 32, 16, 4

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    stream = [
        ("model.embed_tokens.weight", t(128, h)),
        ("model.norm.weight", np.ones(h, np.float32)),
        ("lm_head.weight", t(128, h)),
    ]
    for li in range(2):
        p = f"model.layers.{li}."
        stream += [
            (p + "self_attn.qkv_proj.weight", t(sq + 2 * hd, h)),
            (p + "self_attn.inter_norm.weight", np.ones(sq, np.float32)),
            (p + "self_attn.wq.weight", t(nh * hd, sq)),
            (p + "self_attn.o_proj.weight", t(h, nh * hd)),
            (p + "input_layernorm.weight", np.ones(h, np.float32)),
            (p + "post_attention_layernorm.weight", np.ones(h, np.float32)),
        ]
    stream += [
        ("model.layers.0.mlp.gate_up_proj.weight", t(2 * 96, h)),
        ("model.layers.0.mlp.down_proj.weight", t(h, 96)),
        ("model.layers.1.moe.gate.weight", t(2, h)),
        ("model.layers.1.moe.share_expert.gate_up_proj.weight", t(2 * 24, h)),
        ("model.layers.1.moe.share_expert.down_proj.weight", t(h, 24)),
    ]
    for j in range(2):
        p = f"model.layers.1.moe.experts.{j}."
        stream += [
            (p + "gate_proj.weight", t(16, h)),
            (p + "up_proj.weight", t(16, h)),
            (p + "down_proj.weight", t(h, 16)),
        ]
    params = m.load_weights(stream)
    assert params["layers"][1]["mlp"]["experts"]["gate_proj"][
        "weight"].shape == (2, h, 16)
    assert params["layers"][0]["mlp"]["gate_proj"]["weight"].shape == (h, 96)
    assert params["layers"][1]["mlp"]["shared_expert"]["gate_proj"][
        "weight"].shape == (h, 24)
    from tests.test_model_forward import make_kv_pages, md_single_seq
    ids = jnp.arange(6, dtype=jnp.int32)
    hid, _ = m(params, ids, md_single_seq(6), make_kv_pages(m))
    assert np.isfinite(np.asarray(hid)).all()


def test_step3p5():
    cfg = base("Step3p5ForCausalLM", "step3p5", num_hidden_layers=3,
               head_dim=16)
    cfg.moe_intermediate_size = 16
    cfg.extra = {"moe_num_experts": 4, "moe_top_k": 2,
                 "share_expert_dim": 24, "use_head_wise_attn_gate": True,
                 "partial_rotary_factors": [0.5, 1.0, 1.0],
                 "use_rope_layers": [True, True, False],
                 "swiglu_limits_shared": [0.0, 7.0, 7.0],
                 "moe_router_activation": "sigmoid"}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.attn_specs[0].rotary.rotary_dim == 8
    assert m.attn_specs[1].rotary.rotary_dim == 16
    assert m.attn_specs[2].rotary is None
    assert m.moe_spec.scoring == "sigmoid"
    assert m._shared_limits == [None, 7.0, 7.0]
    params = m.init_params(jax.random.PRNGKey(0))
    sa = params["layers"][0]["self_attn"]
    assert "qkv_proj" in sa and "q_proj" not in sa
    assert sa["g_proj"]["weight"].shape == (64, 4)  # per-head gate
    assert "e_score_correction_bias" in params["layers"][1]["mlp"]
    assert "rope_p500_cos" in params
    _smoke(cfg)


def test_longcat_flash():
    cfg = base("LongcatFlashForCausalLM", "longcat_flash",
               num_hidden_layers=2, head_dim=16)
    cfg.moe_intermediate_size = 16
    cfg.extra = {"n_routed_experts": 4, "moe_topk": 2}
    m = from_config(cfg, dtype=jnp.float32)
    assert len(m.kv_head_info) == 4  # dual attention -> 2 pools per layer
    params = m.init_params(jax.random.PRNGKey(0))
    lp = params["layers"][0]
    assert "self_attn_0" in lp and "self_attn_1" in lp
    assert "mlps_0" in lp and "mlps_1" in lp
    assert lp["mlp"]["experts"]["gate_proj"]["weight"].shape == (4, 64, 16)
    _smoke(cfg)


def test_longcat_flash_load_weights():
    cfg = base("LongcatFlashForCausalLM", "longcat_flash",
               num_hidden_layers=1, head_dim=16)
    cfg.moe_intermediate_size = 16
    cfg.extra = {"n_routed_experts": 2, "moe_topk": 1}
    m = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    h = 64

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    stream = [
        ("model.embed_tokens.weight", t(128, h)),
        ("model.norm.weight", np.ones(h, np.float32)),
        ("lm_head.weight", t(128, h)),
    ]
    p = "model.layers.0."
    for a in ("0", "1"):
        stream += [
            (p + f"self_attn.{a}.q_proj.weight", t(4 * 16, h)),
            (p + f"self_attn.{a}.k_proj.weight", t(2 * 16, h)),
            (p + f"self_attn.{a}.v_proj.weight", t(2 * 16, h)),
            (p + f"self_attn.{a}.o_proj.weight", t(h, 4 * 16)),
            (p + f"mlps.{a}.gate_proj.weight", t(96, h)),
            (p + f"mlps.{a}.up_proj.weight", t(96, h)),
            (p + f"mlps.{a}.down_proj.weight", t(h, 96)),
            (p + f"input_layernorm.{a}.weight", np.ones(h, np.float32)),
            (p + f"post_attention_layernorm.{a}.weight",
             np.ones(h, np.float32)),
        ]
    stream += [
        (p + "mlp.gate.weight", t(2, h)),
        (p + "mlp.gate.e_score_correction_bias", np.zeros(2, np.float32)),
    ]
    for j in range(2):
        stream += [
            (p + f"mlp.experts.{j}.gate_proj.weight", t(16, h)),
            (p + f"mlp.experts.{j}.up_proj.weight", t(16, h)),
            (p + f"mlp.experts.{j}.down_proj.weight", t(h, 16)),
        ]
    params = m.load_weights(stream)
    assert params["layers"][0]["self_attn_1"]["q_proj"]["weight"].shape == (
        h, 64)
    from tests.test_model_forward import make_kv_pages, md_single_seq
    ids = jnp.arange(5, dtype=jnp.int32)
    hid, _ = m(params, ids, md_single_seq(5), make_kv_pages(m))
    assert np.isfinite(np.asarray(hid)).all()


def test_plamo2():
    mc = ModelConfig.from_dict(dict(
        architectures=["Plamo2ForCausalLM"], model_type="plamo2",
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, eos_token_id=0,
        tie_word_embeddings=True,
        mamba_d_state=8, mamba_d_conv=4, mamba_num_heads=4,
        mamba_step=2, hidden_size_per_head=8,
    ))
    m = from_config(mc, dtype=jnp.float32)
    # mamba_step=2 -> attention at i % 2 == 1
    assert m.kinds == ["mamba", "attention", "mamba", "attention"]
    assert m.d_inner == 32 and m.dt_rank == 64
    params = m.init_params(jax.random.PRNGKey(0))
    lp = params["layers"][0]
    for k in ("pre_mixer_norm", "post_mixer_norm", "pre_mlp_norm",
              "post_mlp_norm"):
        assert k in lp
    assert lp["mamba"]["A_log"].shape == (4,)
    teacher_forced_check(mc, [3, 1, 4, 1, 5], n=6)


def test_plamo2_all_attention_when_step1():
    mc = ModelConfig.from_dict(dict(
        architectures=["Plamo2ForCausalLM"], model_type="plamo2",
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, eos_token_id=0, mamba_step=1,
    ))
    m = from_config(mc, dtype=jnp.float32)
    assert m.kinds == ["attention", "attention"]


def test_plamo3():
    cfg = base("Plamo3ForCausalLM", "plamo3")
    cfg.extra = {"hidden_size_per_head": 16}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.post_sublayer_norms
    assert m.attn_specs[0].qk_norm
    params = m.init_params(jax.random.PRNGKey(0))
    assert "post_self_attn_layernorm" in params["layers"][0]
    assert "post_mlp_layernorm" in params["layers"][0]
    _smoke(cfg)


def test_plamo3_weight_names():
    cfg = base("Plamo3ForCausalLM", "plamo3")
    m = from_config(cfg, dtype=jnp.float32)
    # PLaMo double-nested layers + mixer + fused gate_up names
    assert m._param_path("model.layers.layers.0.mixer.q_proj.weight")[0] == [
        "layers", 0, "self_attn", "q_proj", "weight"]
    assert m._param_path("model.layers.layers.1.pre_mixer_norm.weight")[0] \
        == ["layers", 1, "input_layernorm"]
    assert m._param_path("model.layers.layers.1.post_mlp_norm.weight")[0] \
        == ["layers", 1, "post_mlp_layernorm"]
    rng = np.random.default_rng(2)
    h = 64
    stream = [
        ("model.embed_tokens.weight",
         rng.normal(size=(128, h)).astype(np.float32) * 0.05),
        ("model.layers.layers.0.mlp.gate_up_proj.weight",
         rng.normal(size=(2 * 96, h)).astype(np.float32) * 0.05),
    ]
    params = m.load_weights(stream)
    assert params["layers"][0]["mlp"]["gate_proj"]["weight"].shape == (h, 96)
    assert params["layers"][0]["mlp"]["up_proj"]["weight"].shape == (h, 96)


def test_iquest_loopcoder():
    cfg = base("IQuestLoopCoderForCausalLM", "iquest", num_hidden_layers=2,
               head_dim=16)
    cfg.extra = {"loop_num": 2, "loop_window_size": 8}
    m = from_config(cfg, dtype=jnp.float32)
    assert m.loop_num == 2
    assert len(m.kv_head_info) == 4  # layers x loops
    params = m.init_params(jax.random.PRNGKey(0))
    assert len(params["gate_projections"]) == 2
    assert params["gate_projections"][0]["weight"].shape == (16, 4)
    _smoke(cfg)


def test_iquest_single_loop_is_plain_llama():
    cfg = base("IQuestLoopCoderForCausalLM", "iquest", num_hidden_layers=2)
    cfg.extra = {"loop_num": 1}
    _smoke(cfg)

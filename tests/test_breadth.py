"""Breadth batch 2 architecture tests (Cohere/OLMo/Baichuan/InternLM2/
MiniCPM/DeciLM/SmolLM3/ChatGLM/Arcee/Exaone4)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from tests.test_misc_archs import _smoke, base


def test_cohere():
    cfg = base("CohereForCausalLM", "cohere")
    cfg.extra = {"logit_scale": 0.0625, "use_qk_norm": True,
                 "layer_norm_eps": 1e-5}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.parallel_residual and model.single_ln
    assert model.logit_scale == 0.0625
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["layers"][0]["self_attn"]["q_norm"]["weight"].shape == (4, 16)
    assert params["layers"][0]["self_attn"]["k_norm"]["weight"].shape == (2, 16)
    assert "bias" not in params["layers"][0]["ln_1"]
    _smoke(cfg)


def test_cohere2_nope_global_layers():
    cfg = base("Cohere2ForCausalLM", "cohere2", sliding_window=32,
               num_hidden_layers=4)
    cfg.extra = {"sliding_window_pattern": 4}
    model = from_config(cfg, dtype=jnp.float32)
    # layers 0-2 sliding+rope, layer 3 global+NoPE
    assert model.attn_specs[0].sliding_window == 32
    assert model.attn_specs[0].rotary is not None
    assert model.attn_specs[3].sliding_window is None
    assert model.attn_specs[3].rotary is None
    _smoke(cfg)


def test_olmo():
    cfg = base("OlmoForCausalLM", "olmo")
    cfg.extra = {"clip_qkv": 8.0}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].qkv_clip == 8.0
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["layers"][0]["ln_1"] == {}  # non-parametric LN
    _smoke(cfg)


def test_olmo2_post_norm():
    cfg = base("Olmo2ForCausalLM", "olmo2")
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].qk_norm_full
    params = model.init_params(jax.random.PRNGKey(0))
    lp = params["layers"][0]
    assert "input_layernorm" not in lp
    assert "post_feedforward_layernorm" in lp
    assert lp["self_attn"]["q_norm"].shape == (64,)  # nh*hd flat
    _smoke(cfg)


def test_exaone4():
    cfg = base("Exaone4ForCausalLM", "exaone4", sliding_window=32,
               num_hidden_layers=4, qk_norm=True)
    cfg.extra = {"sliding_window_pattern": "LLLG"}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].sliding_window == 32
    assert model.attn_specs[3].sliding_window is None
    assert model.attn_specs[0].qk_norm
    _smoke(cfg)


def test_baichuan_w_pack():
    cfg = base("BaichuanForCausalLM", "baichuan", num_key_value_heads=4)
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h, nh, hd = 64, 4, 16
    q = rng.normal(size=(nh * hd, h)).astype(np.float32)
    k = rng.normal(size=(nh * hd, h)).astype(np.float32)
    v = rng.normal(size=(nh * hd, h)).astype(np.float32)
    stream = [
        ("model.layers.0.self_attn.W_pack.weight", np.concatenate([q, k, v])),
    ]
    params = model.load_weights(iter(stream))
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["self_attn"]["q_proj"]["weight"]), q.T
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["self_attn"]["k_proj"]["weight"]), k.T
    )
    _smoke(cfg)


def test_baichuan_13b_alibi():
    cfg = base("BaichuanForCausalLM", "baichuan", hidden_size=5120,
               num_attention_heads=40, num_key_value_heads=40,
               intermediate_size=128, num_hidden_layers=1)
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].use_alibi
    assert model.attn_specs[0].rotary is None


def test_internlm2_wqkv():
    cfg = base("InternLM2ForCausalLM", "internlm2", num_key_value_heads=2)
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    h, nh, nkv, hd = 64, 4, 2, 16
    g = nh // nkv
    q = rng.normal(size=(nh * hd, h)).astype(np.float32)
    k = rng.normal(size=(nkv * hd, h)).astype(np.float32)
    v = rng.normal(size=(nkv * hd, h)).astype(np.float32)
    blocks = []
    for i in range(nkv):
        blocks.append(np.concatenate([
            q.reshape(nkv, g, hd, h)[i],
            k.reshape(nkv, 1, hd, h)[i],
            v.reshape(nkv, 1, hd, h)[i],
        ]))
    fused = np.stack(blocks).reshape(nkv * (g + 2) * hd, h)
    stream = [
        ("model.layers.0.attention.wqkv.weight", fused),
        ("model.layers.0.attention.wo.weight",
         rng.normal(size=(h, nh * hd)).astype(np.float32)),
        ("model.layers.0.feed_forward.w1.weight",
         rng.normal(size=(96, h)).astype(np.float32)),
        ("model.tok_embeddings.weight",
         rng.normal(size=(128, h)).astype(np.float32)),
        ("output.weight", rng.normal(size=(128, h)).astype(np.float32)),
    ]
    params = model.load_weights(iter(stream))
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["self_attn"]["q_proj"]["weight"]), q.T
    )
    assert float(jnp.abs(params["embed_tokens"]["weight"]).max()) > 0
    assert float(jnp.abs(params["lm_head"]["weight"]).max()) > 0
    _smoke(cfg)


def test_minicpm_scaling():
    cfg = base("MiniCPMForCausalLM", "minicpm")
    cfg.extra = {"scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 32}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.embedding_multiplier == 12.0
    np.testing.assert_allclose(
        model.residual_multiplier, 1.4 / np.sqrt(2), rtol=1e-6
    )
    assert cfg.logits_scaling == 2.0  # 64 / 32
    _smoke(cfg)


def test_decilm_variable_gqa():
    cfg = base("DeciLMForCausalLM", "decilm", num_hidden_layers=3)
    cfg.extra = {"num_key_value_heads_per_layer": [4, 2, 1]}
    model = from_config(cfg, dtype=jnp.float32)
    assert [s.num_kv_heads for s in model.attn_specs] == [4, 2, 1]
    assert model.kv_head_info == [(4, 16), (2, 16), (1, 16)]
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["layers"][0]["self_attn"]["k_proj"]["weight"].shape == (64, 64)
    assert params["layers"][2]["self_attn"]["k_proj"]["weight"].shape == (64, 16)
    _smoke(cfg)


def test_smollm3_nope_layers():
    cfg = base("SmolLM3ForCausalLM", "smollm3", num_hidden_layers=4)
    cfg.extra = {"no_rope_layer_interval": 4}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].rotary is not None
    assert model.attn_specs[3].rotary is None
    _smoke(cfg)


def test_chatglm():
    cfg = base("ChatGLMForCausalLM", "chatglm", num_key_value_heads=4)
    cfg.extra = {
        "padded_vocab_size": 128, "ffn_hidden_size": 96, "num_layers": 2,
        "kv_channels": 16, "multi_query_attention": True,
        "multi_query_group_num": 2, "add_qkv_bias": True,
        "layernorm_epsilon": 1e-5,
    }
    model = from_config(cfg, dtype=jnp.float32)
    assert cfg.num_key_value_heads == 2
    assert cfg.partial_rotary_factor == 0.5
    assert model.attn_specs[0].interleaved_rope
    assert model.qkv_bias
    _smoke(cfg)


def test_chatglm_checkpoint_names():
    cfg = base("ChatGLMForCausalLM", "chatglm", num_key_value_heads=4)
    cfg.extra = {"multi_query_attention": True, "multi_query_group_num": 2,
                 "ffn_hidden_size": 96, "num_layers": 2}
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    h, nh, nkv, hd, inter = 64, 4, 2, 16, 96
    q = rng.normal(size=(nh * hd, h)).astype(np.float32)
    k = rng.normal(size=(nkv * hd, h)).astype(np.float32)
    v = rng.normal(size=(nkv * hd, h)).astype(np.float32)
    gate = rng.normal(size=(inter, h)).astype(np.float32)
    up = rng.normal(size=(inter, h)).astype(np.float32)
    stream = [
        ("transformer.encoder.layers.0.self_attention.query_key_value.weight",
         np.concatenate([q, k, v])),
        ("transformer.encoder.layers.0.mlp.dense_h_to_4h.weight",
         np.concatenate([gate, up])),
        ("transformer.embedding.word_embeddings.weight",
         rng.normal(size=(128, h)).astype(np.float32)),
        ("transformer.output_layer.weight",
         rng.normal(size=(128, h)).astype(np.float32)),
        ("transformer.encoder.final_layernorm.weight", np.ones(h, np.float32)),
    ]
    params = model.load_weights(iter(stream))
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["self_attn"]["k_proj"]["weight"]), k.T
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["mlp"]["gate_proj"]["weight"]), gate.T
    )
    assert float(jnp.abs(params["lm_head"]["weight"]).max()) > 0


def test_arcee():
    cfg = base("ArceeForCausalLM", "arcee", hidden_act="relu2")
    model = from_config(cfg, dtype=jnp.float32)
    assert model.norm_kind == "rms"
    assert not model.mlp_gated
    _smoke(cfg)


def test_llama_aliases():
    for arch in ("SolarForCausalLM", "LlamaModel", "E5MistralModel",
                 "Qwen2Model", "SeedOssForCausalLM", "XverseForCausalLM"):
        cfg = base(arch, "llama")
        model = from_config(cfg, dtype=jnp.float32)
        assert model is not None


def test_attention_bias_from_config():
    cfg = base("LlamaForCausalLM", "llama", attention_bias=True)
    model = from_config(cfg, dtype=jnp.float32)
    assert model.qkv_bias
    params = model.init_params(jax.random.PRNGKey(0))
    assert "bias" in params["layers"][0]["self_attn"]["q_proj"]
    _smoke(cfg)


# -- MoE breadth ------------------------------------------------------------


def moe_base(arch, model_type, **over):
    d = dict(num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32)
    d.update(over)
    return base(arch, model_type, **d)


def test_glm4_moe():
    cfg = moe_base("Glm4MoeForCausalLM", "glm4_moe",
                   num_shared_experts=1, scoring_func="sigmoid",
                   routed_scaling_factor=1.5, first_k_dense_replace=1,
                   norm_topk_prob=True, n_group=2, topk_group=1)
    cfg.extra = {"use_qk_norm": True, "partial_rotary_factor": 0.5}
    model = from_config(cfg, dtype=jnp.float32)
    assert cfg.qk_norm and cfg.partial_rotary_factor == 0.5
    params = model.init_params(jax.random.PRNGKey(0))
    assert "experts" not in params["layers"][0]["mlp"]  # dense first layer
    moe = params["layers"][1]["mlp"]
    assert "e_score_correction_bias" in moe
    assert "shared_expert" in moe and "shared_expert_gate" not in moe
    _smoke(cfg)


def test_glm4_moe_checkpoint_names():
    cfg = moe_base("Glm4MoeForCausalLM", "glm4_moe", num_hidden_layers=1,
                   num_shared_experts=1, scoring_func="sigmoid")
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h, inter = 64, 32
    stream = [
        ("model.layers.0.mlp.gate.weight",
         rng.normal(size=(4, h)).astype(np.float32)),
        ("model.layers.0.mlp.gate.e_score_correction_bias",
         rng.normal(size=(4,)).astype(np.float32)),
        ("model.layers.0.mlp.shared_experts.gate_proj.weight",
         rng.normal(size=(inter, h)).astype(np.float32)),
    ]
    for j in range(4):
        for nm, shp in (("gate_proj", (inter, h)), ("up_proj", (inter, h)),
                        ("down_proj", (h, inter))):
            stream.append((f"model.layers.0.mlp.experts.{j}.{nm}.weight",
                           rng.normal(size=shp).astype(np.float32)))
    params = model.load_weights(iter(stream))
    moe = params["layers"][0]["mlp"]
    assert float(jnp.abs(moe["e_score_correction_bias"]).max()) > 0
    assert float(jnp.abs(moe["shared_expert"]["gate_proj"]["weight"]).max()) > 0
    assert moe["experts"]["gate_proj"]["weight"].shape == (4, h, inter)


def test_olmoe():
    cfg = moe_base("OlmoeForCausalLM", "olmoe", norm_topk_prob=True)
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].qk_norm_full
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["layers"][0]["self_attn"]["q_norm"].shape == (64,)
    _smoke(cfg)


def test_dbrx():
    cfg = base("DbrxForCausalLM", "dbrx", vocab_size=128)
    cfg.extra = {
        "d_model": 64, "n_heads": 4, "n_layers": 2, "max_seq_len": 256,
        "attn_config": {"kv_n_heads": 2, "clip_qkv": 8.0,
                        "rope_theta": 500000.0},
        "ffn_config": {"ffn_hidden_size": 32, "moe_num_experts": 4,
                       "moe_top_k": 2, "moe_normalize_expert_weights": 1},
    }
    model = from_config(cfg, dtype=jnp.float32)
    assert cfg.num_key_value_heads == 2
    assert model.attn_specs[0].qkv_clip == 8.0
    assert not model.attn_specs[0].qk_norm
    _smoke(cfg)


def test_dbrx_checkpoint_layout():
    cfg = base("DbrxForCausalLM", "dbrx", vocab_size=128)
    cfg.extra = {
        "d_model": 64, "n_heads": 4, "n_layers": 1,
        "attn_config": {"kv_n_heads": 2},
        "ffn_config": {"ffn_hidden_size": 32, "moe_num_experts": 4,
                       "moe_top_k": 2},
    }
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    h, inter, e, nh, nkv, hd = 64, 32, 4, 4, 2, 16
    w1 = rng.normal(size=(e * inter, h)).astype(np.float32)
    v1 = rng.normal(size=(e * inter, h)).astype(np.float32)
    w2 = rng.normal(size=(e * inter, h)).astype(np.float32)
    qkv = rng.normal(size=((nh + 2 * nkv) * hd, h)).astype(np.float32)
    stream = [
        ("transformer.blocks.0.norm_attn_norm.attn.Wqkv.weight", qkv),
        ("transformer.blocks.0.norm_attn_norm.attn.out_proj.weight",
         rng.normal(size=(h, h)).astype(np.float32)),
        ("transformer.blocks.0.norm_attn_norm.norm_1.weight",
         np.ones(h, np.float32)),
        ("transformer.blocks.0.norm_attn_norm.norm_2.weight",
         np.ones(h, np.float32)),
        ("transformer.blocks.0.ffn.router.layer.weight",
         rng.normal(size=(e, h)).astype(np.float32)),
        ("transformer.blocks.0.ffn.experts.mlp.w1", w1),
        ("transformer.blocks.0.ffn.experts.mlp.v1", v1),
        ("transformer.blocks.0.ffn.experts.mlp.w2", w2),
        ("transformer.wte.weight", rng.normal(size=(128, h)).astype(np.float32)),
        ("transformer.norm_f.weight", np.ones(h, np.float32)),
        ("lm_head.weight", rng.normal(size=(128, h)).astype(np.float32)),
    ]
    params = model.load_weights(iter(stream))
    moe = params["layers"][0]["mlp"]
    # w1 expert 0 row 0 -> gate_proj[0, :, 0]
    np.testing.assert_array_equal(
        np.asarray(moe["experts"]["gate_proj"]["weight"][0, :, 0]), w1[0]
    )
    np.testing.assert_array_equal(
        np.asarray(moe["experts"]["down_proj"]["weight"][0, 0, :]), w2[0]
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["self_attn"]["q_proj"]["weight"]),
        qkv[: nh * hd].T,
    )


def test_granitemoe():
    cfg = moe_base("GraniteMoeForCausalLM", "granitemoe", norm_topk_prob=True)
    cfg.extra = {"embedding_multiplier": 12.0, "residual_multiplier": 0.22,
                 "attention_multiplier": 0.0078125}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.residual_multiplier == 0.22
    assert model.attn_specs[0].sm_scale == 0.0078125
    _smoke(cfg)


def test_granitemoe_shared_checkpoint():
    cfg = moe_base("GraniteMoeSharedForCausalLM", "granitemoeshared",
                   num_hidden_layers=1, shared_expert_intermediate_size=48)
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    h, inter, e, si = 64, 32, 4, 48
    inp = rng.normal(size=(e, 2 * inter, h)).astype(np.float32)
    outp = rng.normal(size=(e, h, inter)).astype(np.float32)
    sh_in = rng.normal(size=(2 * si, h)).astype(np.float32)
    sh_out = rng.normal(size=(h, si)).astype(np.float32)
    stream = [
        ("model.layers.0.block_sparse_moe.input_linear.weight", inp),
        ("model.layers.0.block_sparse_moe.output_linear.weight", outp),
        ("model.layers.0.block_sparse_moe.router.layer.weight",
         rng.normal(size=(e, h)).astype(np.float32)),
        ("model.layers.0.shared_mlp.input_linear.weight", sh_in),
        ("model.layers.0.shared_mlp.output_linear.weight", sh_out),
    ]
    params = model.load_weights(iter(stream))
    moe = params["layers"][0]["mlp"]
    # input_linear rows [gate; up] per expert
    np.testing.assert_array_equal(
        np.asarray(moe["experts"]["gate_proj"]["weight"][0]), inp[0, :inter].T
    )
    np.testing.assert_array_equal(
        np.asarray(moe["experts"]["up_proj"]["weight"][0]), inp[0, inter:].T
    )
    np.testing.assert_array_equal(
        np.asarray(moe["experts"]["down_proj"]["weight"][0]), outp[0].T
    )
    np.testing.assert_array_equal(
        np.asarray(moe["shared_expert"]["gate_proj"]["weight"]), sh_in[:si].T
    )
    _smoke(cfg)

"""Architecture-breadth smoke tests (reference registry_completeness.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config, supported_architectures
from tests.test_model_forward import make_kv_pages, md_single_seq


def _smoke(cfg, check_incremental=True):
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (10,), 0, cfg.vocab_size)
    kv = make_kv_pages(model)
    h_full, _ = model(params, ids, md_single_seq(10), kv)
    logits_full = model.compute_logits(params, h_full[-1:])
    assert logits_full.shape[-1] == cfg.vocab_size
    if not check_incremental:
        return
    kv = make_kv_pages(model)
    h, kv = model(params, ids[:6], md_single_seq(6), kv)
    for pos in range(6, 10):
        h, kv = model(params, ids[pos:pos+1], md_single_seq(1, start_pos=pos), kv)
    np.testing.assert_allclose(
        np.asarray(logits_full),
        np.asarray(model.compute_logits(params, h[-1:])),
        rtol=5e-4, atol=5e-4,
    )


def base(arch, model_type, **over):
    d = dict(
        architectures=[arch], model_type=model_type, vocab_size=128,
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, eos_token_id=1,
    )
    d.update(over)
    return ModelConfig(**d)


def test_glm4():
    cfg = base("Glm4ForCausalLM", "glm4")
    model = from_config(cfg, dtype=jnp.float32)
    assert model.post_sublayer_norms
    assert cfg.partial_rotary_factor == 0.5
    params = model.init_params(jax.random.PRNGKey(0))
    assert "post_self_attn_layernorm" in params["layers"][0]
    _smoke(cfg)


def test_granite():
    cfg = base("GraniteForCausalLM", "granite")
    cfg.extra = {"embedding_multiplier": 12.0, "residual_multiplier": 0.22,
                 "attention_multiplier": 0.0078125, "logits_scaling": 16.0}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.residual_multiplier == 0.22
    assert model.attn_specs[0].sm_scale == 0.0078125
    _smoke(cfg)


def test_gpt2():
    cfg = base("GPT2LMHeadModel", "gpt2", num_key_value_heads=4)
    cfg.extra = {"n_embd": 64, "n_layer": 2, "n_head": 4, "n_positions": 256}
    _smoke(cfg)


def test_phi3_fused_weight_split():
    cfg = base("Phi3ForCausalLM", "phi3")
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    nh, nkv, hd, h, inter = 4, 2, 16, 64, 96
    stream = []
    for li in range(2):
        qkv = rng.normal(size=((nh + 2 * nkv) * hd, h)).astype(np.float32)
        gu = rng.normal(size=(2 * inter, h)).astype(np.float32)
        stream.append((f"model.layers.{li}.self_attn.qkv_proj.weight", qkv))
        stream.append((f"model.layers.{li}.mlp.gate_up_proj.weight", gu))
        stream.append((f"model.layers.{li}.self_attn.o_proj.weight",
                       rng.normal(size=(h, nh * hd)).astype(np.float32)))
        stream.append((f"model.layers.{li}.mlp.down_proj.weight",
                       rng.normal(size=(h, inter)).astype(np.float32)))
    params = model.load_weights(iter(stream))
    # q slice of the fused tensor must land in q_proj (transposed)
    got = np.asarray(params["layers"][0]["self_attn"]["q_proj"]["weight"])
    assert got.shape == (h, nh * hd)


def test_registry_breadth():
    archs = supported_architectures()
    expected = [
        "LlamaForCausalLM", "Qwen2ForCausalLM", "Qwen3ForCausalLM",
        "MistralForCausalLM", "GemmaForCausalLM", "Gemma2ForCausalLM",
        "Gemma3ForCausalLM", "Qwen3MoeForCausalLM", "MixtralForCausalLM",
        "DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM",
        "Phi3ForCausalLM", "GPT2LMHeadModel", "Glm4ForCausalLM",
        "GraniteForCausalLM", "YiForCausalLM",
    ]
    for a in expected:
        assert a in archs, f"{a} missing from registry"
    assert len(archs) >= 20

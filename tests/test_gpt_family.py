"""GPT-family (LayerNorm transformer) architecture tests.

Mirrors the reference's per-arch construction + shape tests
(registry_completeness.rs + per-file #[cfg(test)] mods): tiny configs,
random weights, prefill-vs-incremental logits parity, fused-QKV
checkpoint-layout splits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from tests.test_misc_archs import _smoke, base


def test_gpt_neox():
    cfg = base("GPTNeoXForCausalLM", "gpt_neox", num_key_value_heads=4)
    cfg.extra = {"rotary_pct": 0.25, "use_parallel_residual": True,
                 "layer_norm_eps": 1e-5}
    cfg.hidden_act = "gelu"
    model = from_config(cfg, dtype=jnp.float32)
    assert model.parallel_residual
    assert cfg.partial_rotary_factor == 0.25
    _smoke(cfg)


def test_gpt_neox_sequential():
    cfg = base("GPTNeoXForCausalLM", "gpt_neox", num_key_value_heads=4)
    cfg.extra = {"use_parallel_residual": False}
    cfg.hidden_act = "gelu"
    model = from_config(cfg, dtype=jnp.float32)
    assert not model.parallel_residual
    _smoke(cfg)


def test_gptj():
    cfg = base("GPTJForCausalLM", "gptj", num_key_value_heads=4)
    cfg.extra = {"n_embd": 64, "n_layer": 2, "n_head": 4, "n_positions": 256,
                 "rotary_dim": 8}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.single_ln and model.parallel_residual
    assert model.attn_specs[0].interleaved_rope
    assert cfg.partial_rotary_factor == 0.5  # 8 / 16
    _smoke(cfg)


def test_opt():
    cfg = base("OPTForCausalLM", "opt", num_key_value_heads=4)
    cfg.extra = {"ffn_dim": 96, "activation_function": "relu"}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.position == "learned" and model.learned_pos_offset == 2
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["pos_embed"]["weight"].shape[0] == 256 + 2
    _smoke(cfg)


def test_bloom():
    cfg = base("BloomForCausalLM", "bloom", num_key_value_heads=4)
    cfg.extra = {"n_layer": 2, "n_head": 4}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.position == "alibi" and model.embed_ln
    assert model.attn_specs[0].use_alibi
    _smoke(cfg)


def test_mpt():
    cfg = base("MPTForCausalLM", "mpt")
    cfg.extra = {"d_model": 64, "n_heads": 4, "n_layers": 2,
                 "max_seq_len": 256, "expansion_ratio": 2,
                 "attn_config": {"alibi": True, "kv_n_heads": 2}}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.position == "alibi"
    assert cfg.num_key_value_heads == 2
    assert cfg.intermediate_size == 128
    _smoke(cfg)


def test_falcon_multiquery():
    cfg = base("FalconForCausalLM", "falcon", num_key_value_heads=4)
    cfg.extra = {"multi_query": True, "parallel_attn": True, "bias": False}
    model = from_config(cfg, dtype=jnp.float32)
    assert cfg.num_key_value_heads == 1
    assert model.parallel_residual and model.single_ln
    _smoke(cfg)


def test_falcon_new_arch():
    cfg = base("FalconForCausalLM", "falcon", num_key_value_heads=4)
    cfg.extra = {"new_decoder_architecture": True, "num_kv_heads": 2,
                 "parallel_attn": True}
    model = from_config(cfg, dtype=jnp.float32)
    assert cfg.num_key_value_heads == 2
    assert not model.single_ln  # ln_attn + ln_mlp
    _smoke(cfg)


def test_gpt_bigcode():
    cfg = base("GPTBigCodeForCausalLM", "gpt_bigcode", num_key_value_heads=4)
    cfg.extra = {"n_embd": 64, "n_layer": 2, "n_head": 4, "n_positions": 256,
                 "multi_query": True}
    model = from_config(cfg, dtype=jnp.float32)
    assert cfg.num_key_value_heads == 1
    assert model.position == "learned"
    _smoke(cfg)


def test_starcoder2():
    cfg = base("Starcoder2ForCausalLM", "starcoder2",
               hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True)
    cfg.extra = {"use_bias": True}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_bias and model.mlp_bias
    _smoke(cfg)


def test_persimmon():
    cfg = base("PersimmonForCausalLM", "persimmon", num_key_value_heads=4,
               hidden_act="relu2")
    cfg.extra = {"partial_rotary_factor": 0.5}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.qk_layernorm
    params = model.init_params(jax.random.PRNGKey(0))
    assert "bias" in params["layers"][0]["self_attn"]["q_norm"]
    _smoke(cfg)


def test_phi2():
    cfg = base("PhiForCausalLM", "phi", num_key_value_heads=4,
               hidden_act="gelu_new")
    cfg.extra = {"partial_rotary_factor": 0.4}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.parallel_residual and model.single_ln
    _smoke(cfg)


def test_stablelm():
    cfg = base("StablelmForCausalLM", "stablelm")
    cfg.extra = {"rope_pct": 0.25, "use_qkv_bias": True}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.mlp_gated and model.attn_bias
    assert cfg.partial_rotary_factor == 0.25
    _smoke(cfg)


def test_nemotron():
    cfg = base("NemotronForCausalLM", "nemotron", hidden_act="relu2")
    cfg.extra = {"norm_eps": 1e-5}
    model = from_config(cfg, dtype=jnp.float32)
    assert model.norm_kind == "layernorm1p"
    params = model.init_params(jax.random.PRNGKey(0))
    # layernorm1p stores w-1 (zeros at init => identity scaling)
    assert float(jnp.max(jnp.abs(params["layers"][0]["ln_1"]["weight"]))) == 0
    _smoke(cfg)


# -- fused-QKV checkpoint layout tests --------------------------------------


def test_neox_interleaved_qkv_split():
    from vllm_rust_tpu.models.gpt_family import split_qkv_interleaved

    nh, hd, hidden = 4, 8, 32
    rng = np.random.default_rng(0)
    # build the fused tensor FROM known q/k/v, NeoX layout [nh, 3, hd, in]
    q = rng.normal(size=(nh * hd, hidden))
    k = rng.normal(size=(nh * hd, hidden))
    v = rng.normal(size=(nh * hd, hidden))
    fused = np.stack(
        [q.reshape(nh, hd, hidden), k.reshape(nh, hd, hidden),
         v.reshape(nh, hd, hidden)],
        axis=1,
    ).reshape(nh * 3 * hd, hidden)
    q2, k2, v2 = split_qkv_interleaved(fused, nh, nh, hd)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(k2, k)
    np.testing.assert_array_equal(v2, v)


def test_falcon_new_arch_qkv_split():
    from vllm_rust_tpu.models.gpt_family import split_qkv_falcon

    nh, nkv, hd, hidden = 4, 2, 8, 32
    g = nh // nkv
    rng = np.random.default_rng(1)
    q = rng.normal(size=(nh * hd, hidden))
    k = rng.normal(size=(nkv * hd, hidden))
    v = rng.normal(size=(nkv * hd, hidden))
    # [nkv, g+2, hd, in]: g query groups then k then v per kv head
    blocks = []
    for kv_i in range(nkv):
        qs = q.reshape(nkv, g, hd, hidden)[kv_i]
        blocks.append(
            np.concatenate(
                [qs, k.reshape(nkv, 1, hd, hidden)[kv_i],
                 v.reshape(nkv, 1, hd, hidden)[kv_i]],
                axis=0,
            )
        )
    fused = np.stack(blocks).reshape(nkv * (g + 2) * hd, hidden)
    q2, k2, v2 = split_qkv_falcon(fused, nh, nkv, hd, True)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(k2, k)
    np.testing.assert_array_equal(v2, v)


def test_neox_checkpoint_end_to_end():
    """Load a synthetic HF-named NeoX checkpoint and compare against
    directly placing the same values."""
    cfg = base("GPTNeoXForCausalLM", "gpt_neox", num_key_value_heads=4)
    cfg.hidden_act = "gelu"
    cfg.extra = {"rotary_pct": 1.0}
    model = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    h, nh, hd, inter, v = 64, 4, 16, 96, 128

    stream = [
        ("gpt_neox.embed_in.weight", rng.normal(size=(v, h)).astype(np.float32)),
        ("gpt_neox.final_layer_norm.weight", np.ones(h, np.float32)),
        ("gpt_neox.final_layer_norm.bias", np.zeros(h, np.float32)),
        ("embed_out.weight", rng.normal(size=(v, h)).astype(np.float32)),
    ]
    q_ref = {}
    for li in range(2):
        pre = f"gpt_neox.layers.{li}"
        q = rng.normal(size=(nh * hd, h)).astype(np.float32)
        k = rng.normal(size=(nh * hd, h)).astype(np.float32)
        vv = rng.normal(size=(nh * hd, h)).astype(np.float32)
        fused = np.stack(
            [q.reshape(nh, hd, h), k.reshape(nh, hd, h), vv.reshape(nh, hd, h)],
            axis=1,
        ).reshape(3 * nh * hd, h)
        q_ref[li] = q
        stream += [
            (f"{pre}.attention.query_key_value.weight", fused),
            (f"{pre}.attention.query_key_value.bias",
             np.zeros(3 * nh * hd, np.float32)),
            (f"{pre}.attention.dense.weight",
             rng.normal(size=(h, nh * hd)).astype(np.float32)),
            (f"{pre}.attention.dense.bias", np.zeros(h, np.float32)),
            (f"{pre}.input_layernorm.weight", np.ones(h, np.float32)),
            (f"{pre}.input_layernorm.bias", np.zeros(h, np.float32)),
            (f"{pre}.post_attention_layernorm.weight", np.ones(h, np.float32)),
            (f"{pre}.post_attention_layernorm.bias", np.zeros(h, np.float32)),
            (f"{pre}.mlp.dense_h_to_4h.weight",
             rng.normal(size=(inter, h)).astype(np.float32)),
            (f"{pre}.mlp.dense_h_to_4h.bias", np.zeros(inter, np.float32)),
            (f"{pre}.mlp.dense_4h_to_h.weight",
             rng.normal(size=(h, inter)).astype(np.float32)),
            (f"{pre}.mlp.dense_4h_to_h.bias", np.zeros(h, np.float32)),
        ]
    params = model.load_weights(iter(stream))
    for li in range(2):
        got = np.asarray(params["layers"][li]["self_attn"]["q_proj"]["weight"])
        np.testing.assert_array_equal(got, q_ref[li].T)
    # embed landed (not zeros)
    assert float(jnp.abs(params["embed_tokens"]["weight"]).max()) > 0
    assert float(jnp.abs(params["lm_head"]["weight"]).max()) > 0


def test_gpt_family_engine_generate():
    """One arch through the full engine: greedy generation determinism."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.request import SamplingParams

    cfg = base("BloomForCausalLM", "bloom", num_key_value_heads=4)
    cfg.extra = {"n_layer": 2, "n_head": 4}
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    p = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    a = LLMEngine(model, params, ec).generate([[1, 2, 3, 4]], p)[0].token_ids
    b = LLMEngine(model, params, ec).generate([[1, 2, 3, 4]], p)[0].token_ids
    assert a == b and len(a) == 8

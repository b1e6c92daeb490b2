"""Gemma-4 structural + numerical tests.

Mirrors the reference's in-module tests for models/gemma4.rs: layer
pattern, dual rope, KV sharing geometry, MoE routing, PLE stream, and
the incremental-decode == full-prefill invariant that anchors every
architecture in this repo.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config
from tests.test_model_forward import make_kv_pages, md_single_seq


def gemma4_config(**over):
    extra = {
        "sliding_window_pattern": 2,  # even layers sliding, odd full
        "rope_parameters": {
            "full_attention": {
                "rope_theta": 1000000.0,
                "rope_type": "proportional",
                "partial_rotary_factor": 0.5,
            },
            "sliding_attention": {"rope_theta": 10000.0},
        },
        "attn_logit_softcapping": 50.0,
        "final_logit_softcapping": 30.0,
        "hidden_size_per_layer_input": 8,
        "vocab_size_per_layer_input": 128,
    }
    extra.update(over.pop("extra", {}))
    d = dict(
        architectures=["Gemma4ForCausalLM"],
        model_type="gemma4",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        sliding_window=16,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        eos_token_id=1,
    )
    d.update(over)
    cfg = ModelConfig(**d)
    cfg.extra = extra
    return cfg


def _forward_parity(model, params):
    """full prefill == prefill(n-1) + decode(1)."""
    kv = make_kv_pages(model)
    ids = jax.random.randint(jax.random.PRNGKey(1), (10,), 0, 256)
    h_full, _ = model(params, ids, md_single_seq(10), kv)
    logits_full = model.compute_logits(params, h_full[-1:])

    kv = make_kv_pages(model)
    _, kv = model(params, ids[:9], md_single_seq(9), kv)
    h_inc, _ = model(params, ids[9:], md_single_seq(1, start_pos=9), kv)
    logits_inc = model.compute_logits(params, h_inc[-1:])
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_inc), rtol=2e-4, atol=2e-4
    )


def test_layer_pattern_and_scale():
    model = from_config(gemma4_config(), dtype=jnp.float32)
    windows = [s.sliding_window for s in model.attn_specs]
    # i % 2 == 0 -> sliding (reference convention, gemma4.rs:459-467)
    assert windows == [16, None, 16, None]
    assert all(s.sm_scale == 1.0 for s in model.attn_specs)
    assert all(s.qk_norm for s in model.attn_specs)
    assert all(s.v_norm_unweighted for s in model.attn_specs)
    # proportional rope: full layers rotate only half the head dims
    assert model.attn_specs[0].rotary.rotary_dim == 16
    assert model.attn_specs[1].rotary.rotary_dim == 8
    assert model.norm_offset == 0.0  # plain w*x norms, NOT (1+w)


def test_proportional_rope_table():
    """inv_freq denominator is head_dim, not rotary_dim
    (rotary.rs:150-157)."""
    model = from_config(gemma4_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    cos_full = np.asarray(params["rope_cos_full"])
    # rotary_dim=8 -> 4 freq pairs; freq_i = pos / theta^(2i/16)
    theta, hd = 1000000.0, 16
    pos = 100
    expected = np.cos(pos / theta ** (np.arange(0, 8, 2) / hd))
    np.testing.assert_allclose(cos_full[pos], expected, rtol=1e-5)
    # sliding table is full-width (8 pairs at theta=1e4)
    assert params["rope_cos"].shape[-1] == 8


def test_forward_parity_plain():
    model = from_config(gemma4_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    _forward_parity(model, params)


def test_kv_sharing_geometry_and_parity():
    cfg = gemma4_config(
        num_hidden_layers=6,
        extra={"num_kv_shared_layers": 2},
    )
    model = from_config(cfg, dtype=jnp.float32)
    # layers: 0 s, 1 f, 2 s, 3 f, 4 s(shared->2), 5 f(shared->3)
    assert model._share == [None, None, None, None, 2, 3]
    assert len(model.kv_head_info) == 4  # shared layers own no pool
    params = model.init_params(jax.random.PRNGKey(0))
    # shared layers carry no k/v proj or k_norm
    assert "k_proj" not in params["layers"][4]["self_attn"]
    assert "k_norm" not in params["layers"][5]["self_attn"]
    _forward_parity(model, params)


def test_heterogeneous_full_layer_geometry():
    cfg = gemma4_config(
        extra={"global_head_dim": 32, "num_global_key_value_heads": 1}
    )
    model = from_config(cfg, dtype=jnp.float32)
    assert model.kv_head_info == [(2, 16), (1, 32), (2, 16), (1, 32)]
    params = model.init_params(jax.random.PRNGKey(0))
    _forward_parity(model, params)


def test_moe_block_parity_and_routing():
    cfg = gemma4_config(
        extra={
            "enable_moe_block": True,
            "num_experts": 4,
            "top_k_experts": 2,
            "moe_intermediate_size": 32,
        }
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "moe" in params["layers"][0]
    _forward_parity(model, params)

    # routing semantics: softmax over ALL experts, renormalized over the
    # top-k, folded with per_expert_scale (gemma4.rs:729-795)
    mp = params["layers"][0]["moe"]
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 64), jnp.float32)
    out = model._moe(mp, x, x)
    assert out.shape == (5, 64)

    # manual single-token reference
    rn = x[0:1]
    xf = rn.astype(jnp.float32)
    rms = xf * jax.lax.rsqrt(jnp.mean(xf**2, -1, keepdims=True) + 1e-6)
    scaled = rms * (64**-0.5) * mp["router"]["scale"]
    logits = np.asarray(scaled @ mp["router"]["proj"]["weight"])[0]
    topi = np.argsort(-logits)[:2]
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    sel = probs[topi] / probs[topi].sum()
    ref = np.zeros(64, np.float32)
    for j, e in enumerate(topi):
        g = np.asarray(x[0] @ mp["gate_proj"][e])
        u = np.asarray(x[0] @ mp["up_proj"][e])
        import math as _m

        act = g * 0.5 * (1 + np.vectorize(_m.erf)(g / np.sqrt(2))) * u
        ref += (
            sel[j]
            * float(mp["per_expert_scale"][e])
            * np.asarray(act @ mp["down_proj"][e])
        )
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=2e-3, atol=2e-3)


def test_ple_stream_contributes():
    model = from_config(gemma4_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "embed_tokens_per_layer" in params
    kv = make_kv_pages(model)
    ids = jnp.arange(6, dtype=jnp.int32)
    h1, _ = model(params, ids, md_single_seq(6), kv)
    # zero the PLE embedding table -> output must change
    p2 = dict(params)
    p2["embed_tokens_per_layer"] = {
        "weight": jnp.zeros_like(params["embed_tokens_per_layer"]["weight"])
    }
    kv = make_kv_pages(model)
    h2, _ = model(p2, ids, md_single_seq(6), kv)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_double_wide_mlp_on_shared_layers():
    cfg = gemma4_config(
        num_hidden_layers=4,
        extra={"num_kv_shared_layers": 2, "use_double_wide_mlp": True},
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["layers"][0]["mlp"]["gate_proj"]["weight"].shape == (64, 96)
    assert params["layers"][3]["mlp"]["gate_proj"]["weight"].shape == (64, 192)
    _forward_parity(model, params)


def test_vlm_wrapper():
    extra = {
        "text_config": {
            "architectures": ["Gemma4ForCausalLM"],
            "model_type": "gemma4",
            "vocab_size": 256,
            "hidden_size": 64,
            "intermediate_size": 96,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "head_dim": 16,
            "max_position_embeddings": 256,
            "sliding_window": 16,
            "tie_word_embeddings": True,
            "sliding_window_pattern": 2,
        },
        "vision_config": {
            "hidden_size": 32,
            "intermediate_size": 64,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 28,
            "patch_size": 14,
        },
        "image_token_id": 99,
        "mm_tokens_per_image": 4,
    }
    cfg = ModelConfig(
        architectures=["Gemma4ForConditionalGeneration"],
        model_type="gemma4_vlm",
        vocab_size=256,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        eos_token_id=1,
    )
    cfg.extra = extra
    model = from_config(cfg, dtype=jnp.float32)
    assert model.is_multimodal
    assert model.image_token_index == 99
    params = model.init_params(jax.random.PRNGKey(0))
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28), jnp.float32)
    emb = model.encode_images(params, px)
    assert emb.shape[-1] == 64
    # text path drives the inner gemma4
    kv = make_kv_pages(model)
    ids = jnp.arange(6, dtype=jnp.int32)
    h, _ = model(params, ids, md_single_seq(6), kv)
    logits = model.compute_logits(params, h[-1:])
    assert logits.shape == (1, 256)


def test_registry_strings():
    from vllm_rust_tpu.models import _populate, _REGISTRY

    _populate()
    for s in (
        "Gemma4ForCausalLM",
        "Gemma4TextModel",
        "Gemma4ForConditionalGeneration",
        "Gemma4UnifiedForConditionalGeneration",
        "Gemma4UnifiedTextModel",
    ):
        assert s in _REGISTRY, s

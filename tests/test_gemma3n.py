"""Gemma3n: AltUp streams, Laurel, per-layer inputs, v-norm, VLM wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

from tests.test_model_forward import make_kv_pages, md_single_seq


def _cfg(**over):
    d = dict(
        architectures=["Gemma3nForCausalLM"], model_type="gemma3n_text",
        vocab_size=128, hidden_size=64, intermediate_size=[96, 80],
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, eos_token_id=1,
        tie_word_embeddings=True, sliding_window=8,
        altup_num_inputs=2, laurel_rank=8, hidden_size_per_layer_input=16,
        sliding_window_pattern=2,
    )
    d.update(over)
    return ModelConfig.from_dict(d)


def test_gemma3n_structure():
    cfg = _cfg()
    m = from_config(cfg, dtype=jnp.float32)
    # i % pattern == 0 sliding (gemma3n convention, unlike gemma3's 5:1)
    assert cfg.layer_types == ["sliding_attention", "full_attention"]
    assert m.attn_specs[0].sliding_window == 8
    assert m.attn_specs[0].sm_scale == 1.0
    assert m.attn_specs[0].v_norm_unweighted
    assert m.intermediate_sizes == [96, 80]
    params = m.init_params(jax.random.PRNGKey(0))
    lp = params["layers"][0]
    assert lp["mlp"]["gate_proj"]["weight"].shape == (64, 96)
    assert params["layers"][1]["mlp"]["gate_proj"]["weight"].shape == (64, 80)
    assert lp["altup"]["prediction_coefs"]["weight"].shape == (2, 4)
    assert lp["laurel"]["linear_left"]["weight"].shape == (64, 8)
    assert params["per_layer_model_projection"]["weight"].shape == (
        64, 2 * 16)


def test_gemma3n_incremental_matches_full():
    m = from_config(_cfg(), dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (10,), 0, 128)
    kv = make_kv_pages(m)
    h_full, _ = m(params, ids, md_single_seq(10), kv)
    lf = m.compute_logits(params, h_full[-1:])
    kv = make_kv_pages(m)
    h, kv = m(params, ids[:6], md_single_seq(6), kv)
    for pos in range(6, 10):
        h, kv = m(params, ids[pos:pos + 1],
                  md_single_seq(1, start_pos=pos), kv)
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(m.compute_logits(params, h[-1:])),
        rtol=5e-4, atol=5e-4,
    )


def test_gemma3n_load_weights():
    m = from_config(_cfg(), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h, hd, pli, r, na = 64, 16, 16, 8, 2

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    stream = [
        ("model.embed_tokens.weight", t(128, h)),
        ("model.norm.weight", np.zeros(h, np.float32)),
        ("model.altup_projections.0.weight", t(h, h)),
        ("model.altup_unembed_projections.0.weight", t(h, h)),
        ("model.self_decoder.per_layer_model_projection.weight",
         t(2 * pli, h)),
        ("model.self_decoder.per_layer_projection_norm.weight",
         np.zeros(pli, np.float32)),
    ]
    for li in range(2):
        p = f"model.layers.{li}."
        inter = [96, 80][li]
        stream += [
            (p + "self_attn.q_proj.weight", t(4 * hd, h)),
            (p + "self_attn.k_proj.weight", t(2 * hd, h)),
            (p + "self_attn.v_proj.weight", t(2 * hd, h)),
            (p + "self_attn.o_proj.weight", t(h, 4 * hd)),
            (p + "self_attn.q_norm.weight", np.zeros(hd, np.float32)),
            (p + "self_attn.k_norm.weight", np.zeros(hd, np.float32)),
            (p + "mlp.gate_proj.weight", t(inter, h)),
            (p + "mlp.up_proj.weight", t(inter, h)),
            (p + "mlp.down_proj.weight", t(h, inter)),
            (p + "laurel.linear_left.weight", t(r, h)),
            (p + "laurel.linear_right.weight", t(h, r)),
            (p + "laurel.post_laurel_norm.weight", np.zeros(h, np.float32)),
            (p + "altup.correction_coefs.weight", t(na, na)),
            (p + "altup.prediction_coefs.weight", t(na * na, na)),
            (p + "altup.modality_router.weight", t(na, h)),
            (p + "altup.router_norm.weight", np.zeros(h, np.float32)),
            (p + "altup.correct_output_scale", np.ones(h, np.float32)),
            (p + "per_layer_input_gate.weight", t(pli, h)),
            (p + "per_layer_projection.weight", t(h, pli)),
            (p + "input_layernorm.weight", np.zeros(h, np.float32)),
            (p + "post_attention_layernorm.weight", np.zeros(h, np.float32)),
            (p + "pre_feedforward_layernorm.weight", np.zeros(h, np.float32)),
            (p + "post_feedforward_layernorm.weight",
             np.zeros(h, np.float32)),
            (p + "post_per_layer_input_norm.weight",
             np.zeros(h, np.float32)),
        ]
    params = m.load_weights(stream)
    assert params["per_layer_model_projection"]["weight"].shape == (h, 2 * pli)
    ids = jnp.arange(6, dtype=jnp.int32)
    hid, _ = m(params, ids, md_single_seq(6), make_kv_pages(m))
    assert np.isfinite(np.asarray(hid)).all()


def test_gemma3n_vlm():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Gemma3nForConditionalGeneration"],
        model_type="gemma3n",
        text_config=dict(
            model_type="gemma3n_text", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=256, tie_word_embeddings=True,
            sliding_window=8, altup_num_inputs=2, laurel_rank=8,
            hidden_size_per_layer_input=16, sliding_window_pattern=2,
        ),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14),
        audio_config=dict(hidden_size=24),
        image_token_index=99, vocab_size=128, eos_token_id=1,
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.is_multimodal
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    img_embeds = m.encode_images(params, pix)
    assert img_embeds.shape == (4, 64)  # (28/14)^2 patches -> text hidden
    audio = jax.random.normal(jax.random.PRNGKey(2), (5, 24))
    au = m.encode_audio(params, audio)
    assert au.shape == (5, 64)
    # injected forward == engine embeds convention (mask, override)
    ids = jnp.array([1, 99, 99, 99, 99, 2], jnp.int32)
    mask = ids == 99
    override = jnp.zeros((6, 64), jnp.float32).at[1:5].set(img_embeds)
    kv = make_kv_pages(m)
    hid, _ = m(params, ids, md_single_seq(6), kv, embeds=(mask, override))
    logits = m.compute_logits(params, hid[-1:])
    assert np.isfinite(np.asarray(logits)).all()

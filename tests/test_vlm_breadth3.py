"""VLM breadth 3: Qwen3-VL, GLM-4.1V, Keye, AyaVision, Fuyu."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

_TEXT = dict(
    model_type="qwen3", vocab_size=160, hidden_size=32,
    intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
    eos_token_id=1, tie_word_embeddings=True,
)


def _mm_forward(m, params, img_embeds, n_img_tokens):
    from tests.test_model_forward import make_kv_pages, md_single_seq

    ids = jnp.array([1] + [2] * n_img_tokens + [3], jnp.int32)
    mask = ids == 2
    t = ids.shape[0]
    h = img_embeds.shape[-1]
    override = jnp.zeros((t, h), jnp.float32).at[1:1 + n_img_tokens].set(
        img_embeds[:n_img_tokens])
    hid, _ = m(params, ids, md_single_seq(t), make_kv_pages(m),
               embeds=(mask, override))
    logits = m.compute_logits(params, hid[-1:])
    assert np.isfinite(np.asarray(logits)).all()


def test_qwen3_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Qwen3VLForConditionalGeneration"],
        model_type="qwen3_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=dict(_TEXT),
        vision_config=dict(hidden_size=16, out_hidden_size=32, depth=2,
                           num_heads=2, intermediate_size=32,
                           patch_size=14, spatial_merge_size=2,
                           image_size=56),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.vision.v3
    assert m.lm.attn_specs[0].qk_norm  # Qwen3 backbone
    params = m.init_params(jax.random.PRNGKey(0))
    assert "fc1" in params["vision_tower"]["layers"][0]
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)  # (56/14)^2 / 4 merged
    _mm_forward(m, params, emb, 4)


def test_qwen3_vl_tower_weight_names():
    from vllm_rust_tpu.models.vlm_breadth import Qwen2VLVisionTower

    tower = Qwen2VLVisionTower(dict(hidden_size=16, out_hidden_size=32,
                                    depth=1, num_heads=2,
                                    intermediate_size=32, patch_size=14,
                                    spatial_merge_size=2, image_size=28),
                               dtype=jnp.float32, v3=True)
    rng = np.random.default_rng(0)
    h = 16
    stream = [
        ("patch_embed.proj.weight",
         rng.normal(size=(h, 3 * 2 * 14 * 14)).astype(np.float32) * 0.05),
        ("patch_embed.proj.bias", np.zeros(h, np.float32)),
        ("blocks.0.mlp.linear_fc1.weight",
         rng.normal(size=(32, h)).astype(np.float32) * 0.05),
        ("blocks.0.mlp.linear_fc2.weight",
         rng.normal(size=(h, 32)).astype(np.float32) * 0.05),
        ("merger.norm.weight", np.ones(h, np.float32)),
        ("merger.linear_fc1.weight",
         rng.normal(size=(4 * h, 4 * h)).astype(np.float32) * 0.05),
        ("merger.linear_fc2.weight",
         rng.normal(size=(32, 4 * h)).astype(np.float32) * 0.05),
    ]
    params = tower.load_weights(stream)
    assert params["layers"][0]["fc1"]["weight"].shape == (h, 32)
    assert params["merger_fc2"]["weight"].shape == (4 * h, 32)
    assert "bias" in params["patch_embed"]


def test_glm4v():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Glm4vForConditionalGeneration"],
        model_type="glm4v", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=dict(_TEXT, model_type="glm4"),
        vision_config=dict(hidden_size=16, out_hidden_size=32,
                           intermediate_size=24, depth=2, num_heads=2,
                           patch_size=14, spatial_merge_size=2,
                           image_size=56),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)
    _mm_forward(m, params, emb, 4)


def test_glm4v_moe_and_aliases():
    from vllm_rust_tpu.models import supported_architectures

    archs = supported_architectures()
    for a in ("Glm4vMoeForConditionalGeneration", "GLM4VForCausalLM",
              "Glm4VForConditionalGeneration",
              "LlavaNextVideoForConditionalGeneration",
              "RForConditionalGeneration", "BeeForConditionalGeneration",
              "Qwen3VLMoeForConditionalGeneration"):
        assert a in archs, a


def test_keye_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["KeyeVL1_5ForConditionalGeneration"],
        model_type="keye_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=dict(_TEXT),
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=56, patch_size=14),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)  # 16 patches / 2x2 merge
    _mm_forward(m, params, emb, 4)


def test_aya_vision():
    cfg = ModelConfig.from_dict(dict(
        architectures=["AyaVisionForConditionalGeneration"],
        model_type="aya_vision", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        downsample_factor=2, alignment_intermediate_size=48,
        text_config=dict(_TEXT, model_type="cohere",
                         layer_norm_eps=1e-5),
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=56, patch_size=14),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.use_layernorm
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)
    _mm_forward(m, params, emb, 4)


def test_fuyu():
    cfg = ModelConfig.from_dict(dict(
        architectures=["FuyuForCausalLM"], model_type="fuyu",
        vocab_size=160, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=8, max_position_embeddings=128,
        eos_token_id=1, patch_size=8, image_size=16,
        hidden_act="relu2",
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.vision is None
    params = m.init_params(jax.random.PRNGKey(0))
    pe = params["projector"]["vision_embed_tokens"]
    assert pe["weight"].shape == (8 * 8 * 3, 32)
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)  # 2x2 patch grid
    _mm_forward(m, params, emb, 4)

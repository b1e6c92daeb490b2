"""VLM breadth 4: DeepSeek-VL2, Kimi-VL, ERNIE-4.5-VL, Eagle2.5-VL,
Bagel, NVLM-D, Dots-OCR, HCX-Vision."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

_VIS = dict(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14)


def _text(**over):
    d = dict(
        model_type="qwen2", vocab_size=160, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
        eos_token_id=1, tie_word_embeddings=True,
    )
    d.update(over)
    return d


def _check(m, n_img, emb_dim=32):
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (n_img, emb_dim), emb.shape
    from tests.test_model_forward import make_kv_pages, md_single_seq

    ids = jnp.array([1] + [2] * min(n_img, 4) + [3], jnp.int32)
    mask = ids == 2
    t = ids.shape[0]
    override = jnp.zeros((t, emb_dim), jnp.float32).at[1:t - 1].set(
        emb[:t - 2])
    hid, _ = m(params, ids, md_single_seq(t), make_kv_pages(m),
               embeds=(mask, override))
    logits = m.compute_logits(params, hid[-1:])
    assert np.isfinite(np.asarray(logits)).all()


def test_deepseek_vl2():
    cfg = ModelConfig.from_dict(dict(
        architectures=["DeepseekVLV2ForCausalLM"], model_type="deepseek_vl2",
        vocab_size=160, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, eos_token_id=1,
        language_config=_text(model_type="deepseek_v2", q_lora_rank=None,
                              kv_lora_rank=16, qk_nope_head_dim=8,
                              qk_rope_head_dim=4, v_head_dim=8,
                              num_key_value_heads=4),
        vision_config=dict(_VIS),
        projector_config=dict(downsample_ratio=2, depth=2,
                              intermediate_size=64),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _check(m, 4)


def test_kimi_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["KimiVLForConditionalGeneration"],
        model_type="kimi_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        media_placeholder_token_id=2,
        text_config=_text(model_type="deepseek_v2", q_lora_rank=None,
                          kv_lora_rank=16, qk_nope_head_dim=8,
                          qk_rope_head_dim=4, v_head_dim=8,
                          num_key_value_heads=4),
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=56, patch_size=14,
                           merge_kernel_size=[2, 2]),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _check(m, 4)


def test_kimi_vl_tower_weights():
    from vllm_rust_tpu.models.vlm_breadth4 import MoonVitTower

    tower = MoonVitTower(dict(hidden_size=16, intermediate_size=32,
                              num_hidden_layers=1, num_attention_heads=2,
                              image_size=28, patch_size=14),
                         dtype=jnp.float32)
    rng = np.random.default_rng(0)
    stream = [
        ("patch_embed.proj.weight",
         rng.normal(size=(16, 3, 14, 14)).astype(np.float32) * 0.02),
        ("patch_embed.proj.bias", np.zeros(16, np.float32)),
        ("patch_embed.pos_emb.weight",
         rng.normal(size=(4, 16)).astype(np.float32) * 0.02),
        ("encoder.blocks.0.wqkv.weight",
         rng.normal(size=(48, 16)).astype(np.float32) * 0.02),
        ("encoder.blocks.0.mlp.fc0.weight",
         rng.normal(size=(32, 16)).astype(np.float32) * 0.02),
        ("encoder.final_layernorm.weight", np.ones(16, np.float32)),
    ]
    params = tower.load_weights(stream)
    assert params["layers"][0]["wqkv"]["weight"].shape == (16, 48)
    assert params["layers"][0]["fc0"]["weight"].shape == (16, 32)


def test_ernie45_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Ernie4_5_VLMoeForConditionalGeneration"],
        model_type="ernie4_5_vl", vocab_size=160, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
        eos_token_id=1, tie_word_embeddings=True, im_patch_id=2,
        spatial_conv_size=2, moe_num_experts=4, moe_k=2,
        moe_intermediate_size=16, moe_layer_start_index=1,
        vision_config=dict(_VIS, depth=2, num_heads=2),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _check(m, 4)


def test_eagle25_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Eagle2_5_VLForConditionalGeneration"],
        model_type="eagle2_5_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        img_context_token_id=2, downsample_ratio=0.5,
        text_config=_text(),
        vision_config=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.shuffle == 2
    _check(m, 4)


def test_bagel():
    cfg = ModelConfig.from_dict(dict(
        architectures=["BagelForConditionalGeneration"], model_type="bagel",
        vocab_size=160, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, eos_token_id=1,
        image_token_id=2,
        text_config=_text(),
        vision_config=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _check(m, 16)  # no downsampling: 4x4 patches


def test_nvlm_d():
    cfg = ModelConfig.from_dict(dict(
        architectures=["NVLM_D_Model"], model_type="internvl_chat",
        vocab_size=160, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, eos_token_id=1,
        image_token_index=2, downsample_ratio=0.5,
        llm_intermediate_size=64,
        llm_config=_text(),
        vision_config=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert params["projector"]["fc1"]["weight"].shape == (16 * 4, 64)
    assert "bias" not in params["projector"]["fc1"]
    _check(m, 4)


def test_dots_ocr():
    cfg = ModelConfig.from_dict(dict(
        architectures=["DotsOCRForCausalLM"], model_type="dots_ocr",
        vocab_size=160, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, eos_token_id=1,
        tie_word_embeddings=True, image_token_id=2,
        vision_config=dict(embed_dim=16, hidden_size=32,
                           intermediate_size=24, num_hidden_layers=2,
                           num_attention_heads=2, image_size=56,
                           patch_size=14, spatial_merge_size=2),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _check(m, 4)


def test_hcx_vision():
    cfg = ModelConfig.from_dict(dict(
        architectures=["HCXVisionForCausalLM"], model_type="hyperclovax_vlm",
        vocab_size=160, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, eos_token_id=1,
        image_token_index=2, mm_projector_type="inverted_mlp",
        text_config=_text(model_type="llama"),
        vision_config=dict(_VIS, model_type="siglip_vision_model"),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert params["projector"]["fc1"]["weight"].shape == (16, 64)
    _check(m, 16)


def test_breadth4_aliases():
    from vllm_rust_tpu.models import supported_architectures

    archs = supported_architectures()
    for a in ("KimiK25ForConditionalGeneration",
              "DeepseekVLV2ForConditionalGeneration",
              "DeepSeekVLV2ForCausalLM", "Ernie4_5_VLMoeForCausalLM",
              "LightOnOCRForConditionalGeneration",
              "MiniCPMVForConditionalGeneration", "H2OVLChatModel",
              "SkyworkR1VChatModel", "MLlama4ForConditionalGeneration",
              "OpenCUAForConditionalGeneration", "HF_ColBERT",
              "InternS1ForConditionalGeneration"):
        assert a in archs, a

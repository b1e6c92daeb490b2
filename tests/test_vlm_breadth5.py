"""VLM breadth 5: GLM-OCR, PaddleOCR-VL, LFM2-VL, Phi-4-MM, BLIP-2."""

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


def _img(m, n, dim=32, size=56):
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, size, size))
    emb = m.encode_images(params, pix)
    assert emb.shape == (n, dim), emb.shape
    assert np.isfinite(np.asarray(emb)).all()
    return params, emb


def test_glm_ocr():
    cfg = ModelConfig.from_dict(dict(
        architectures=["GlmOcrForConditionalGeneration"],
        model_type="glm_ocr", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="glm4"),
        vision_config=dict(hidden_size=16, out_hidden_size=32,
                           intermediate_size=24, depth=2, num_heads=2,
                           patch_size=14, spatial_merge_size=2,
                           image_size=56),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.vision.qk_norm and m.vision.use_bias
    params = m.init_params(jax.random.PRNGKey(0))
    lp = params["vision_tower"]["layers"][0]
    assert "q_norm" in lp and "bias" in lp["qkv"]
    _img(m, 4)


def test_paddleocr_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["PaddleOCRVLForConditionalGeneration"],
        model_type="paddleocr_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="ernie4_5"),
        vision_config=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _img(m, 4)


def test_lfm2_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Lfm2VLForConditionalGeneration"],
        model_type="lfm2_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        downsample_factor=2, projector_hidden_size=24,
        text_config=_text(model_type="lfm2", conv_L_cache=3,
                          layer_types=["full_attention", "conv"],
                          norm_eps=1e-5, num_heads=4),
        vision_config=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)


def test_phi4mm():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Phi4MMForCausalLM"], model_type="phi4mm",
        vocab_size=160, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, eos_token_id=1,
        tie_word_embeddings=True, image_token_id=2,
        img_processor=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _img(m, 4)


def test_blip2():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Blip2ForConditionalGeneration"], model_type="blip-2",
        vocab_size=160, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, eos_token_id=1,
        num_query_tokens=8,
        text_config=_text(model_type="llama"),
        qformer_config=dict(hidden_size=16, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=32,
                            cross_attention_frequency=2),
        vision_config=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.tokens_per_image == 8
    params = m.init_params(jax.random.PRNGKey(0))
    lp = params["projector"]["layers"]
    assert "xq" in lp[0] and "xq" not in lp[1]  # cross-attn every 2nd
    pix = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (16, 32)  # 2 images x 8 queries


def test_breadth5_aliases():
    from vllm_rust_tpu.models import supported_architectures

    archs = supported_architectures()
    for a in ("Lfm2VlForConditionalGeneration", "MiniCPMOForCausalLM",
              "MiniCPMO"):
        assert a in archs, a


def test_qwen_vl_v1():
    cfg = ModelConfig.from_dict(dict(
        architectures=["QwenVLForConditionalGeneration"], model_type="qwen",
        vocab_size=160, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=8, max_position_embeddings=128, eos_token_id=1,
        tie_word_embeddings=True, image_start_id=1,
        visual=dict(width=16, layers=2, heads=2, mlp_width=32,
                    patch_size=14, image_size=56, output_dim=32,
                    n_queries=4, pool_heads=2),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.tokens_per_image == 4
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_aria():
    cfg = ModelConfig.from_dict(dict(
        architectures=["AriaForConditionalGeneration"], model_type="aria",
        vocab_size=160, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, eos_token_id=1,
        image_token_index=2,
        projector_patch_to_query_dict={"16": 4},
        text_config=_text(model_type="llama", moe_num_experts=4,
                          moe_topk=2, moe_num_shared_experts=1,
                          moe_intermediate_size=16),
        vision_config=dict(_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.tokens_per_image == 4
    assert m.lm.moe_spec.num_experts == 4
    params = m.init_params(jax.random.PRNGKey(0))
    assert "q_norm" not in params["language_model"]["layers"][0]["self_attn"]
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_aria_expert_weight_split():
    import numpy as np
    from vllm_rust_tpu.models.vlm_breadth6 import AriaTextMoeForCausalLM

    cfg = ModelConfig.from_dict(dict(
        architectures=["AriaTextMoeForCausalLM"], model_type="aria_moe",
        **{k: v for k, v in _text(model_type="llama").items()
           if k != "model_type"},
        moe_num_experts=2, moe_topk=1, moe_num_shared_experts=1,
        moe_intermediate_size=16,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h, inter = 32, 16
    stream = [
        ("model.layers.0.mlp.experts.fc1.weight",
         rng.normal(size=(2, 2 * inter, h)).astype(np.float32) * 0.05),
        ("model.layers.0.mlp.experts.fc2.weight",
         rng.normal(size=(2, h, inter)).astype(np.float32) * 0.05),
        ("model.layers.0.mlp.router.weight",
         rng.normal(size=(2, h)).astype(np.float32) * 0.05),
        ("model.layers.0.mlp.shared_experts.gate_proj.weight",
         rng.normal(size=(inter, h)).astype(np.float32) * 0.05),
    ]
    params = m.load_weights(stream)
    mlp = params["layers"][0]["mlp"]
    assert mlp["experts"]["gate_proj"]["weight"].shape == (2, h, inter)
    assert mlp["experts"]["down_proj"]["weight"].shape == (2, inter, h)
    assert mlp["shared_expert"]["gate_proj"]["weight"].shape == (h, inter)


def test_step3_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Step3VLForConditionalGeneration"],
        model_type="step3_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1, image_token_id=2,
        text_config=dict(_text(model_type="step3_text"), head_dim=8,
                         moe_num_experts=2, moe_top_k=1,
                         moe_intermediate_size=16, share_q_dim=16,
                         share_expert_dim=16),
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=56, patch_size=14),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.tokens_per_image == 4  # grid 4 -> conv1 3 -> conv2 2 -> 4
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_molmo():
    cfg = ModelConfig.from_dict(dict(
        architectures=["MolmoForCausalLM"], model_type="molmo",
        vocab_size=160, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, eos_token_id=1,
        tie_word_embeddings=True, image_token_id=2, model_type2="molmo",
        vision_config=dict(_VIS, num_attention_heads=2),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.tokens_per_image == 4
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_chameleon():
    from tests.test_model_forward import make_kv_pages, md_single_seq

    cfg = ModelConfig.from_dict(dict(
        architectures=["ChameleonForConditionalGeneration"],
        model_type="chameleon", vocab_size=160, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
        eos_token_id=1, tie_word_embeddings=True, logit_scale=2.0,
        swin_norm=False,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    sa = params["layers"][0]["self_attn"]
    assert sa["q_norm"].shape == (4, 8)   # per-head-individual weights
    assert sa["k_norm"].shape == (2, 8)
    assert "bias" in sa["qkv_proj"] and "bias" in params["layers"][0][
        "mlp"]["gate_proj"]
    ids = jnp.arange(8, dtype=jnp.int32)
    kv = make_kv_pages(m)
    hid, kv = m(params, ids, md_single_seq(8), kv)
    lf = m.compute_logits(params, hid[-1:])
    assert np.isfinite(np.asarray(lf)).all()
    # incremental decode consistency
    kv = make_kv_pages(m)
    hid2, kv = m(params, ids[:5], md_single_seq(5), kv)
    for pos in range(5, 8):
        hid2, kv = m(params, ids[pos:pos + 1],
                     md_single_seq(1, start_pos=pos), kv)
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(m.compute_logits(params, hid2[-1:])),
        rtol=5e-4, atol=5e-4)


def test_isaac():
    cfg = ModelConfig.from_dict(dict(
        architectures=["IsaacForConditionalGeneration"], model_type="isaac",
        vocab_size=160, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, eos_token_id=1,
        image_token_id=2,
        text_config=_text(model_type="qwen3"),
        vision_config=dict(_VIS, pixel_shuffle_scale_factor=2),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.tokens_per_image == 4
    params = m.init_params(jax.random.PRNGKey(0))
    assert "bias" not in params["projector"]["linear_fc1"]
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)


def test_hunyuan_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["HunYuanVLForConditionalGeneration"],
        model_type="hunyuan_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1, image_token_id=2,
        text_config=_text(model_type="hunyuan"),
        vision_config=dict(hidden_size=16, out_hidden_size=32,
                           intermediate_size=32, num_hidden_layers=2,
                           num_attention_heads=2, patch_size=14,
                           spatial_merge_size=2, image_size=56),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    # 2x2 merged grid + newline col per row + begin/end = 2*3+2 = 8
    assert m.tokens_per_image == 8
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (8, 32)
    assert np.isfinite(np.asarray(emb)).all()

"""VLM breadth 7: Ovis, Molmo2, KananaV, OpenPangu-VL, MiniMax-VL-01,
Nemotron VLs, JinaVL ranking, InternS1-Pro, DeepSeek-OCR."""

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
        architectures=["Qwen2ForCausalLM"],
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


def test_ovis_soft_tokenizer():
    cfg = ModelConfig.from_dict(dict(
        architectures=["OvisForConditionalGeneration"],
        model_type="ovis", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        llm_config=_text(),
        visual_tokenizer_config=dict(
            vocab_size=37, hidden_stride=2,
            backbone_config=dict(_VIS, rms_norm_eps=1e-5),
        ),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.tokens_per_image == 4  # 16 patches / 2^2
    params, emb = _img(m, 4)
    # soft tokens: softmax over visual vocab, indicator slots zero
    feats = m.vision(params["vision_tower"],
                     jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56)))
    assert feats.shape == (1, 16, 16)


def test_ovis2_5():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Ovis2_5"],
        model_type="ovis2_5", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        llm_config=_text(model_type="qwen3",
                         architectures=["Qwen3ForCausalLM"]),
        visual_tokenizer_config=dict(
            vocab_size=21, hidden_stride=2, backbone_config=_VIS),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.hidden_stride == 2
    _img(m, 4)


def test_molmo2():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Molmo2ForConditionalGeneration"],
        model_type="molmo2", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="qwen3",
                          architectures=["Qwen3ForCausalLM"]),
        vision_config=dict(_VIS, num_hidden_layers=4),
        vit_layers=[-2, -4],
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.vit_layers == (-2, -4)
    # multi-layer concat: projector input width = 2 * vision hidden
    params = m.init_params(jax.random.PRNGKey(0))
    assert params["projector"]["w1"]["weight"].shape[0] == 32
    _img(m, 4)  # 4x4 grid -> 2x2 pooled


def test_kanana_v():
    cfg = ModelConfig.from_dict(dict(
        architectures=["KananaVForConditionalGeneration"],
        model_type="kanana_v", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="llama",
                          architectures=["LlamaForCausalLM"]),
        vision_config=dict(embed_dim=16, hidden_size=32, depth=2,
                           num_heads=2, patch_size=14,
                           spatial_merge_size=2, image_size=56),
        projector_config=dict(merge_size=2, hidden_size=24),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape[-1] == 32
    assert np.isfinite(np.asarray(emb)).all()


def test_openpangu_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["OpenPanguVLForConditionalGeneration"],
        model_type="openpangu_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="pangu",
                          architectures=["PanguEmbeddedForCausalLM"]),
        vision_config=dict(hidden_size=16, out_hidden_size=24,
                           intermediate_size=24, depth=2, num_heads=2,
                           patch_size=14, spatial_merge_size=2,
                           image_size=56),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _img(m, 4)


def test_minimax_vl01():
    cfg = ModelConfig.from_dict(dict(
        architectures=["MiniMaxVL01ForConditionalGeneration"],
        model_type="minimax_vl_01", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(
            model_type="minimax_text01",
            architectures=["MiniMaxText01ForCausalLM"],
            num_local_experts=2, num_experts_per_tok=1,
            attn_type_list=[0, 1],
        ),
        vision_config=_VIS,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    # 4x4 grid + 4 newline tokens
    assert m.tokens_per_image == 20
    params, emb = _img(m, 20)


def test_llama_nemotron_vl():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Llama_Nemotron_Nano_VL"],
        model_type="nemotron_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        llm_config=_text(model_type="llama",
                         architectures=["LlamaForCausalLM"]),
        vision_config=_VIS,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    _img(m, 4)  # 4x4 grid, pixel-shuffled to 2x2


def test_nemotron_h_nano_vl_v2():
    cfg = ModelConfig.from_dict(dict(
        architectures=["NemotronH_Nano_VL_V2"],
        model_type="nemotron_h_vl", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        llm_config=dict(
            model_type="nemotron_h", vocab_size=160, hidden_size=32,
            intermediate_size=48, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            max_position_embeddings=128, eos_token_id=1,
            architectures=["NemotronHForCausalLM"],
            hybrid_override_pattern="M*M-",
            ssm_state_size=8, conv_kernel=4, mamba_num_heads=4,
            mamba_head_dim=8, n_groups=1, expand=2,
        ),
        vision_config=_VIS,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    emb = m.encode_images(params, pix)
    assert emb.shape == (4, 32)
    # ReLU^2 projector: zeroing fc1 weight zeroes the output
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2["projector"]["fc1"]["weight"] = jnp.zeros_like(
        params["projector"]["fc1"]["weight"])
    emb2 = m.encode_images(p2, pix)
    np.testing.assert_allclose(np.asarray(emb2), 0.0)


def test_jina_vl_ranking():
    cfg = ModelConfig.from_dict(dict(
        architectures=["JinaVLForRanking"],
        model_type="qwen2_vl", vocab_size=160, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
        eos_token_id=1, tie_word_embeddings=True,
        text_config=_text(),
        vision_config=dict(embed_dim=16, hidden_size=32, depth=2,
                           num_heads=2, patch_size=14,
                           spatial_merge_size=2, image_size=56),
        num_labels=1,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.is_scoring
    params = m.init_params(jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(2), (10, 32))
    cu = jnp.asarray([0, 4, 10], jnp.int32)
    scores = m.classify_logits(params, hidden, cu)
    assert scores.shape == (2, 1)
    assert np.isfinite(np.asarray(scores)).all()


def test_interns1_pro_fope():
    from vllm_rust_tpu.models.vlm_breadth7 import fope_tables

    # identity coefficients reproduce plain cos/sin on the learned dims
    hd, mp = 16, 64
    inv = 1.0 / 10000.0 ** (np.arange(0, hd, 2) / hd)
    keep = inv[inv > 2 * np.pi / mp]
    eye = np.eye(len(keep), dtype=np.float32)
    cos, sin = fope_tables(hd, mp, 10000.0, eye, eye)
    t = 7
    np.testing.assert_allclose(
        np.asarray(cos[t, : len(keep)]), np.cos(t * keep), rtol=1e-5
    )
    # padded dims are ones
    np.testing.assert_allclose(np.asarray(cos[t, len(keep):]), 1.0)

    cfg = ModelConfig.from_dict(dict(
        architectures=["InternS1ProForConditionalGeneration"],
        model_type="interns1_pro", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=dict(
            model_type="qwen3_moe", vocab_size=160, hidden_size=32,
            intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            max_position_embeddings=128, eos_token_id=1,
            tie_word_embeddings=True, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=16,
            architectures=["InternS1ProMoeLLMForCausalLM"],
        ),
        vision_config=dict(hidden_size=16, out_hidden_size=32,
                           intermediate_size=24, depth=2, num_heads=2,
                           patch_size=14, spatial_merge_size=2,
                           image_size=56),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "fope_cos_coef" in params["language_model"]
    _img(m, 4)


def test_deepseek_ocr():
    for arch, text_arch, extra_text in (
        ("DeepseekOCRForCausalLM", "DeepseekV2ForCausalLM",
         dict(kv_lora_rank=16, qk_rope_head_dim=8, qk_nope_head_dim=8,
              v_head_dim=8, q_lora_rank=None)),
        ("DeepseekOCR2ForCausalLM", "DeepseekV3ForCausalLM",
         dict(kv_lora_rank=16, qk_rope_head_dim=8, qk_nope_head_dim=8,
              v_head_dim=8, q_lora_rank=None, n_routed_experts=4,
              num_experts_per_tok=2, moe_intermediate_size=16,
              first_k_dense_replace=1, n_shared_experts=1)),
    ):
        cfg = ModelConfig.from_dict(dict(
            architectures=[arch],
            model_type="deepseek_ocr", vocab_size=160, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=128, eos_token_id=1,
            language_config=dict(
                model_type="deepseek_v2", vocab_size=160, hidden_size=32,
                intermediate_size=48, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=4,
                max_position_embeddings=128, eos_token_id=1,
                tie_word_embeddings=True, architectures=[text_arch],
                **extra_text,
            ),
            vision_config=_VIS,
        ))
        m = from_config(cfg, dtype=jnp.float32)
        _img(m, 4)


def test_registry_strings():
    from vllm_rust_tpu.models import _populate, _REGISTRY

    _populate()
    for s in (
        "Ovis", "OvisForConditionalGeneration", "Ovis2_5",
        "Molmo2ForConditionalGeneration", "KananaVForConditionalGeneration",
        "OpenPanguVLForConditionalGeneration",
        "MiniMaxVL01ForConditionalGeneration", "Llama_Nemotron_Nano_VL",
        "NemotronH_Nano_VL_V2", "JinaVLForRanking",
        "InternS1ProForConditionalGeneration",
        "InternS1ProMoeLLMForCausalLM", "DeepseekOCRForCausalLM",
        "DeepseekOCR2ForCausalLM", "E5MistralForEmbedding",
        "GteNewForEmbedding", "ModernBertForEmbedding",
        "VoyageForEmbedding",
    ):
        assert s in _REGISTRY, s

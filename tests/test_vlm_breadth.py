"""VLM breadth tests: construction, encode shapes, projector parity
where a cheap HF reference exists."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

torch = pytest.importorskip("torch")

_TINY_VIS = dict(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=28, patch_size=14,
)
_TINY_TXT = dict(
    architectures=["LlamaForCausalLM"], vocab_size=128, hidden_size=48,
    intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, max_position_embeddings=128,
)


def _encode(model, params, n=1):
    rng = np.random.default_rng(0)
    size = model.vision.image_size
    px = jnp.asarray(rng.normal(size=(n, 3, size, size)).astype(np.float32))
    return model.encode_images(params, px)


def _check(arch, extra, expected_tokens=None):
    cfg = ModelConfig.from_dict(
        dict(architectures=[arch], vocab_size=128, hidden_size=48,
             num_hidden_layers=2, num_attention_heads=4, **extra)
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    out = _encode(model, params)
    assert out.ndim == 2
    assert out.shape[0] == model.tokens_per_image
    assert out.shape[1] == model.text_config.hidden_size
    if expected_tokens is not None:
        assert model.tokens_per_image == expected_tokens
    assert np.isfinite(np.asarray(out)).all()
    return model


def test_paligemma():
    _check(
        "PaliGemmaForConditionalGeneration",
        dict(text_config=dict(_TINY_TXT, architectures=["GemmaForCausalLM"]),
             vision_config=_TINY_VIS, image_token_index=120),
        expected_tokens=4,
    )


def test_gemma3_multimodal_dispatch():
    m = _check(
        "Gemma3ForConditionalGeneration",
        dict(text_config=dict(_TINY_TXT, architectures=["Gemma3ForCausalLM"]),
             vision_config=_TINY_VIS, image_token_index=120,
             mm_tokens_per_image=1),
        expected_tokens=1,
    )
    assert m.pool == 2  # 2x2 grid pooled to 1x1
    # text-only checkpoints with the same arch string still resolve
    cfg = ModelConfig.from_dict(
        dict(architectures=["Gemma3ForConditionalGeneration"], vocab_size=64,
             hidden_size=32, intermediate_size=64, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=2, head_dim=8)
    )
    tm = from_config(cfg, dtype=jnp.float32)
    assert not getattr(tm, "is_multimodal", False)


@pytest.mark.parametrize("arch,vis_extra,exp", [
    ("Qwen2VLForConditionalGeneration",
     dict(embed_dim=32, hidden_size=48), 1),
    ("Qwen2_5_VLForConditionalGeneration",
     dict(hidden_size=32, out_hidden_size=48), 1),
])
def test_qwen2_vl(arch, vis_extra, exp):
    vis = dict(depth=2, num_heads=4, patch_size=14, image_size=28,
               spatial_merge_size=2, temporal_patch_size=2,
               intermediate_size=64, **vis_extra)
    cfg = ModelConfig.from_dict(
        dict(architectures=[arch], vocab_size=128, hidden_size=48,
             intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, vision_config=vis, image_token_id=120)
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    out = _encode(model, params)
    # 28/14 = 2x2 grid, merge 2 -> 1 token
    assert out.shape == (exp, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_internvl():
    _check(
        "InternVLChatModel",
        dict(llm_config=dict(_TINY_TXT, architectures=["Qwen2ForCausalLM"]),
             vision_config=_TINY_VIS, downsample_ratio=0.5,
             image_token_index=120),
        expected_tokens=1,
    )


def test_idefics3():
    _check(
        "Idefics3ForConditionalGeneration",
        dict(text_config=_TINY_TXT, vision_config=_TINY_VIS, scale_factor=2,
             image_token_id=120),
        expected_tokens=1,
    )


def test_pixtral():
    _check(
        "PixtralForConditionalGeneration",
        dict(text_config=dict(_TINY_TXT, architectures=["MistralForCausalLM"]),
             vision_config=dict(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=4,
                                image_size=32, patch_size=16),
             image_token_index=10),
        expected_tokens=4,
    )


def test_llava_next():
    _check(
        "LlavaNextForConditionalGeneration",
        dict(text_config=_TINY_TXT, vision_config=_TINY_VIS,
             image_token_index=120, vision_feature_layer=-2),
        expected_tokens=4,
    )


def test_paligemma_projector_parity():
    """Tower+projector output vs HF PaliGemma vision path."""
    try:
        from transformers import (
            GemmaConfig,
            PaliGemmaConfig,
            PaliGemmaForConditionalGeneration as HFPali,
            SiglipVisionConfig,
        )
    except ImportError:
        pytest.skip("transformers lacks PaliGemma")

    vis = SiglipVisionConfig(**_TINY_VIS, attention_dropout=0.0)
    txt = GemmaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12,
    )
    hf_cfg = PaliGemmaConfig(vision_config=vis, text_config=txt,
                             image_token_index=120, projection_dim=48)
    torch.manual_seed(0)
    hf = HFPali(hf_cfg).eval()

    cfg = ModelConfig.from_dict(
        dict(architectures=["PaliGemmaForConditionalGeneration"],
             vocab_size=128, hidden_size=48, num_hidden_layers=2,
             num_attention_heads=4, image_token_index=120,
             text_config=dict(architectures=["GemmaForCausalLM"],
                              vocab_size=128, hidden_size=48,
                              intermediate_size=96, num_hidden_layers=2,
                              num_attention_heads=4, num_key_value_heads=2,
                              head_dim=12),
             vision_config=_TINY_VIS)
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.load_weights(
        (k, v.numpy()) for k, v in hf.state_dict().items()
    )
    rng = np.random.default_rng(0)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        feats = hf.model.vision_tower(torch.tensor(px)).last_hidden_state
        ref = hf.model.multi_modal_projector(feats)[0].numpy()
        ref = ref / (48**0.5)
    got = np.asarray(model.encode_images(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

"""Audio LMM breadth 2: Omni thinkers, Qwen3-ASR, AudioFlamingo3,
GLM-ASR, FunAudioChat."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

_AUDIO = dict(d_model=16, encoder_layers=2, encoder_attention_heads=2,
              num_mel_bins=8, max_source_positions=8, encoder_ffn_dim=32)


def _text(**over):
    d = dict(
        model_type="qwen2", vocab_size=160, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
        eos_token_id=1, tie_word_embeddings=True,
    )
    d.update(over)
    return d


def _lm_check(m, emb):
    from tests.test_model_forward import make_kv_pages, md_single_seq

    n = min(4, emb.shape[0])
    ids = jnp.array([1] + [2] * n + [3], jnp.int32)
    mask = ids == 2
    t = ids.shape[0]
    override = jnp.zeros((t, emb.shape[-1]), jnp.float32).at[1:1 + n].set(
        emb[:n])
    params = m._params_cache
    hid, _ = m(params, ids, md_single_seq(t), make_kv_pages(m),
               embeds=(mask, override))
    logits = m.compute_logits(params, hid[-1:])
    assert np.isfinite(np.asarray(logits)).all()


def test_qwen25_omni_thinker():
    cfg = ModelConfig.from_dict(dict(
        architectures=["Qwen2_5OmniThinkerForConditionalGeneration"],
        model_type="qwen2_5_omni", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(),
        audio_config=dict(_AUDIO),
        vision_config=dict(hidden_size=16, out_hidden_size=32, depth=2,
                           num_heads=2, intermediate_size=32,
                           patch_size=14, spatial_merge_size=2,
                           image_size=56),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    m._params_cache = params
    # vision path
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 56))
    img = m.encode_images(params, pix)
    assert img.shape == (4, 32)
    # audio path: whisper encoder halves frames (conv2), pool halves again
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16))
    au = m.encode_audio(params, mel)
    assert au.shape == (4, 32)
    _lm_check(m, img)


def test_qwen3_omni_thinker_and_asr():
    audio = dict(d_model=16, encoder_layers=1, encoder_attention_heads=2,
                 num_mel_bins=8, max_source_positions=16,
                 encoder_ffn_dim=32, downsample_hidden_size=4,
                 output_dim=32)
    cfg = ModelConfig.from_dict(dict(
        architectures=["Qwen3OmniMoeThinkerForConditionalGeneration"],
        model_type="qwen3_omni_moe", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="qwen3_moe", num_experts=4,
                          num_experts_per_tok=2, moe_intermediate_size=16),
        audio_config=dict(audio),
        vision_config=dict(hidden_size=16, out_hidden_size=32, depth=1,
                           num_heads=2, intermediate_size=32,
                           patch_size=14, spatial_merge_size=2,
                           image_size=28),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    m._params_cache = params
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16))
    au = m.encode_audio(params, mel)
    assert au.shape == (2, 32)  # T/8 tokens, output_dim
    _lm_check(m, au)

    cfg2 = ModelConfig.from_dict(dict(
        architectures=["Qwen3ASRForConditionalGeneration"],
        model_type="qwen3_asr", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="qwen3"),
        audio_config=dict(audio),
    ))
    m2 = from_config(cfg2, dtype=jnp.float32)
    p2 = m2.init_params(jax.random.PRNGKey(0))
    au2 = m2.encode_images(p2, mel)
    assert au2.shape == (2, 32)


def test_audioflamingo3():
    cfg = ModelConfig.from_dict(dict(
        architectures=["AudioFlamingo3ForConditionalGeneration"],
        model_type="audioflamingo3", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(),
        audio_config=dict(_AUDIO),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    m._params_cache = params
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16))
    au = m.encode_images(params, mel)
    assert au.shape == (4, 32)
    _lm_check(m, au)


def test_glm_asr():
    cfg = ModelConfig.from_dict(dict(
        architectures=["GlmAsrForConditionalGeneration"],
        model_type="glmasr", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1, merge_factor=2,
        text_config=_text(model_type="llama"),
        audio_config=dict(hidden_size=16, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=32,
                          num_mel_bins=8, max_source_positions=8),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    m._params_cache = params
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16))
    au = m.encode_images(params, mel)
    assert au.shape == (4, 32)  # T=16 -> conv/2 -> 8 -> merge2 -> 4
    _lm_check(m, au)


def test_funaudiochat():
    cfg = ModelConfig.from_dict(dict(
        architectures=["FunAudioChatForConditionalGeneration"],
        model_type="funaudiochat", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="qwen3"),
        audio_config=dict(_AUDIO),
    ))
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16))
    au = m.encode_images(params, mel)
    assert au.shape == (4, 32)


def test_audio2_aliases():
    from vllm_rust_tpu.models import supported_architectures

    archs = supported_architectures()
    for a in ("Qwen2_5OmniModel", "Qwen2_5OmniForConditionalGeneration",
              "Qwen3OmniMoeForConditionalGeneration",
              "MusicFlamingoForConditionalGeneration"):
        assert a in archs, a

"""Audio LMM tests: Qwen2-Audio / Ultravox / Voxtral encode shapes and
whisper-encoder reuse."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config

_AUDIO = dict(d_model=32, encoder_layers=2, encoder_attention_heads=4,
              num_mel_bins=16, max_source_positions=8, encoder_ffn_dim=64)
_TXT = dict(architectures=["Qwen2ForCausalLM"], vocab_size=128,
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2)


def _run(arch, extra, expected_tokens):
    cfg = ModelConfig.from_dict(
        dict(architectures=[arch], vocab_size=128, hidden_size=48,
             num_hidden_layers=2, num_attention_heads=4, **extra)
    )
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # frames = 2 * positions (conv2 stride 2)
    mel = jnp.asarray(rng.normal(size=(1, 16, 16)).astype(np.float32))
    out = model.encode_images(params, mel)
    assert out.shape == (expected_tokens, 48)
    assert model.tokens_per_image == expected_tokens
    assert np.isfinite(np.asarray(out)).all()
    assert model.audio_token_index == model.image_token_index


def test_qwen2_audio():
    _run("Qwen2AudioForConditionalGeneration",
         dict(text_config=_TXT, audio_config=_AUDIO, audio_token_index=120),
         expected_tokens=4)


def test_ultravox():
    _run("UltravoxModel",
         dict(text_config=dict(_TXT, architectures=["LlamaForCausalLM"]),
              audio_config=_AUDIO, stack_factor=4,
              audio_token_index=120),
         expected_tokens=2)


def test_voxtral():
    _run("VoxtralForConditionalGeneration",
         dict(text_config=dict(_TXT, architectures=["MistralForCausalLM"]),
              audio_config=_AUDIO, downsample_factor=4,
              audio_token_index=120),
         expected_tokens=2)


def test_audio_encoder_matches_whisper_encoder():
    """The standalone audio encoder must match the Whisper model's
    encode_hidden on identical weights."""
    from vllm_rust_tpu.models.audio_lmm import WhisperStyleAudioEncoder
    from vllm_rust_tpu.models.whisper import WhisperForConditionalGeneration

    wcfg = ModelConfig.from_dict(
        dict(architectures=["WhisperForConditionalGeneration"],
             model_type="whisper", vocab_size=64, hidden_size=32,
             num_hidden_layers=2, d_model=32, encoder_layers=2,
             decoder_layers=2, encoder_attention_heads=4,
             decoder_attention_heads=4, num_mel_bins=16,
             max_source_positions=8, max_target_positions=16,
             encoder_ffn_dim=64, decoder_ffn_dim=64)
    )
    whisper = WhisperForConditionalGeneration(wcfg, dtype=jnp.float32)
    wp = whisper.init_params(jax.random.PRNGKey(1))

    enc = WhisperStyleAudioEncoder(_AUDIO, dtype=jnp.float32)
    # hand the whisper encoder subtree to the standalone encoder
    ep = wp["encoder"]
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))
    ref = whisper.encode_hidden(wp, mel)
    got = enc(ep, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

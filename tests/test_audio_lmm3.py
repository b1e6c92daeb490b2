"""Audio LMM breadth 3: Granite Speech, MiDashengLM."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.models import from_config


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


def test_granite_speech():
    cfg = ModelConfig.from_dict(dict(
        architectures=["GraniteSpeechForConditionalGeneration"],
        model_type="granite_speech", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(model_type="granite",
                          architectures=["GraniteForCausalLM"],
                          logits_scaling=2.0),
        encoder_config=dict(input_dim=20, hidden_dim=24, num_layers=2,
                            num_heads=4, conv_kernel_size=5),
        projector_config=dict(window_size=8, downsample_rate=3,
                              hidden_size=24),
        audio_token_index=49155,
        max_audio_frames=16,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    assert m.audio_token_index == 49155
    assert m.tokens_per_image == 6  # 2 windows * 3 queries
    params = m.init_params(jax.random.PRNGKey(0))
    mels = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 20))
    emb = m.encode_audio(params, mels)
    assert emb.shape == (6, 32)
    assert np.isfinite(np.asarray(emb)).all()
    # conformer encoder is sequence-length generic
    enc = m.vision(params["vision_tower"],
                   jax.random.normal(jax.random.PRNGKey(2), (24, 20)))
    assert enc.shape == (24, 24)


def test_midashenglm():
    cfg = ModelConfig.from_dict(dict(
        architectures=["MiDashengLMModel"],
        model_type="midashenglm", vocab_size=160, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, eos_token_id=1,
        text_config=_text(),
        audio_encoder_config=dict(n_mels=32, target_length=16,
                                  embed_dim=24, depth=2, num_heads=4,
                                  patch_size=(16, 4)),
        subsample_factor=2,
        audio_token_id=151646,
    ))
    m = from_config(cfg, dtype=jnp.float32)
    # patches: (32/16) freq x (16/4) time = 8; subsample 2 -> 4 tokens
    assert m.vision.num_patches == 8
    assert m.tokens_per_image == 4
    params = m.init_params(jax.random.PRNGKey(0))
    mels = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 16))
    emb = m.encode_audio(params, mels)
    assert emb.shape == (4, 32)
    assert np.isfinite(np.asarray(emb)).all()
    # LayerScale gates: zeroing ls1/ls2 freezes the blocks
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    for b in p2["vision_tower"]["blocks"]:
        b["ls1"] = jnp.zeros_like(b["ls1"])
        b["ls2"] = jnp.zeros_like(b["ls2"])
    e1 = m.vision(p2["vision_tower"], jnp.zeros((32, 16)))
    assert np.isfinite(np.asarray(e1)).all()


def test_registry_strings():
    from vllm_rust_tpu.models import _populate, _REGISTRY

    _populate()
    for s in ("GraniteSpeechForConditionalGeneration", "MiDashengLMModel"):
        assert s in _REGISTRY, s

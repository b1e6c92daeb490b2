"""Encoder breadth: GTE-new family, ModernBERT, ColBERT, SPLADE."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.engine.encoder import EncoderRunner
from vllm_rust_tpu.models import from_config


def _cfg(arch, mt, **over):
    d = dict(
        architectures=[arch], model_type=mt, vocab_size=96, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, eos_token_id=1,
    )
    d.update(over)
    return ModelConfig.from_dict(d)


def _runner(cfg):
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    return m, EncoderRunner(m, params, token_buckets=(16, 32, 64))


def test_gte_new_embed():
    cfg = _cfg("GteNewModel", "new", rotary_emb_dim=4,
               hidden_act="geglu")
    m, r = _runner(cfg)
    assert m._gated
    out = r.embed([[1, 2, 3], [4, 5, 6, 7]], pooling="cls")
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                               rtol=1e-4)
    # bidirectional RoPE encode is position-sensitive: same tokens at
    # different lengths must differ
    a = r.embed([[1, 2, 3]], pooling="mean")
    b = r.embed([[1, 2, 3, 3]], pooling="mean")
    assert not np.allclose(a, b[:, :])


def test_nomic_and_jina_variants():
    cfg = _cfg("NomicBertModel", "nomic_bert")
    m = from_config(cfg, dtype=jnp.float32)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "bias" in params["layers"][0]["gate_up_proj"]

    cfg = _cfg("JinaRobertaModel", "xlm-roberta")
    m = from_config(cfg, dtype=jnp.float32)
    assert m.act == "gelu"  # ungated GELU (gte.rs new_jina)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "up_proj" in params["layers"][0]
    assert "gate_up_proj" not in params["layers"][0]


def test_gte_load_weights():
    cfg = _cfg("GteNewModel", "new", type_vocab_size=2)
    m = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h, inter = 32, 48
    stream = [
        ("new.embeddings.word_embeddings.weight",
         rng.normal(size=(96, h)).astype(np.float32) * 0.05),
        ("new.embeddings.LayerNorm.weight", np.ones(h, np.float32)),
        ("new.encoder.layers.0.attention.qkv_proj.weight",
         rng.normal(size=(3 * h, h)).astype(np.float32) * 0.05),
        ("new.encoder.layers.0.mlp.gate_up_proj.weight",
         rng.normal(size=(2 * inter, h)).astype(np.float32) * 0.05),
        ("new.encoder.layers.1.attn_ln.weight", np.ones(h, np.float32)),
        ("classifier.weight",
         rng.normal(size=(3, h)).astype(np.float32) * 0.05),
    ]
    params = m.load_weights(stream)
    assert params["layers"][0]["qkv_proj"]["weight"].shape == (h, 3 * h)
    assert params["classifier"]["weight"].shape == (h, 3)


def test_modernbert():
    cfg = _cfg("ModernBertModel", "modernbert",
               global_attn_every_n_layers=2, local_attention=8,
               global_rope_theta=160000.0, num_labels=2)
    m, r = _runner(cfg)
    assert m._is_global(0) and not m._is_global(1)
    params = m.init_params(jax.random.PRNGKey(0))
    assert "attn_norm" not in params["layers"][0]  # layer 0 identity
    assert "attn_norm" in params["layers"][1]
    out = r.embed([[1, 2, 3, 4]], pooling="cls")
    assert out.shape == (1, 32)
    probs = r.classify([[1, 2, 3]])
    assert probs.shape == (1, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_modernbert_load_weights():
    cfg = _cfg("ModernBertModel", "modernbert", num_labels=2)
    m = from_config(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    h = 32
    stream = [
        ("model.embeddings.tok_embeddings.weight",
         rng.normal(size=(96, h)).astype(np.float32) * 0.05),
        ("model.layers.1.attn.Wqkv.weight",
         rng.normal(size=(3 * h, h)).astype(np.float32) * 0.05),
        ("model.layers.1.mlp.Wi.weight",
         rng.normal(size=(2 * 48, h)).astype(np.float32) * 0.05),
        ("model.layers.1.mlp.Wo.weight",
         rng.normal(size=(h, 48)).astype(np.float32) * 0.05),
        ("head.dense.weight",
         rng.normal(size=(h, h)).astype(np.float32) * 0.05),
        ("classifier.weight",
         rng.normal(size=(2, h)).astype(np.float32) * 0.05),
    ]
    params = m.load_weights(stream)
    assert params["layers"][1]["Wqkv"]["weight"].shape == (h, 3 * h)
    assert params["layers"][1]["Wo_mlp"]["weight"].shape == (48, h)
    assert params["classifier"]["weight"].shape == (h, 2)


def test_colbert():
    cfg = _cfg("ColBERTModel", "bert", colbert_dim=8)
    m, r = _runner(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    hidden = m.encode(params, jnp.array([1, 2, 3], jnp.int32),
                      jnp.zeros(3, jnp.int32), jnp.array([0, 3], jnp.int32))
    tok = m.colbert_embeddings(params, hidden)
    assert tok.shape == (3, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(tok), axis=-1),
                               1.0, rtol=1e-4)
    out = r.embed([[1, 2, 3]], pooling="cls", normalize=False)
    assert out.shape == (1, 8)


def test_splade_sparse():
    cfg = _cfg("BertSpladeSparseEmbeddingModel", "bert")
    m, r = _runner(cfg)
    out = r.embed([[1, 2, 3], [4, 5]], pooling="cls", normalize=False)
    assert out.shape == (2, 96)  # vocab-sized sparse vectors
    assert (out >= 0).all()


def test_llama_bidirectional():
    cfg = _cfg("LlamaBidirectionalModel", "llama",
               num_key_value_heads=2, head_dim=8, num_labels=3,
               pooling="mean")
    m, r = _runner(cfg)
    out = r.embed([[1, 2, 3], [4, 5]], pooling="mean")
    assert out.shape == (2, 32)
    probs = r.classify([[1, 2, 3]])
    assert probs.shape == (1, 3)


def test_voyage_qwen3_bidirectional():
    cfg = _cfg("VoyageQwen3BidirectionalEmbedModel", "qwen3",
               num_key_value_heads=2, head_dim=8)
    m = from_config(cfg, dtype=jnp.float32)
    assert m.qk_norm
    params = m.init_params(jax.random.PRNGKey(0))
    assert "q_norm" in params["layers"][0]["self_attn"]
    _, r = _runner(cfg)
    out = r.embed([[1, 2, 3, 4]], pooling="mean")
    assert out.shape == (1, 32)


def test_classification_aliases():
    from vllm_rust_tpu.models import supported_architectures
    archs = supported_architectures()
    for a in ("GPT2ForSequenceClassification",
              "JambaForSequenceClassification",
              "LlamaBidirectionalForSequenceClassification",
              "SnowflakeGteNewModel"):
        assert a in archs, a


def test_clip_dual_encoder():
    cfg = ModelConfig.from_dict(dict(
        architectures=["CLIPModel"], model_type="clip", vocab_size=96,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, eos_token_id=1,
        text_config=dict(vocab_size=96, hidden_size=32,
                         num_attention_heads=4, num_hidden_layers=2,
                         intermediate_size=48, max_position_embeddings=16,
                         projection_dim=24),
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=28, patch_size=14),
    ))
    m, r = _runner(cfg)
    out = r.embed([[1, 2, 3], [4, 5]], pooling="last")
    assert out.shape == (2, 24)  # projection_dim
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))
    img = m.encode_images(params, pix)
    assert img.shape == (2, 24)  # shared projection space


def test_siglip_dual_encoder():
    cfg = ModelConfig.from_dict(dict(
        architectures=["SiglipModel"], model_type="siglip", vocab_size=96,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, eos_token_id=1,
        text_config=dict(vocab_size=96, hidden_size=32,
                         num_attention_heads=4, num_hidden_layers=2,
                         intermediate_size=48, max_position_embeddings=16,
                         projection_size=24),
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=28, patch_size=14),
    ))
    m, r = _runner(cfg)
    assert m.siglip
    out = r.embed([[1, 2, 3]], pooling="last")
    assert out.shape == (1, 24)
    params = m.init_params(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    img = m.encode_images(params, pix)
    assert img.shape == (1, 16)  # mean-pooled vision hidden (siglip.rs)

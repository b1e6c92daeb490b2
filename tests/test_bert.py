"""BERT-family encoder tests: parity against HuggingFace transformers
(torch CPU), segment independence, and the score/rerank/classify runner
API (reference correctness bar: embeddings cos >= 0.998 vs external
implementations — SURVEY.md §6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import ModelConfig
from vllm_rust_tpu.engine.encoder import EncoderRunner
from vllm_rust_tpu.models import from_config


def tiny_bert_dict(**over):
    d = dict(
        architectures=["BertModel"],
        model_type="bert",
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        num_labels=1,
    )
    d.update(over)
    return d


@pytest.fixture(scope="module")
def hf_pair():
    """(our model + params, HF torch model) with identical weights."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertForSequenceClassification

    hf_cfg = BertConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        type_vocab_size=2,
        num_labels=1,
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertForSequenceClassification(hf_cfg).eval()

    mc = ModelConfig.from_dict(
        tiny_bert_dict(architectures=["BertForSequenceClassification"])
    )
    model = from_config(mc, dtype=jnp.float32)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = model.load_weights(state.items())
    return model, params, hf, torch


def test_bert_hidden_parity_vs_hf(hf_pair):
    model, params, hf, torch = hf_pair
    ids = [[5, 17, 99, 3, 42], [7, 8, 9]]
    for seq in ids:
        t = torch.tensor([seq])
        with torch.no_grad():
            ref = hf.bert(input_ids=t).last_hidden_state[0].numpy()
        cu = jnp.asarray([0, len(seq)], jnp.int32)
        got = np.asarray(
            model.encode(
                params,
                jnp.asarray(seq, jnp.int32),
                jnp.zeros(len(seq), jnp.int32),
                cu,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_bert_classifier_parity_vs_hf(hf_pair):
    model, params, hf, torch = hf_pair
    seq = [5, 17, 99, 3, 42, 11]
    types = [0, 0, 0, 1, 1, 1]
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor([seq]),
            token_type_ids=torch.tensor([types]),
        ).logits[0].numpy()
    cu = jnp.asarray([0, len(seq)], jnp.int32)
    hidden = model.encode(
        params, jnp.asarray(seq, jnp.int32), jnp.asarray(types, jnp.int32), cu
    )
    got = np.asarray(model.classify_logits(params, hidden, cu))[0]
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_segment_independence():
    """Two inputs encoded in one flattened batch must equal separate
    encodes (the segment mask isolates them)."""
    mc = ModelConfig.from_dict(tiny_bert_dict())
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    a, b = [5, 6, 7, 8], [9, 10]
    joint = model.encode(
        params,
        jnp.asarray(a + b + [0, 0], jnp.int32),  # with padding tail
        jnp.zeros(8, jnp.int32),
        jnp.asarray([0, 4, 6], jnp.int32),
    )
    solo_a = model.encode(
        params, jnp.asarray(a, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.asarray([0, 4], jnp.int32),
    )
    solo_b = model.encode(
        params, jnp.asarray(b, jnp.int32), jnp.zeros(2, jnp.int32),
        jnp.asarray([0, 2], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(joint[:4]), np.asarray(solo_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(joint[4:6]), np.asarray(solo_b),
                               rtol=1e-5, atol=1e-5)


def test_encoder_runner_api():
    mc = ModelConfig.from_dict(
        tiny_bert_dict(architectures=["BertForSequenceClassification"],
                       num_labels=1)
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(1))
    runner = EncoderRunner(model, params, token_buckets=(16, 32, 64))

    emb = runner.embed([[1, 2, 3], [4, 5, 6, 7], [8]], pooling="mean")
    assert emb.shape == (3, mc.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5)

    scores = runner.score([([1, 2], [3, 4, 5]), ([1, 2], [9, 9])])
    assert scores.shape == (2,)

    ranked = runner.rerank([1, 2], [[3, 4], [5, 6], [7, 8]])
    assert [r["index"] for r in ranked] != []
    assert ranked[0]["relevance_score"] >= ranked[-1]["relevance_score"]

    mc3 = ModelConfig.from_dict(
        tiny_bert_dict(architectures=["BertForSequenceClassification"],
                       num_labels=3)
    )
    model3 = from_config(mc3, dtype=jnp.float32)
    params3 = model3.init_params(jax.random.PRNGKey(2))
    probs = EncoderRunner(model3, params3, token_buckets=(16, 32)).classify(
        [[1, 2, 3], [4, 5]]
    )
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_roberta_position_offset_and_head():
    from vllm_rust_tpu.models.bert import RobertaForSequenceClassification

    mc = ModelConfig.from_dict(
        tiny_bert_dict(architectures=["RobertaForSequenceClassification"])
    )
    model = RobertaForSequenceClassification(mc, dtype=jnp.float32)
    assert model.position_offset == 2
    h = mc.hidden_size
    rng = np.random.default_rng(0)
    params = model.load_weights(
        [
            ("roberta.embeddings.word_embeddings.weight",
             rng.normal(size=(mc.vocab_size, h)).astype(np.float32)),
            ("classifier.dense.weight", rng.normal(size=(h, h)).astype(np.float32)),
            ("classifier.dense.bias", np.zeros(h, np.float32)),
            ("classifier.out_proj.weight", rng.normal(size=(1, h)).astype(np.float32)),
            ("classifier.out_proj.bias", np.zeros(1, np.float32)),
        ]
    )
    assert params["pooler"]["weight"].shape == (h, h)
    assert params["classifier"]["weight"].shape == (h, 1)
    assert not np.allclose(np.asarray(params["pooler"]["weight"]), 0)

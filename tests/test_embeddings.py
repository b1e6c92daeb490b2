"""Embeddings path tests: pooling correctness, normalization, engine
interleave, HTTP endpoint."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config
from vllm_rust_tpu.tokenizer import MockTokenizer
from tests.test_model_forward import make_kv_pages, md_single_seq


def make_engine():
    mc = tiny_llama_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(model, params, cfg, tokenizer=MockTokenizer())


def test_embed_shapes_and_norm():
    eng = make_engine()
    embs = eng.embed([[1, 2, 3], [4, 5, 6, 7, 8], [9]])
    assert embs.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-5)
    # distinct inputs -> distinct embeddings
    assert not np.allclose(embs[0], embs[1])


def test_embed_mean_matches_manual():
    """Mean pooling must equal a hand-computed mean of hidden states."""
    eng = make_engine()
    toks = [3, 1, 4, 1, 5]
    embs = eng.embed([toks], normalize=False)

    model, params = eng.model, eng.params
    kv = make_kv_pages(model)
    hidden, _ = model(params, jnp.asarray(toks, jnp.int32), md_single_seq(5), kv)
    manual = np.asarray(hidden, np.float32).mean(axis=0)
    np.testing.assert_allclose(embs[0], manual, rtol=1e-4, atol=1e-5)


def test_embed_pooling_modes():
    eng = make_engine()
    toks = [[10, 20, 30, 40]]
    mean = eng.embed(toks, pooling="mean")
    last = eng.embed(toks, pooling="last")
    cls = eng.embed(toks, pooling="cls")
    assert not np.allclose(mean, last)
    assert not np.allclose(last, cls)


def test_embed_between_generations():
    """Embeds must not corrupt in-flight generation state."""
    eng = make_engine()
    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
    base = eng.generate([[7, 8, 9]], sp)[0].token_ids

    eng2 = make_engine()
    eng2.add_request("g", [7, 8, 9], sp)
    for _ in range(3):
        eng2.step()
    eng2.embed([[1, 2, 3, 4]] * 3)  # interleave embeds mid-generation
    done = None
    while eng2.has_unfinished:
        for o in eng2.step():
            if o.finished:
                done = o
    assert done.token_ids == base
    assert eng2.kv.num_free_pages == eng2.kv.pool.total_usable


def test_embed_deterministic():
    eng = make_engine()
    a = eng.embed([[5, 6, 7]])
    b = eng.embed([[5, 6, 7]])
    np.testing.assert_array_equal(a, b)
    # batched vs solo consistency
    c = eng.embed([[5, 6, 7], [1, 2]])
    np.testing.assert_allclose(a[0], c[0], rtol=1e-5, atol=1e-6)

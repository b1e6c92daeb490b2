"""Prefix caching tests: reuse, correctness, eviction, refcounts.

Reference: prefix_cache.rs tests + contract #5 (always leave >=1 token
to prefill)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.kv_cache.prefix_cache import PrefixCache, chunk_hash
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config


def make_engine(prefix=True, num_pages=64):
    mc = tiny_llama_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=num_pages, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=128),
        max_model_len=256,
        token_buckets=(16, 32, 64, 128),
        enable_prefix_caching=prefix,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(model, params, cfg)


def test_prefix_cache_unit():
    pc = PrefixCache()
    h1 = chunk_hash(0, (1, 2, 3))
    h2 = chunk_hash(h1, (4, 5, 6))
    pc.register(h1, 5)
    pc.register(h2, 6)
    assert pc.match([h1, h2]) == [5, 6]
    assert pc.match([h1, chunk_hash(h1, (9, 9, 9))]) == [5]
    # three refs on page 5 now (register + 2 matches)
    assert pc.release(5) and pc.release(5) and pc.release(5)
    assert pc.num_evictable == 1
    assert pc.evict() == 5
    assert pc.match([h1]) == []  # gone after eviction


def test_shared_prefix_reuse_and_correctness():
    """Second request with the same long prompt must reuse cached pages
    AND produce identical output."""
    prompt = list(np.arange(50) % 200 + 1)  # 50 tokens = 3 full pages + tail
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    base = make_engine(prefix=False).generate([prompt], sp)[0].token_ids

    eng = make_engine(prefix=True)
    out1 = eng.generate([prompt], sp)[0].token_ids
    assert out1 == base
    stats = eng.kv.prefix.stats
    assert stats.registered >= 3
    hits_before = stats.hits

    out2 = eng.generate([prompt], sp)[0].token_ids
    assert out2 == base, "cached-prefix generation diverged"
    assert eng.kv.prefix.stats.hits >= hits_before + 3, "no cache hits"
    r2 = eng.requests[[k for k in eng.requests if k.startswith("gen-")][-1]]
    assert r2.num_cached_tokens >= 48


def test_partial_prefix_reuse():
    common = list(range(1, 40))  # shares 2 full pages
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    eng = make_engine(prefix=True)
    eng.generate([common + [100, 101]], sp)
    out_nocache = make_engine(prefix=False).generate([common + [50, 51, 52]], sp)[0]
    out_cached = eng.generate([common + [50, 51, 52]], sp)[0]
    assert out_cached.token_ids == out_nocache.token_ids


def test_eviction_under_pressure():
    """Cache must give pages back when the pool runs dry."""
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    eng = make_engine(prefix=True, num_pages=16)  # 15 usable pages
    for i in range(8):
        prompt = [(i * 7 + j) % 200 + 1 for j in range(60)]  # 3 full pages each
        eng.generate([prompt], sp)
    assert eng.kv.prefix.stats.evictions > 0
    # engine still healthy
    out = eng.generate([[1, 2, 3]], sp)[0]
    assert len(out.token_ids) == 4


def test_reset_prefix_cache():
    sp = SamplingParams(max_tokens=2, temperature=0.0, ignore_eos=True)
    eng = make_engine(prefix=True)
    eng.generate([list(range(1, 40))], sp)
    assert eng.kv.prefix.num_evictable > 0
    freed = eng.reset_prefix_cache()
    assert freed > 0
    assert eng.kv.prefix.num_evictable == 0
    assert eng.kv.pool.num_free == eng.kv.pool.total_usable

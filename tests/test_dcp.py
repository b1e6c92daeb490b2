"""Decode context parallelism: sharded attention == single-device
attention (reference context_parallel.rs LSE-merge tests)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
from vllm_rust_tpu.ops.dcp import (
    attention_with_lse,
    dcp_attention,
    dcp_local_assignment,
    lse_merge,
)
from vllm_rust_tpu.ops.paged_attention import ragged_paged_attention_op

PAGE = 16


def md_decode(kv_lens, pages_rows, s_pad=4, t=4):
    """Decode-step metadata: one query token per sequence."""
    n_seqs = len(kv_lens)
    kv = np.zeros(s_pad, np.int32)
    kv[: len(kv_lens)] = kv_lens
    pg = np.zeros((s_pad, 8), np.int32)
    for i, row in enumerate(pages_rows):
        pg[i, : len(row)] = row
    cu = np.zeros(s_pad + 1, np.int32)
    cu[1 : n_seqs + 1] = np.arange(1, n_seqs + 1)
    cu[n_seqs + 1 :] = n_seqs
    return AttentionMetadata(
        slot_mapping=jnp.zeros(t, jnp.int32),
        kv_lens=jnp.asarray(kv),
        page_indices=jnp.asarray(pg),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([n_seqs], jnp.int32),
        positions=jnp.zeros(t, jnp.int32),
        logits_indices=jnp.zeros(s_pad, jnp.int32),
    )


def test_attention_with_lse_matches_softmax():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 4, 32)), jnp.float32)
    kv_pages = jnp.asarray(rng.normal(size=(8, PAGE, 4, 32)), jnp.float32)
    md = md_decode([20, 9], [[1, 2], [3]], t=2)
    out, lse = attention_with_lse(q, kv_pages, md, sm_scale=0.18)
    # reference op computes the same numbers with causal+len masking;
    # q_pos here = kv_len-1 (decode), so causal == length mask
    md2 = md_decode([20, 9], [[1, 2], [3]], t=2)
    ref = ragged_paged_attention_op(
        q, kv_pages, md2, sm_scale=0.18, backend="ref"
    )
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(ref[:2]), rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(lse[:2])).all()


def test_lse_merge_exactness():
    """Splitting a sequence's KV into two shards and merging must equal
    attention over the full KV."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 4, 32)), jnp.float32)
    kv_full = jnp.asarray(rng.normal(size=(8, PAGE, 4, 32)), jnp.float32)

    full = attention_with_lse(q, kv_full, md_decode([32], [[1, 2]], t=1), sm_scale=0.2)[0]

    # shard: rank0 gets page 1 (tokens 0..16), rank1 gets page 2 (16..32)
    out0, lse0 = attention_with_lse(q, kv_full, md_decode([16], [[1]], t=1), sm_scale=0.2)
    out1, lse1 = attention_with_lse(q, kv_full, md_decode([16], [[2]], t=1), sm_scale=0.2)

    outs = jnp.stack([out0, out1])
    lses = jnp.stack([lse0, lse1])
    merged = jax.vmap(lambda o, l: (o, l))(outs, lses)
    # manual merge math
    m = jnp.max(lses, axis=0)
    w = jnp.exp(lses - m)[..., None]
    merged = (outs * w).sum(0) / w.sum(0)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full), rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_dcp_shard_map():
    """End-to-end shard_map DCP on the virtual mesh: each rank holds half
    the KV; merged result equals single-device attention."""
    rng = np.random.default_rng(2)
    devices = jax.devices()[:2]
    mesh = Mesh(np.array(devices), ("sp",))
    q = jnp.asarray(rng.normal(size=(1, 4, 32)), jnp.float32)
    kv_full = jnp.asarray(rng.normal(size=(8, PAGE, 4, 32)), jnp.float32)
    full = attention_with_lse(
        q, kv_full, md_decode([32], [[1, 2]], t=1), sm_scale=0.2
    )[0]

    # per-rank local pools: rank r keeps its interleaved block in page 1
    assert dcp_local_assignment(32, world=2, rank=0, interleave=16) == [0]
    assert dcp_local_assignment(32, world=2, rank=1, interleave=16) == [1]
    kv_sharded = jnp.stack([kv_full, kv_full])  # same pool; local md differs
    md0 = md_decode([16], [[1]], t=1)
    md1 = md_decode([16], [[2]], t=1)
    md_stack = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), md0, md1)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("sp"), jax.tree_util.tree_map(lambda _: P("sp"), md0)),
        out_specs=P(),
    )
    def run(q, kv, md):
        kv = kv[0]
        md = jax.tree_util.tree_map(lambda x: x[0], md)
        return dcp_attention(q, kv, md, sm_scale=0.2, axis_name="sp")

    merged = run(q, kv_sharded, md_stack)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(full), rtol=2e-5, atol=2e-5
    )


# ---------------------------------------------------------------------------
# Engine-integrated DCP (VERDICT r2 #3): sp mesh axis, striped pool,
# shard_map attention in the production step — greedy == single-device.
# ---------------------------------------------------------------------------


def make_dcp_engine(dcp=1, num_pages=32):
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128,
    )
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=num_pages, page_size=PAGE),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
        decode_context_parallel_size=dcp,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(model, params, cfg)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_dcp_engine_matches_single_device():
    from vllm_rust_tpu.request import SamplingParams

    sp = SamplingParams(max_tokens=20, temperature=0.0, ignore_eos=True)
    prompts = [list(range(1, 20)), [9, 8, 7]]
    base = [o.token_ids for o in make_dcp_engine(dcp=1).generate(prompts, sp)]
    eng = make_dcp_engine(dcp=2)
    assert eng.mesh is not None and eng.mesh.shape["sp"] == 2
    # pool pages striped across the sp axis
    assert eng.kv.pool.stripes == 2
    got = [o.token_ids for o in eng.generate(prompts, sp)]
    assert got == base, f"DCP diverged: {got} vs {base}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dcp_with_tp_engine_matches_single_device():
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams
    from vllm_rust_tpu.testing import tiny_llama_config

    mc = tiny_llama_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128,
    )

    def build(dcp, tp):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(num_pages=32, page_size=PAGE),
            scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
            max_model_len=128,
            token_buckets=(16, 32, 64),
            tensor_parallel_size=tp,
            decode_context_parallel_size=dcp,
        )
        model = from_config(mc, dtype=jnp.float32)
        params = model.init_params(jax.random.PRNGKey(0))
        return LLMEngine(model, params, cfg)

    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
    prompts = [list(range(1, 20))]
    base = [o.token_ids for o in build(1, 1).generate(prompts, sp)]
    both = build(2, 2)
    assert both.mesh.shape == {"dp": 1, "sp": 2, "tp": 2}
    got = [o.token_ids for o in both.generate(prompts, sp)]
    assert got == base, f"DCP x TP diverged: {got} vs {base}"


def test_striped_pool_allocation_balances():
    from vllm_rust_tpu.kv_cache.block_pool import BlockPool, BlockTable

    pool = BlockPool(32, 16, stripes=4)
    t = BlockTable(pool)
    t.ensure_capacity(16 * 8)  # 8 pages
    stripes = [pool._stripe(p) for p in t.pages]
    # round-robin: two pages per stripe
    assert sorted(stripes) == [0, 0, 1, 1, 2, 2, 3, 3], stripes

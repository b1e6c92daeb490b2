"""Decode-attention v2 kernel (r4) vs the jittable reference.

Covers the engine-realistic cases: ragged lengths with partial last
pages, padded (zero-length) sequence rows, page-allocation patterns
(interleaved / contiguous — the span-DMA coalescing fast path), sliding
window, softcap, KV scales, host-side vs in-graph compaction, and the
multi-step-window semantics (compaction from END-of-window lens serving
an earlier step's smaller lens).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
from vllm_rust_tpu.ops.paged_attention import _ref_ragged_paged_attention
from vllm_rust_tpu.ops.pallas.decode_v2 import (
    compact_decode_pages,
    decode_attention_v2,
    prepare_decode_v2,
    supports,
)

rng = np.random.default_rng(7)
PAGE = 16
D = 128


def decode_md(kv_lens, pg, s_pad):
    n = len(kv_lens)
    kv = np.zeros(s_pad, np.int32)
    kv[:n] = kv_lens
    cu = np.zeros(s_pad + 1, np.int32)
    cu[1 : n + 1] = np.arange(1, n + 1)
    cu[n + 1 :] = n
    return AttentionMetadata(
        slot_mapping=jnp.zeros(s_pad, jnp.int32),
        kv_lens=jnp.asarray(kv),
        page_indices=jnp.asarray(pg),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([n], jnp.int32),
        positions=jnp.asarray(np.maximum(kv - 1, 0)[:s_pad]),
        logits_indices=jnp.zeros(s_pad, jnp.int32),
    )


def tables(kv_lens, s_pad, p_width, pattern):
    """Page table rows per allocation pattern; page 0 is the null page."""
    pg = np.zeros((s_pad, p_width), np.int32)
    nxt = 1
    if pattern == "contig":
        for i, L in enumerate(kv_lens):
            n = -(-L // PAGE)
            pg[i, :n] = nxt + np.arange(n)
            nxt += n
    else:  # interleaved: round-robin single-page grabs
        counts = [-(-L // PAGE) for L in kv_lens]
        for j in range(max(counts, default=0)):
            for i, c in enumerate(counts):
                if j < c:
                    pg[i, j] = nxt
                    nxt += 1
    return pg


def run_case(kv_lens, s_pad, p_width, pattern="interleaved", *, h=8, k=4,
             window=None, cap=None, k_scale=None, v_scale=None,
             prepared=None, pool_dtype=jnp.float32):
    pg = tables(kv_lens, s_pad, p_width, pattern)
    q = jnp.asarray(rng.normal(size=(s_pad, h, D)), jnp.float32)
    kv_pages = jnp.asarray(
        rng.normal(size=(40, PAGE, 2 * k, D)) * 0.3, pool_dtype
    )
    md = decode_md(kv_lens, pg, s_pad)
    got = decode_attention_v2(
        q, kv_pages, md.kv_lens, md.page_indices, prepared,
        sm_scale=0.11, sliding_window=window, soft_cap=cap,
        k_scale=k_scale, v_scale=v_scale,
    )
    want = _ref_ragged_paged_attention(
        q, kv_pages, md, sm_scale=0.11, sliding_window=window, soft_cap=cap,
        k_scale=k_scale, v_scale=v_scale,
    )
    n = len(kv_lens)
    np.testing.assert_allclose(
        np.asarray(got[:n]), np.asarray(want[:n]), atol=2e-2, rtol=2e-2
    )
    return md, q, kv_pages


@pytest.mark.parametrize("pattern", ["interleaved", "contig"])
def test_matches_ref_ragged_lengths(pattern):
    # partial last pages + a padded zero-length row
    run_case([37, 16, 50], 4, 8, pattern)


@pytest.mark.parametrize(
    "h,k", [(8, 8), (8, 1), (16, 4)]  # MHA, MQA, GQA
)
def test_head_layouts(h, k):
    run_case([37, 29], 2, 4, h=h, k=k)


def test_sliding_window():
    run_case([60, 33], 2, 4, window=20)


def test_softcap():
    run_case([60, 33], 2, 4, cap=30.0)


def test_kv_scales():
    run_case([40, 25], 2, 4, k_scale=0.5, v_scale=2.0)


def test_bf16_pool_f32_query():
    run_case([40, 25], 2, 4, pool_dtype=jnp.bfloat16)


def test_host_prepare_matches_in_graph():
    kv_lens = [37, 16, 50]
    pg = tables(kv_lens, 4, 8, "interleaved")
    lens = np.zeros(4, np.int32)
    lens[:3] = kv_lens
    host = prepare_decode_v2(lens, pg, page_size=PAGE, lmax=4 * 8)
    graph = compact_decode_pages(
        jnp.asarray(lens), jnp.asarray(pg), page_size=PAGE
    )
    for a, b in zip(host, graph):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prepared_path_matches_ref():
    kv_lens = [37, 16, 50]
    pg = tables(kv_lens, 4, 8, "contig")
    lens = np.zeros(4, np.int32)
    lens[:3] = kv_lens
    prepared = tuple(
        jnp.asarray(a)
        for a in prepare_decode_v2(lens, pg, page_size=PAGE, lmax=4 * 8)
    )
    run_case(kv_lens, 4, 8, "contig", prepared=prepared)


def test_window_end_lens_compaction():
    """Multi-step-window contract: compaction computed from END-of-window
    lens (pages preallocated, some not yet filled) must give the same
    result for an earlier step's smaller kv_lens."""
    kv_lens = [37, 16, 50]
    end_lens = np.zeros(4, np.int32)
    end_lens[:3] = [L + 7 for L in kv_lens]  # 7 more decode steps ahead
    pg = tables([L + 7 for L in kv_lens], 4, 8, "interleaved")
    prepared = tuple(
        jnp.asarray(a)
        for a in prepare_decode_v2(end_lens, pg, page_size=PAGE, lmax=4 * 8)
    )
    q = jnp.asarray(rng.normal(size=(4, 8, D)), jnp.float32)
    kv_pages = jnp.asarray(rng.normal(size=(40, PAGE, 8, D)) * 0.3, jnp.float32)
    md = decode_md(kv_lens, pg, 4)
    got = decode_attention_v2(
        q, kv_pages, md.kv_lens, md.page_indices, prepared, sm_scale=0.11
    )
    want = _ref_ragged_paged_attention(q, kv_pages, md, sm_scale=0.11,
                                       sliding_window=None, soft_cap=None)
    np.testing.assert_allclose(
        np.asarray(got[:3]), np.asarray(want[:3]), atol=2e-2, rtol=2e-2
    )


def test_supports_gate():
    assert supports(128, 16, jnp.bfloat16, 8)
    assert supports(256, 16, jnp.bfloat16, 8)
    assert not supports(64, 16, jnp.bfloat16, 8)  # head_dim not 128-aligned
    assert not supports(128, 16, jnp.int8, 8)  # packed pools: ragged fallback
    assert not supports(128, 16, jnp.bfloat16, 4)  # 2K=8 < bf16 sublane 16
    assert supports(128, 16, jnp.float32, 4)  # 2K=8 == f32 sublane 8
    assert supports(128, 8, jnp.float32, 8)

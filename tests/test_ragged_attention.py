"""In-house ragged paged attention kernel vs the XLA reference path.

Mirrors the reference's kernel-vs-CPU-port pinning strategy (SURVEY §4
GPU tests; crates/core/kernels/paged_attention.cu dtype x KV-quant x
ALiBi matrix) across the full feature matrix: mixed prefill+decode,
GQA, sliding window, softcap, sinks, ALiBi(+sqrt), quantized KV, LSE.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
from vllm_rust_tpu.ops.paged_attention import _ref_ragged_paged_attention
from vllm_rust_tpu.ops.pallas.ragged_attention import (
    ragged_paged_attention_pallas,
)

PAGE_SIZE = 16
NUM_PAGES = 128
P = 16  # pages per seq
S = 4  # seq pad


def make_case(seed, q_lens, kv_lens, h=8, kh=4, d=128, kv_dtype=jnp.float32):
    """Random q + KV pool + metadata for a mixed batch."""
    rng = np.random.RandomState(seed)
    t = sum(q_lens)
    q = jnp.asarray(rng.randn(t, h, d), jnp.float32) * 0.3

    kv_pages = jnp.asarray(
        rng.randn(NUM_PAGES, PAGE_SIZE, 2 * kh, d), jnp.float32
    ) * 0.3
    if kv_dtype == jnp.int8:
        kv_pages = jnp.clip(jnp.round(kv_pages * 50), -127, 127).astype(
            jnp.int8
        )

    n = len(q_lens)
    cu = np.zeros(S + 1, np.int32)
    cu[1 : n + 1] = np.cumsum(q_lens)
    cu[n + 1 :] = cu[n]
    kv = np.zeros(S, np.int32)
    kv[:n] = kv_lens
    pages = np.zeros((S, P), np.int32)
    next_free = 1
    for i in range(n):
        need = -(-kv_lens[i] // PAGE_SIZE)
        pages[i, :need] = np.arange(next_free, next_free + need)
        next_free += need
    md = AttentionMetadata(
        slot_mapping=jnp.zeros((t,), jnp.int32),
        kv_lens=jnp.asarray(kv),
        page_indices=jnp.asarray(pages),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([n], jnp.int32),
        positions=jnp.zeros((t,), jnp.int32),
        logits_indices=jnp.zeros((S,), jnp.int32),
    )
    return q, kv_pages, md


def run_both(q, kv_pages, md, **kw):
    ref_kw = dict(kw)
    ref_kw.pop("num_queries_per_block", None)
    ref = _ref_ragged_paged_attention(
        q, kv_pages, md,
        sm_scale=kw.get("sm_scale", 0.125),
        sliding_window=kw.get("sliding_window"),
        soft_cap=kw.get("soft_cap"),
        k_scale=kw.get("k_scale"),
        v_scale=kw.get("v_scale"),
        sinks=kw.get("sinks"),
        alibi_slopes=kw.get("alibi_slopes"),
        alibi_sqrt=kw.get("alibi_sqrt", False),
    )
    got = ragged_paged_attention_pallas(
        q, kv_pages, md.kv_lens, md.page_indices, md.cu_q_lens, md.num_seqs,
        kw.get("sinks"), kw.get("alibi_slopes"),
        sm_scale=kw.get("sm_scale", 0.125),
        sliding_window=kw.get("sliding_window"),
        soft_cap=kw.get("soft_cap"),
        k_scale=kw.get("k_scale"),
        v_scale=kw.get("v_scale"),
        alibi_sqrt=kw.get("alibi_sqrt", False),
        num_queries_per_block=kw.get("num_queries_per_block", 32),
    )
    t = int(md.cu_q_lens[md.num_seqs[0]])
    np.testing.assert_allclose(
        np.asarray(got)[:t], np.asarray(ref)[:t], rtol=2e-3, atol=2e-3
    )


def test_mixed_prefill_decode():
    q, kv, md = make_case(0, q_lens=[40, 1, 1, 7], kv_lens=[40, 33, 17, 50])
    run_both(q, kv, md)


def test_pure_prefill_single_seq():
    q, kv, md = make_case(1, q_lens=[100], kv_lens=[100])
    run_both(q, kv, md)


def test_chunked_prefill_continuation():
    # q covers the TAIL of the kv (chunk 2 of a chunked prefill)
    q, kv, md = make_case(2, q_lens=[32, 1], kv_lens=[96, 12])
    run_both(q, kv, md)


def test_pure_decode():
    q, kv, md = make_case(3, q_lens=[1, 1, 1, 1], kv_lens=[30, 64, 5, 128])
    run_both(q, kv, md)


def test_mqa():
    q, kv, md = make_case(4, q_lens=[17, 3], kv_lens=[40, 20], h=8, kh=1)
    run_both(q, kv, md)


def test_no_gqa():
    q, kv, md = make_case(5, q_lens=[25, 1], kv_lens=[25, 77], h=4, kh=4)
    run_both(q, kv, md)


def test_sliding_window():
    q, kv, md = make_case(6, q_lens=[60, 1], kv_lens=[60, 120])
    run_both(q, kv, md, sliding_window=24)


def test_sliding_window_small():
    q, kv, md = make_case(7, q_lens=[50], kv_lens=[50])
    run_both(q, kv, md, sliding_window=8)


def test_softcap():
    q, kv, md = make_case(8, q_lens=[33, 1], kv_lens=[33, 90])
    run_both(q, kv, md, soft_cap=30.0)


def test_sinks():
    q, kv, md = make_case(9, q_lens=[20, 1, 5], kv_lens=[20, 40, 36])
    sinks = jnp.asarray(np.random.RandomState(0).randn(8), jnp.float32)
    run_both(q, kv, md, sinks=sinks)


def test_sinks_with_window():
    q, kv, md = make_case(10, q_lens=[40, 1], kv_lens=[40, 70])
    sinks = jnp.asarray(np.random.RandomState(1).randn(8), jnp.float32)
    run_both(q, kv, md, sinks=sinks, sliding_window=16)


def test_alibi():
    q, kv, md = make_case(11, q_lens=[30, 1], kv_lens=[30, 55])
    slopes = jnp.asarray(
        [2.0 ** (-i - 1) for i in range(8)], jnp.float32
    )
    run_both(q, kv, md, alibi_slopes=slopes)


def test_alibi_sqrt():
    q, kv, md = make_case(12, q_lens=[22, 1], kv_lens=[22, 48])
    slopes = jnp.asarray(
        [2.0 ** (-i - 1) for i in range(8)], jnp.float32
    )
    run_both(q, kv, md, alibi_slopes=slopes, alibi_sqrt=True)


def test_int8_kv_dequant():
    q, kv, md = make_case(
        13, q_lens=[28, 1], kv_lens=[28, 60], kv_dtype=jnp.int8
    )
    run_both(q, kv, md, k_scale=0.02, v_scale=0.02)


def test_small_q_block():
    q, kv, md = make_case(14, q_lens=[9, 2, 1], kv_lens=[9, 30, 14])
    run_both(q, kv, md, num_queries_per_block=16)


def test_lse_matches_manual():
    # attention_with_lse is the DCP decode path (each q token attends the
    # whole local kv, no causal mask) — compare on a pure-decode batch
    from vllm_rust_tpu.ops.dcp import attention_with_lse

    q, kv, md = make_case(15, q_lens=[1, 1], kv_lens=[24, 40])
    ref_out, ref_lse = attention_with_lse(q, kv, md, sm_scale=0.125)
    got_out, got_lse = ragged_paged_attention_pallas(
        q, kv, md.kv_lens, md.page_indices, md.cu_q_lens, md.num_seqs,
        sm_scale=0.125, return_lse=True,
    )
    t = int(md.cu_q_lens[md.num_seqs[0]])
    np.testing.assert_allclose(
        np.asarray(got_out)[:t], np.asarray(ref_out)[:t], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_lse)[:t], np.asarray(ref_lse)[:t], rtol=2e-3, atol=2e-3
    )


def test_large_page_size_pool():
    """page_size 64 -> pb=2 spans."""
    rng = np.random.RandomState(20)
    h, kh, d, ps = 8, 4, 128, 64
    q_lens, kv_lens = [40, 1], [40, 100]
    t = sum(q_lens)
    q = jnp.asarray(rng.randn(t, h, d), jnp.float32) * 0.3
    kv_pages = jnp.asarray(rng.randn(32, ps, 2 * kh, d), jnp.float32) * 0.3
    cu = np.zeros(S + 1, np.int32)
    cu[1:3] = np.cumsum(q_lens)
    cu[3:] = cu[2]
    kvl = np.zeros(S, np.int32)
    kvl[:2] = kv_lens
    pages = np.zeros((S, 4), np.int32)
    pages[0, :1] = [1]
    pages[1, :2] = [2, 3]
    md = AttentionMetadata(
        slot_mapping=jnp.zeros((t,), jnp.int32),
        kv_lens=jnp.asarray(kvl),
        page_indices=jnp.asarray(pages),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([2], jnp.int32),
        positions=jnp.zeros((t,), jnp.int32),
        logits_indices=jnp.zeros((S,), jnp.int32),
    )
    run_both(q, kv_pages, md)

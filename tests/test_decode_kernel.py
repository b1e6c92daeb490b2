"""Decode-shaped batches through the in-house ragged kernel vs the
jittable reference.

(r4: the dedicated per-(seq,page) decode kernel and the r3 batched-seq
kernel were deleted — both measured slower than the stock kernel, and
decode_v2 (tests/test_decode_v2.py) replaced them as the production
path. The in-house ragged kernel remains the fallback for geometries /
features v2 doesn't serve, so decode-shaped batches are pinned against
the reference HERE through backend="pallas".)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
from vllm_rust_tpu.ops.paged_attention import ragged_paged_attention_op

rng = np.random.default_rng(0)
PAGE = 16


def pallas_decode(q, kv_pages, md, sinks=None, alibi=None, **kw):
    return ragged_paged_attention_op(
        q, kv_pages, md, sinks, alibi, backend="pallas", **kw
    )


def decode_md(kv_lens, pages_rows, s_pad, p_width):
    n = len(kv_lens)
    kv = np.zeros(s_pad, np.int32)
    kv[:n] = kv_lens
    pg = np.zeros((s_pad, p_width), np.int32)
    for i, row in enumerate(pages_rows):
        pg[i, : len(row)] = row
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


@pytest.mark.parametrize(
    "h,k,d,window,cap",
    [
        (8, 4, 32, None, None),
        (8, 8, 32, None, None),  # MHA
        (8, 1, 32, None, None),  # MQA
        (8, 4, 32, 20, None),  # sliding window
        (8, 4, 32, None, 30.0),  # softcap
    ],
)
def test_decode_kernel_matches_ref(h, k, d, window, cap):
    s_pad, p_width = 4, 4
    kv_lens = [37, 16, 50]
    pages_rows = [[1, 2, 3], [4], [5, 6, 7, 8]]
    q = jnp.asarray(rng.normal(size=(s_pad, h, d)), jnp.float32)
    kv_pages = jnp.asarray(rng.normal(size=(10, PAGE, 2 * k, d)), jnp.float32)
    md = decode_md(kv_lens, pages_rows, s_pad, p_width)

    out_kernel = pallas_decode(
        q, kv_pages, md,
        sm_scale=0.17, sliding_window=window, soft_cap=cap,
    )
    out_ref = ragged_paged_attention_op(
        q, kv_pages, md, sm_scale=0.17, sliding_window=window, soft_cap=cap,
        backend="ref",
    )
    np.testing.assert_allclose(
        np.asarray(out_kernel[:3]), np.asarray(out_ref[:3]),
        rtol=2e-5, atol=2e-5,
    )


def test_decode_kernel_quantized_kv():
    s_pad, p_width, h, k, d = 4, 2, 4, 2, 32
    kv_lens = [20]
    q = jnp.asarray(rng.normal(size=(s_pad, h, d)), jnp.float32)
    kv_f = rng.normal(size=(4, PAGE, 2 * k, d)) * 0.2
    scale = 0.01
    kv_int8 = jnp.asarray(
        np.clip(np.round(kv_f / scale), -128, 127), jnp.int8
    )
    md = decode_md(kv_lens, [[1, 2]], s_pad, p_width)
    out_q = pallas_decode(
        q, kv_int8, md, sm_scale=0.2, k_scale=scale, v_scale=scale,
    )
    kv_deq = jnp.asarray(np.asarray(kv_int8, np.float32) * scale, jnp.float32)
    out_f = pallas_decode(q, kv_deq, md, sm_scale=0.2)
    np.testing.assert_allclose(
        np.asarray(out_q[:1]), np.asarray(out_f[:1]), rtol=1e-5, atol=1e-5
    )


def test_decode_kernel_alibi_matches_ref():
    from vllm_rust_tpu.layers.attention import alibi_slopes

    h, k, d = 8, 4, 32
    s_pad, p_width = 4, 4
    kv_lens = [37, 16, 50]
    pages_rows = [[1, 2, 3], [4], [5, 6, 7, 8]]
    q = jnp.asarray(rng.normal(size=(s_pad, h, d)), jnp.float32)
    kv_pages = jnp.asarray(rng.normal(size=(10, PAGE, 2 * k, d)), jnp.float32)
    md = decode_md(kv_lens, pages_rows, s_pad, p_width)
    slopes = jnp.asarray(alibi_slopes(h), jnp.float32)

    out_kernel = pallas_decode(
        q, kv_pages, md, None, slopes, sm_scale=0.17,
    )
    out_ref = ragged_paged_attention_op(
        q, kv_pages, md, None, slopes, sm_scale=0.17, backend="ref"
    )
    np.testing.assert_allclose(
        np.asarray(out_kernel[:3]), np.asarray(out_ref[:3]),
        rtol=2e-5, atol=2e-5,
    )


def test_alibi_ref_matches_dense():
    """ALiBi ref path vs an explicit dense-attention computation."""
    h, d = 4, 16
    t = 12  # single sequence, full prefill
    q = rng.normal(size=(t, h, d)).astype(np.float32)
    keys = rng.normal(size=(t, h, d)).astype(np.float32)
    vals = rng.normal(size=(t, h, d)).astype(np.float32)

    from vllm_rust_tpu.layers.attention import alibi_slopes

    slopes = np.asarray(alibi_slopes(h), np.float32)
    # dense reference
    scores = np.einsum("qhd,khd->hqk", q, keys) * 0.25
    dist = np.arange(t)[None, :] - np.arange(t)[:, None]  # key - query
    scores += slopes[:, None, None] * dist[None]
    scores = np.where(dist[None] <= 0, scores, -1e30)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    want = np.einsum("hqk,khd->qhd", w, vals)

    # paged layout: one sequence, one page of 16
    kv_pages = np.zeros((2, PAGE, 2 * h, d), np.float32)
    kv_pages[1, :t, 0::2] = keys
    kv_pages[1, :t, 1::2] = vals
    md = AttentionMetadata(
        slot_mapping=jnp.arange(t, dtype=jnp.int32) + PAGE,
        kv_lens=jnp.asarray([t], jnp.int32),
        page_indices=jnp.asarray([[1]], jnp.int32),
        cu_q_lens=jnp.asarray([0, t], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        logits_indices=jnp.asarray([t - 1], jnp.int32),
    )
    got = ragged_paged_attention_op(
        jnp.asarray(q), jnp.asarray(kv_pages), md, None,
        jnp.asarray(slopes), sm_scale=0.25, backend="ref",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

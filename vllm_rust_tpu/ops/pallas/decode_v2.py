"""Decode attention v2: single-program batched-seq kernel (r4).

The r3 attribution doc (docs/perf/r3-decode-attribution.md) pinned decode
attention as the #1 step cost — the stock ragged kernel spends 3.1 ms/step
moving 0.47 GB (152 GB/s on an 819 GB/s part) and every in-house kernel
lost to it. This kernel is the prescribed marriage of batched-q rows and
multi-page span DMA, rebuilt around four findings from that doc:

1. **Dynamic chunk loop, not a static grid.** The engine's page table is
   [S, max_model_len/ps] — at serving geometry ~15/16 of it is dead. The
   r3 batched kernel's static grid walked every chunk; here ONE grid
   program runs a `fori_loop` whose bound is the *live* chunk count (a
   scalar), so dead table entries cost nothing.
2. **Lane-aligned head slices.** The KV pool is passed as
   ``[pages, ps, 2K*D]`` (a free XLA reshape of the engine layout
   ``[pages, ps, 2K, D]``): head h's K lives at columns ``2h*D`` and its V
   at ``(2h+1)*D``. With D a multiple of 128 these are whole-tile column
   slices — no sublane-strided relayout (the r3 kernel's
   ``kv[:, 2kh, :]`` was one) and no bitcast tricks (the stock kernel's
   u32 pack/shift dance, jax .../ragged_paged_attention/kernel.py
   strided_load_kv, exists only to dodge this relayout).
3. **Register-carried flash state.** (m, l, acc) ride the fori_loop carry
   — Mosaic keeps them in vregs/VMEM as it sees fit — instead of
   broadcast-writing [K, SG, 128] m/l scratch tiles every chunk
   (~4 MB/layer of pure bookkeeping traffic in the r3 kernel).
4. **Span-coalesced DMA.** A per-chunk scalar holds the first page id iff
   the chunk's pb pages are consecutive in the pool: one pb-page DMA
   instead of pb page-sized ones. The engine's block pool allocates
   prefill runs contiguously, so steady-state decode coalesces most
   chunks (see kv_cache/block_pool.py allocate_contiguous).

MXU math stays in the source dtypes (bf16 q × bf16 KV, f32 accumulate);
the r3 kernels upcast K/V/q to f32 first, materializing an extra
~100 KB per (head, chunk) in VMEM for no precision gain over f32
accumulation.

Reference counterpart: paged_attention.cu V2's partitioned decode
(crates/core/kernels/paged_attention.cu:1-1199) — re-thought for the MXU:
batched [S*G, span] dots instead of a warp-per-sequence layout.

Covers GQA/MQA, length masking, sliding window, logit softcap. The
k_scale/v_scale hooks exist for quantized pools, but supports() gates on
16/32-bit KV dtypes (1-byte pools would need packed strided loads), so
fp8/int8 KV currently routes to the in-house ragged kernel along with
sinks/ALiBi and non-128-multiple head dims (ops/paged_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import interpret_kernels

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    # scalar prefetch
    lens_ref,  # [S] kv_lens
    pages_ref,  # [L] compacted live page ids (pool page per live slot)
    meta_ref,  # [L] owner*2**16 + local_page_idx per live slot (owner==S*2 for pad)
    contig_ref,  # [C] first page id if the chunk's pb pages are consecutive, else -1
    nchunks_ref,  # [1] live chunk count
    # inputs
    q_ref,  # [K, SG, D] (VMEM)
    kv_hbm_ref,  # [pages, ps, 2K, D] (ANY/HBM) — the engine pool, unreshaped
    # outputs
    o_ref,  # [K, SG, D]
    # scratch
    kv_buf,  # [2, pb, ps, 2K, D] pool dtype
    sems,  # [2, pb]
    *,
    pb: int,
    page_size: int,
    num_kv_heads: int,
    group: int,
    sm_scale: float,
    sliding_window: int | None,
    soft_cap: float | None,
    k_scale: float | None,
    v_scale: float | None,
    use_bitcast: bool,
    ablate: str = "",
):
    n_chunks = nchunks_ref[0]
    ps = page_size
    span = pb * ps
    k_heads = num_kv_heads
    g = group
    sg, d = q_ref.shape[1], q_ref.shape[2]

    def start_dma(c, slot):
        c0 = contig_ref[c]

        @pl.when(c0 >= 0)
        def _one():
            pltpu.make_async_copy(
                kv_hbm_ref.at[pl.ds(c0, pb)], kv_buf.at[slot], sems.at[slot, 0]
            ).start()

        @pl.when(c0 < 0)
        def _many():
            for j in range(pb):
                page = pages_ref[c * pb + j]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                ).start()

    def wait_dma(c, slot):
        c0 = contig_ref[c]

        @pl.when(c0 >= 0)
        def _one():
            pltpu.make_async_copy(
                kv_hbm_ref.at[pl.ds(c0, pb)], kv_buf.at[slot], sems.at[slot, 0]
            ).wait()

        @pl.when(c0 < 0)
        def _many():
            for j in range(pb):
                page = pages_ref[c * pb + j]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                ).wait()

    if ablate == "empty":  # timing ablation: call + prefetch cost only
        for kh in range(k_heads):
            o_ref[kh] = q_ref[kh]
        return

    # n_chunks can be 0 in direct/test calls (all kv_lens zero): an
    # unconditional start here would leave the DMA semaphore unconsumed
    # at kernel exit (the fori_loop below never waits it) — undefined
    # behavior in Mosaic
    @pl.when(n_chunks > 0)
    def _first():
        start_dma(0, 0)

    row_seq = jax.lax.broadcasted_iota(jnp.int32, (sg, 1), 0) // g  # [SG,1]

    def chunk_body(c, carry):
        # carry: per-head tuples ((m [SG,1], l [SG,1], acc [SG,D]) f32,)*K
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            start_dma(c + 1, 1 - slot)

        wait_dma(c, slot)

        if ablate == "dma":  # timing ablation: DMA + loop skeleton only
            return carry

        # column metadata from SMEM scalars: owning seq, kv position, kv len
        num_seqs = lens_ref.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
        owner_row = jnp.zeros((1, span), jnp.int32)
        kvbase_row = jnp.zeros((1, span), jnp.int32)
        len_row = jnp.zeros((1, span), jnp.int32)
        for j in range(pb):
            meta = meta_ref[c * pb + j]
            owner_j = meta >> 16
            len_j = jnp.where(
                owner_j < num_seqs,
                lens_ref[jnp.clip(owner_j, 0, num_seqs - 1)],
                0,
            )
            sel = (col // ps) == j
            owner_row = jnp.where(sel, owner_j, owner_row)
            kvbase_row = jnp.where(sel, (meta & 0xFFFF) * ps, kvbase_row)
            len_row = jnp.where(sel, len_j, len_row)
        kvpos = kvbase_row + jax.lax.rem(col, ps)  # [1, span]
        if ablate == "nomask":  # timing ablation: skip metadata-derived mask
            valid = jnp.ones((sg, span), bool)
        else:
            valid = (owner_row == row_seq) & (kvpos < len_row)  # [SG, span]
        if sliding_window is not None:
            # decode: every row's q position is its sequence's last token
            valid &= kvpos > (len_row - 1 - sliding_window)

        # flat (token, combined-head)-row view of this chunk's buffer; the
        # collapse is free because (2K, D) is a whole sublane tile (see
        # supports())
        kvr = kv_buf.at[slot].reshape(span * 2 * k_heads, d)
        new_carry = []
        for kh in range(k_heads):
            if use_bitcast:
                # bf16 K/V of one head sit in adjacent rows -> one u32
                # row: ONE strided load per head yields both (same idiom
                # as the stock kernel's strided_load_kv, jax
                # .../ragged_paged_attention/kernel.py:361-393)
                b = kvr.bitcast(jnp.uint32)[kh::k_heads, :]  # [span, D] u32
                k_mat = pltpu.bitcast(b << 16, jnp.float32).astype(jnp.bfloat16)
                v_mat = pltpu.bitcast(
                    b & jnp.uint32(0xFFFF0000), jnp.float32
                ).astype(jnp.bfloat16)
            else:
                k_mat = kvr[2 * kh :: 2 * k_heads, :]  # [span, D]
                v_mat = kvr[2 * kh + 1 :: 2 * k_heads, :]
            q_kh = q_ref[kh]  # [SG, D]
            if k_mat.dtype != q_kh.dtype:  # quantized pools: widen for MXU
                k_mat = k_mat.astype(q_kh.dtype)
                v_mat = v_mat.astype(q_kh.dtype)
            scores = jax.lax.dot_general(
                q_kh,
                k_mat,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            eff_scale = sm_scale * (k_scale if k_scale is not None else 1.0)
            scores = scores * eff_scale
            if soft_cap is not None:
                scores = soft_cap * jnp.tanh(scores / soft_cap)
            scores = jnp.where(valid, scores, NEG_INF)

            m_prev, l_prev, acc_prev = carry[kh]
            if ablate == "noflash":  # timing ablation: dots only
                pv = jax.lax.dot_general(
                    scores.astype(v_mat.dtype), v_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                new_carry.append((m_prev, l_prev, acc_prev + pv))
                continue
            m_cur = jnp.max(scores, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new).astype(v_mat.dtype)
            l_new = alpha * l_prev + jnp.sum(
                e.astype(jnp.float32), axis=1, keepdims=True
            )
            pv = jax.lax.dot_general(
                e,
                v_mat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_carry.append((m_new, l_new, acc_prev * alpha + pv))
        return tuple(new_carry)

    init = tuple(
        (
            jnp.full((sg, 1), NEG_INF, jnp.float32),
            jnp.zeros((sg, 1), jnp.float32),
            jnp.zeros((sg, d), jnp.float32),
        )
        for _ in range(k_heads)
    )
    final = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    vs = v_scale if v_scale is not None else 1.0
    for kh in range(k_heads):
        _, l_fin, acc_fin = final[kh]
        denom = jnp.maximum(l_fin, 1e-30)
        o_ref[kh] = ((acc_fin * vs) / denom).astype(o_ref.dtype)


def supports(head_dim: int, page_size: int, kv_dtype, num_kv_heads: int) -> bool:
    """Geometry gate: D%128==0 keeps every row tile-aligned; the in-kernel
    flat row view [pb*ps*2K, D] of the rank-4 buffer is only a free
    reshape when the (2K, D) plane is whole sublane tiles (2K a multiple
    of the dtype's sublane count); sub-16-bit pools would need the stock
    kernel's packed strided loads (unimplemented here — they fall back to
    the in-house ragged kernel)."""
    itemsize = jnp.dtype(kv_dtype).itemsize
    sublane = {4: 8, 2: 16}.get(itemsize)
    return (
        head_dim % 128 == 0
        and sublane is not None
        and (2 * num_kv_heads) % sublane == 0
    )


def compact_decode_pages(
    kv_lens: jax.Array,  # [S] i32
    page_indices: jax.Array,  # [S, P] i32
    *,
    page_size: int,
    pb: int = 8,
):
    """In-graph (XLA) live-page compaction — the traced twin of
    prepare_decode_v2. Cheap vector ops, but NOT hoisted by XLA out of
    scan/while bodies, so callers inside loops should run it once up
    front (the engine step does, before its decode window fori_loop)
    and pass the result through AttentionMetadata.decode_prepared.

    When computed from END-of-window kv_lens, the same arrays serve every
    step of a multi-step window: pages that only fill up mid-window are
    masked per step by the kernel's `kvpos < len` check.
    """
    s, p = page_indices.shape
    lmax_pad = ((s * p + pb - 1) // pb) * pb
    cmax = lmax_pad // pb
    n_pages_per_seq = (kv_lens + page_size - 1) // page_size  # [S]
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_pages_per_seq).astype(jnp.int32)]
    )  # [S+1]
    total_live = cum[s]
    slot = jnp.arange(lmax_pad, dtype=jnp.int32)
    owner = jnp.clip(
        jnp.searchsorted(cum, slot, side="right") - 1, 0, s - 1
    ).astype(jnp.int32)
    local = slot - cum[owner]
    live = slot < total_live
    pages_flat = jnp.where(
        live, page_indices[owner, jnp.clip(local, 0, p - 1)], 0
    ).astype(jnp.int32)
    # pad slots get owner 2*S (matches no row, len lookup -> 0)
    meta = jnp.where(live, (owner << 16) | local, (2 * s) << 16).astype(jnp.int32)
    # chunk is coalescible iff fully live and its pages are consecutive
    pg = pages_flat.reshape(cmax, pb)
    consec = (
        jnp.all(pg[:, 1:] == pg[:, :-1] + 1, axis=1)
        if pb > 1
        else jnp.ones((cmax,), bool)
    )
    full = live.reshape(cmax, pb).all(axis=1)
    contig = jnp.where(consec & full, pg[:, 0], -1).astype(jnp.int32)
    n_chunks = ((total_live + pb - 1) // pb).astype(jnp.int32).reshape(1)
    return pages_flat, meta, contig, n_chunks


def prepare_decode_v2(
    kv_lens,  # [S] int array (numpy or jax; host values)
    page_indices,  # [S, P] int array
    *,
    page_size: int,
    pb: int = 8,
    lmax: int | None = None,
):
    """Host-side compaction of the live page list (numpy — the engine
    builds its page tables on host anyway, so this adds no device work).

    Returns (pages_flat [L], meta [L], contig [C], n_chunks [1]) as numpy
    int32, with L the pb-aligned live-page bound. When called inside a
    multi-step decode window, pass the END-of-window kv_lens: pages that
    only become live mid-window are included and masked off per step by
    the kernel's `kvpos < len` check, so one compaction serves the whole
    window (see engine/step_fn.py).

    `lmax` pads L up to a fixed bucket so jit keys stay stable.
    """
    import numpy as np

    kv_lens = np.asarray(kv_lens)
    page_indices = np.asarray(page_indices)
    s, p = page_indices.shape
    n_per_seq = -(-kv_lens // page_size)  # ceil
    total_live = int(n_per_seq.sum())
    n_chunks = -(-total_live // pb)
    size = max(n_chunks * pb, pb)
    if lmax is not None:
        size = max(size, ((lmax + pb - 1) // pb) * pb)
    pages_flat = np.zeros((size,), np.int32)
    meta = np.full((size,), (2 * s) << 16, np.int32)  # pad: matches no seq
    pos = 0
    for i in range(s):
        n = int(n_per_seq[i])
        if n == 0:
            continue
        pages_flat[pos : pos + n] = page_indices[i, :n]
        meta[pos : pos + n] = (i << 16) | np.arange(n, dtype=np.int32)
        pos += n
    pg = pages_flat.reshape(-1, pb)
    full = (meta.reshape(-1, pb) >> 16 < s).all(axis=1)
    consec = (
        (pg[:, 1:] == pg[:, :-1] + 1).all(axis=1) if pb > 1 else np.ones(len(pg), bool)
    )
    contig = np.where(consec & full, pg[:, 0], -1).astype(np.int32)
    return pages_flat, meta, contig, np.array([n_chunks], np.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "sliding_window", "soft_cap", "k_scale", "v_scale", "pb",
        "ablate",
    ),
)
def decode_attention_v2(
    q: jax.Array,  # [S, H, D] — one query token per sequence
    kv_pages: jax.Array,  # [pages, ps, 2K, D]
    kv_lens: jax.Array,  # [S] i32
    page_indices: jax.Array,  # [S, P] i32 (unused when prepared is given)
    prepared=None,  # optional (pages_flat, meta, contig, n_chunks) from prepare_decode_v2
    *,
    sm_scale: float,
    sliding_window: int | None = None,
    soft_cap: float | None = None,
    k_scale: float | None = None,
    v_scale: float | None = None,
    pb: int = 8,
    ablate: str = "",  # timing forensics only: "dma" | "nomask" | "noflash"
) -> jax.Array:
    s, h, d = q.shape
    num_pages, page_size, combined, _ = kv_pages.shape
    num_kv = combined // 2
    g = h // num_kv

    if prepared is not None:
        pages_flat, meta, contig, n_chunks = prepared
    else:
        # in-graph fallback compaction (tests, direct calls). CSE'd across
        # unrolled layer calls; the engine step precomputes this ONCE per
        # dispatch instead (compact_decode_pages in step_fn.py) because
        # XLA does not hoist it out of scanned/while-looped callers.
        pages_flat, meta, contig, n_chunks = compact_decode_pages(
            kv_lens, page_indices, page_size=page_size, pb=pb
        )

    # ---- q/o head-major layout -------------------------------------------
    # The pool is passed UNRESHAPED: on TPU a [pages, ps, 2K, D] ->
    # [pages, ps, 2K*D] reshape is a physical retiling, and with the
    # donated pool mutating every engine step XLA must materialize it —
    # a pool-sized copy per layer per step (r4 finding: drove the engine
    # bench to 594 tok/s). The kernel splits K/V heads in VMEM instead
    # (u32 bitcast trick above).
    q_heads = q.reshape(s, num_kv, g, d).transpose(1, 0, 2, 3).reshape(num_kv, s * g, d)

    kernel = functools.partial(
        _kernel,
        pb=pb,
        page_size=page_size,
        num_kv_heads=num_kv,
        group=g,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
        # bf16 K/V-pair bitcast split needs compiled Mosaic (interpret
        # mode lacks ref.bitcast); interpret/f32 use plain strided loads
        use_bitcast=(kv_pages.dtype == jnp.bfloat16 and not interpret_kernels()),
        ablate=ablate,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((num_kv, s * g, d), lambda *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((num_kv, s * g, d), lambda *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, pb, page_size, combined, d), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, pb)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_kv, s * g, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_kernels(),
        name="decode_attention_v2",
    )(kv_lens, pages_flat, meta, contig, n_chunks, q_heads, kv_pages)
    return out.reshape(num_kv, s, g, d).transpose(1, 0, 2, 3).reshape(s, h, d)

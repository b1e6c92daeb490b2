"""Decode-attention kernel lab (r4): isolated per-kernel rates on the chip.

Methodology per docs/perf/r3-decode-attribution.md: in-graph fori_loop
repetition feeding each iteration's output back as the next query (forces
sequential execution), two-point subtraction, fetch-synced timing (the
axon tunnel backend ignores block_until_ready).

Geometry mirrors the driver bench: Qwen3-4B heads (32q/8kv, D=128),
c=16 decode, kv_len=128, page 16, pool 2048 pages bf16, page table
width 128 (max_model_len 2048) — the table is ~94% dead, which is what
the engine actually hands the kernel.

Usage: python benchmarks/decode_lab.py [variant ...]
Variants: stock v2 v2p v2pb16 ref (r4: batched/decode kernels deleted)
Page patterns: interleaved (decode-realistic), runs4 (prefill runs of 4),
contig (fully contiguous).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

S, H, K, D, PS = 16, 32, 8, 128, 16
P = int(os.environ.get("LAB_P", "128"))
POOL = 2048
KV_LEN = int(os.environ.get("LAB_KV_LEN", "128"))
SCALE = D ** -0.5
LAYERS = 36  # report per-layer and per-step-equivalent


def make_tables(pattern: str):
    """Page tables per allocation pattern. Live pages per seq = KV_LEN/PS."""
    live = KV_LEN // PS
    tbl = np.zeros((S, P), np.int32)
    if pattern == "interleaved":
        # decode-time allocation: seqs grab pages round-robin
        for i in range(S):
            tbl[i, :live] = 1 + i + S * np.arange(live)
    elif pattern == "runs4":
        # prefill allocates 4-page runs, decode appends round-robin singles
        n_run = 4
        for i in range(S):
            tbl[i, :n_run] = 1 + i * n_run + np.arange(n_run)
        base = 1 + S * n_run
        for j in range(live - n_run):
            for i in range(S):
                tbl[i, n_run + j] = base + j * S + i
    elif pattern == "contig":
        for i in range(S):
            tbl[i, :live] = 1 + i * live + np.arange(live)
    else:
        raise ValueError(pattern)
    return jnp.asarray(tbl)


def make_inputs(pattern):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((POOL, PS, 2 * K, D)) * 0.3, jnp.bfloat16)
    lens = jnp.full((S,), KV_LEN, jnp.int32)
    tbl = make_tables(pattern)
    return q, kv, lens, tbl


def md_for(lens, tbl):
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata

    cu = jnp.arange(S + 1, dtype=jnp.int32)
    return AttentionMetadata(
        kv_lens=lens, page_indices=tbl, cu_q_lens=cu,
        num_seqs=jnp.array([S], jnp.int32),
        slot_mapping=jnp.zeros((S,), jnp.int32),
        positions=lens - 1,
        logits_indices=jnp.arange(S, dtype=jnp.int32),
    )


def variant_fn(name, host_lens=None, host_tbl=None):
    if name == "stock":
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention.kernel import (
            ragged_paged_attention,
        )

        def fn(q, kv, lens, tbl):
            cu = jnp.arange(S + 1, dtype=jnp.int32)
            return ragged_paged_attention(
                q, kv, lens, tbl, cu, jnp.array([S], jnp.int32),
                sm_scale=SCALE, num_kv_pages_per_block=8,
                num_queries_per_block=32, vmem_limit_bytes=100 * 1024 * 1024,
            )
        return fn
    if name.startswith("v2"):
        from vllm_rust_tpu.ops.pallas.decode_v2 import (
            decode_attention_v2,
            prepare_decode_v2,
        )

        # name grammar: v2[p][pbN][!ablation]; 'p' = host-prepared arrays
        rest = name[2:]
        ablate = ""
        if "!" in rest:
            rest, ablate = rest.split("!", 1)
        host_prep = rest.startswith("p") and not rest.startswith("pb")
        if host_prep:
            rest = rest[1:]
        pb = int(rest[2:]) if rest.startswith("pb") else 8

        prepared = None
        if host_prep:
            # host-side prep from concrete arrays, as the engine does per
            # window — outside the jitted/timed region
            prepared = tuple(
                jnp.asarray(a)
                for a in prepare_decode_v2(host_lens, host_tbl, page_size=PS, pb=pb)
            )

        def fn(q, kv, lens, tbl):
            return decode_attention_v2(
                q, kv, lens, tbl, prepared, sm_scale=SCALE, pb=pb, ablate=ablate
            )

        return fn
    if name == "ref":
        from vllm_rust_tpu.ops.paged_attention import _ref_ragged_paged_attention

        return lambda q, kv, lens, tbl: _ref_ragged_paged_attention(
            q, kv, md_for(lens, tbl), sm_scale=SCALE,
            sliding_window=None, soft_cap=None,
        )
    raise ValueError(name)


def check_correct(name, pattern="interleaved"):
    q, kv, lens, tbl = make_inputs(pattern)
    got = np.asarray(variant_fn(name, lens, tbl)(q, kv, lens, tbl), np.float32)
    want = np.asarray(variant_fn("ref")(q, kv, lens, tbl), np.float32)
    err = np.max(np.abs(got - want))
    ok = err < 0.03
    print(f"  correctness[{name}/{pattern}]: max|err|={err:.4f} {'OK' if ok else 'FAIL'}")
    return ok


def time_variant(name, pattern, iters=(100, 1100)):
    q, kv, lens, tbl = make_inputs(pattern)
    fn = variant_fn(name, lens, tbl)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(q, kv, lens, tbl, n):
        def body(_, qq):
            return fn(qq, kv, lens, tbl).astype(qq.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    def run(n):
        t0 = time.perf_counter()
        np.asarray(loop(q, kv, lens, tbl, n))  # fetch-sync
        return time.perf_counter() - t0

    run(iters[0]); run(iters[1])  # compile both loop lengths
    t1 = min(run(iters[0]), run(iters[0]), run(iters[0]))
    t2 = min(run(iters[1]), run(iters[1]), run(iters[1]))
    per = (t2 - t1) / (iters[1] - iters[0]) * 1e6
    kv_bytes = S * KV_LEN * 2 * K * D * 2
    gbps = kv_bytes / (per * 1e-6) / 1e9
    print(
        f"  {name:10s} {pattern:12s} {per:8.1f} us/layer  {gbps:6.0f} GB/s  "
        f"step-equiv {per * LAYERS / 1000:.2f} ms"
    )
    return per


def main():
    names = sys.argv[1:] or ["stock", "v2p"]
    patterns = os.environ.get("LAB_PATTERNS", "interleaved,runs4,contig").split(",")
    for name in names:
        if name != "stock" and "!" not in name:
            if not check_correct(name):
                print(f"  SKIP timing for {name} (incorrect)")
                continue
        for pat in patterns:
            try:
                time_variant(name, pat)
            except Exception as e:
                print(f"  {name:10s} {pat:12s} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

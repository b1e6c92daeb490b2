"""Decode-attention backend shootout at the serving geometry.

Times each decode attention backend with the honest methodology from
docs/perf/r3-decode-attribution.md: in-graph fori_loop chaining (one
dispatch runs N dependent calls), fetch-synced (np.asarray of a scalar
slice — block_until_ready does not reliably wait over the axon tunnel),
two-point subtraction (N1 vs N2 iters) to cancel fixed overhead.

Run: python benchmarks/attn_micro.py [klen ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

HBM_GBPS = 819.0  # v5e


def fetch_sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def time_chained(make_fn, q, iters_lo=64, iters_hi=448, reps=4):
    """Returns seconds per inner call via two-point subtraction."""

    def loop(n):
        def body(i, qq):
            y = make_fn(qq)
            return qq * jnp.exp(
                y[0, 0, 0].astype(jnp.float32) * 1e-30
            ).astype(qq.dtype)

        return jax.jit(lambda qq: jax.lax.fori_loop(0, n, body, qq))

    f_lo, f_hi = loop(iters_lo), loop(iters_hi)
    fetch_sync(f_lo(q)); fetch_sync(f_hi(q))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fetch_sync(f_lo(q)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch_sync(f_hi(q)); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (iters_hi - iters_lo))
    return best


def main():
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
    from vllm_rust_tpu.ops.paged_attention import (
        decode_mode,
        ragged_paged_attention_op,
    )

    klens = [int(a) for a in sys.argv[1:]] or [96, 128]
    s, hq, hkv, d, ps = 16, 32, 8, 128, 16
    layers = 36
    print(f"devices: {jax.devices()}")
    for klen in klens:
        pps = max(8, -(-klen // ps))  # bucketed table width
        pages = 2048
        q = jnp.ones((s, hq, d), jnp.bfloat16)
        kv = jnp.ones((pages, ps, 2 * hkv, d), jnp.bfloat16)
        rng = np.random.default_rng(0)
        tables = {
            "seq": np.arange(s * pps, dtype=np.int32).reshape(s, pps),
            "rand": rng.permutation(pages)[: s * pps]
            .reshape(s, pps)
            .astype(np.int32),
        }
        gb = s * klen * 2 * hkv * d * 2 / 1e9  # valid KV bytes, 1 layer
        sol_us = gb / HBM_GBPS * 1e6
        print(f"\n== klen={klen} pps={pps}: {gb*1e3:.2f} MB valid KV/layer, "
              f"SoL {sol_us:.1f} us/layer ==")
        for tname, table in tables.items():
            md = AttentionMetadata(
                slot_mapping=jnp.arange(s, dtype=jnp.int32) * ps,
                kv_lens=jnp.full((s,), klen, jnp.int32),
                page_indices=jnp.asarray(table),
                cu_q_lens=jnp.arange(s + 1, dtype=jnp.int32),
                num_seqs=jnp.array([s], jnp.int32),
                positions=jnp.full((s,), klen - 1, jnp.int32),
                logits_indices=jnp.arange(s, dtype=jnp.int32),
            )
            for backend in ("null", "jax", "decode", "pallas", "batched"):
                def attn(qq, backend=backend, md=md):
                    if backend == "null":
                        return qq * 1.0000001
                    with decode_mode():
                        return ragged_paged_attention_op(
                            qq, kv, md, sm_scale=d ** -0.5, backend=backend
                        )

                try:
                    dt = time_chained(attn, q)
                except Exception as e:  # noqa: BLE001
                    print(f"{tname:5s} {backend:10s}  FAILED: "
                          f"{type(e).__name__}: {e}")
                    continue
                us = dt * 1e6
                gbps = gb / dt
                print(f"{tname:5s} {backend:10s} {us:8.1f} us/layer  "
                      f"{gbps:6.0f} GB/s ({100*gbps/HBM_GBPS:4.1f}% SoL)  "
                      f"x{layers} = {us*layers/1e3:.2f} ms/step")


if __name__ == "__main__":
    main()

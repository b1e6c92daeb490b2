"""Same-session A/B: int8-group MXU serve vs w4a16 Pallas kernel (r5).

The serving default is the int8-group image (make_w4a16_linear: "int4-
in-HBM loses to VPU dequant cost on TPU"). But the step is HBM-bound and
int4 halves the weight bytes — if the w4 kernel's effective GB/s (on the
bytes it actually moves) is more than ~half the int8 path's, it wins.
This measures both at the bench.py Qwen3-4B shapes, same session,
fori_loop repetition, fetch-to-sync (r3 methodology).

Run: python benchmarks/quant_kernel_ab.py
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

M = 16  # decode batch
REPS = 50
SHAPES = [  # (K, N, tag) — Qwen3-4B decoder
    (2560, 4096, "q_proj"),
    (2560, 1024, "kv_proj"),
    (4096, 2560, "o_proj"),
    (2560, 9728, "gate/up"),
    (9728, 2560, "down"),
]
GROUP = 128


def bench_fn(fn, x, reps=REPS):
    """Two-point fori_loop repetition (r3 methodology): the ~25 ms tunnel
    D2H round trip swamps a ~20 us kernel, so time loop(n_hi) - loop(n_lo)
    and divide by the rep delta. Data dependence defeats LICM."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(_, acc):
            # acc feeds x so XLA cannot hoist the matmul out of the loop
            y = fn(x + acc[0].astype(x.dtype) * 1e-30)
            return acc + y[0, :1].astype(jnp.float32)

        return jax.lax.fori_loop(
            0, n, body, jnp.zeros((1,), jnp.float32), unroll=min(8, n)
        )

    lo, hi = 4, 4 + reps
    np.asarray(loop(x, lo))
    np.asarray(loop(x, hi))  # compile+warm both points
    t_lo = t_hi = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(x, lo))
        t_lo += time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(loop(x, hi))
        t_hi += time.perf_counter() - t0
    return max((t_hi - t_lo) / 3 / reps, 1e-9)

    np.asarray(loop(x))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(loop(x))
    return (time.perf_counter() - t0) / reps


def main():
    from vllm_rust_tpu.ops.int8_group import int8_group_matmul, prepare_int8_group
    from vllm_rust_tpu.ops.pallas.quant_matmul import (
        prepare_tiled_scales,
        quant_matmul_w4a16,
    )
    from vllm_rust_tpu.quantization.awq import repack_k_half

    rng = np.random.default_rng(0)
    print(f"M={M}, group={GROUP}")
    tot_i8 = tot_w4 = 0.0
    for k, n, tag in SHAPES:
        q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
        s = np.full((k // GROUP, n), 0.01, np.float32)
        zs = np.full((k // GROUP, n), 0.08, np.float32)
        x = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)

        img8 = prepare_int8_group(q, s, zs)
        q8g = jnp.asarray(img8["q8g"])
        sg = jnp.asarray(img8["sg"])
        zg = jnp.asarray(img8["zg"]) if "zg" in img8 else None
        t8 = bench_fn(lambda x: int8_group_matmul(x, q8g, sg, zg), x)

        qp = jnp.asarray(repack_k_half(q))
        sc = jnp.asarray(s, jnp.bfloat16)
        zc = jnp.asarray(zs, jnp.bfloat16)
        tiles = prepare_tiled_scales(
            np.asarray(s, np.float32).astype(jnp.bfloat16),
            np.asarray(zs, np.float32).astype(jnp.bfloat16),
            k // 2,
        )
        st, zt = (jnp.asarray(a) for a in tiles)
        t4 = bench_fn(
            lambda x: quant_matmul_w4a16(x, qp, sc, zc, st, zt), x
        )
        by8 = k * n  # int8 bytes
        by4 = k * n // 2
        tot_i8 += t8
        tot_w4 += t4
        print(f"  {tag:8s} K={k:5d} N={n:5d}: int8 {t8*1e6:7.1f} us "
              f"({by8/t8/1e9:5.0f} GB/s)  w4 {t4*1e6:7.1f} us "
              f"({by4/t4/1e9:5.0f} GB/s)  ratio w4/int8 {t4/t8:.2f}")
    # per-layer totals: q+kv*2? (k and v separate) — approximate with the
    # shape list as-is plus gate/up twice (gate and up are separate mats)
    print(f"sum over listed shapes: int8 {tot_i8*1e3:.3f} ms  "
          f"w4 {tot_w4*1e3:.3f} ms  (x36 layers: "
          f"{tot_i8*36*1e3:.2f} vs {tot_w4*36*1e3:.2f} ms)")


if __name__ == "__main__":
    main()

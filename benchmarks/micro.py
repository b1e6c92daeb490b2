"""Per-kernel microbenchmarks on the attached TPU chip.

Localizes decode-step time against speed-of-light HBM targets
(VERDICT round-1 item #4; reference keeps 23 criterion benches —
docs/benches/moe-baseline.md). Run: python benchmarks/micro.py

Covers, at the bench geometry (Qwen3-4B, c=16 decode):
  - dispatch: per-call overhead of a trivial jitted fn (axon tunnel cost)
  - w4a16 GEMM at every decoder layer shape, M in {1,8,16,32}
  - lm_head bf16 and int8 [16, 2560] x [2560, 151936]
  - paged decode attention at the bench KV geometry
Each row prints measured ms, moved GB, effective GB/s, and % of the
v5e HBM roofline (~819 GB/s).
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

HBM_GBPS = 819.0  # v5e


def timeit(fn, *args, iters=50, warmup=5):
    """Pipelined per-call timing (one block_until_ready after `iters`
    async dispatches). Valid ONLY with the device to ourselves: a
    concurrent engine/bench on the same tunneled chip inflates the
    dispatch floor from ~40 us to ~650 us and buries small kernels —
    bench_dispatch prints the floor first so a contended run is
    self-evident."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def timeit_chained(kernel, x, iters=50):
    """In-graph chained timing: ONE dispatch runs `iters` dependent
    kernel invocations inside a lax.fori_loop, so per-iteration time is
    pure device time — per-dispatch tunnel overhead (~0.7-1 ms over the
    axon link, measured r3) is amortized to nothing. The dependency
    x' = x * exp(y[0]*1e-30) keeps XLA from hoisting the kernel out of
    the loop; its cost is one scalar exp + an O(x) multiply."""

    def chained(i, x):
        y = kernel(x)
        return x * jnp.exp(y.ravel()[0].astype(jnp.float32) * 1e-30).astype(
            x.dtype
        )

    g = jax.jit(lambda x: jax.lax.fori_loop(0, iters, chained, x))
    jax.block_until_ready(g(x))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(g(x))
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(g(x))
    dt = min(dt, time.perf_counter() - t0)
    return dt / iters


def row(name, ms, gb):
    gbps = gb / (ms / 1e3)
    print(f"{name:42s} {ms*1e3:9.3f} us  {gb*1e3:8.2f} MB  "
          f"{gbps:7.1f} GB/s  {100*gbps/HBM_GBPS:5.1f}% SoL")
    return gbps


def bench_dispatch():
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    # chained (pipelined) dispatch: no sync between calls
    for _ in range(5):
        x = f(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    n = 200
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    pipelined = (time.perf_counter() - t0) / n
    # synchronous dispatch: block every call
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(x))
    sync = (time.perf_counter() - t0) / 20
    print(f"{'dispatch pipelined':42s} {pipelined*1e6:9.1f} us")
    print(f"{'dispatch sync (round-trip)':42s} {sync*1e6:9.1f} us")
    return pipelined, sync


QWEN3_4B = dict(h=2560, q=4096, kv=1024, inter=9728, layers=36, v=151936)


def make_w4(k, n, rng):
    from vllm_rust_tpu.ops.pallas.quant_matmul import prepare_tiled_scales
    from vllm_rust_tpu.quantization.awq import repack_k_half

    g = 128 if k % 128 == 0 else k
    q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
    s = np.full((k // g, n), 0.01, np.float32).astype(jnp.bfloat16)
    zs = np.full((k // g, n), 0.08, np.float32).astype(jnp.bfloat16)
    tiled = prepare_tiled_scales(s, zs, k // 2)
    return (
        jnp.asarray(repack_k_half(q)),
        jnp.asarray(s),
        jnp.asarray(zs),
        jnp.asarray(tiled[0]) if tiled else None,
        jnp.asarray(tiled[1]) if tiled else None,
    )


_LAYER_SHAPES = [
    ("qkv  2560x6144", QWEN3_4B["h"], QWEN3_4B["q"] + 2 * QWEN3_4B["kv"]),
    ("o    4096x2560", QWEN3_4B["q"], QWEN3_4B["h"]),
    ("gate+up 2560x19456", QWEN3_4B["h"], 2 * QWEN3_4B["inter"]),
    ("down 9728x2560", QWEN3_4B["inter"], QWEN3_4B["h"]),
]


def bench_int8_group(ms_list):
    """The DEFAULT AWQ/GPTQ serving path: int8-grouped weights through
    native s8 MXU dots (ops/int8_group.py) — what bench.py exercises."""
    from vllm_rust_tpu.ops.int8_group import int8_group_matmul, prepare_int8_group

    g = QWEN3_4B
    rng = np.random.default_rng(0)
    for m in ms_list:
        total_ms = 0.0
        total_gb = 0.0
        for name, k, n in _LAYER_SHAPES:
            gsz = 128
            q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
            sc = np.full((k // gsz, n), 0.01, np.float32)
            zs = np.full((k // gsz, n), 0.08, np.float32)
            img = prepare_int8_group(q, sc, zs)
            w = {kk: jnp.asarray(v) for kk, v in img.items()}
            x = jnp.ones((m, k), jnp.bfloat16)
            dt = timeit_chained(
                lambda x, w=w: int8_group_matmul(
                    x, w["q8g"], w["sg"], w.get("zg")), x)
            gb = (k * n + k * n / gsz * 4) / 1e9  # int8 + f32 scales
            row(f"s8grp M={m:<3d} {name}", dt * 1e3, gb)
            total_ms += dt * 1e3
            total_gb += gb
        row(f"s8grp M={m:<3d} ALL-LAYER x{g['layers']}",
            total_ms * g["layers"], total_gb * g["layers"])


def bench_w4(ms_list):
    """Legacy fused int4 Pallas kernel (pre-round-2 serving path; kept
    for comparison — it is VPU-dequant-bound on v5e, which is why the
    int8-group MXU path above replaced it)."""
    from vllm_rust_tpu.ops.pallas.quant_matmul import quant_matmul_w4a16

    g = QWEN3_4B
    rng = np.random.default_rng(0)
    for m in ms_list:
        total_ms = 0.0
        total_gb = 0.0
        for name, k, n in _LAYER_SHAPES:
            w = make_w4(k, n, rng)
            x = jnp.ones((m, k), jnp.bfloat16)
            f = jax.jit(lambda x, w=w: quant_matmul_w4a16(x, *w))
            dt = timeit(f, x)
            gb = (k * n / 2 + k * n / 64 * 2 * 2) / 1e9  # int4 + scales/zs
            row(f"w4a16 M={m:<3d} {name}", dt * 1e3, gb)
            total_ms += dt * 1e3
            total_gb += gb
        gbps = row(f"w4a16 M={m:<3d} ALL-LAYER x{g['layers']}",
                   total_ms * g["layers"], total_gb * g["layers"])
    return gbps


def bench_lm_head():
    g = QWEN3_4B
    h, v = g["h"], g["v"]
    x = jnp.ones((16, h), jnp.bfloat16)
    w = jnp.ones((h, v), jnp.bfloat16)

    dt = timeit_chained(lambda x, w=w: (x @ w).astype(jnp.float32), x)
    row("lm_head bf16 16x2560x151936", dt * 1e3, h * v * 2 / 1e9)

    w8 = jnp.ones((h, v), jnp.int8)
    s8 = jnp.ones((v,), jnp.bfloat16)

    def int8_mm(x, w8, s8):
        y = jax.lax.dot_general(
            x, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y * s8.astype(jnp.float32)

    dt = timeit_chained(lambda x: int8_mm(x, w8, s8), x)
    row("lm_head int8 (bf16 act) 16x2560x151936", dt * 1e3, h * v / 1e9)

    def int8_s8a8(x, w8, s8):
        # dynamic per-token activation quant -> native s8xs8 MXU dot
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
        xs = jnp.where(amax == 0, 1.0, amax / 127.0)
        x8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) / xs), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * xs * s8.astype(jnp.float32)

    dt = timeit_chained(lambda x: int8_s8a8(x, w8, s8), x)
    row("lm_head int8 (s8 act)  16x2560x151936", dt * 1e3, h * v / 1e9)


def bench_s8a8_group(ms_list):
    """Native s8xs8 MXU path for the grouped-int8 image: dynamic
    per-token activation quant, int32 group accumulators, scales on the
    accumulator. This is the candidate replacement for the mixed
    bf16 x int8 dots in ops/int8_group.py."""
    from vllm_rust_tpu.ops.int8_group import prepare_int8_group

    g = QWEN3_4B
    rng = np.random.default_rng(0)
    for m in ms_list:
        total_ms = 0.0
        total_gb = 0.0
        for name, k, n in _LAYER_SHAPES:
            gsz = 128
            q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
            sc = np.full((k // gsz, n), 0.01, np.float32)
            zs = np.full((k // gsz, n), 0.08, np.float32)
            img = prepare_int8_group(q, sc, zs)
            q8g = jnp.asarray(img["q8g"])
            sg = jnp.asarray(img["sg"])
            groups = k // gsz

            def s8a8(x, q8g=q8g, sg=sg, groups=groups, gsz=gsz, n=n):
                t = x.shape[0]
                amax = jnp.max(
                    jnp.abs(x), axis=-1, keepdims=True
                ).astype(jnp.float32)
                xs = jnp.where(amax == 0, 1.0, amax / 127.0)
                x8 = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / xs), -127, 127
                ).astype(jnp.int8)
                xg = x8.reshape(t, groups, gsz).transpose(1, 0, 2)
                y = jax.lax.dot_general(
                    xg, q8g, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # [G, T, N] s32
                out = (y.astype(jnp.float32) * sg[:, None, :]).sum(0)
                return (out * xs).astype(jnp.bfloat16)

            x = jnp.ones((m, k), jnp.bfloat16)
            dt = timeit_chained(s8a8, x)
            gb = (k * n + k * n / gsz * 4) / 1e9
            row(f"s8a8  M={m:<3d} {name}", dt * 1e3, gb)
            total_ms += dt * 1e3
            total_gb += gb
        row(f"s8a8  M={m:<3d} ALL-LAYER x{g['layers']}",
            total_ms * g["layers"], total_gb * g["layers"])


def bench_decode_attention():
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
    from vllm_rust_tpu.ops.paged_attention import (
        decode_mode,
        ragged_paged_attention_op,
    )

    g = QWEN3_4B
    s, hq, hkv, d, ps = 16, 32, 8, 128, 16
    pages, pps = 2048, 16  # 16 seqs x 16 pages = 256 tokens each
    klen = 200
    q = jnp.ones((s, hq, d), jnp.bfloat16)
    kv = jnp.ones((pages, ps, 2 * hkv, d), jnp.bfloat16)
    md = AttentionMetadata(
        slot_mapping=jnp.arange(s, dtype=jnp.int32) * ps,
        kv_lens=jnp.full((s,), klen, jnp.int32),
        page_indices=jnp.arange(s * pps, dtype=jnp.int32).reshape(s, pps),
        cu_q_lens=jnp.arange(s + 1, dtype=jnp.int32),
        num_seqs=jnp.array([s], jnp.int32),
        positions=jnp.full((s,), klen - 1, jnp.int32),
        logits_indices=jnp.arange(s, dtype=jnp.int32),
    )

    def attn(q, kv):
        with decode_mode():
            return ragged_paged_attention_op(
                q, kv, md, sm_scale=d ** -0.5, backend="auto"
            )

    dt = timeit_chained(lambda q: attn(q, kv), q)
    # bytes: klen tokens x 2(KV) x 8 heads x 128 x 2B per seq per layer
    gb = s * klen * 2 * hkv * d * 2 / 1e9
    row(f"decode attn s={s} len={klen} (1 layer)", dt * 1e3, gb)
    row(f"decode attn x{g['layers']} layers", dt * 1e3 * g["layers"],
        gb * g["layers"])


def main():
    print(f"devices: {jax.devices()}")
    bench_dispatch()
    bench_int8_group([1, 16])
    bench_s8a8_group([1, 16])
    if os.environ.get("MICRO_LEGACY_W4"):
        bench_w4([1, 16])
    bench_lm_head()
    bench_decode_attention()


if __name__ == "__main__":
    main()

"""Native XLA int4 weight matmul vs int8-group serve (r5, VERDICT #1).

The Pallas w4a16 kernel is VPU-unpack-bound (quant_kernel_ab.py): ~5
vector ops per weight element beats the DMA it saves. This probes the
path NOT tried: storing weights as jnp.int4 (XLA s4) and letting XLA's
own convert-into-dot fusion do the widening — if the s4->bf16/int8
convert is hardware-assisted, byte-halving wins without a kernel.

Variants at bench decode shapes (M=16):
  i8g   : production int8-group serve (ops/int8_group.py)
  s4bf  : x @ w_s4.astype(bf16)       (XLA fuses convert into dot)
  s4i8  : x_q8 @ w_s4.astype(int8) int8 MXU dot, rescale after
  u8pack: bf16 dot against unpacked-in-XLA nibbles (no Pallas)

Run: python benchmarks/int4_native_ab.py
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

M = int(os.environ.get("AB_M", "16"))
REPS = 30
LAYERS = int(os.environ.get("AB_LAYERS", "24"))  # defeat VMEM residency
SHAPES = [
    (2560, 9728, "gate/up"),
    (9728, 2560, "down"),
]
GROUP = 128


def bench_fn(fn, x, w_stack, prep=None, reps=REPS):
    """Streams a DIFFERENT weight layer each iteration (stacked [L, ...]
    operand, dynamic-sliced per step) — the quant_kernel_ab.py fori_loop
    over ONE weight let XLA keep a 25 MB operand VMEM-resident and
    reported >2 TB/s 'HBM' rates. This forces the engine's real access
    pattern: every layer's weights stream from HBM once per pass.

    ``prep`` runs INSIDE the jit before the loop (e.g. int8->int4 cast):
    the axon plugin recurses when an S4 array crosses the jit boundary,
    so s4 operands must be born in-graph. Its cost cancels in the
    two-point subtraction."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, w_stack, n):
        w_prep = prep(w_stack) if prep is not None else w_stack

        def body(i, acc):
            w_i = jax.tree_util.tree_map(
                lambda w: jax.lax.dynamic_index_in_dim(
                    w, i % LAYERS, 0, keepdims=False
                ),
                w_prep,
            )
            y = fn(x + acc[0].astype(x.dtype) * 1e-30, w_i)
            return acc + y[0, :1].astype(jnp.float32)

        return jax.lax.fori_loop(
            0, n, body, jnp.zeros((1,), jnp.float32)
        )

    # rep counts sized so the exec-time DELTA (tens of ms) dwarfs the
    # tunnel's per-sync RTT jitter (+-few ms); median over 5 pairs
    lo, hi = 10 * LAYERS, 50 * LAYERS
    np.asarray(loop(x, w_stack, lo))
    np.asarray(loop(x, w_stack, hi))
    deltas = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(loop(x, w_stack, lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(loop(x, w_stack, hi))
        t_hi = time.perf_counter() - t0
        deltas.append(t_hi - t_lo)
    return max(float(np.median(deltas)) / (hi - lo), 1e-9)


def main():
    from vllm_rust_tpu.ops.int8_group import int8_group_matmul

    rng = np.random.default_rng(0)
    print(f"M={M}, group={GROUP}, layers={LAYERS}")
    tots = {}
    for k, n, tag in SHAPES:
        q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
        s = np.full((k // GROUP, n), 0.01, np.float32)
        x = jnp.asarray(rng.standard_normal((M, k)), jnp.bfloat16)

        # int8-group serve image, stacked per-layer (content identical
        # across layers; the access pattern is what matters)
        q8 = (q.astype(np.int8) - 8) * 8  # int8-ish values
        q8_stack = jnp.asarray(
            np.broadcast_to(q8, (LAYERS, k, n)).copy()
        )
        sg = np.full((k // GROUP, n), 0.00125, np.float32)
        sg_stack = jnp.asarray(
            np.broadcast_to(sg, (LAYERS, k // GROUP, n)).copy(), jnp.bfloat16
        )
        res = {}
        res["i8g"] = bench_fn(
            lambda x, w: int8_group_matmul(
                x, w[0].reshape(k // GROUP, GROUP, n), w[1], None
            ),
            x, (q8_stack, sg_stack),
        )

        # native s4: signed nibbles (AWQ q-8). S4 arrays cannot cross the
        # jit boundary on the axon plugin (device_put relayout recurses),
        # so the int8 stack is cast in-graph BEFORE the timing loop.
        w8_stack = jnp.asarray(
            np.broadcast_to(q.astype(np.int8) - 8, (LAYERS, k, n)).copy()
        )

        def s4bf_post(x, w):
            return (x @ w.astype(jnp.bfloat16)).astype(jnp.bfloat16)

        res["s4bf"] = bench_fn(
            s4bf_post, x, w8_stack, prep=lambda w: w.astype(jnp.int4)
        )

        def s4i8(x, w):
            w8 = w.astype(jnp.int8)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * 32.0), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * (1 / 32.0)).astype(jnp.bfloat16)

        res["s4i8"] = bench_fn(
            s4i8, x, w8_stack, prep=lambda w: w.astype(jnp.int4)
        )

        def s4i8mix(x, w):
            # numerics-preserving candidate: int4->int8 widen on the
            # weight, then the SAME mixed bf16 x int8 dot i8g uses
            w8 = w.astype(jnp.int8)
            y = jax.lax.dot_general(
                x, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return y.astype(jnp.bfloat16)

        res["s4i8mix"] = bench_fn(
            s4i8mix, x, w8_stack, prep=lambda w: w.astype(jnp.int4)
        )

        def s4i8grp(x, w):
            # w4a8 serve candidate: per-token-group int8 activations,
            # G-batched int8 MXU dot, scales on the [G,T,N] accumulator
            groups = k // GROUP
            xg = x.astype(jnp.float32).reshape(M, groups, GROUP)
            amax = jnp.max(jnp.abs(xg), axis=2, keepdims=True)
            sx = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.round(xg / sx).astype(jnp.int8)
            xq = xq.transpose(1, 0, 2)  # [G, T, gs]
            wg = w.astype(jnp.int8).reshape(groups, GROUP, n)
            y = jax.lax.dot_general(
                xq, wg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # [G, T, N]
            out = (
                y.astype(jnp.float32) * sx.transpose(1, 0, 2)
            ).sum(0)
            return out.astype(jnp.bfloat16)

        res["s4i8grp"] = bench_fn(
            s4i8grp, x, w8_stack, prep=lambda w: w.astype(jnp.int4)
        )

        def i4g_serve(x, w):
            # the exact ops/int4_group.py decode form: grouped MIXED dot
            # (bf16 x, s4->s8 w), scales on the [G,T,N] accumulator.
            # The image is PRE-SHAPED [G, gs, N] in prep — an in-graph
            # reshape of an s4 array is a physical relayout (first
            # version of this variant measured 0.85x because of it)
            from vllm_rust_tpu.ops.int4_group import int4_group_matmul

            groups = k // GROUP
            sg_ = jnp.full((groups, n), 0.01, jnp.float32)
            zg_ = jnp.full((groups, n), -0.08, jnp.float32)
            return int4_group_matmul(x, w, sg_, zg_)

        res["i4g_serve"] = bench_fn(
            i4g_serve, x, w8_stack,
            prep=lambda w: w.reshape(
                LAYERS, k // GROUP, GROUP, n
            ).astype(jnp.int4),
        )


        by4 = k * n // 2
        by8 = k * n
        line = f"  {tag:8s} K={k:5d} N={n:5d}:"
        for name, t in res.items():
            by = by8 if name == "i8g" else by4
            line += f"  {name} {t*1e6:6.1f}us ({by/t/1e9:4.0f}GB/s)"
            tots[name] = tots.get(name, 0.0) + t
        print(line, flush=True)
    print("totals: " + "  ".join(f"{k} {v*1e3:.3f}ms" for k, v in tots.items()))
    base = tots["i8g"]
    for k, v in tots.items():
        print(f"  {k}: {v/base:.2f}x of i8g")


if __name__ == "__main__":
    main()

"""Can s4 arrays cross the jit boundary on the axon plugin? (r5)

The int4_native_ab.py run showed s4->int8 MXU dots stream int4 weights
at HBM speed-of-light, but passing an S4 array into a jit recursed in
the plugin's device_put relayout path for a [L,K,N] stack. The engine's
params are 2D [K,N] per projection: probe whether a jit-PRODUCED 2D s4
array feeds other jits without a relayout, which consumer layouts are
wanted, and whether jnp.int4 vs jnp.uint4 differ.

Run: python benchmarks/int4_layout_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def try_case(tag, fn):
    try:
        out = fn()
        print(f"  {tag}: OK {getattr(out, 'shape', out)}")
        return True
    except RecursionError:
        print(f"  {tag}: RecursionError")
    except Exception as e:
        print(f"  {tag}: {type(e).__name__}: {str(e)[:120]}")
    return False


def main():
    rng = np.random.default_rng(0)
    for k, n in [(2560, 9728), (9728, 2560), (2560, 4096)]:
        print(f"shape ({k}, {n}):")
        w8 = jnp.asarray(rng.integers(-8, 8, (k, n), np.int8))
        w4 = jax.jit(lambda a: a.astype(jnp.int4))(w8)
        jax.block_until_ready(w4)
        fmt = w4.format
        print(f"  produced layout: {fmt}")
        x = jnp.asarray(rng.standard_normal((16, k)), jnp.bfloat16)

        def mixdot():
            f = jax.jit(
                lambda x, w: jax.lax.dot_general(
                    x, w.astype(jnp.int8), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            y = f(x, w4)
            jax.block_until_ready(y)
            return y

        try_case("consumer mixed dot", mixdot)

        def idot():
            xq = jnp.ones((16, k), jnp.int8)
            f = jax.jit(
                lambda xq, w: jax.lax.dot_general(
                    xq, w.astype(jnp.int8), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            )
            y = f(xq, w4)
            jax.block_until_ready(y)
            return y

        try_case("consumer int8 dot", idot)

        def grouped():
            g = k // 128
            xq = jnp.ones((g, 16, 128), jnp.int8)
            f = jax.jit(
                lambda xq, w: jax.lax.dot_general(
                    xq,
                    w.astype(jnp.int8).reshape(g, 128, n),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                )
            )
            y = f(xq, w4)
            jax.block_until_ready(y)
            return y

        try_case("consumer grouped dot", grouped)

        def through_tree():
            # params-style: dict arg with other leaves
            f = jax.jit(
                lambda p, x: (
                    jax.lax.dot_general(
                        x, p["w"].astype(jnp.int8),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + p["b"]
                )
            )
            y = f({"w": w4, "b": jnp.zeros((n,), jnp.float32)}, x)
            jax.block_until_ready(y)
            return y

        try_case("pytree params arg", through_tree)


def probe_pinned():
    """Plan A: compile the consumer FOR the producer's layout via
    in_shardings=Format — no relayout at dispatch, no recursion."""
    rng = np.random.default_rng(0)
    k, n = 2560, 9728
    w8 = jnp.asarray(rng.integers(-8, 8, (k, n), np.int8))
    w4 = jax.jit(lambda a: a.astype(jnp.int4))(w8)
    jax.block_until_ready(w4)
    x = jnp.asarray(rng.standard_normal((16, k)), jnp.bfloat16)

    def pinned():
        f = jax.jit(
            lambda x, w: jax.lax.dot_general(
                x, w.astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            in_shardings=(None, w4.format),
        )
        y = f(x, w4)
        jax.block_until_ready(y)
        # numerics: must equal the int8 reference
        ref = jnp.asarray(np.asarray(w8, np.float32))
        want = np.asarray(x.astype(jnp.float32) @ ref)
        got = np.asarray(y)
        err = np.abs(want - got).max()
        return f"maxerr={err:.3g}"

    try_case("pinned-format mixed dot", pinned)

    def pinned_tree():
        fmt_tree = {"w": w4.format, "b": None}
        f = jax.jit(
            lambda p, x: jax.lax.dot_general(
                x, p["w"].astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + p["b"],
            in_shardings=(fmt_tree, None),
        )
        y = f({"w": w4, "b": jnp.zeros((n,), jnp.float32)}, x)
        jax.block_until_ready(y)
        return y

    try_case("pinned-format pytree", pinned_tree)


if __name__ == "__main__":
    main()
    probe_pinned()

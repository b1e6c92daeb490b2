"""Probe the axon tunnel's RPC ordering semantics (r5, VERDICT #1).

The r4 xprof attribution blamed 23% device IDLE on "dispatch-boundary
serialization": host transfer RPCs (packed-meta H2D, ring D2H) queueing
against in-flight executions. This probe measures the semantics
directly so the engine fix targets the real behavior instead of a
guess. All synchronization is via tiny D2H fetches (np.asarray) —
block_until_ready returns early over this tunnel (r3 finding).

Run: python benchmarks/tunnel_probe.py   (needs the TPU chip)
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@jax.jit
def heavy(x):
    # chained 4k matmuls, long enough (~tens of ms) to race RPCs against
    for _ in range(40):
        x = jnp.tanh(x @ x) * 0.5 + x * 0.5
    return x[:1, :1]  # tiny output: fetch = sync, negligible D2H payload


def ms(t):
    return f"{t * 1e3:8.2f} ms"


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4096, 4096)),
                    jnp.bfloat16)
    meta = np.zeros(1024, np.int32)  # the packed-meta H2D analogue (4 KB)

    np.asarray(heavy(x))  # warm compile
    # exec+fetch wall and pure-RTT baseline
    t0 = time.perf_counter()
    y = heavy(x)
    np.asarray(y)
    exec_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(y)  # already materialized: pure D2H round trip
    rtt = time.perf_counter() - t0
    exec_time = exec_fetch - rtt
    print(f"exec+fetch {ms(exec_fetch)}   rtt {ms(rtt)}   "
          f"=> exec ~{ms(exec_time)}")

    # host-side cost of one H2D, idle device
    t0 = time.perf_counter()
    a = jnp.asarray(meta)
    h2d_idle_enq = time.perf_counter() - t0
    np.asarray(a)

    # host-side cost of one H2D while heavy runs
    y = heavy(x)
    time.sleep(0.002)
    t0 = time.perf_counter()
    a = jnp.asarray(meta)
    h2d_busy_enq = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(a)  # when does the transfer LAND relative to the exec?
    h2d_busy_land = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(y)
    rest = time.perf_counter() - t0
    print(f"H2D enqueue: idle {ms(h2d_idle_enq)}  busy {ms(h2d_busy_enq)}")
    print(f"H2D while busy: fetch-of-meta blocked {ms(h2d_busy_land)}; "
          f"exec remainder after {ms(rest)}")
    print("  (if blocked ~exec time: transfers serialize behind executions)")

    # back-to-back executes, no H2D between: pipeline wall
    t0 = time.perf_counter()
    y1 = heavy(x)
    y2 = heavy(x)
    np.asarray(y2)
    wall2 = time.perf_counter() - t0
    # with an H2D + fresh np buffer between (the engine window boundary)
    t0 = time.perf_counter()
    y1 = heavy(x)
    a = jnp.asarray(meta.copy())
    y2 = heavy(x)
    np.asarray(y2)
    wall2_h2d = time.perf_counter() - t0
    # with a D2H of y1 between (the ring-fetch boundary)
    t0 = time.perf_counter()
    y1 = heavy(x)
    y2 = heavy(x)
    np.asarray(y1)
    t_mid = time.perf_counter() - t0
    np.asarray(y2)
    wall2_d2h = time.perf_counter() - t0
    print(f"2x exec wall: bare {ms(wall2)}  +H2D {ms(wall2_h2d)}  "
          f"+D2H-of-first {ms(wall2_d2h)} (first landed at {ms(t_mid)})")

    # how far ahead can the host run? dispatch 8 executes, time each enqueue
    enq = []
    t_start = time.perf_counter()
    ys = []
    for i in range(8):
        t0 = time.perf_counter()
        ys.append(heavy(x))
        enq.append(time.perf_counter() - t0)
    np.asarray(ys[-1])
    wall8 = time.perf_counter() - t_start
    print(f"8x exec: enqueues {' '.join(f'{e*1e3:.1f}' for e in enq)} ms; "
          f"wall {ms(wall8)} (8x exec = {ms(8 * exec_time)})")

    # threaded H2D while busy (does a dispatch thread help?)
    res = {}

    def put():
        t0 = time.perf_counter()
        a = jnp.asarray(meta.copy())
        res["enq"] = time.perf_counter() - t0

    y = heavy(x)
    th = threading.Thread(target=put)
    th.start()
    th.join()
    np.asarray(y)
    print(f"threaded H2D enqueue while busy: {ms(res['enq'])}")


if __name__ == "__main__":
    main()

"""Probe the axon tunnel's RPC ordering semantics (r5, VERDICT #1).

The r4 xprof attribution blamed 23% device IDLE on "dispatch-boundary
serialization": host transfer RPCs (packed-meta H2D, ring D2H) queueing
against in-flight executions. This probe measures the semantics
directly so the engine fix targets the real behavior instead of a
guess:

  1. H2D latency with an idle device (baseline).
  2. H2D latency issued WHILE a long execution is in flight — if the
     client blocks until the device drains, the delta is the in-flight
     execution's remaining time (the serialization hypothesis).
  3. Same, from a separate thread (does the GIL/client allow overlap?).
  4. Execute-enqueue latency while another execution is in flight (can
     the host run ahead of the device at all?).
  5. D2H (np.asarray of a device array produced by in-flight compute).

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
    # ~40 chained 4k matmuls: long enough (~100 ms) to race RPCs against
    for _ in range(40):
        x = jnp.tanh(x @ x) * 0.5 + x * 0.5
    return x


def ms(t):
    return f"{t * 1e3:7.2f} ms"


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4096, 4096)),
                    jnp.bfloat16)
    meta = np.zeros(1024, np.int32)  # the packed-meta H2D analogue (4 KB)

    y = heavy(x)
    y.block_until_ready()  # warm compile
    t0 = time.perf_counter()
    y = heavy(x)
    y.block_until_ready()
    exec_time = time.perf_counter() - t0
    print(f"heavy() device time          : {ms(exec_time)}")

    # 1. idle H2D
    for _ in range(3):
        jnp.asarray(meta).block_until_ready()
    t0 = time.perf_counter()
    a = jnp.asarray(meta)
    t_enq = time.perf_counter() - t0
    a.block_until_ready()
    t_done = time.perf_counter() - t0
    print(f"H2D idle: enqueue {ms(t_enq)}  landed {ms(t_done)}")

    # 2. H2D while compute in flight
    y = heavy(x)
    time.sleep(0.005)
    t0 = time.perf_counter()
    a = jnp.asarray(meta)
    t_enq = time.perf_counter() - t0
    a.block_until_ready()
    t_done = time.perf_counter() - t0
    y.block_until_ready()
    print(f"H2D in-flight: enqueue {ms(t_enq)}  landed {ms(t_done)}"
          f"   (exec was {ms(exec_time)})")

    # 3. H2D from a thread while compute in flight
    res = {}

    def put():
        t0 = time.perf_counter()
        a = jnp.asarray(meta)
        res["enq"] = time.perf_counter() - t0
        a.block_until_ready()
        res["done"] = time.perf_counter() - t0

    y = heavy(x)
    time.sleep(0.005)
    th = threading.Thread(target=put)
    t0 = time.perf_counter()
    th.start()
    th.join()
    y.block_until_ready()
    print(f"H2D threaded in-flight: enqueue {ms(res['enq'])}  "
          f"landed {ms(res['done'])}")

    # 4. enqueue a second execution while the first runs
    y1 = heavy(x)
    time.sleep(0.005)
    t0 = time.perf_counter()
    y2 = heavy(x)
    t_enq = time.perf_counter() - t0
    y2.block_until_ready()
    t_done = time.perf_counter() - t0
    print(f"execute while in-flight: enqueue {ms(t_enq)}  both done "
          f"{ms(t_done)}  (2x exec = {ms(2 * exec_time)})")

    # 5. D2H of the in-flight result (the ring-fetch analogue)
    y1 = heavy(x)
    t0 = time.perf_counter()
    _ = np.asarray(y1[:1, :256])
    print(f"D2H of in-flight result      : {ms(time.perf_counter() - t0)}")

    # 6. chained dispatches with one H2D in between (the engine's window
    # boundary shape): does the H2D delay the second execution?
    y1 = heavy(x)
    a = jnp.asarray(meta)
    y2 = heavy(x)
    t0 = time.perf_counter()
    y2.block_until_ready()
    t_pipeline = time.perf_counter() - t0
    print(f"exec,H2D,exec pipeline drain : {ms(t_pipeline)} "
          f"(2x exec = {ms(2 * exec_time)}; bigger gap = H2D barrier)")


if __name__ == "__main__":
    main()

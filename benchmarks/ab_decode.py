"""Same-process A/B of decode backends through the full engine.

Chip sessions over the axon tunnel vary by +-10-20% between processes
(r3 noted it; r4 measurements confirmed), so backend comparisons are
only honest when both run in ONE process on the same session. This
builds a fresh engine per backend (fresh jit cache; the decode-backend
global is read at trace time) and runs the bench.py round.

Run: AB_BACKENDS=v2,jax python benchmarks/ab_decode.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench as bench_mod


def run_backend(spec, cfg, model, params):
    """spec: backend[:window[:fetch_interval]] e.g. v2, v2:16, v2:32:64.
    A ``@form`` suffix (e.g. v2:16:32@int8) rebuilds the AWQ params with
    that serve form (VLLM_TPU_W4_SERVE) — the r5 int4-vs-int8 A/B."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.ops import paged_attention as pa
    from vllm_rust_tpu.request import SamplingParams

    parts = spec.split(":")
    backend = parts[0]
    if backend.endswith("!watch"):
        backend = backend[:-6]
        os.environ["VLLM_TPU_FORCE_WATCH"] = "1"
    else:
        os.environ.pop("VLLM_TPU_FORCE_WATCH", None)
    window = int(parts[1]) if len(parts) > 1 else int(
        os.environ.get("BENCH_DECODE_WINDOW", "8")
    )
    fi = int(parts[2]) if len(parts) > 2 else int(
        os.environ.get("BENCH_FETCH_INTERVAL", "32")
    )
    pa._DECODE_BACKEND = backend
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=2048, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=16, max_tokens_per_step=2048),
        max_model_len=2048,
        fetch_interval=fi,
        decode_window=window,
    )
    eng = LLMEngine(model, params, ec)

    def round_(tag):
        sp = SamplingParams(max_tokens=64, temperature=0.0, ignore_eos=True)
        for i in range(16):
            eng.add_request(f"{tag}-{i}", [(7 * i + j) % 1000 + 1 for j in range(64)], sp)
        t0 = time.perf_counter()
        n = 0
        while eng.has_unfinished:
            for out in eng.step():
                n += len(out.new_token_ids)
        return n / (time.perf_counter() - t0)

    round_(f"warm-{spec}")
    n_rounds = int(os.environ.get("AB_ROUNDS", "3"))
    vals = []
    for i in range(n_rounds):
        t0 = time.perf_counter()
        v = round_(f"b{spec.replace(":", "_")}{i}")
        vals.append(v)
        try:  # decay forensics: device-buffer population per round
            n_live = len(jax.live_arrays())
        except Exception:
            n_live = -1
        print(f"  [{spec}] round {i}: {v:.0f} tok/s "
              f"(rtt_est {eng._rtt_est*1e3:.1f} ms, "
              f"in_flight {len(eng._in_flight)}, "
              f"live_bufs {n_live}, "
              f"round wall {time.perf_counter()-t0:.2f}s)", flush=True)
    if os.environ.get("AB_DELETE") == "1":
        # decay forensics: explicitly free this engine's device state
        # before the next engine allocates, so the server-side allocator
        # sees the HBM back immediately (GC timing otherwise decides)
        for arr in [*eng.kv_pages, *eng._rings, eng.token_counts]:
            try:
                arr.delete()
            except Exception:
                pass
    del eng
    import gc
    gc.collect()
    return vals


def main():
    backends = os.environ.get("AB_BACKENDS", "v2,jax,v2").split(",")
    cfg = bench_mod.qwen3_4b_config()
    from vllm_rust_tpu.models import from_config

    model = from_config(cfg, dtype=jnp.bfloat16)
    # quantize_params_awq rebuilds the decoder linears in place, and two
    # full param sets + KV pool would not fit HBM: group specs by serve
    # form and (re)build params only at form changes, dropping the old
    # set first.
    params = None
    cur_form = None
    import gc

    for b in backends:
        b, _, form = b.partition("@")
        form = form or os.environ.get("VLLM_TPU_W4_SERVE", "int4")
        if form != cur_form:
            params = None
            gc.collect()
            os.environ["VLLM_TPU_W4_SERVE"] = form
            params = bench_mod.quantize_params_awq(
                model, model.init_params(jax.random.PRNGKey(0))
            )
            cur_form = form
        vals = run_backend(b, cfg, model, params)
        print(f"backend={b}@{form}: " + " ".join(f"{v:.0f}" for v in vals) +
              f"  (best {max(vals):.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()

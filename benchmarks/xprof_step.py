"""xprof op-level attribution of the engine decode round (r4).

Runs the bench-geometry engine decode round under jax.profiler.trace and
prints the TPU op_profile table (self-time by op category), the r3
attribution methodology (docs/perf/r3-decode-attribution.md) as a
committed script instead of an ad-hoc session.

Run: python benchmarks/xprof_step.py [decode|prefill|mixed]
Env: XPROF_FETCH_INTERVAL / XPROF_DECODE_WINDOW override engine knobs.
"""

from __future__ import annotations

import glob
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


def build_engine():
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config

    cfg = bench_mod.qwen3_4b_config()
    model = from_config(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    params = bench_mod.quantize_params_awq(model, params)
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=2048, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=16, max_tokens_per_step=2048),
        max_model_len=2048,
        fetch_interval=int(os.environ.get("XPROF_FETCH_INTERVAL", "32")),
        decode_window=int(os.environ.get("XPROF_DECODE_WINDOW", "8")),
    )
    return LLMEngine(model, params, ec)


def run_round(eng, tag, mode, gen=64):
    from vllm_rust_tpu.request import SamplingParams

    sp = SamplingParams(max_tokens=gen, temperature=0.0, ignore_eos=True)
    if mode == "prefill":
        sp = SamplingParams(max_tokens=1, temperature=0.0, ignore_eos=True)
    for i in range(16):
        plen = 64 if mode != "prefill" else 192
        prompt = [(7 * i + j) % 1000 + 1 for j in range(plen)]
        eng.add_request(f"{tag}-{i}", prompt, sp)
    n = 0
    while eng.has_unfinished:
        for out in eng.step():
            n += len(out.new_token_ids)
    return n


def op_table(logdir, top=24):
    """Device self-time by op (framework_op_stats over the xplane)."""
    import json as _json
    from collections import defaultdict

    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane under {logdir}"
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    tables = _json.loads(data)
    table = tables[0] if isinstance(tables, list) else tables
    cols = [c["id"] for c in table["cols"]]

    def get(row, cid):
        return row["c"][cols.index(cid)].get("v")

    agg = defaultdict(float)
    host_total = 0.0
    for row in table.get("rows", []):
        t = float(get(row, "total_self_time") or 0)
        if get(row, "host_or_device") == "Device":
            agg[(get(row, "type") or "?")] += t
        else:
            host_total += t
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    total = sum(agg.values()) or 1.0
    print(f"{'self us':>12}  {'%':>5}  device op type")
    for name, t in rows[:top]:
        print(f"{t:12.1f}  {100*t/total:5.1f}  {name[:90]}")
    print(f"{total:12.1f}  100.0  TOTAL device self-time "
          f"(host self-time {host_total:.0f} us)")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "decode"
    logdir = f"/tmp/xprof_{mode}_{int(time.time())}"
    eng = build_engine()
    run_round(eng, "warm", mode)  # compile everything first
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        n = run_round(eng, "prof", mode)
    dt = time.perf_counter() - t0
    print(f"mode={mode}: {n} tokens in {dt*1e3:.0f} ms -> {n/dt:.0f} tok/s")
    op_table(logdir)


if __name__ == "__main__":
    main()

"""Serving-detail benchmark: TTFT, fetch-interval tradeoff, mixed load.

VERDICT r2 #2: the driver headline (bench.py) is decode-only; the
reference records TTFT and per-stage history
(/root/reference/docs/perf/qwen3-4b-awq.md:52-66). This writes
BENCH_DETAIL.md at the repo root with:
  - TTFT at c=1 and c=16 (latency-mode fetch_interval=2)
  - decode throughput vs fetch_interval (the latency/throughput curve
    that bench.py's default of 32 is chosen from)
  - a mixed prefill+decode round (staggered arrivals)

Run: python benchmarks/detail.py          (on the attached TPU chip)
     BENCH_MODEL=qwen3-small python ...   (fast smoke)
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

PROMPT_LEN = 64  # == bench.py geometry, reuses its compile cache
GEN_LEN = 64


_MODEL_CACHE = {}


def build_engine(fetch_interval: int, cfg, quant):
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config

    # one model + params shared across engines: a second 4 GB param set
    # OOMs the 16 GB chip alongside the first engine's pools
    key = id(cfg)
    if key not in _MODEL_CACHE:
        model = from_config(cfg, dtype=jnp.bfloat16)
        params = model.init_params(jax.random.PRNGKey(0))
        if quant == "awq":
            params = bench_mod.quantize_params_awq(model, params)
        _MODEL_CACHE[key] = (model, params)
    model, params = _MODEL_CACHE[key]
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=2048, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=16, max_tokens_per_step=2048),
        max_model_len=2048,
        fetch_interval=fetch_interval,
        decode_window=int(os.environ.get("BENCH_DECODE_WINDOW", "8")),
    )
    return LLMEngine(model, params, ec)


def _prompt(i, n=PROMPT_LEN):
    return [(7 * i + j) % 1000 + 1 for j in range(n)]


def warm(eng, tag="warm"):
    from vllm_rust_tpu.request import SamplingParams

    sp = SamplingParams(max_tokens=GEN_LEN, temperature=0.0, ignore_eos=True)
    for i in range(16):
        eng.add_request(f"{tag}-{i}", _prompt(i), sp)
    while eng.has_unfinished:
        eng.step()


def ttft_run(eng, concurrency: int) -> tuple[float, float, float]:
    """Returns (mean TTFT s, p95-ish max TTFT s, aggregate tok/s)."""
    from vllm_rust_tpu.request import SamplingParams

    sp = SamplingParams(max_tokens=GEN_LEN, temperature=0.0, ignore_eos=True)
    t_arrive = {}
    t_first = {}
    n_tokens = 0
    t0 = time.perf_counter()
    for i in range(concurrency):
        rid = f"t-{i}"
        t_arrive[rid] = time.perf_counter()
        eng.add_request(rid, _prompt(100 + i), sp)
    while eng.has_unfinished:
        for out in eng.step():
            if out.new_token_ids and out.request_id not in t_first:
                t_first[out.request_id] = time.perf_counter()
            n_tokens += len(out.new_token_ids)
    dt = time.perf_counter() - t0
    ttfts = sorted(t_first[r] - t_arrive[r] for r in t_arrive)
    mean = sum(ttfts) / len(ttfts)
    return mean, ttfts[-1], n_tokens / dt


def decode_tput(eng) -> float:
    from vllm_rust_tpu.request import SamplingParams

    sp = SamplingParams(max_tokens=GEN_LEN, temperature=0.0, ignore_eos=True)
    for i in range(16):
        eng.add_request(f"d-{i}", _prompt(200 + i, 64), sp)
    t0 = time.perf_counter()
    n = 0
    while eng.has_unfinished:
        for out in eng.step():
            n += len(out.new_token_ids)
    return n / (time.perf_counter() - t0)


def mixed_round(eng, base=300) -> float:
    """Staggered arrivals: 32 requests fed 4-at-a-time as others decode
    (chunked-prefill + decode interleaving under continuous batching).
    Runs a warm pass first: each distinct batch mix is its own jitted
    step variant and a mid-measure compile costs 20-60 s over the
    tunnel (r4 serving-bench finding)."""
    from vllm_rust_tpu.request import SamplingParams

    sp = SamplingParams(max_tokens=32, temperature=0.0, ignore_eos=True)

    def one_pass(tag):
        pending = [(f"{tag}-{i}", _prompt(base + i)) for i in range(32)]
        n = 0
        t0 = time.perf_counter()
        for rid, pr in pending[:4]:
            eng.add_request(rid, pr, sp)
        fed = 4
        while eng.has_unfinished or fed < len(pending):
            if fed < len(pending) and eng.scheduler.num_unfinished < 16:
                rid, pr = pending[fed]
                eng.add_request(rid, pr, sp)
                fed += 1
            for out in eng.step():
                n += len(out.new_token_ids)
        return n / (time.perf_counter() - t0)

    one_pass("mw")  # warm: compile the batch-mix variants
    return one_pass("m")


def main():
    size = os.environ.get("BENCH_MODEL", "qwen3-4b-awq")
    quant = "awq" if size.endswith("-awq") else None
    base = size.removesuffix("-awq")
    cfg = (
        bench_mod.qwen3_4b_config()
        if base == "qwen3-4b"
        else bench_mod.qwen3_small_config()
    )

    lines = [
        "# BENCH_DETAIL — serving latency/throughput detail (r4)",
        "",
        f"Model geometry: {size} (dummy weights), prompt {PROMPT_LEN}, "
        f"gen {GEN_LEN}, page 16, v5e single chip via the axon tunnel.",
        "Reference baseline: Qwen3-4B-AWQ TTFT ~600 ms, 44 tok/s c=1, "
        "185 tok/s c=16 on RTX 4060 Laptop "
        "(docs/perf/qwen3-4b-awq.md:52-66, stage-15-status.md:41).",
        "",
        "| metric | value |",
        "|---|---|",
    ]

    def log(msg):
        import sys
        print(f"[detail] {msg}", file=sys.stderr, flush=True)

    # latency mode: fetch_interval=2
    log("build fi=2 engine")
    eng = build_engine(2, cfg, quant)
    log("warmup")
    warm(eng)
    log("warm c=1 variants")
    ttft_run(eng, 1)  # discard: compiles the c=1 decode variants
    log("ttft c=1")
    mean1, max1, _ = ttft_run(eng, 1)
    log(f"TTFT c=1: {mean1*1e3:.0f} ms")
    lines.append(f"| TTFT c=1 (fetch_interval=2, prompt {PROMPT_LEN}) | "
                 f"{mean1*1e3:.0f} ms |")
    log("ttft c=16")
    mean16, max16, agg16 = ttft_run(eng, 16)
    log(f"TTFT c=16: mean {mean16*1e3:.0f} max {max16*1e3:.0f} ms, agg {agg16:.0f} tok/s")
    lines.append(f"| TTFT c=16 mean / max (fetch_interval=2) | "
                 f"{mean16*1e3:.0f} / {max16*1e3:.0f} ms |")
    lines.append(f"| aggregate tok/s during the c=16 TTFT round | "
                 f"{agg16:.0f} |")
    log("mixed round")
    mx = mixed_round(eng)
    log(f"mixed: {mx:.0f} tok/s")
    lines.append(f"| mixed staggered round tok/s (fetch_interval=2) | "
                 f"{mx:.0f} |")
    del eng

    # fetch-interval tradeoff curve (decode-only throughput)
    lines.append("")
    lines.append("## fetch_interval latency/throughput tradeoff "
                 "(decode c=16)")
    lines.append("")
    lines.append("| fetch_interval | decode tok/s | stop-latency bound |")
    lines.append("|---|---|---|")
    for fi in (2, 32):
        log(f"curve fi={fi}")
        import gc
        gc.collect()
        eng = build_engine(fi, cfg, quant)
        warm(eng)
        tput = decode_tput(eng)
        log(f"fi={fi}: {tput:.0f} tok/s")
        lines.append(f"| {fi} | {tput:.0f} | ~{fi} steps |")
        del eng

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.md")
    lines.append("")
    lines.append(f"Generated by benchmarks/detail.py on "
                 f"{time.strftime('%Y-%m-%d %H:%M')} (decode_window="
                 f"{os.environ.get('BENCH_DECODE_WINDOW', '8')}).")
    # preserve the marker-delimited serving section (benchmarks/serving.py)
    tail = ""
    try:
        prev = open(out).read()
        if "<!-- serving:begin -->" in prev:
            tail = "\n" + prev[prev.index("<!-- serving:begin -->"):]
    except FileNotFoundError:
        pass
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print("\n".join(lines))


if __name__ == "__main__":
    main()

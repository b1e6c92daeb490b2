"""Host-side timing trace of the engine decode loop at bench geometry.

Answers: where does wall time go per dispatch — host batch build, H2D,
step_fn dispatch, ring fetch stalls, scheduler? The jitted step's device
time is known from stepprof.py; the delta to bench.py's tok/s lives in
the host loop, and this prints it per phase.

Run: python benchmarks/engine_trace.py   (TPU; reuses bench compile cache)
     SERVING=1 python benchmarks/engine_trace.py
        — drive the serving bench's Poisson fi8 workload instead of the
        closed batch, with per-dispatch-kind attribution (mixed vs
        window sizes, rotations, fetch blocking): VERDICT r4 #2.
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


def main():
    size = os.environ.get("BENCH_MODEL", "qwen3-4b-awq")
    quant = "awq" if size.endswith("-awq") else None
    cfg = (
        bench_mod.qwen3_4b_config()
        if size.startswith("qwen3-4b")
        else bench_mod.qwen3_small_config()
    )
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.engine import engine as eng_mod
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams

    model = from_config(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    if quant == "awq":
        params = bench_mod.quantize_params_awq(model, params)
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=2048, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=16, max_tokens_per_step=2048),
        max_model_len=2048,
        fetch_interval=int(os.environ.get("BENCH_FETCH_INTERVAL", "32")),
        decode_window=int(os.environ.get("BENCH_DECODE_WINDOW", "8")),
    )
    serving = os.environ.get("SERVING") == "1"
    if serving:
        ec.fetch_interval = int(os.environ.get("BENCH_FETCH_INTERVAL", "8"))
    eng = LLMEngine(model, params, ec)

    # instrument: wrap _dispatch and _consume_fetch with timers
    timers = {"dispatch": 0.0, "fetch_block": 0.0, "step_other": 0.0,
              "n_dispatch": 0, "n_steps": 0, "n_fetches": 0,
              "n_rotations": 0}
    by_kind: dict[str, list[float]] = {}
    orig_dispatch = eng._dispatch
    orig_consume = eng._consume_fetch
    orig_rotate = eng._rotate_rings

    slow: list[tuple] = []

    def timed_dispatch(scheduled):
        t0 = time.perf_counter()
        recs = orig_dispatch(scheduled)
        dt = time.perf_counter() - t0
        timers["dispatch"] += dt
        timers["n_dispatch"] += 1
        timers["n_steps"] += len(recs)
        if scheduled:
            if all(s.num_tokens == 1 for s in scheduled):
                kind = f"decode_w{len(recs)}"
            elif any(s.num_tokens == 1 for s in scheduled):
                kind = "mixed"
            else:
                kind = "prefill"
            by_kind.setdefault(kind, []).append(dt)
            if dt > 0.05:
                total = sum(s.num_tokens for s in scheduled)
                from vllm_rust_tpu.utils import pick_bucket

                t_pad = pick_bucket(total, eng.config.token_buckets)
                pb = eng._page_bucket(scheduled)
                slow.append((dt, kind, t_pad, pb, len(scheduled)))
        return recs

    def timed_consume():
        t0 = time.perf_counter()
        out = orig_consume()
        timers["fetch_block"] += time.perf_counter() - t0
        timers["n_fetches"] += 1
        return out

    def counted_rotate():
        timers["n_rotations"] += 1
        return orig_rotate()

    eng._dispatch = timed_dispatch
    eng._consume_fetch = timed_consume
    eng._rotate_rings = counted_rotate

    def run_round(tag, n=16, gen=64):
        sp = SamplingParams(max_tokens=gen, temperature=0.0, ignore_eos=True)
        for i in range(n):
            prompt = [(7 * i + j) % 1000 + 1 for j in range(64)]
            eng.add_request(f"{tag}-{i}", prompt, sp)
        t0 = time.perf_counter()
        n_tok = 0
        n_step_calls = 0
        while eng.has_unfinished:
            ts = time.perf_counter()
            outs = eng.step()
            n_step_calls += 1
            for out in outs:
                n_tok += len(out.new_token_ids)
        dt = time.perf_counter() - t0
        return n_tok, dt, n_step_calls

    def run_poisson(tag):
        """The serving bench's fi8 Poisson stream (seeded identically)."""
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import serving as serving_mod
        from vllm_rust_tpu.request import SamplingParams

        reqs = serving_mod.gen_workload()
        sp_of = lambda i: SamplingParams(  # noqa: E731
            max_tokens=serving_mod.GEN_LEN, temperature=0.0, ignore_eos=True
        )
        _, t_tokens, _, makespan = serving_mod.drive(eng, reqs, sp_of, tag)
        n_tok = sum(len(v) for v in t_tokens.values())
        return n_tok, makespan, 0

    if serving:
        eng.warmup(gen_tokens=2)
        eng.warmup_variants()
        run_poisson("warmup")  # compile every batch-mix variant
        for k in timers:
            timers[k] = 0 if isinstance(timers[k], int) else 0.0
        by_kind.clear()
        slow.clear()
        n_tok, dt, n_calls = run_poisson("bench")
    else:
        run_round("warmup")  # compile
        for k in timers:
            timers[k] = 0 if isinstance(timers[k], int) else 0.0
        by_kind.clear()
        n_tok, dt, n_calls = run_round("bench")
    print(f"tok/s            : {n_tok/dt:.0f}  ({n_tok} tokens in {dt*1e3:.0f} ms)")
    print(f"step() calls     : {n_calls}; dispatches {timers['n_dispatch']} "
          f"covering {timers['n_steps']} device steps")
    print(f"host _dispatch   : {timers['dispatch']*1e3:.1f} ms total "
          f"({timers['dispatch']/max(timers['n_dispatch'],1)*1e3:.2f} ms each)")
    print(f"fetch blocking   : {timers['fetch_block']*1e3:.1f} ms total over "
          f"{timers['n_fetches']} fetches")
    print(f"other loop time  : {(dt - timers['dispatch'] - timers['fetch_block'])*1e3:.1f} ms")
    print(f"device steps/s   : {timers['n_steps']/dt:.1f} -> "
          f"{timers['n_steps'] and dt/timers['n_steps']*1e3:.2f} ms/step incl. gaps")
    print(f"rotations        : {timers['n_rotations']} "
          f"({timers['n_steps']/max(timers['n_rotations'],1):.1f} steps/cycle)")
    print(f"rtt_est          : {eng._rtt_est*1e3:.1f} ms; rings {eng._num_rings}")
    if by_kind:
        print("dispatch kinds:")
        for kind in sorted(by_kind):
            xs = by_kind[kind]
            print(f"  {kind:12s}: n={len(xs):4d}  host total "
                  f"{sum(xs)*1e3:7.1f} ms  mean {sum(xs)/len(xs)*1e3:6.2f} ms")
    if slow:
        print("slow dispatches (>50 ms): dt  kind  t_pad  p_bucket  n_seqs")
        for dt, kind, t_pad, pb, ns in sorted(slow, reverse=True)[:20]:
            print(f"  {dt*1e3:8.1f} ms  {kind:10s} t{t_pad:5d} p{pb:4d} s{ns}")


if __name__ == "__main__":
    main()

"""Full-decode-step device-time profiler with component ablations.

Why not per-kernel loops (benchmarks/micro.py): a lone GEMM inside a
fori_loop exposes ~150 us of unpipelined DMA latency per iteration
(measured r3), understating steady-state throughput ~4x. The engine's
real step pipelines layer weight fetches against compute, so honest
attribution = time the WHOLE jitted decode step in-graph, then ablate
one component at a time; the delta is that component's pipelined cost.

Run: python benchmarks/stepprof.py            (all variants)
     STEPPROF_VARIANTS=full,bf16 python ...   (subset)

Geometry matches bench.py: Qwen3-4B AWQ (int8-group image), c=16
decode, 200-token KV context.
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

HBM_GBPS = 819.0  # v5e

S, KLEN, PAGES, PS, PPS = 16, 200, 2048, 16, 16
ITERS = 100


def build(quant: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    from vllm_rust_tpu.models import from_config

    cfg = bench_mod.qwen3_4b_config()
    model = from_config(cfg, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    if quant == "awq":
        params = bench_mod.quantize_params_awq(model, params)
    return model, params, cfg


def make_md():
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata
    from vllm_rust_tpu.ops.pallas.decode_v2 import prepare_decode_v2

    kv_lens = jnp.full((S,), KLEN, jnp.int32)
    pages = jnp.arange(S * PPS, dtype=jnp.int32).reshape(S, PPS)
    # host-side compaction, as the engine step attaches it (step_fn.py)
    prepared = tuple(
        jnp.asarray(a)
        for a in prepare_decode_v2(np.asarray(kv_lens), np.asarray(pages),
                                   page_size=PS)
    )
    return AttentionMetadata(
        slot_mapping=jnp.arange(S, dtype=jnp.int32) * PS,
        kv_lens=kv_lens,
        page_indices=pages,
        cu_q_lens=jnp.arange(S + 1, dtype=jnp.int32),
        num_seqs=jnp.array([S], jnp.int32),
        positions=jnp.full((S,), KLEN - 1, jnp.int32),
        logits_indices=jnp.arange(S, dtype=jnp.int32),
        decode_prepared=prepared,
    )


def time_step(model, params, *, lm_head=True, attn=True,
              gemm=True) -> float:
    """Device ms per full decode step (forward + head + argmax feedback),
    measured as one dispatch of ITERS chained steps."""
    from vllm_rust_tpu.ops import paged_attention as pa

    md = make_md()
    kv = [
        jnp.zeros((PAGES, PS, 2 * nkv, hd), jnp.bfloat16)
        for nkv, hd in model.kv_head_info
    ]

    from vllm_rust_tpu.ops import int8_group as ig

    orig_gemm = ig.int8_group_matmul
    if not gemm:
        def zero_gemm(x, q8g, sg, zg=None):
            n = q8g.shape[2]
            return jnp.zeros((x.shape[0], n), jnp.bfloat16) + x.mean()
        ig.int8_group_matmul = zero_gemm
    # modules bind the op BY NAME at import time (layers/attention.py,
    # models/deepseek.py, phi.py, gemma4.py, ...), so the patch must hit
    # EVERY loaded module's global, not just ops.paged_attention's
    # (advisor r3: patching only layers/attention silently measured full
    # attention for models that from-import the op)
    patched: list = []
    if not attn:
        def identity_attn(q, kv_page, md_, *a, **kw):
            # keep the KV write out too: measures non-attention cost
            return q
        for name, mod in list(sys.modules.items()):
            if name.startswith("vllm_rust_tpu") and hasattr(
                mod, "ragged_paged_attention_op"
            ):
                patched.append((mod, mod.ragged_paged_attention_op))
                mod.ragged_paged_attention_op = identity_attn
    try:
        def one(params, ids, kv):
            with pa.decode_mode():
                hidden, kv = model(params, ids, md, kv)
            sel = hidden[md.logits_indices]
            if lm_head:
                logits = model.compute_logits(params, sel)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            else:
                nxt = jnp.argmax(sel, -1).astype(jnp.int32)
            return nxt % 1000, kv

        def loop(params, ids, kv):
            # params as ARGUMENTS: closing over them captures GBs of
            # constants at lowering time (measured 4.9 GB — unusable
            # over the tunnel compiler)
            return jax.lax.fori_loop(
                0, ITERS, lambda i, c: one(params, *c), (ids, kv)
            )

        g = jax.jit(loop, donate_argnums=(2,))
        ids = jnp.ones((S,), jnp.int32)
        out = g(params, ids, kv)
        np.asarray(out[0])  # block_until_ready does NOT wait on the
        _, kv2 = out        # axon tunnel (measured r3) — fetch to sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = g(params, ids, kv2)
            np.asarray(out[0])
            _, kv2 = out
            best = min(best, time.perf_counter() - t0)
        return best / ITERS * 1e3
    finally:
        for mod, orig in patched:
            mod.ragged_paged_attention_op = orig
        ig.int8_group_matmul = orig_gemm


def main():
    want = os.environ.get(
        "STEPPROF_VARIANTS", "full,noattn,nolmhead,nogemm"
    ).split(",")
    print(f"devices: {jax.devices()}  c={S} klen={KLEN} iters={ITERS}")
    results = {}

    if {"full", "noattn", "nolmhead", "nogemm"} & set(want):
        model, params, _ = build("awq")
    if "full" in want:
        results["full"] = time_step(model, params)
        print(f"awq full step          {results['full']:8.3f} ms")
    if "noattn" in want:
        results["noattn"] = time_step(model, params, attn=False)
        print(f"awq attn->identity     {results['noattn']:8.3f} ms   "
              f"(attn+KVwrite = {results.get('full', 0) - results['noattn']:+.3f})")
    if "nolmhead" in want:
        results["nolmhead"] = time_step(model, params, lm_head=False)
        print(f"awq no lm_head         {results['nolmhead']:8.3f} ms   "
              f"(lm_head = {results.get('full', 0) - results['nolmhead']:+.3f})")
    if "nogemm" in want:
        results["nogemm"] = time_step(model, params, gemm=False)
        print(f"awq gemm->zeros        {results['nogemm']:8.3f} ms   "
              f"(decoder GEMMs = "
              f"{results.get('full', 0) - results['nogemm']:+.3f})")
    if "bf16" in want:
        model_bf, params_bf, _ = build(None)
        results["bf16"] = time_step(model_bf, params_bf)
        print(f"bf16 full step         {results['bf16']:8.3f} ms")

    if "full" in results:
        ms = results["full"]
        # int8 image bytes: 36L x ~101M int8 + scales + lm_head int8 + KV
        wbytes = 3.75e9 + 0.389e9
        kvbytes = S * KLEN * 2 * 8 * 128 * 2 * 36
        gb = (wbytes + kvbytes) / 1e9
        print(f"\nfull-step traffic ~{gb:.2f} GB -> {gb / (ms / 1e3):.0f} GB/s "
              f"({100 * gb / (ms / 1e3) / HBM_GBPS:.0f}% of v5e HBM SoL); "
              f"SoL step = {gb / HBM_GBPS * 1e3:.2f} ms -> "
              f"{S / (gb / HBM_GBPS):.0f} tok/s ceiling at c={S}")


if __name__ == "__main__":
    main()

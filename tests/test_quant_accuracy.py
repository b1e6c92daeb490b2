"""Quantization accuracy gates (VERDICT r2 #7; reference ADR 0025
discipline + docs/perf quality bars).

The environment is zero-egress (no real checkpoints), so the gates are
PROXIES on a tiny random-weight model over a fixed synthetic corpus:

1. *Serving-path fidelity* (the strong gate): for each quantized
   serving path, logits through the production kernels must match a
   straight float dequantization of the same quantized weights — the
   path may not add error beyond the quantization itself.
2. *Quantization cost* (the sanity gate): perplexity-delta of each
   format vs the bf16/f32 baseline stays under a per-format bound, and
   coarser formats are not mysteriously better than finer ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.hf_parity_util import make_kv_pages, md_prefill
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.quantization.awq import make_w4a16_linear
from vllm_rust_tpu.testing import tiny_llama_config

GROUP = 32
CORPUS = [
    [(13 * i + j * j) % 200 + 1 for j in range(48)] for i in range(4)
]


def _quantize_group_asym(w: np.ndarray, bits: int, group: int):
    """Per-group asymmetric min/max quantization [K, N] -> (q, s, zs)."""
    k, n = w.shape
    g = k // group
    wg = w.reshape(g, group, n)
    lo = wg.min(axis=1)
    hi = wg.max(axis=1)
    qmax = (1 << bits) - 1
    s = np.maximum((hi - lo) / qmax, 1e-8)
    z = np.clip(np.rint(-lo / s), 0, qmax)
    q = np.clip(
        np.rint(wg / s[:, None, :]) + z[:, None, :], 0, qmax
    ).astype(np.uint8)
    return q.reshape(k, n), s.astype(np.float32), (z * s).astype(np.float32)


def _dequant(q, s, zs, group):
    k, n = q.shape
    g = k // group
    return (
        q.reshape(g, group, n).astype(np.float32) * s[:, None, :]
        - zs[:, None, :]
    ).reshape(k, n)


def _build(dtype=jnp.float32):
    mc = tiny_llama_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128, vocab_size=256,
    )
    model = from_config(mc, dtype=dtype)
    params = model.init_params(jax.random.PRNGKey(0), scale=0.15)
    return model, params


def _ppl(model, params, kv_dtype=None, kv_scales=None):
    """exp(mean NLL) of the fixed corpus under the model."""
    total, count = 0.0, 0
    for seq in CORPUS:
        kv = make_kv_pages(model, dtype=jnp.float32)
        md = md_prefill(len(seq))
        hidden, _ = model(
            params, jnp.asarray(seq, jnp.int32), md, kv
        )
        logits = model.compute_logits(params, hidden)
        lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
        tgt = np.asarray(seq[1:])
        total += -np.asarray(lp)[np.arange(len(tgt)), tgt].sum()
        count += len(tgt)
    return float(np.exp(total / count))


def _quantize_model(params, maker):
    """Apply ``maker(weight) -> node`` to every decoder linear."""
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, params))
    for lp in out["layers"]:
        for mod, names in (
            ("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
            ("mlp", ("gate_proj", "up_proj", "down_proj")),
        ):
            for nm in names:
                w = np.asarray(lp[mod][nm]["weight"], np.float32)
                lp[mod][nm] = maker(w)
    return out


def _maker_awq(w):
    q, s, zs = _quantize_group_asym(w, 4, GROUP)
    return make_w4a16_linear(q, s, zs, None, "awq")


def _maker_dequant(bits):
    def mk(w):
        q, s, zs = _quantize_group_asym(w, bits, GROUP)
        return {"weight": jnp.asarray(_dequant(q, s, zs, GROUP), jnp.float32)}
    return mk


def _maker_fp8(w):
    from vllm_rust_tpu.quantization.types import QuantLinear

    amax = np.abs(w).max() or 1.0
    scale = amax / 448.0
    qw = jnp.asarray(
        np.asarray(w / scale), jnp.float8_e4m3fn
    )
    return QuantLinear(
        qweight=qw,
        scales=jnp.asarray([[scale]], jnp.float32),
        method="fp8",
    )


def _maker_fp8_dequant(w):
    amax = np.abs(w).max() or 1.0
    scale = amax / 448.0
    deq = np.asarray(
        jnp.asarray(np.asarray(w / scale), jnp.float8_e4m3fn)
    ).astype(np.float32) * scale
    return {"weight": jnp.asarray(deq, jnp.float32)}


def test_serving_paths_match_float_dequant():
    """Gate 1: production kernels == float dequant of the same codes."""
    model, base = _build()
    ppl_w4_serving = _ppl(model, _quantize_model(base, _maker_awq))
    ppl_w4_ref = _ppl(model, _quantize_model(base, _maker_dequant(4)))
    assert abs(ppl_w4_serving - ppl_w4_ref) / ppl_w4_ref < 0.01, (
        ppl_w4_serving, ppl_w4_ref,
    )
    ppl_fp8_serving = _ppl(model, _quantize_model(base, _maker_fp8))
    ppl_fp8_ref = _ppl(model, _quantize_model(base, _maker_fp8_dequant))
    assert abs(ppl_fp8_serving - ppl_fp8_ref) / ppl_fp8_ref < 0.005


def test_quantization_cost_ordering_and_bounds():
    """Gate 2: Δppl per format under committed bounds, finer <= coarser."""
    model, base = _build()
    ppl_base = _ppl(model, base)
    ppl_w4 = _ppl(model, _quantize_model(base, _maker_awq))
    ppl_w8 = _ppl(model, _quantize_model(base, _maker_dequant(8)))
    ppl_fp8 = _ppl(model, _quantize_model(base, _maker_fp8))

    def delta(p):
        return abs(p - ppl_base) / ppl_base

    # committed bounds (tiny random model; real checkpoints are gentler)
    assert delta(ppl_w8) < 0.02, (ppl_base, ppl_w8)
    assert delta(ppl_fp8) < 0.02, (ppl_base, ppl_fp8)
    assert delta(ppl_w4) < 0.40, (ppl_base, ppl_w4)
    # finer formats must not lose to 4-bit
    assert delta(ppl_w8) <= delta(ppl_w4) + 1e-6
    assert delta(ppl_fp8) <= delta(ppl_w4) + 1e-6


def test_int8_lm_head_cost():
    from vllm_rust_tpu.quantization.compressed_tensors import quantize_lm_head

    model, base = _build()
    ppl_base = _ppl(model, base)
    import copy

    q = quantize_lm_head(copy.copy(dict(base)))
    ppl_q = _ppl(model, q)
    assert abs(ppl_q - ppl_base) / ppl_base < 0.02, (ppl_base, ppl_q)


# bounds calibrated on the tiny random model (real checkpoints are far
# gentler); a mis-wired scale or dequant shows up as O(1) drift.
# e4m3's 3 mantissa bits are noisier than int8 at a pinned scale.
@pytest.mark.parametrize("kv_dtype,bound", [
    ("fp8_e4m3", 0.10), ("int8", 0.08),
])
def test_kv_cache_quantization_cost(kv_dtype, bound):
    """KV-quantized engine vs full-precision engine: mean chosen-token
    logprob drift bounded (reference kv_cache/quantization.rs bar)."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.request import SamplingParams

    mc = tiny_llama_config(
        hidden_size=64, num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128, vocab_size=256,
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), scale=0.15)

    def run(kv):
        cfg = EngineConfig(
            model=mc,
            cache=CacheConfig(
                num_pages=32, page_size=16, kv_dtype=kv,
                k_scale=0.05 if kv != "auto" else 1.0,
                v_scale=0.05 if kv != "auto" else 1.0,
            ),
            scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
            max_model_len=128,
            token_buckets=(16, 32, 64),
        )
        eng = LLMEngine(model, params, cfg)
        # teacher-forced comparison: echo logprobs of the SAME prompt
        # (sampled continuations would diverge and compare different
        # contexts)
        out = eng.generate(
            [CORPUS[0][:24]],
            SamplingParams(max_tokens=1, temperature=0.0,
                           ignore_eos=True, prompt_logprobs=1),
        )[0]
        return np.asarray(
            [x for x in out.prompt_logprobs if x is not None], np.float32
        )

    lp_full = run("auto")
    lp_q = run(kv_dtype)
    assert lp_full.shape == lp_q.shape and lp_full.size > 10
    drift = float(np.abs(lp_full - lp_q).mean())
    assert drift < bound, (kv_dtype, drift)

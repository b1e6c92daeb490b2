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


# ---------------------------------------------------------------------------
# r4: per-format serving-fidelity gates (VERDICT r3 #5) — every quantized
# serving path must match a float dequant of its own codes. MXFP4's exact
# int8 repack is gated in test_gpt_oss.py::test_mxfp4_dequant_and_int8_agree.
# ---------------------------------------------------------------------------


def _pack_nibbles_rows(q):
    """[K, N] uint8 -> int32 [K/8, N] (AutoGPTQ qweight packing)."""
    k, n = q.shape
    qq = q.reshape(k // 8, 8, n).astype(np.uint32)
    out = np.zeros((k // 8, n), np.uint32)
    for i in range(8):
        out |= qq[:, i, :] << np.uint32(4 * i)
    return out.view(np.int32)


def _pack_nibbles_cols(z):
    """[G, N] uint8 -> int32 [G, N/8] (AutoGPTQ qzeros packing)."""
    g, n = z.shape
    zz = z.reshape(g, n // 8, 8).astype(np.uint32)
    out = np.zeros((g, n // 8), np.uint32)
    for i in range(8):
        out |= zz[:, :, i] << np.uint32(4 * i)
    return out.view(np.int32)


def _maker_gptq(desc_act=False):
    from vllm_rust_tpu.quantization.gptq import load_gptq_linear

    def mk(w):
        k, n = w.shape
        if desc_act:
            rngp = np.random.default_rng(k * 31 + n)
            g_idx = rngp.permutation(
                np.repeat(np.arange(k // GROUP), GROUP)
            ).astype(np.int32)
        else:
            g_idx = np.repeat(np.arange(k // GROUP), GROUP).astype(np.int32)
        sigma = np.argsort(g_idx, kind="stable")
        q_s, s, zs = _quantize_group_asym(w[sigma], 4, GROUP)
        q = np.empty_like(q_s)
        q[sigma] = q_s  # back to checkpoint (original-K) row order
        z = np.clip(np.rint(zs / s), 0, 15).astype(np.uint8)
        return load_gptq_linear(
            _pack_nibbles_rows(q),
            _pack_nibbles_cols((z - 1) & 0xF),  # AutoGPTQ zero-1 quirk
            s,
            g_idx if desc_act else None,
        )

    return mk


def _maker_gptq_dequant(desc_act=False):
    def mk(w):
        k, n = w.shape
        if desc_act:
            rngp = np.random.default_rng(k * 31 + n)
            g_idx = rngp.permutation(
                np.repeat(np.arange(k // GROUP), GROUP)
            ).astype(np.int32)
        else:
            g_idx = np.repeat(np.arange(k // GROUP), GROUP).astype(np.int32)
        sigma = np.argsort(g_idx, kind="stable")
        q_s, s, zs = _quantize_group_asym(w[sigma], 4, GROUP)
        deq_s = _dequant(q_s, s, zs, GROUP)
        deq = np.empty_like(deq_s)
        deq[sigma] = deq_s
        return {"weight": jnp.asarray(deq, jnp.float32)}

    return mk


def _int8_group_codes(w, g=16):
    wg = w.reshape(w.shape[0] // g, g, w.shape[1])
    scale = np.maximum(np.abs(wg).max(axis=1) / 127.0, 1e-12)
    q = np.clip(np.round(wg / scale[:, None, :]), -127, 127)
    return q.astype(np.int8), scale.astype(np.float32)


def _maker_exl3_int8(w):
    # the int8+group-scale serve form shared by EXL3, GGUF Q6_K/IQ
    # repacks and the AWQ-Marlin-equivalent path
    from vllm_rust_tpu.quantization.exl3 import dense_to_int8_quant_linear

    return dense_to_int8_quant_linear(w.astype(np.float32))


def _maker_exl3_int8_dequant(w):
    q, s = _int8_group_codes(w)  # q is [K/16, 16, N]
    deq = (q.astype(np.float32) * s[:, None, :]).reshape(w.shape)
    return {"weight": jnp.asarray(deq, jnp.float32)}


def _maker_gguf_q4k(w):
    """Build the production gguf_q4k node (repacked int4 + bf16 per-32
    scales, method registered to the fused w4a16 kernel) directly from
    group-asym codes — the byte-level Q4_K decode itself is golden-gated
    in tests/test_gguf.py."""
    from vllm_rust_tpu.ops.pallas.quant_matmul import prepare_tiled_scales
    from vllm_rust_tpu.quantization.awq import repack_k_half
    from vllm_rust_tpu.quantization.types import QuantLinear

    q, s, zs = _quantize_group_asym(w, 4, 32)
    st = np.asarray(jnp.asarray(s, jnp.bfloat16))
    zt = np.asarray(jnp.asarray(zs, jnp.bfloat16))
    aux = {}
    tiled = prepare_tiled_scales(st, zt, w.shape[0] // 2)
    if tiled is not None:
        aux = {
            "s_tiled": jnp.asarray(tiled[0]),
            "zs_tiled": jnp.asarray(tiled[1]),
        }
    return QuantLinear(
        qweight=jnp.asarray(repack_k_half(q)),
        scales=jnp.asarray(st, jnp.bfloat16),
        zs=jnp.asarray(zt, jnp.bfloat16),
        aux=aux,
        method="gguf_q4k",
    )


def _maker_gguf_q4k_dequant(w):
    q, s, zs = _quantize_group_asym(w, 4, 32)
    # match the loader's bf16 scale storage so only kernel-path error
    # remains under the gate
    s = np.asarray(jnp.asarray(s, jnp.bfloat16), np.float32)
    zs = np.asarray(jnp.asarray(zs, jnp.bfloat16), np.float32)
    return {"weight": jnp.asarray(_dequant(q, s, zs, 32), jnp.float32)}


def _bnb_nf4_parts(w):
    from vllm_rust_tpu.quantization.bitsandbytes import NF4_TABLE

    flat = w.astype(np.float32).reshape(-1)
    bs = 64
    pad = (-len(flat)) % bs
    fp = np.pad(flat, (0, pad))
    blocks = fp.reshape(-1, bs)
    absmax = np.abs(blocks).max(axis=1)
    absmax_safe = np.maximum(absmax, 1e-12)
    norm = blocks / absmax_safe[:, None]
    codes = np.abs(norm[:, :, None] - NF4_TABLE[None, None, :]).argmin(-1)
    codes = codes.astype(np.uint8).reshape(-1)[: len(flat) + pad]
    packed = (codes[0::2] << 4) | codes[1::2]
    state = np.frombuffer(
        json.dumps({"shape": list(w.shape), "blocksize": bs}).encode(),
        np.uint8,
    )
    return {
        "weight": packed,
        "weight.absmax": absmax.astype(np.float32),
        "weight.quant_state.bitsandbytes__nf4": state,
    }


def _maker_bnb_nf4(w):
    from vllm_rust_tpu.quantization.bitsandbytes import load_bnb_linear

    dense = load_bnb_linear(_bnb_nf4_parts(w))
    # BnB serves dense after load-time dequant (loader.py
    # _load_bitsandbytes); the gate pins that loader path
    return {"weight": jnp.asarray(dense, jnp.float32)}


def _maker_bnb_nf4_dequant(w):
    from vllm_rust_tpu.quantization.bitsandbytes import NF4_TABLE

    flat = w.astype(np.float32).reshape(-1)
    bs = 64
    pad = (-len(flat)) % bs
    fp = np.pad(flat, (0, pad))
    blocks = fp.reshape(-1, bs)
    absmax = np.abs(blocks).max(axis=1)
    absmax_safe = np.maximum(absmax, 1e-12)
    codes = np.abs(
        (blocks / absmax_safe[:, None])[:, :, None] - NF4_TABLE[None, None, :]
    ).argmin(-1)
    deq = (NF4_TABLE[codes] * absmax[:, None]).reshape(-1)[: len(flat)]
    return {"weight": jnp.asarray(deq.reshape(w.shape), jnp.float32)}


import json  # noqa: E402  (used by _bnb_nf4_parts)


@pytest.mark.parametrize(
    "name,mk_serving,mk_ref,bound",
    [
        ("gptq", _maker_gptq(False), _maker_gptq_dequant(False), 0.01),
        ("gptq_desc_act", _maker_gptq(True), _maker_gptq_dequant(True), 0.01),
        ("exl3_int8", _maker_exl3_int8, _maker_exl3_int8_dequant, 0.005),
        ("gguf_q4k", _maker_gguf_q4k, _maker_gguf_q4k_dequant, 0.01),
        ("bnb_nf4", _maker_bnb_nf4, _maker_bnb_nf4_dequant, 1e-6),
    ],
)
def test_format_serving_fidelity(name, mk_serving, mk_ref, bound):
    """Per-format gate (ADR 0025 discipline): the production kernel path
    may not add perplexity beyond the quantization itself."""
    model, base = _build()
    ppl_serving = _ppl(model, _quantize_model(base, mk_serving))
    ppl_ref = _ppl(model, _quantize_model(base, mk_ref))
    assert abs(ppl_serving - ppl_ref) / ppl_ref < bound, (
        name, ppl_serving, ppl_ref,
    )


@pytest.mark.parametrize(
    "name,mk,bound",
    [
        ("gptq", _maker_gptq(False), 0.40),
        ("exl3_int8", _maker_exl3_int8, 0.02),
        ("gguf_q4k", _maker_gguf_q4k, 0.40),
        ("bnb_nf4", _maker_bnb_nf4, 0.40),
    ],
)
def test_format_quantization_cost(name, mk, bound):
    """Per-format Δppl vs the float baseline stays under its bound."""
    model, base = _build()
    ppl_base = _ppl(model, base)
    ppl_q = _ppl(model, _quantize_model(base, mk))
    assert abs(ppl_q - ppl_base) / ppl_base < bound, (name, ppl_base, ppl_q)

"""First-write KV scale calibration (r4, reference
kv_cache/quantization.rs:80-100): serving a quantized KV cache with no
checkpoint scales must measure amax -> scale on the first prefill and
pin it, keeping teacher-forced drift bounded. Scale 1.0 int8 KV rounds
sub-0.5 activations to zero — the calibrated engine must match the
float-KV engine's greedy tokens where the uncalibrated one does not."""

import jax
import jax.numpy as jnp

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config

PROMPT = [3, 5, 7, 11, 13, 17, 19, 23]


def build(kv_dtype="auto", calibrate=True):
    cfg = tiny_llama_config()
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(
            num_pages=64, page_size=16, kv_dtype=kv_dtype,
            kv_calibrate=calibrate,
        ),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=256,
    )
    return LLMEngine(model, params, ec)


def gen(eng, n=12):
    sp = SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)
    eng.add_request("r", PROMPT, sp)
    toks = []
    while eng.has_unfinished:
        for out in eng.step():
            toks.extend(out.new_token_ids)
    return toks


def test_calibration_pins_scales_and_bounds_drift():
    want = gen(build("auto"))

    eng = build("int8", calibrate=True)
    assert eng._kv_calib_pending
    got = gen(eng)
    assert not eng._kv_calib_pending
    ks, vs = eng.config.cache.k_scale, eng.config.cache.v_scale
    assert ks != 1.0 and vs != 1.0 and 0 < ks < 1.0
    # bounded teacher-forced drift: greedy prefix matches the float run
    n_match = sum(1 for a, b in zip(got, want) if a == b)
    assert n_match >= len(want) // 2, (got, want)
    assert got[:4] == want[:4]


def test_uncalibrated_int8_diverges():
    """Documents WHY calibration matters: scale-1.0 int8 rounds the tiny
    model's sub-unit K/V values and the output drifts quickly."""
    want = gen(build("auto"))
    got = gen(build("int8", calibrate=False))
    assert got != want  # the silent mis-scaling VERDICT r3 #4 flagged


def test_calibration_survives_second_request():
    eng = build("int8", calibrate=True)
    first = gen(eng)
    ks = eng.config.cache.k_scale
    second = gen(eng)
    assert eng.config.cache.k_scale == ks  # pinned (contract #10)
    assert first == second  # deterministic greedy with pinned scales

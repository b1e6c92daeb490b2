"""On-device stop handling in multi-step decode windows (r4).

A watched sequence that samples EOS mid-window must (a) stop exactly at
the EOS with finish_reason STOP, (b) produce identical tokens up to the
stop as an ignore_eos run (overshoot discarded, KV of overshoot steps
routed to the null page), and (c) leave other still-running sequences
unaffected. Reference behavior: per-step stop checks in
engine/helpers.rs:2746-2795.
"""

import jax
import jax.numpy as jnp

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import FinishReason, SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config


def build(eos_id, window=4, fi=4):
    cfg = tiny_llama_config()
    cfg.eos_token_id = eos_id
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    ec = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=256,
        fetch_interval=fi,
        decode_window=window,
    )
    return model, params, ec


def run(eng, prompts, sps):
    toks, fins = {}, {}
    for i, (p, sp) in enumerate(zip(prompts, sps)):
        eng.add_request(f"r{i}", p, sp)
    while eng.has_unfinished:
        for out in eng.step():
            toks.setdefault(out.request_id, []).extend(out.new_token_ids)
            if out.finished:
                fins[out.request_id] = out.finish_reason
    return toks, fins


def test_window_eos_stop_exact():
    prompt = [3, 5, 7, 11]
    # probe: learn the greedy trajectory with EOS ignored
    model, params, ec = build(eos_id=2)
    eng = LLMEngine(model, params, ec)
    sp = SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True)
    toks, _ = run(eng, [prompt], [sp])
    traj = toks["r0"]
    assert len(traj) == 24

    # pick a stop token whose FIRST occurrence is mid-window (tiny-model
    # greedy output repeats values; an earlier duplicate would stop early)
    stop_at = next(
        i for i in range(5, len(traj)) if traj[i] not in traj[:i]
    )
    eos = traj[stop_at]
    # rebuild with that token as the model EOS; greedy is deterministic
    model, params, ec = build(eos_id=eos)
    eng = LLMEngine(model, params, ec)
    sp = SamplingParams(max_tokens=24, temperature=0.0)
    toks, fins = run(eng, [prompt], [sp])
    got = toks["r0"]
    assert got == traj[: stop_at + 1], (got, traj[: stop_at + 1])
    assert fins["r0"] == FinishReason.STOP


def test_window_eos_one_seq_stops_others_run():
    prompts = [[3, 5, 7, 11], [13, 17, 19, 23]]
    model, params, ec = build(eos_id=2)
    eng = LLMEngine(model, params, ec)
    sp = SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True)
    toks, _ = run(eng, prompts, [sp, sp])
    t0, t1 = toks["r0"], toks["r1"]

    stop_at = next(
        i for i in range(3, len(t0)) if t0[i] not in t0[:i] and t0[i] not in t1
    )
    eos = t0[stop_at]
    model, params, ec = build(eos_id=eos)
    eng = LLMEngine(model, params, ec)
    sp0 = SamplingParams(max_tokens=16, temperature=0.0)
    sp1 = SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True)
    toks, fins = run(eng, prompts, [sp0, sp1])
    assert toks["r0"] == t0[: stop_at + 1]
    assert fins["r0"] == FinishReason.STOP
    # the ignore_eos seq decodes its full budget with identical tokens
    assert toks["r1"] == t1


def test_window_custom_stop_token_on_device():
    """Per-seq stop_token_ids are watched ON DEVICE in windows (r4):
    identical stop semantics, exact tokens, STOP reason."""
    prompt = [3, 5, 7, 11]
    model, params, ec = build(eos_id=2)
    eng = LLMEngine(model, params, ec)
    sp = SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True)
    toks, _ = run(eng, [prompt], [sp])
    traj = toks["r0"]
    stop_at = next(i for i in range(5, len(traj)) if traj[i] not in traj[:i])
    stop_tok = traj[stop_at]

    eng = LLMEngine(model, params, ec)
    sp = SamplingParams(
        max_tokens=24, temperature=0.0, ignore_eos=True,
        stop_token_ids=[stop_tok],
    )
    toks, fins = run(eng, [prompt], [sp])
    assert toks["r0"] == traj[: stop_at + 1]
    assert fins["r0"] == FinishReason.STOP

"""Engine integration tests with tiny dummy models.

Reference: tests/engine_integration.rs (full engine with deterministic
mock models), tests/stress/concurrent_requests.rs (load/preemption).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import FinishReason, SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config
from vllm_rust_tpu.tokenizer import MockTokenizer


def make_engine(**over):
    model_cfg = over.pop("model_cfg", None) or tiny_llama_config()
    cfg = EngineConfig(
        model=model_cfg,
        cache=over.pop("cache", CacheConfig(num_pages=32, page_size=16)),
        scheduler=over.pop(
            "scheduler", SchedulerConfig(max_num_seqs=8, max_tokens_per_step=64)
        ),
        max_model_len=over.pop("max_model_len", 128),
        token_buckets=(16, 32, 64),
        seq_buckets=(4, 8),
        **over,
    )
    model = from_config(model_cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(model, params, cfg, tokenizer=MockTokenizer())


def test_single_greedy_generation():
    eng = make_engine()
    eng.add_request("r1", [1, 5, 9, 13], SamplingParams(max_tokens=8, temperature=0.0))
    outs = []
    while eng.has_unfinished:
        outs.extend(eng.step())
    final = outs[-1]
    assert final.finished
    assert len(final.token_ids) == 8 or final.finish_reason == FinishReason.STOP
    # deterministic re-run
    eng2 = make_engine()
    eng2.add_request("r1", [1, 5, 9, 13], SamplingParams(max_tokens=8, temperature=0.0))
    outs2 = []
    while eng2.has_unfinished:
        outs2.extend(eng2.step())
    assert outs2[-1].token_ids == final.token_ids


def test_concurrent_requests_same_as_solo():
    """Batching must not change greedy results (continuous-batching
    correctness — reference correctness suite concept)."""
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [20, 21]]
    solo_results = []
    for p in prompts:
        eng = make_engine()
        eng.add_request("solo", p, SamplingParams(max_tokens=6, temperature=0.0))
        res = {}
        while eng.has_unfinished:
            for o in eng.step():
                if o.finished:
                    res = o.token_ids
        solo_results.append(res)

    eng = make_engine()
    for i, p in enumerate(prompts):
        eng.add_request(f"r{i}", p, SamplingParams(max_tokens=6, temperature=0.0))
    batch_results = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                batch_results[o.request_id] = o.token_ids
    for i in range(len(prompts)):
        assert batch_results[f"r{i}"] == solo_results[i], f"prompt {i} diverged"


def test_chunked_prefill():
    """A prompt longer than max_tokens_per_step must complete via chunks."""
    eng = make_engine(
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=16),
        cache=CacheConfig(num_pages=32, page_size=16),
    )
    prompt = list(np.arange(40) % 250)
    eng.add_request("long", prompt, SamplingParams(max_tokens=4, temperature=0.0))
    steps = 0
    final = None
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                final = o
        steps += 1
        assert steps < 100
    assert final is not None
    assert len(final.token_ids) == 4
    # 40 tokens at 16/step needs >= 3 prefill steps + >=3 decode steps
    # (decode steps may share one dispatch via multi-step windows, so
    # count engine steps, not step() calls)
    assert eng.stats["num_steps"] >= 3 + 3


def test_preemption_under_memory_pressure():
    """Tiny pool forces preemption; all requests must still complete
    (recompute preemption, reference contract #3)."""
    eng = make_engine(
        cache=CacheConfig(num_pages=6, page_size=16),  # 5 usable pages = 80 tokens
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
    )
    for i in range(3):
        eng.add_request(
            f"r{i}", [10 + i, 20 + i, 30 + i], SamplingParams(max_tokens=24, temperature=0.0)
        )
    done = {}
    for _ in range(400):
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o
        if not eng.has_unfinished:
            break
    assert len(done) == 3
    assert eng.kv.num_free_pages == 5  # everything freed at the end

    # preempted-and-recomputed results must equal unpressured run
    eng2 = make_engine(
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
    )
    for i in range(3):
        eng2.add_request(
            f"r{i}", [10 + i, 20 + i, 30 + i], SamplingParams(max_tokens=24, temperature=0.0)
        )
    done2 = {}
    while eng2.has_unfinished:
        for o in eng2.step():
            if o.finished:
                done2[o.request_id] = o
    for k in done:
        assert done[k].token_ids == done2[k].token_ids, f"{k} diverged after preemption"


def test_admission_guard():
    eng = make_engine(
        cache=CacheConfig(num_pages=4, page_size=16), max_model_len=48
    )
    with pytest.raises(ValueError, match="unschedulable"):
        eng.add_request("too-long", list(range(100)), SamplingParams())


def test_stop_token_and_max_tokens():
    eng = make_engine()
    eng.add_request(
        "r", [3, 4], SamplingParams(max_tokens=50, temperature=0.0, ignore_eos=True)
    )
    # find what greedy generates, then use its 3rd token as a stop token
    outs = []
    while eng.has_unfinished:
        outs.extend(eng.step())
    tokens = outs[-1].token_ids
    stop_tok = tokens[2]

    eng2 = make_engine()
    eng2.add_request(
        "r",
        [3, 4],
        SamplingParams(
            max_tokens=50,
            temperature=0.0,
            ignore_eos=True,
            stop_token_ids=[stop_tok],
        ),
    )
    outs2 = []
    while eng2.has_unfinished:
        outs2.extend(eng2.step())
    assert outs2[-1].finish_reason == FinishReason.STOP
    assert outs2[-1].token_ids[-1] == stop_tok
    expected_len = tokens.index(stop_tok) + 1  # first occurrence stops it
    assert len(outs2[-1].token_ids) == expected_len


def test_seeded_sampling_deterministic():
    eng = make_engine()
    p = SamplingParams(max_tokens=10, temperature=0.8, top_k=20, seed=1234)
    r1 = eng.generate([[5, 6, 7]], p)[0].token_ids
    eng2 = make_engine()
    r2 = eng2.generate([[5, 6, 7]], p)[0].token_ids
    assert r1 == r2
    # different seed should (overwhelmingly) differ
    eng3 = make_engine()
    r3 = eng3.generate(
        [[5, 6, 7]], SamplingParams(max_tokens=10, temperature=0.8, top_k=20, seed=99)
    )[0].token_ids
    assert r1 != r3


def test_penalties_change_output():
    eng = make_engine()
    base = eng.generate(
        [[5, 6, 7]], SamplingParams(max_tokens=12, temperature=0.0)
    )[0].token_ids
    eng2 = make_engine()
    pen = eng2.generate(
        [[5, 6, 7]],
        SamplingParams(max_tokens=12, temperature=0.0, repetition_penalty=5.0),
    )[0].token_ids
    # with random weights greedy output usually repeats; strong repetition
    # penalty should alter the trajectory
    assert base != pen


def test_abort():
    eng = make_engine()
    eng.add_request("r", [1, 2, 3], SamplingParams(max_tokens=50, temperature=0.0))
    eng.step()
    eng.abort_request("r")
    assert not eng.has_unfinished
    assert eng.kv.num_free_pages == eng.kv.pool.total_usable


def test_victim_preemption_no_double_schedule():
    """Regression: a running seq preempted as a VICTIM mid-schedule (to
    make room for an earlier-arrived seq) must not also be scheduled from
    the stale running-list snapshot in the same round — that double-
    scheduled it and corrupted token accounting (IndexError in slots)."""
    eng = make_engine(
        cache=CacheConfig(num_pages=6, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=80,
    )
    sp = SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True)
    for i, p in enumerate([[2, 7, 1, 8], [9, 9, 2], [4, 4, 4, 4]]):
        eng.add_request(f"r{i}", p, sp)
    done = {}
    for _ in range(400):
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o
        if not eng.has_unfinished:
            break
    assert len(done) == 3
    assert all(len(o.token_ids) == 16 for o in done.values())
    assert eng.kv.pool.num_free == eng.kv.pool.total_usable


def test_swap_preemption():
    """Swap-mode preemption restores KV from host memory instead of
    recomputing (reference kv_cache/offload.rs + Swap preempt target)."""
    eng = make_engine(
        cache=CacheConfig(num_pages=6, page_size=16),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_tokens_per_step=64, preemption_mode="swap"
        ),
        max_model_len=80,
    )
    assert eng.kv.offload is not None
    sp = SamplingParams(max_tokens=20, temperature=0.0, ignore_eos=True)
    for i in range(3):
        eng.add_request(f"r{i}", [10 + i, 20 + i, 30 + i], sp)
    done = {}
    for _ in range(400):
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o
        if not eng.has_unfinished:
            break
    assert len(done) == 3
    assert eng.kv.offload.stats["swap_outs"] >= 1, "no swaps happened"
    assert eng.kv.offload.stats["swap_ins"] == eng.kv.offload.stats["swap_outs"]
    assert eng.kv.offload.used_bytes == 0
    # r4: queued swapped seqs had their H2D issued ahead of the restore
    # (reference offload.rs:59), so swap_in was a scatter, not a transfer
    assert eng.kv.offload.stats["prefetches"] >= 1, "no prefetch happened"
    assert not eng.kv.offload._prefetched  # all consumed or dropped

    # results identical to an unpressured recompute engine
    eng2 = make_engine(
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
    )
    for i in range(3):
        eng2.add_request(f"r{i}", [10 + i, 20 + i, 30 + i], sp)
    done2 = {}
    while eng2.has_unfinished:
        for o in eng2.step():
            if o.finished:
                done2[o.request_id] = o
    for k in done:
        assert done[k].token_ids == done2[k].token_ids, f"{k} diverged after swap"


def test_multistep_decode_window_exact():
    """Multi-step decode windows (config.decode_window) must be
    bit-identical to single-step decoding: same greedy tokens, same
    seeded-sampling tokens (device-evolved metadata == host metadata)."""
    from vllm_rust_tpu.config import CacheConfig, SchedulerConfig

    def run(window, params):
        eng = make_engine(
            scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
            cache=CacheConfig(num_pages=64, page_size=16),
            fetch_interval=8,
        )
        eng.config.decode_window = window
        dispatches = 0
        orig = eng.step_fn.__call__

        outs = {}
        prompts = {"a": [1, 2, 3], "b": list(range(5, 29))}  # page-crossing
        for rid, pr in prompts.items():
            eng.add_request(rid, pr, params)
        while eng.has_unfinished:
            for o in eng.step():
                outs.setdefault(o.request_id, []).extend(o.new_token_ids)
        return outs, eng.stats["num_steps"]

    greedy = SamplingParams(max_tokens=21, temperature=0.0, ignore_eos=True)
    base, base_steps = run(1, greedy)
    win, win_steps = run(4, greedy)
    assert win == base, f"window diverged: {win} vs {base}"
    assert win_steps == base_steps  # engine-visible steps identical

    seeded = SamplingParams(
        max_tokens=15, temperature=0.9, top_k=8, seed=7, ignore_eos=True
    )
    base, _ = run(1, seeded)
    win, _ = run(4, seeded)
    assert win == base, "seeded sampling diverged under windows"


def test_window_respects_max_tokens_and_page_boundaries():
    from vllm_rust_tpu.config import CacheConfig, SchedulerConfig

    eng = make_engine(
        scheduler=SchedulerConfig(max_num_seqs=2, max_tokens_per_step=64),
        cache=CacheConfig(num_pages=16, page_size=16),
        fetch_interval=8,
    )
    eng.config.decode_window = 8
    # 14-token prompt: decode crosses the page boundary inside a window
    eng.add_request("x", list(range(1, 15)),
                    SamplingParams(max_tokens=5, temperature=0.0,
                                   ignore_eos=True))
    outs = []
    while eng.has_unfinished:
        for o in eng.step():
            outs.extend(o.new_token_ids)
    assert len(outs) == 5

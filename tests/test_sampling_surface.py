"""Sampling feature tail: logit_bias, bad_words, allowed_token_ids,
typical-p, top_logprobs, prompt logprobs/echo.

Reference: sampling/mod.rs:38-120 + logits_processor.rs (LogitBias,
BadWords, AllowedTokenIds) + engine/helpers.rs:860-890 (echo contract #4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.sampling.sampler import (
    SamplerInputs,
    _typical_filter,
    apply_logit_bias,
    sample_tokens,
)
from vllm_rust_tpu.testing import tiny_engine_config, tiny_llama_config


@pytest.fixture(scope="module")
def engine():
    from vllm_rust_tpu.models import from_config

    cfg = tiny_engine_config(tiny_llama_config())
    model = from_config(cfg.model, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return LLMEngine(model, params, cfg)


def _run(engine, params, prompt=(5, 6, 7, 8), rid="r"):
    import itertools

    rid = rid + str(next(_run._c))
    engine.add_request(rid, list(prompt), params)
    outs = {}
    while engine.has_unfinished:
        for o in engine.step():
            outs[o.request_id] = o
    return outs[rid]


_run._c = iter(range(10_000))


# ---------------------------------------------------------------- unit level

def test_apply_logit_bias_unit():
    logits = jnp.zeros((2, 10), jnp.float32)
    ids = jnp.array([[3, 7, -1, -1], [-1, -1, -1, -1]], jnp.int32)
    vals = jnp.array([[1.5, -2.0, 99.0, 99.0], [99.0, 0, 0, 0]], jnp.float32)
    out = apply_logit_bias(logits, ids, vals)
    assert float(out[0, 3]) == 1.5
    assert float(out[0, 7]) == -2.0
    assert float(out[0, 0]) == 0.0  # -1 slots dropped
    assert np.allclose(np.asarray(out[1]), 0.0)


def test_typical_filter_unit():
    # peaked distribution: typical set keeps tokens near the entropy
    logits = jnp.array([[4.0, 3.9, 0.0, -4.0, -8.0]], jnp.float32)
    out = _typical_filter(logits, jnp.array([0.5], jnp.float32))
    kept = np.asarray(out[0]) > -1e9
    assert kept.sum() >= 1
    assert kept.sum() < 5
    # typical_p = 1.0 keeps everything
    out_off = _typical_filter(logits, jnp.array([1.0], jnp.float32))
    assert (np.asarray(out_off[0]) > -1e9).all()


def test_sample_tokens_top_logprobs():
    logits = jnp.asarray(
        np.random.RandomState(0).randn(3, 32), jnp.float32
    )
    si = SamplerInputs(
        temperature=jnp.zeros(3),
        top_k=jnp.zeros(3, jnp.int32),
        top_p=jnp.ones(3),
        min_p=jnp.zeros(3),
        repetition_penalty=jnp.ones(3),
        presence_penalty=jnp.zeros(3),
        frequency_penalty=jnp.zeros(3),
        seed=jnp.zeros(3, jnp.uint32),
        position=jnp.zeros(3, jnp.int32),
        ban_eos=jnp.zeros(3, bool),
    )
    toks, lps, tids, tlps = sample_tokens(
        logits, si, None, (), use_penalties=False, use_top_filters=False,
        top_logprobs_k=4,
    )
    ref_lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for r in range(3):
        order = np.argsort(-ref_lp[r])[:4]
        assert list(np.asarray(tids)[r]) == list(order)
        np.testing.assert_allclose(
            np.asarray(tlps)[r], ref_lp[r, order], rtol=1e-5
        )
        # greedy token == top-1
        assert int(toks[r]) == order[0]


# -------------------------------------------------------------- engine level

def test_logit_bias_forces_token(engine):
    # +1e9 bias on token 42 makes greedy pick it every step
    out = _run(
        engine,
        SamplingParams(
            max_tokens=4, temperature=0.0, logit_bias={42: 1e9},
            ignore_eos=True,
        ),
    )
    assert out.token_ids == [42, 42, 42, 42]


def test_allowed_token_ids(engine):
    allowed = [7, 9, 11]
    out = _run(
        engine,
        SamplingParams(
            max_tokens=6, temperature=0.0, allowed_token_ids=allowed,
            ignore_eos=True,
        ),
    )
    assert all(t in allowed for t in out.token_ids)


def test_bad_words_single_token(engine):
    base = _run(
        engine, SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    )
    banned = base.token_ids[0]
    out = _run(
        engine,
        SamplingParams(
            max_tokens=4, temperature=0.0, bad_words=[[banned]],
            ignore_eos=True,
        ),
    )
    assert banned not in out.token_ids


def test_bad_words_sequence(engine):
    base = _run(
        engine, SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    )
    if len(set(base.token_ids[:2])) >= 1:
        # ban the observed bigram: the second token must change after the
        # first appears
        bigram = base.token_ids[:2]
        out = _run(
            engine,
            SamplingParams(
                max_tokens=5, temperature=0.0, bad_words=[bigram],
                ignore_eos=True,
            ),
        )
        for a, b in zip(out.token_ids, out.token_ids[1:]):
            assert not (a == bigram[0] and b == bigram[1])


def test_top_logprobs_engine(engine):
    out = _run(
        engine,
        SamplingParams(
            max_tokens=3, temperature=0.0, top_logprobs=4, logprobs=1,
            ignore_eos=True,
        ),
    )
    assert out.top_logprobs is not None
    step = out.top_logprobs[0]
    assert len(step) == 4
    # best-first and contains the chosen greedy token as top-1
    lps = [lp for _, lp in step]
    assert lps == sorted(lps, reverse=True)
    assert step[0][0] == out.token_ids[-1]
    # accumulated per-token candidates live on the sequence
    # (chosen token logprob equals the top-1 logprob under greedy)
    assert abs(out.logprobs[0] - step[0][1]) < 1e-4


def test_typical_p_engine_runs(engine):
    out = _run(
        engine,
        SamplingParams(
            max_tokens=4, temperature=1.0, typical_p=0.5, seed=7,
            ignore_eos=True,
        ),
    )
    assert len(out.token_ids) == 4


def test_prompt_logprobs_echo(engine):
    prompt = [5, 6, 7, 8, 9, 10]
    out = _run(
        engine,
        SamplingParams(max_tokens=2, temperature=0.0, prompt_logprobs=True),
        prompt=prompt,
    )
    acc = out.prompt_logprobs
    assert acc is not None
    assert acc[0] is None  # first token has no conditional
    assert len(acc) == len(prompt)
    assert all(isinstance(x, float) for x in acc[1:])

    # cross-check one position vs a direct forward
    import sys
    sys.path.insert(0, "tests")
    from test_model_forward import make_kv_pages, md_single_seq

    model, params = engine.model, engine.params
    kv = make_kv_pages(model)
    md = md_single_seq(len(prompt))
    h, _ = model(params, jnp.asarray(prompt, jnp.int32), md, kv)
    logits = model.compute_logits(params, h)
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for i in range(1, len(prompt)):
        np.testing.assert_allclose(
            acc[i], lp[i - 1, prompt[i]], rtol=1e-3, atol=1e-3
        )

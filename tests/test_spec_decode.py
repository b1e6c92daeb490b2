"""Speculative decoding tests: equivalence with the normal engine and
acceptance on repetitive text.

Reference correctness bar: spec decode must be lossless for greedy
(speculative.rs greedy verification)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams, Sequence
from vllm_rust_tpu.spec_decode import NgramProposer
from vllm_rust_tpu.spec_decode.engine import SpecLLMEngine
from vllm_rust_tpu.testing import tiny_llama_config


def build(spec: bool, **over):
    mc = tiny_llama_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    if spec:
        return SpecLLMEngine(
            model, params, cfg, proposer=NgramProposer(num_draft_tokens=3)
        )
    return LLMEngine(model, params, cfg)


def run_greedy(eng, prompt, n=16):
    out = eng.generate(
        [prompt], SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)
    )
    return out[0].token_ids


def test_ngram_proposer():
    p = NgramProposer(num_draft_tokens=3, min_ngram=1, max_ngram=3)
    seq = Sequence("t", [1, 2, 3, 9, 1, 2, 3], SamplingParams())
    # trailing 3-gram [1,2,3] occurred at position 0; proposes [9, 1, 2]
    assert p.propose(seq) == [9, 1, 2]
    seq2 = Sequence("t", [5, 6, 7], SamplingParams())
    assert p.propose(seq2) == []  # no earlier occurrence


def test_spec_greedy_lossless():
    """Spec decode must produce byte-identical greedy output."""
    prompts = [[1, 2, 3, 4], [9, 8, 7], [11, 12, 13, 14, 15, 16]]
    for prompt in prompts:
        base = run_greedy(build(False), prompt)
        spec = run_greedy(build(True), prompt)
        assert base == spec, f"spec diverged for {prompt}: {base} vs {spec}"


def test_spec_acceptance_on_repetitive_model():
    """Random tiny models greedily repeat; ngram drafts should be accepted
    and the engine should finish in fewer steps than tokens."""
    eng = build(True)
    out = eng.generate(
        [[1, 2, 3]], SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True)
    )[0]
    assert len(out.token_ids) == 24
    # steps < tokens generated implies multi-token acceptance happened
    assert eng.stats["num_steps"] < 24 + 2
    assert eng.stats["accepted_tokens"] > 0, (
        f"no drafts accepted (drafted={eng.stats['draft_tokens']})"
    )


def test_spec_concurrent_mixed():
    """Greedy (speculated) + sampled (non-speculated) requests together."""
    eng = build(True)
    eng.add_request("g", [1, 2, 3], SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True))
    eng.add_request("s", [4, 5, 6], SamplingParams(max_tokens=10, temperature=0.9, seed=7, ignore_eos=True))
    done = {}
    for _ in range(200):
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o
        if not eng.has_unfinished:
            break
    assert set(done) == {"g", "s"}
    assert len(done["g"].token_ids) == 10
    assert len(done["s"].token_ids) == 10
    # sampled request must match the non-spec engine's seeded output
    eng2 = build(False)
    ref = eng2.generate(
        [[4, 5, 6]], SamplingParams(max_tokens=10, temperature=0.9, seed=7, ignore_eos=True)
    )[0]
    assert done["s"].token_ids == ref.token_ids

"""Speculative decoding x structured output (reference speculative.rs
grammar rollback: drafts verified under per-position grammar masks).
"""

import jax
import jax.numpy as jnp
import pytest

from vllm_rust_tpu.config import SpeculativeConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.spec_decode import NgramProposer
from vllm_rust_tpu.spec_decode.engine import SpecLLMEngine
from vllm_rust_tpu.testing import tiny_engine_config, tiny_llama_config


class ByteTok:
    eos_token_id = 0

    def encode(self, s):
        return [min(ord(c), 255) for c in s]

    def decode(self, ids):
        return "".join(chr(i) for i in ids if i != 0)


def make_engines():
    cfg = tiny_engine_config(tiny_llama_config())
    model = from_config(cfg.model, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    base = LLMEngine(model, params, cfg, tokenizer=ByteTok())
    cfg2 = tiny_engine_config(tiny_llama_config())
    spec = SpecLLMEngine(
        model, params, cfg2, tokenizer=ByteTok(),
        proposer=NgramProposer(num_draft_tokens=3),
    )
    return base, spec


def run(eng, rid, constraint, max_tokens=10):
    eng.add_request(
        rid, [72, 73, 72, 73, 72],  # repetitive prompt: ngram drafts fire
        SamplingParams(
            max_tokens=max_tokens, temperature=0.0, constraint=constraint
        ),
    )
    outs = {}
    while eng.has_unfinished:
        for o in eng.step():
            outs[o.request_id] = o
    return outs[rid]


def test_spec_grammar_choice_matches_base():
    base, spec = make_engines()
    constraint = {"choice": ["alpha", "beta", "gamma"]}
    b = run(base, "b1", constraint)
    s = run(spec, "s1", constraint)
    assert b.output_text in ("alpha", "beta", "gamma")
    assert s.output_text == b.output_text  # greedy-exact under spec


def test_spec_grammar_regex_valid():
    _, spec = make_engines()
    out = run(spec, "s2", {"regex": "(yes|no)!"}, max_tokens=8)
    assert out.output_text in ("yes!", "no!")


def test_spec_grammar_acceptance_counted():
    _, spec = make_engines()
    run(spec, "s3", {"choice": ["aaaa", "bbbb"]}, max_tokens=8)
    # drafts were proposed; stats exposed for /metrics
    assert "draft_tokens" in spec.stats
    assert 0.0 <= spec.acceptance_rate <= 1.0


# ------------------------------------------------------------ tree verify

def test_medusa_tree_lossless_and_exercised():
    """Tree verification (reference tree_attention.rs) via root-path
    batch rows: greedy output must stay EXACTLY lossless, and alternate
    paths must actually be dispatched."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.spec_decode import MedusaProposer

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))

    def build_cfg():
        return EngineConfig(
            model=mc,
            cache=CacheConfig(num_pages=32, page_size=16),
            scheduler=SchedulerConfig(max_num_seqs=6, max_tokens_per_step=64),
            max_model_len=128,
            token_buckets=(16, 32, 64),
        )

    base = LLMEngine(model, params, build_cfg())
    prompt = [1, 2, 3, 4]
    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
    base_out = base.generate([prompt], [sp])[0].token_ids

    proposer = MedusaProposer(mc, num_heads=2, dtype=jnp.float32,
                              tree_width=2)
    proposer.init_params(rng=None)
    for hp in proposer.device_params["heads"]:
        hp["lm_head"]["weight"] = params["lm_head"]["weight"]
    assert proposer.proposes_trees
    eng = SpecLLMEngine(model, params, build_cfg(), proposer=proposer)
    assert eng.tree_mode
    out = eng.generate([prompt], [sp])[0].token_ids
    assert out == base_out, f"tree spec diverged: {out} vs {base_out}"
    assert eng.stats["tree_alt_rows"] > 0, "no alternate path was dispatched"

    # alternate paths dispatched: draft count exceeds the top-1 chain
    # budget only when alt rows run — assert propose_paths yields >1 path
    seq_like = type("S", (), {"request_id": "x"})()
    proposer._pending["x"] = [5, 6, 7, 8]  # 2 heads x width 2
    paths = proposer.propose_paths(seq_like)
    assert paths[0] == [5, 7]
    assert [5, 8] in paths and [6] in paths


def test_medusa_tree_page_boundary():
    """Tree windows that start mid-page need the boundary-page copy; a
    long generation crosses page boundaries repeatedly."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.spec_decode import MedusaProposer

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=6, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    base = LLMEngine(model, params, cfg)
    prompt = [7, 3, 9]
    sp = SamplingParams(max_tokens=40, temperature=0.0, ignore_eos=True)
    base_out = base.generate([prompt], [sp])[0].token_ids

    proposer = MedusaProposer(mc, num_heads=2, dtype=jnp.float32,
                              tree_width=2)
    proposer.init_params(rng=None)
    for hp in proposer.device_params["heads"]:
        hp["lm_head"]["weight"] = params["lm_head"]["weight"]
    cfg2 = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=6, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng = SpecLLMEngine(model, params, cfg2, proposer=proposer)
    out = eng.generate([prompt], [sp])[0].token_ids
    assert out == base_out

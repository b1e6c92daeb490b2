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


# -- round-1 extension: draft model / medusa / stochastic verification -------


def build_draft(num_draft=3, draft_same=True, **eng_over):
    """Spec engine with a full draft-model proposer."""
    from vllm_rust_tpu.spec_decode import DraftModelProposer

    mc = tiny_llama_config()
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    for k, v in eng_over.items():
        setattr(cfg, k, v)
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    if draft_same:
        draft_model, draft_params = model, params
    else:
        dmc = tiny_llama_config(num_hidden_layers=1, hidden_size=32,
                                intermediate_size=64, num_attention_heads=2,
                                num_key_value_heads=1)
        draft_model = from_config(dmc, dtype=jnp.float32)
        draft_params = draft_model.init_params(jax.random.PRNGKey(7))
    proposer = DraftModelProposer(draft_model, draft_params,
                                  num_draft_tokens=num_draft)
    return SpecLLMEngine(model, params, cfg, proposer=proposer)


def test_draft_model_lossless_and_accepting():
    """Draft == target model: greedy drafts always match -> near-full
    acceptance, and the output must equal the plain engine's."""
    prompt = [1, 2, 3, 4]
    base = run_greedy(build(False), prompt, n=20)
    eng = build_draft(draft_same=True)
    out = run_greedy(eng, prompt, n=20)
    assert out == base
    assert eng.acceptance_rate > 0.9, eng.stats
    # with k=3 accepted everywhere, ~20/4 decode steps + prefill
    assert eng.stats["num_steps"] <= 9


def test_draft_model_different_draft_still_lossless():
    """A different (random) draft proposes garbage; verification must
    reject it and the emitted stream must stay byte-identical."""
    prompt = [5, 6, 7]
    base = run_greedy(build(False), prompt, n=16)
    eng = build_draft(draft_same=False)
    out = run_greedy(eng, prompt, n=16)
    assert out == base


def test_draft_model_survives_preemption():
    """Tiny pool forces preemption; the draft KV must be rebuilt."""
    eng = build_draft(draft_same=True)
    eng.config.scheduler.max_num_seqs = 4
    prompts = [[i + 1, i + 2, i + 3, i + 4] for i in range(4)]
    outs = eng.generate(
        prompts,
        SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True),
    )
    base_eng = build(False)
    for p, o in zip(prompts, outs):
        assert o.token_ids == run_greedy(base_eng, p, n=24)


def test_stochastic_spec_bitwise_equal():
    """Rejection-sampling verification: a SEEDED stochastic request run
    through the spec engine must emit the byte-identical stream the plain
    engine emits (stateless positional RNG makes this exact, not just
    distributional)."""
    p = SamplingParams(max_tokens=16, temperature=0.8, seed=1234,
                       ignore_eos=True)
    base = build(False).generate([[3, 1, 4, 1, 5]], p)[0].token_ids
    eng = build(True)
    out = eng.generate([[3, 1, 4, 1, 5]], p)[0].token_ids
    assert out == base
    p2 = SamplingParams(max_tokens=16, temperature=0.8, seed=1234,
                        top_k=12, top_p=0.9, ignore_eos=True)
    base2 = build(False).generate([[3, 1, 4, 1, 5]], p2)[0].token_ids
    out2 = build(True).generate([[3, 1, 4, 1, 5]], p2)[0].token_ids
    assert out2 == base2


def test_typical_acceptance_runs():
    """Typical acceptance emits valid tokens and respects max_tokens."""
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
    eng = SpecLLMEngine(
        model, params, cfg,
        proposer=NgramProposer(num_draft_tokens=3),
        acceptance_method="typical",
    )
    out = eng.generate(
        [[1, 2, 3, 1, 2, 3]],
        SamplingParams(max_tokens=12, temperature=0.7, seed=3, ignore_eos=True),
    )[0]
    assert len(out.token_ids) == 12
    assert all(0 <= t < mc.vocab_size for t in out.token_ids)
    # greedy rows under typical must still be exactly lossless
    base = run_greedy(build(False), [9, 8, 7], n=12)
    eng2 = SpecLLMEngine(
        model, params, cfg,
        proposer=NgramProposer(num_draft_tokens=3),
        acceptance_method="typical",
    )
    assert run_greedy(eng2, [9, 8, 7], n=12) == base


def _medusa_engine(model, params, mc, num_heads=2):
    from vllm_rust_tpu.spec_decode import MedusaProposer

    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    proposer = MedusaProposer(mc, num_heads=num_heads, dtype=jnp.float32)
    proposer.init_params(rng=None)  # zero blocks => head(h) = h
    for hp in proposer.device_params["heads"]:
        hp["lm_head"]["weight"] = params["lm_head"]["weight"]
    return SpecLLMEngine(model, params, cfg, proposer=proposer), proposer


def test_medusa_lossless_and_head_position():
    """Medusa heads run in-step on the hidden of the last emitted
    position. With identity blocks + the target's lm_head, each head must
    reproduce exactly the token the target emitted at that position —
    proving the in-step gather hits the right hidden state. Output stays
    lossless regardless of draft quality."""
    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    eng, proposer = _medusa_engine(model, params, mc)

    stored = []
    orig_store = proposer.store
    proposer.store = lambda seq, d: (stored.append(list(d)), orig_store(seq, d))

    prompt = [1, 2, 3, 4]
    base = run_greedy(build(False), prompt, n=12)
    out = run_greedy(eng, prompt, n=12)
    assert out == base
    assert eng.stats["draft_tokens"] > 0
    # the head == lm_head, so stored drafts at each step must equal the
    # token emitted from the same hidden state (one per step here: this
    # random model is not period-1, so drafts are never accepted)
    assert [s[0] for s in stored][: len(out)] == out


def test_medusa_acceptance_on_constant_model():
    """A zero-weight model emits argmax=0 forever (period 1); identity
    heads then draft 0s which must be accepted, cutting the step count."""
    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(rng=None)  # all-zero weights
    eng, _ = _medusa_engine(model, params, mc)
    out = eng.generate(
        [[1, 2, 3]],
        SamplingParams(max_tokens=18, temperature=0.0, ignore_eos=True),
    )[0]
    assert out.token_ids == [0] * 18
    assert eng.stats["accepted_tokens"] > 0
    assert eng.stats["num_steps"] < 18  # multi-token emission happened


def test_medusa_checkpoint_loading():
    """HF medusa naming: medusa_head.{k}.{i}.linear.{weight,bias} +
    medusa_head.{k}.1.weight lm head."""
    from vllm_rust_tpu.spec_decode import MedusaProposer

    mc = tiny_llama_config()
    h, v = mc.hidden_size, mc.vocab_size
    rng = np.random.default_rng(0)
    stream = []
    for k in range(2):
        stream.append((f"medusa_head.{k}.0.linear.weight",
                       rng.normal(size=(h, h)).astype(np.float32)))
        stream.append((f"medusa_head.{k}.0.linear.bias",
                       rng.normal(size=(h,)).astype(np.float32)))
        stream.append((f"medusa_head.{k}.1.weight",
                       rng.normal(size=(v, h)).astype(np.float32)))
    p = MedusaProposer(mc, num_heads=2, dtype=jnp.float32)
    params = p.load_weights(stream)
    assert params["heads"][1]["blocks"][0]["weight"].shape == (h, h)
    assert params["heads"][1]["lm_head"]["weight"].shape == (h, v)
    assert not np.allclose(np.asarray(params["heads"][0]["lm_head"]["weight"]), 0)


# -- EAGLE / MTP / suffix proposers ------------------------------------------


def test_suffix_proposer():
    from vllm_rust_tpu.spec_decode import SuffixProposer

    p = SuffixProposer(num_draft_tokens=3)
    # trailing [1,2,3] occurred at positions 0..2; propose what followed: 9,1,2
    seq = Sequence("t", [1, 2, 3, 9, 1, 2, 3], SamplingParams())
    assert p.propose(seq) == [9, 1, 2]
    # suffix automaton finds LONG matches an ngram cap would miss
    long = [7, 8, 9, 10, 11, 12, 13, 42] + [7, 8, 9, 10, 11, 12, 13]
    seq2 = Sequence("t2", long, SamplingParams())
    assert p.propose(seq2) == [42, 7, 8]
    seq3 = Sequence("t3", [5, 6, 7], SamplingParams())
    assert p.propose(seq3) == []
    # incremental extension across calls
    seq.generated_token_ids.extend([9, 1])
    out = p.propose(seq)
    assert out == [2, 3, 9]


def _eagle_engine(model, params, mc, cls, draft_rng=None, k=3):
    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    dmc = tiny_llama_config(num_hidden_layers=1)
    proposer = cls(dmc, num_draft_tokens=k, dtype=jnp.float32)
    proposer.init_params(rng=draft_rng)
    return SpecLLMEngine(model, params, cfg, proposer=proposer), proposer


def test_eagle_lossless():
    """Random EAGLE module drafts junk; output must stay byte-identical,
    and drafts must be stored every step."""
    from vllm_rust_tpu.spec_decode import EagleProposer

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    eng, proposer = _eagle_engine(
        model, params, mc, EagleProposer, draft_rng=jax.random.PRNGKey(5)
    )
    prompt = [1, 2, 3, 4]
    base = run_greedy(build(False), prompt, n=16)
    out = run_greedy(eng, prompt, n=16)
    assert out == base
    assert eng.stats["draft_tokens"] > 0


def test_eagle_acceptance_on_constant_model():
    """Zero target + zero EAGLE: both predict argmax=0, drafts accepted."""
    from vllm_rust_tpu.spec_decode import EagleProposer

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(rng=None)
    eng, _ = _eagle_engine(model, params, mc, EagleProposer)
    out = eng.generate(
        [[1, 2, 3]],
        SamplingParams(max_tokens=18, temperature=0.0, ignore_eos=True),
    )[0]
    assert out.token_ids == [0] * 18
    assert eng.stats["accepted_tokens"] > 0
    assert eng.stats["num_steps"] < 18


def test_mtp_lossless():
    from vllm_rust_tpu.spec_decode import MtpProposer

    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    eng, _ = _eagle_engine(
        model, params, mc, MtpProposer, draft_rng=jax.random.PRNGKey(6)
    )
    prompt = [9, 8, 7]
    base = run_greedy(build(False), prompt, n=14)
    out = run_greedy(eng, prompt, n=14)
    assert out == base


def test_eagle_checkpoint_loading():
    """EAGLE-1 names (fc + decoder layer) and MTP names (enorm/hnorm/
    eh_proj/shared_head) both map into the param tree."""
    from vllm_rust_tpu.spec_decode import EagleProposer, MtpProposer

    dmc = tiny_llama_config(num_hidden_layers=1)
    h, hd = dmc.hidden_size, dmc.head_dim
    rng = np.random.default_rng(0)
    f32 = np.float32
    stream = [
        ("fc.weight", rng.normal(size=(h, 2 * h)).astype(f32)),
        ("layers.0.self_attn.q_proj.weight",
         rng.normal(size=(dmc.num_attention_heads * hd, h)).astype(f32)),
        ("layers.0.input_layernorm.weight", np.ones(h, f32) * 2),
    ]
    p = EagleProposer(dmc, dtype=jnp.float32)
    params = p.load_weights(stream)
    assert params["fc"]["weight"].shape == (2 * h, h)
    assert not np.allclose(np.asarray(params["layers"][0]["self_attn"]["q_proj"]["weight"]), 0)
    assert float(params["layers"][0]["input_layernorm"][0]) == 2.0

    mtp_stream = [
        ("model.layers.2.enorm.weight", np.ones(h, f32) * 3),
        ("model.layers.2.eh_proj.weight", rng.normal(size=(h, 2 * h)).astype(f32)),
        ("model.layers.2.shared_head.norm.weight", np.ones(h, f32) * 4),
        ("model.layers.2.shared_head.head.weight",
         rng.normal(size=(dmc.vocab_size, h)).astype(f32)),
    ]
    m = MtpProposer(dmc, dtype=jnp.float32)
    mp = m.load_weights(mtp_stream)
    assert float(mp["enorm"][0]) == 3.0
    assert mp["eh_proj"]["weight"].shape == (2 * h, h)
    assert float(mp["norm"][0]) == 4.0
    assert mp["lm_head"]["weight"].shape == (h, dmc.vocab_size)


def _eos_of(prompt):
    """The token a greedy tiny model repeats (used as a synthetic EOS)."""
    toks = run_greedy(build(False), prompt, n=4)
    return toks[0]


def _build_with_eos(spec: bool, eos: int):
    mc = tiny_llama_config()
    mc.eos_token_id = eos
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


def test_min_tokens_bans_eos_normal_and_spec():
    """min_tokens must ban EOS for at least min_tokens positions in BOTH
    engines (ADVICE r4 #1: the spec engine wrote boolean ban_eos after
    the field became tri-state, silently unbanning position 0)."""
    prompt = [1, 2, 3, 4]
    eos = _eos_of(prompt)
    for spec in (False, True):
        # without min_tokens: greedy emits the repeated token and stops
        base = _build_with_eos(spec, eos).generate(
            [prompt], SamplingParams(max_tokens=16, temperature=0.0)
        )[0]
        assert len(base.token_ids) < 8, (spec, base.token_ids)
        out = _build_with_eos(spec, eos).generate(
            [prompt],
            SamplingParams(max_tokens=16, temperature=0.0, min_tokens=8),
        )[0]
        assert len(out.token_ids) >= 8, (
            f"spec={spec}: min_tokens=8 violated: {out.token_ids}"
        )
        assert eos not in out.token_ids[:7], (
            f"spec={spec}: EOS emitted inside the banned window: "
            f"{out.token_ids}"
        )

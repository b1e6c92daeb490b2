"""EAGLE-3, MLP speculator, and tree-attention speculation tests.

The correctness bar is the reference's (SURVEY.md §2.7): greedy spec
decode must be LOSSLESS — identical tokens to the plain engine —
regardless of draft quality.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.spec_decode.engine import SpecLLMEngine
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.testing import tiny_llama_config


def _cfg(mc):
    return EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )


def _greedy(eng, prompt, n):
    return eng.generate(
        [prompt], SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)
    )[0].token_ids


def test_eagle3_lossless():
    mc = tiny_llama_config()
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    base = _greedy(LLMEngine(model, params, _cfg(mc)), [1, 2, 3], 12)

    from vllm_rust_tpu.spec_decode import Eagle3Proposer

    dmc = tiny_llama_config(num_hidden_layers=1)
    proposer = Eagle3Proposer(dmc, num_draft_tokens=3, dtype=jnp.float32)
    proposer.init_params(jax.random.PRNGKey(5))
    model2 = from_config(mc, dtype=jnp.float32)
    eng = SpecLLMEngine(model2, params, _cfg(mc), proposer=proposer)
    assert len(model2.aux_hidden_layers) > 0  # capture configured
    out = _greedy(eng, [1, 2, 3], 12)
    assert out == base
    assert eng.stats["draft_tokens"] > 0


def test_eagle3_checkpoint_loading_and_d2t():
    from vllm_rust_tpu.spec_decode import Eagle3Proposer

    dmc = tiny_llama_config(num_hidden_layers=1)
    h = dmc.hidden_size
    nh, nkv, hd = (
        dmc.num_attention_heads, dmc.num_key_value_heads, dmc.head_dim,
    )
    dv = dmc.vocab_size // 2
    rng = np.random.default_rng(0)
    p = Eagle3Proposer(dmc, num_draft_tokens=2, dtype=jnp.float32,
                       draft_vocab_size=dv)
    stream = [
        ("fc.weight", rng.normal(size=(h, 3 * h)).astype(np.float32)),
        ("d2t", rng.integers(0, 5, size=dv).astype(np.int64)),
        ("midlayer.hidden_norm.weight", np.ones(h, np.float32)),
        ("midlayer.input_layernorm.weight", np.ones(h, np.float32)),
        ("midlayer.self_attn.q_proj.weight",
         rng.normal(size=(nh * hd, 2 * h)).astype(np.float32)),
        ("lm_head.weight", rng.normal(size=(dv, h)).astype(np.float32)),
        ("norm.weight", np.ones(h, np.float32)),
    ]
    params = p.load_weights(stream)
    assert params["fc"]["weight"].shape == (3 * h, h)
    assert params["lm_head"]["weight"].shape == (h, dv)
    assert params["layers"][0]["self_attn"]["q_proj"]["weight"].shape == (
        2 * h, nh * hd,
    )
    assert params["d2t"].shape == (dv,)


def test_mlp_speculator_lossless_and_chain_math():
    mc = tiny_llama_config()
    mc.extra["n_predict"] = 3
    model = from_config(mc, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    base = _greedy(LLMEngine(model, params, _cfg(mc)), [4, 5, 6], 12)

    from vllm_rust_tpu.spec_decode import MLPSpeculatorProposer

    proposer = MLPSpeculatorProposer(mc, dtype=jnp.float32)
    proposer.init_params(jax.random.PRNGKey(9))
    eng = SpecLLMEngine(model, params, _cfg(mc), proposer=proposer)
    out = _greedy(eng, [4, 5, 6], 12)
    assert out == base
    assert eng.stats["draft_tokens"] > 0

    # chain math matches a scalar transcription of the stage recurrence
    from vllm_rust_tpu.spec_decode.mlp_speculator import (
        mlp_speculator_head_fn,
    )

    hp = proposer.device_params
    hid = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, mc.hidden_size)), jnp.float32
    )
    tok = jnp.asarray([7], jnp.int32)
    got = np.asarray(mlp_speculator_head_fn(hp, hid, tok))[0]
    sw, ew = hp["meta"]["state_weight"], hp["meta"]["emb_weight"]
    state = np.asarray(hid)[0]
    t = 7
    want = []
    for st in hp["stages"]:
        z = np.asarray(st["emb"]["weight"])[t]
        state = state @ np.asarray(st["proj"]["weight"]) + z * (ew / sw)
        state = state / np.sqrt(np.mean(state**2) + 1e-6)
        state = state * np.asarray(st["ln"]["weight"]) + np.asarray(
            st["ln"]["bias"]
        )
        from scipy.stats import norm  # exact gelu via erf

        state = state * norm.cdf(state)
        logits = state @ np.asarray(st["head"]["weight"])
        t = int(np.argmax(logits))
        want.append(t)
    assert list(got) == want


def test_mlp_speculator_tied_checkpoint():
    mc = tiny_llama_config()
    mc.extra.update({"n_predict": 3, "tie_weights": True})
    from vllm_rust_tpu.spec_decode import MLPSpeculatorProposer

    v, h = mc.vocab_size, mc.hidden_size
    rng = np.random.default_rng(1)
    p = MLPSpeculatorProposer(mc, dtype=jnp.float32)
    stream = [
        ("emb.0.weight", rng.normal(size=(v, h)).astype(np.float32)),
        ("proj.0.weight", rng.normal(size=(h, h)).astype(np.float32)),
        ("proj.1.weight", rng.normal(size=(h, h)).astype(np.float32)),
        ("ln.0.weight", np.ones(h, np.float32)),
        ("ln.0.bias", np.zeros(h, np.float32)),
        ("head.0.weight", rng.normal(size=(v, h)).astype(np.float32)),
        ("head.1.weight", rng.normal(size=(v, h)).astype(np.float32)),
        ("head.2.weight", rng.normal(size=(v, h)).astype(np.float32)),
    ]
    params = p.load_weights(stream)
    s = params["stages"]
    np.testing.assert_array_equal(
        np.asarray(s[0]["emb"]["weight"]), np.asarray(s[2]["emb"]["weight"])
    )
    np.testing.assert_array_equal(
        np.asarray(s[1]["proj"]["weight"]), np.asarray(s[2]["proj"]["weight"])
    )
    assert not np.allclose(
        np.asarray(s[0]["head"]["weight"]), np.asarray(s[1]["head"]["weight"])
    )


def test_speculation_tree():
    from vllm_rust_tpu.spec_decode import SpeculationTree

    chain = SpeculationTree.from_linear([5, 6, 7])
    assert chain.num_nodes == 3
    assert list(chain.parents) == [-1, 0, 1]
    mask = chain.build_attention_mask()
    # chain mask == causal
    assert (mask == 0).sum() == 6

    tree = SpeculationTree.from_medusa_candidates(9, [[1, 2], [3]])
    # root + 2 level-1 + 2 level-2 (one per level-1 parent)
    assert tree.num_nodes == 5
    assert list(tree.depths) == [0, 1, 1, 2, 2]
    anc = tree.ancestor_matrix()
    assert anc[3, 1] and not anc[3, 2]  # node 3's parent is node 1
    assert list(tree.positions(10)) == [10, 11, 11, 12, 12]

    # greedy verify: target prefers token 2 at root, then 3, then 8
    v = 16
    logits = np.full((5, v), -10.0, np.float32)
    logits[0, 2] = 0.0  # root -> 2 (matches node 2)
    logits[2, 3] = 0.0  # node 2 -> 3 (matches node 4)
    logits[4, 8] = 0.0  # node 4 -> 8 (no child: correction)
    accepted = tree.verify_and_accept(logits)
    assert accepted == [2, 3, 8]

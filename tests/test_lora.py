"""LoRA tests: adapter math, mixed-adapter batches, hot load/unload."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
from vllm_rust_tpu.engine import LLMEngine
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.request import SamplingParams
from vllm_rust_tpu.testing import tiny_llama_config


def save_adapter(tmp_path, name, rank=4, alpha=8.0, seed=0, layers=2, hidden=64):
    """Write a synthetic PEFT adapter dir targeting q_proj/up_proj."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    d = tmp_path / name
    d.mkdir()
    tensors = {}
    for li in range(layers):
        for mod, proj, dout in [
            ("self_attn", "q_proj", 64),
            ("mlp", "up_proj", 128),
        ]:
            a = rng.normal(size=(rank, hidden)).astype(np.float32) * 0.3
            b = rng.normal(size=(dout, rank)).astype(np.float32) * 0.3
            tensors[
                f"base_model.model.model.layers.{li}.{mod}.{proj}.lora_A.weight"
            ] = a
            tensors[
                f"base_model.model.model.layers.{li}.{mod}.{proj}.lora_B.weight"
            ] = b
    save_file(tensors, str(d / "adapter_model.safetensors"))
    (d / "adapter_config.json").write_text(
        json.dumps({"r": rank, "lora_alpha": alpha})
    )
    return str(d)


def make_engine():
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
    return LLMEngine(model, params, cfg)


def test_lora_changes_output_and_base_unchanged(tmp_path):
    eng = make_engine()
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    base_before = eng.generate([[1, 2, 3]], sp)[0].token_ids

    mgr = eng.enable_lora(max_loras=2, max_rank=8)
    path = save_adapter(tmp_path, "style-a", seed=1)
    mgr.load("style-a", path)

    # base requests (no adapter) still produce the same output
    base_after = eng.generate([[1, 2, 3]], sp)[0].token_ids
    assert base_after == base_before

    sp_lora = SamplingParams(
        max_tokens=8, temperature=0.0, ignore_eos=True, lora_name="style-a"
    )
    lora_out = eng.generate([[1, 2, 3]], sp_lora)[0].token_ids
    assert lora_out != base_before, "adapter had no effect"


def test_mixed_adapter_batch(tmp_path):
    eng = make_engine()
    mgr = eng.enable_lora(max_loras=3, max_rank=8)
    mgr.load("a", save_adapter(tmp_path, "a", seed=1))
    mgr.load("b", save_adapter(tmp_path, "b", seed=2))
    sp = lambda name: SamplingParams(
        max_tokens=6, temperature=0.0, ignore_eos=True, lora_name=name
    )
    base_sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    # solo runs
    solo_a = eng.generate([[5, 6, 7]], sp("a"))[0].token_ids
    solo_b = eng.generate([[5, 6, 7]], sp("b"))[0].token_ids
    solo_none = eng.generate([[5, 6, 7]], base_sp)[0].token_ids
    assert solo_a != solo_b != solo_none

    # mixed batch must reproduce each solo result
    eng.add_request("ra", [5, 6, 7], sp("a"))
    eng.add_request("rb", [5, 6, 7], sp("b"))
    eng.add_request("rn", [5, 6, 7], base_sp)
    done = {}
    while eng.has_unfinished:
        for o in eng.step():
            if o.finished:
                done[o.request_id] = o.token_ids
    assert done["ra"] == solo_a
    assert done["rb"] == solo_b
    assert done["rn"] == solo_none


def test_lora_math_golden(tmp_path):
    """Runtime LoRA == merged-weight forward."""
    from tests.test_model_forward import make_kv_pages, md_single_seq

    eng = make_engine()
    mgr = eng.enable_lora(max_loras=2, max_rank=8)
    mgr.load("g", save_adapter(tmp_path, "g", seed=3))
    adapter = mgr.adapters["g"]

    model = eng.model
    # merged params: W' = W + scale * A @ B
    import copy

    merged = jax.tree_util.tree_map(lambda x: x, eng.params)  # shallow-ish
    merged = jax.device_get(merged)
    import numpy as _np

    for (li, mod, proj), (a, b) in adapter.weights.items():
        node = eng.params["layers"][li][mod][proj]
        w = _np.asarray(node["weight"]) + adapter.scaling * (a @ b)
        merged["layers"][li][mod][proj]["weight"] = jnp.asarray(w)
        merged["layers"][li][mod][proj].pop("lora", None)
    # strip remaining lora subtrees so linear() takes the dense path
    for lp in merged["layers"]:
        for mod in ("self_attn", "mlp"):
            for k, v in lp[mod].items():
                if isinstance(v, dict):
                    v.pop("lora", None)
    merged = jax.tree_util.tree_map(jnp.asarray, merged)

    ids = jnp.asarray([3, 1, 4, 1, 5], jnp.int32)
    kv = make_kv_pages(model)
    from vllm_rust_tpu.layers.linear import lora_context

    with lora_context(jnp.zeros((5,), jnp.int32)):  # slot 0 for all tokens
        h_lora, _ = model(eng.params, ids, md_single_seq(5), kv)
    kv = make_kv_pages(model)
    h_merged, _ = model(merged, ids, md_single_seq(5), kv)
    np.testing.assert_allclose(
        np.asarray(h_lora), np.asarray(h_merged), rtol=2e-4, atol=2e-4
    )


def test_unload_and_slot_reuse(tmp_path):
    eng = make_engine()
    mgr = eng.enable_lora(max_loras=2, max_rank=8)
    mgr.load("x", save_adapter(tmp_path, "x", seed=4))
    mgr.load("y", save_adapter(tmp_path, "y", seed=5))
    assert len(mgr.list()) == 2
    mgr.unload("x")
    assert len(mgr.list()) == 1
    mgr.load("z", save_adapter(tmp_path, "z", seed=6))  # reuses slot 0
    assert {a["name"] for a in mgr.list()} == {"y", "z"}
    import pytest

    with pytest.raises(ValueError, match="not loaded"):
        eng.generate(
            [[1]],
            SamplingParams(max_tokens=2, lora_name="x"),
        )

"""DeepSeek MLA + grouped-top-k MoE tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_rust_tpu.config import ModelConfig, RopeScalingConfig
from vllm_rust_tpu.models import from_config
from vllm_rust_tpu.models.deepseek import grouped_topk
from tests.test_model_forward import md_single_seq

PAGE_SIZE = 16
NUM_PAGES = 32


def ds_config(moe=True, q_lora=True, **over):
    d = dict(
        architectures=["DeepseekV3ForCausalLM"],
        model_type="deepseek_v3",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=256,
        q_lora_rank=24 if q_lora else None,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        first_k_dense_replace=1,
        num_experts=8 if moe else None,
        num_experts_per_tok=2,
        n_group=4,
        topk_group=2,
        scoring_func="sigmoid",
        norm_topk_prob=True,
        routed_scaling_factor=1.5,
        num_shared_experts=1,
        eos_token_id=1,
    )
    d.update(over)
    return ModelConfig(**d)


def make_kv(model, dtype=jnp.float32):
    return [
        jnp.zeros((NUM_PAGES, PAGE_SIZE, 2 * nkv, hd), dtype)
        for nkv, hd in model.kv_head_info
    ]


def test_mla_cache_geometry():
    model = from_config(ds_config(), dtype=jnp.float32)
    # 1 latent head of kv_lora_rank + rope_dim per layer (42x-style saving)
    assert model.kv_head_info == [(1, 40), (1, 40)]
    assert model.is_moe_layer(1) and not model.is_moe_layer(0)


def test_mla_forward_and_incremental():
    model = from_config(ds_config(), dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (12,), 0, 128)
    kv = make_kv(model)
    h_full, _ = model(params, ids, md_single_seq(12), kv)
    logits_full = model.compute_logits(params, h_full[-1:])

    kv = make_kv(model)
    h, kv = model(params, ids[:8], md_single_seq(8), kv)
    for pos in range(8, 12):
        h, kv = model(params, ids[pos:pos+1], md_single_seq(1, start_pos=pos), kv)
    logits_inc = model.compute_logits(params, h[-1:])
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_inc), rtol=5e-4, atol=5e-4
    )


def test_mla_no_q_lora():
    model = from_config(ds_config(q_lora=False, moe=False), dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "q_proj" in params["layers"][0]["self_attn"]
    ids = jnp.arange(6, dtype=jnp.int32)
    h, _ = model(params, ids, md_single_seq(6), make_kv(model))
    assert h.shape == (6, 64)


def test_grouped_topk():
    t, e, g = 2, 8, 4
    scores = jnp.asarray(np.random.default_rng(0).uniform(size=(t, e)), jnp.float32)
    # bias strongly favoring expert 0's group for selection
    bias = jnp.asarray([10.0, 0, 0, 0, 0, 0, 0, 0])
    topv, topi = grouped_topk(scores, bias, top_k=2, n_group=g, topk_group=1)
    # all selected experts must come from group 0 (experts 0,1)
    assert np.asarray(topi).max() <= 1
    # weights use the ORIGINAL scores, not biased
    expected = np.take_along_axis(np.asarray(scores), np.asarray(topi), 1)
    np.testing.assert_allclose(np.asarray(topv), expected, rtol=1e-6)


def test_deepseek_engine_generation():
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.request import SamplingParams

    cfg = ds_config()
    model = from_config(cfg, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(2))
    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng = LLMEngine(model, params, ecfg)
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    outs = eng.generate([[3, 1, 4], [5, 9, 2, 6]], sp)
    assert all(len(o.token_ids) == 8 for o in outs)

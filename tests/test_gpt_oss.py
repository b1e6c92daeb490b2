"""GPT-OSS: attention sinks, clamped-swiglu MoE, MXFP4 loading."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

rng = np.random.default_rng(23)


def _md(kv_lens, page_indices, cu_q_lens, t):
    from vllm_rust_tpu.ops.attn_metadata import AttentionMetadata

    s = len(kv_lens)
    return AttentionMetadata(
        kv_lens=jnp.asarray(kv_lens, jnp.int32),
        page_indices=jnp.asarray(page_indices, jnp.int32),
        cu_q_lens=jnp.asarray(cu_q_lens, jnp.int32),
        num_seqs=jnp.asarray([s], jnp.int32),
        positions=jnp.asarray(
            [kv_lens[i] - 1 for i in range(s)], jnp.int32
        ),
        slot_mapping=jnp.zeros(t, jnp.int32),
        logits_indices=jnp.arange(s, dtype=jnp.int32),
    )


def test_sink_attention_ref_matches_manual():
    """Sink == extra zero-value key with logit `sink` appended to scores."""
    from vllm_rust_tpu.ops.paged_attention import _ref_ragged_paged_attention

    s_, ps, h, kvh, d_ = 2, 8, 4, 2, 16
    pages = 6
    kv_pages = jnp.asarray(
        rng.normal(size=(pages, ps, 2 * kvh, d_)), jnp.float32
    )
    q = jnp.asarray(rng.normal(size=(s_, h, d_)), jnp.float32)
    kv_lens = [7, 13]
    page_indices = [[0, 1, 0, 0], [2, 3, 4, 0]]
    md = _md(kv_lens, page_indices, [0, 1, 2], 2)
    sinks = jnp.asarray(rng.normal(size=h), jnp.float32)
    sm = d_**-0.5

    got = np.asarray(
        _ref_ragged_paged_attention(
            q, kv_pages, md, sm_scale=sm, sliding_window=None,
            soft_cap=None, sinks=sinks,
        ),
        np.float32,
    )

    # manual per-sequence computation with the sink as a virtual key
    kvp = np.asarray(kv_pages)
    qn = np.asarray(q)
    sk = np.asarray(sinks)
    for i, kvl in enumerate(kv_lens):
        flat = kvp[np.asarray(page_indices[i])].reshape(-1, 2 * kvh, d_)
        k = flat[:kvl, 0::2, :]  # [N, K, D]
        v = flat[:kvl, 1::2, :]
        for hh in range(h):
            kh = hh // (h // kvh)
            logits = (k[:, kh, :] @ qn[i, hh]) * sm  # [N]
            logits = np.concatenate([logits, [sk[hh]]])
            w = np.exp(logits - logits.max())
            w /= w.sum()
            want = (w[:-1, None] * v[:, kh, :]).sum(0)
            np.testing.assert_allclose(
                got[i, hh], want, rtol=2e-5, atol=2e-5
            )


def test_decode_kernel_sinks_match_ref():
    from vllm_rust_tpu.ops.paged_attention import (
        _ref_ragged_paged_attention,
        ragged_paged_attention_op,
    )

    s_, ps, h, kvh, d_ = 3, 16, 8, 2, 64
    pages = 10
    kv_pages = jnp.asarray(
        rng.normal(size=(pages, ps, 2 * kvh, d_)), jnp.bfloat16
    )
    q = jnp.asarray(rng.normal(size=(s_, h, d_)), jnp.bfloat16)
    kv_lens = [5, 30, 17]
    page_indices = [[1, 0], [2, 3], [4, 5]]
    md = _md(kv_lens, page_indices, [0, 1, 2, 3], 3)
    sinks = jnp.asarray(rng.normal(size=h) * 2.0, jnp.float32)
    sm = d_**-0.5

    got = ragged_paged_attention_op(
        q, kv_pages, md, sinks, sm_scale=sm, backend="pallas",
    )
    want = _ref_ragged_paged_attention(
        q, kv_pages, md, sm_scale=sm, sliding_window=None, soft_cap=None,
        sinks=sinks,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )


def test_mxfp4_dequant_and_int8_agree():
    from vllm_rust_tpu.quantization.mxfp4 import (
        dequant_mxfp4,
        mxfp4_to_int8_grouped,
    )

    blocks = rng.integers(0, 256, size=(3, 4, 16), dtype=np.uint8)
    scales = rng.integers(100, 140, size=(3, 4), dtype=np.uint8)
    w = dequant_mxfp4(blocks, scales)
    assert w.shape == (3, 128)
    q, s = mxfp4_to_int8_grouped(blocks, scales)
    np.testing.assert_array_equal(
        np.repeat(s, 32, axis=-1) * q.astype(np.float32), w
    )


def _gpt_oss_config():
    from vllm_rust_tpu.config import ModelConfig

    return ModelConfig.from_dict(
        dict(
            architectures=["GptOssForCausalLM"],
            model_type="gpt_oss",
            vocab_size=512,
            hidden_size=64,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            num_local_experts=4,
            num_experts_per_tok=2,
            sliding_window=32,
            layer_types=["sliding_attention", "full_attention"],
            max_position_embeddings=256,
            rope_theta=150000.0,
            attention_bias=True,
            tie_word_embeddings=True,
        )
    )


def test_gpt_oss_end_to_end_mxfp4():
    """MXFP4 checkpoint stream -> GptOss load_weights -> engine."""
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine import LLMEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.quantization.mxfp4 import dequant_mxfp4
    from vllm_rust_tpu.request import SamplingParams

    cfg = _gpt_oss_config()
    model = from_config(cfg, dtype=jnp.float32)
    h, e, inter, vocab = 64, 4, 64, 512

    def t(*shape, s=0.05):
        return (rng.normal(size=shape) * s).astype(np.float32)

    weights = [
        ("model.embed_tokens.weight", t(vocab, h)),
        ("model.norm.weight", np.ones(h, np.float32)),
    ]
    for i in range(2):
        p = f"model.layers.{i}"
        weights += [
            (f"{p}.input_layernorm.weight", np.ones(h, np.float32)),
            (f"{p}.post_attention_layernorm.weight", np.ones(h, np.float32)),
            (f"{p}.self_attn.q_proj.weight", t(h, h)),
            (f"{p}.self_attn.q_proj.bias", t(h)),
            (f"{p}.self_attn.k_proj.weight", t(h // 2, h)),
            (f"{p}.self_attn.k_proj.bias", t(h // 2)),
            (f"{p}.self_attn.v_proj.weight", t(h // 2, h)),
            (f"{p}.self_attn.v_proj.bias", t(h // 2)),
            (f"{p}.self_attn.o_proj.weight", t(h, h)),
            (f"{p}.self_attn.o_proj.bias", t(h)),
            (f"{p}.self_attn.sinks", t(4, s=1.0)),
            (f"{p}.mlp.router.weight", t(e, h)),
            (f"{p}.mlp.router.bias", t(e)),
            # MXFP4 expert tensors: [E, out, K/32, 16] blocks + scales
            (
                f"{p}.mlp.experts.gate_up_proj_blocks",
                rng.integers(0, 256, size=(e, 2 * inter, h // 32, 16), dtype=np.uint8),
            ),
            (
                f"{p}.mlp.experts.gate_up_proj_scales",
                rng.integers(118, 124, size=(e, 2 * inter, h // 32), dtype=np.uint8),
            ),
            (f"{p}.mlp.experts.gate_up_proj_bias", t(e, 2 * inter)),
            (
                f"{p}.mlp.experts.down_proj_blocks",
                rng.integers(0, 256, size=(e, h, inter // 32, 16), dtype=np.uint8),
            ),
            (
                f"{p}.mlp.experts.down_proj_scales",
                rng.integers(118, 124, size=(e, h, inter // 32), dtype=np.uint8),
            ),
            (f"{p}.mlp.experts.down_proj_bias", t(e, h)),
        ]

    params = model.load_weights(iter(weights))
    # spot-check the gate/up de-interleave against a direct dequant
    blocks = dict(weights)[
        "model.layers.0.mlp.experts.gate_up_proj_blocks"
    ]
    scales = dict(weights)[
        "model.layers.0.mlp.experts.gate_up_proj_scales"
    ]
    full = np.swapaxes(dequant_mxfp4(blocks, scales), -1, -2)  # [E, K, 2I]
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["mlp"]["experts"]["gate_proj"]["weight"]),
        full[..., 0::2],
        rtol=1e-6,
    )
    assert params["layers"][0]["self_attn"]["sinks"].shape == (4,)

    ecfg = EngineConfig(
        model=cfg,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=64),
        max_model_len=128,
        token_buckets=(16, 32, 64),
    )
    eng = LLMEngine(model, params, ecfg)
    outs = eng.generate(
        [[1, 2, 3, 4]],
        SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True),
    )
    assert len(outs[0].token_ids) == 6


def test_gpt_oss_sliding_pattern():
    from vllm_rust_tpu.models import from_config

    cfg = _gpt_oss_config()
    model = from_config(cfg, dtype=jnp.float32)
    assert model.attn_specs[0].sliding_window == 32
    assert model.attn_specs[1].sliding_window is None
    assert model.moe_spec.scoring == "softmax_after_topk"
    assert model.moe_spec.act == "swiglu_oss"

"""HF image-input parity for a second VLM family: LLaVA (VERDICT r2
weak #6 — VLM wrappers beyond Qwen2-VL were shapes-only).

Same discipline as tests/test_mrope.py: tiny random HF checkpoint, the
SAME pixel inputs through both stacks, greedy continuations must match
token-for-token (anchors projector wiring + CLIP tower numerics +
token-merge order end-to-end through the engine).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow

from transformers import (  # noqa: E402
    CLIPVisionConfig,
    LlamaConfig,
    LlavaConfig,
    LlavaForConditionalGeneration,
)

IMG_TOK = 30


def tiny_hf_llava():
    torch.manual_seed(0)
    text = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    vision = CLIPVisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        projection_dim=32,
    )
    cfg = LlavaConfig(
        vision_config=vision,
        text_config=text,
        image_token_index=IMG_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    return LlavaForConditionalGeneration(cfg).eval(), cfg


def test_llava_engine_greedy_matches_hf_with_image():
    import jax
    import jax.numpy as jnp

    from vllm_rust_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_rust_tpu.engine.vlm import VlmEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams

    hf, cfg = tiny_hf_llava()
    d = cfg.to_dict()
    d["architectures"] = ["LlavaForConditionalGeneration"]
    mc = ModelConfig.from_dict(d)
    model = from_config(mc, dtype=jnp.float32)
    params = model.load_weights(
        (n, t.float().numpy()) for n, t in hf.state_dict().items()
    )
    ec = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=256),
        max_model_len=256,
        token_buckets=(32, 64, 128, 256),
    )
    eng = VlmEngine(model, params, ec)

    n_patches = (32 // 8) ** 2  # 16 image tokens
    assert model.tokens_per_image == n_patches
    rng = np.random.default_rng(5)
    image = rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.4

    ids = [1, 2] + [IMG_TOK] * n_patches + [3, 4, 5]
    max_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(image)[None],
            max_new_tokens=max_new,
            do_sample=False,
        )
    hf_new = hf_out[0, len(ids) :].tolist()

    prompt = [1, 2, IMG_TOK, 3, 4, 5]  # single placeholder expands
    eng.add_image_request(
        "r1", prompt, [image],
        SamplingParams(max_tokens=max_new, temperature=0.0,
                       ignore_eos=True),
    )
    out = {}
    while eng.has_unfinished:
        for r in eng.step():
            out.setdefault(r.request_id, []).extend(r.new_token_ids)
    assert out["r1"] == hf_new, f"greedy diverged: {out['r1']} vs {hf_new}"


def test_paligemma_engine_greedy_matches_hf_with_image():
    """Third family: SigLIP tower + linear projector + Gemma LM
    (full-attention image tokens in HF are causal-equivalent here only
    because the image block is a contiguous PREFIX the text attends to)."""
    import jax
    import jax.numpy as jnp
    from transformers import (
        GemmaConfig,
        PaliGemmaConfig,
        PaliGemmaForConditionalGeneration,
        SiglipVisionConfig,
    )

    from vllm_rust_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelConfig,
        SchedulerConfig,
    )
    from vllm_rust_tpu.engine.vlm import VlmEngine
    from vllm_rust_tpu.models import from_config
    from vllm_rust_tpu.request import SamplingParams

    torch.manual_seed(0)
    text = GemmaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=1,
        head_dim=16,
        max_position_embeddings=512,
    )
    vision = SiglipVisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        projection_dim=64,
    )
    cfg = PaliGemmaConfig(
        vision_config=vision,
        text_config=text,
        image_token_index=99,
        projection_dim=64,
    )
    hf = PaliGemmaForConditionalGeneration(cfg).eval()

    d = cfg.to_dict()
    d["architectures"] = ["PaliGemmaForConditionalGeneration"]
    mc = ModelConfig.from_dict(d)
    model = from_config(mc, dtype=jnp.float32)
    params = model.load_weights(
        (n, t.float().numpy()) for n, t in hf.state_dict().items()
    )
    ec = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=256),
        max_model_len=256,
        token_buckets=(32, 64, 128, 256),
    )
    eng = VlmEngine(model, params, ec)

    n_patches = (32 // 8) ** 2
    assert model.tokens_per_image == n_patches
    rng = np.random.default_rng(9)
    image = rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.4

    ids = [99] * n_patches + [2, 3, 4, 5]  # image prefix + text
    max_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(image)[None],
            max_new_tokens=max_new,
            do_sample=False,
        )
    hf_new = hf_out[0, len(ids) :].tolist()

    prompt = [99, 2, 3, 4, 5]
    eng.add_image_request(
        "r1", prompt, [image],
        SamplingParams(max_tokens=max_new, temperature=0.0,
                       ignore_eos=True),
    )
    out = {}
    while eng.has_unfinished:
        for r in eng.step():
            out.setdefault(r.request_id, []).extend(r.new_token_ids)
    assert out["r1"] == hf_new, f"greedy diverged: {out['r1']} vs {hf_new}"

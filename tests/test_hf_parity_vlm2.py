"""HF image-input parity, r4 wave: InternVL (and friends in this file as
they land). VERDICT r3 #8 — anchor more VLM tails end-to-end with a real
image through both stacks; greedy continuations must match
token-for-token (pins tower numerics, layer-scale, pixel-shuffle order,
projector wiring, and token merge through the engine).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.slow

IMG_TOK = 30


def tiny_hf_internvl():
    from transformers import (
        InternVLConfig,
        InternVLForConditionalGeneration,
        InternVLVisionConfig,
        Qwen2Config,
    )

    torch.manual_seed(0)
    vis = InternVLVisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
    )
    txt = Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    cfg = InternVLConfig(
        vision_config=vis,
        text_config=txt,
        image_token_id=IMG_TOK,
        downsample_ratio=0.5,
    )
    return InternVLForConditionalGeneration(cfg).eval(), cfg


def test_internvl_engine_greedy_matches_hf_with_image(f32_matmuls):
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

    hf, cfg = tiny_hf_internvl()
    d = cfg.to_dict()
    d["architectures"] = ["InternVLForConditionalGeneration"]
    mc = ModelConfig.from_dict(d)
    model = from_config(mc, dtype=jnp.float32)
    assert type(model).__name__ == "InternVLChatModel"
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

    # image 32x32 @ patch 8 -> 4x4 patches; downsample 0.5 -> 2x2 = 4 toks
    assert model.tokens_per_image == 4
    rng = np.random.default_rng(11)
    image = rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.4

    ids = [1, 2] + [IMG_TOK] * model.tokens_per_image + [3, 4, 5]
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
        SamplingParams(max_tokens=max_new, temperature=0.0, ignore_eos=True),
    )
    out = {}
    while eng.has_unfinished:
        for r in eng.step():
            out.setdefault(r.request_id, []).extend(r.new_token_ids)
    assert out["r1"] == hf_new, f"greedy diverged: {out['r1']} vs {hf_new}"


def tiny_hf_idefics3():
    from transformers import (
        Idefics3Config,
        Idefics3ForConditionalGeneration,
    )
    from transformers.models.idefics3.configuration_idefics3 import (
        Idefics3VisionConfig,
    )

    torch.manual_seed(0)
    vis = Idefics3VisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
    )
    txt = dict(
        model_type="llama",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rms_norm_eps=1e-6,
    )
    cfg = Idefics3Config(
        vision_config=vis.to_dict(),
        text_config=txt,
        image_token_id=IMG_TOK,
        scale_factor=2,
    )
    return Idefics3ForConditionalGeneration(cfg).eval(), cfg


def test_idefics3_engine_greedy_matches_hf_with_image(f32_matmuls):
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

    hf, cfg = tiny_hf_idefics3()
    d = cfg.to_dict()
    d["architectures"] = ["Idefics3ForConditionalGeneration"]
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

    # 4x4 patches, scale_factor 2 -> 2x2 = 4 image tokens
    assert model.tokens_per_image == 4
    rng = np.random.default_rng(12)
    image = rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.4

    ids = [1, 2] + [IMG_TOK] * model.tokens_per_image + [3, 4, 5]
    max_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(image)[None, None],
            pixel_attention_mask=torch.ones(1, 1, 32, 32, dtype=torch.bool),
            max_new_tokens=max_new,
            do_sample=False,
        )
    hf_new = hf_out[0, len(ids) :].tolist()

    prompt = [1, 2, IMG_TOK, 3, 4, 5]
    eng.add_image_request(
        "r1", prompt, [image],
        SamplingParams(max_tokens=max_new, temperature=0.0, ignore_eos=True),
    )
    out = {}
    while eng.has_unfinished:
        for r in eng.step():
            out.setdefault(r.request_id, []).extend(r.new_token_ids)
    assert out["r1"] == hf_new, f"greedy diverged: {out['r1']} vs {hf_new}"


def tiny_hf_qwen2audio():
    from transformers import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
        Qwen2AudioForConditionalGeneration,
        Qwen2Config,
    )

    torch.manual_seed(0)
    aud = Qwen2AudioEncoderConfig(
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=4,
        num_mel_bins=16,
        max_source_positions=8,
        encoder_ffn_dim=64,
        scale_embedding=False,
    )
    txt = Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    cfg = Qwen2AudioConfig(
        audio_config=aud.to_dict(),
        text_config=txt.to_dict(),
        audio_token_index=IMG_TOK,
    )
    return Qwen2AudioForConditionalGeneration(cfg).eval(), cfg


def test_qwen2audio_engine_greedy_matches_hf_with_audio(f32_matmuls):
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

    hf, cfg = tiny_hf_qwen2audio()
    d = cfg.to_dict()
    d["architectures"] = ["Qwen2AudioForConditionalGeneration"]
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

    # max_source_positions=8 -> 16 mel frames -> 8 encoder frames -> 4
    # tokens after the stride-2 pool
    assert model.tokens_per_image == 4
    rng = np.random.default_rng(13)
    mel = rng.standard_normal((16, 16)).astype(np.float32) * 0.4

    n_tok = model.tokens_per_image
    ids = [1, 2] + [IMG_TOK] * n_tok + [3, 4, 5]
    max_new = 8
    # torch's oneDNN conv1d carries ~3e-4 noise in f32 (its own banner
    # warns about it); run the reference in f64 for a clean anchor
    hf = hf.double()
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            input_features=torch.tensor(mel)[None].double(),
            feature_attention_mask=torch.ones(1, 16, dtype=torch.long),
            max_new_tokens=max_new,
            do_sample=False,
        )
    hf_new = hf_out[0, len(ids) :].tolist()

    prompt = [1, 2, IMG_TOK, 3, 4, 5]
    eng.add_image_request(
        "r1", prompt, [mel],
        SamplingParams(max_tokens=max_new, temperature=0.0, ignore_eos=True),
    )
    out = {}
    while eng.has_unfinished:
        for r in eng.step():
            out.setdefault(r.request_id, []).extend(r.new_token_ids)
    assert out["r1"] == hf_new, f"greedy diverged: {out['r1']} vs {hf_new}"


def tiny_hf_llava_next():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaNextConfig,
        LlavaNextForConditionalGeneration,
    )

    torch.manual_seed(0)
    vis = CLIPVisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        projection_dim=32,
    )
    txt = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    cfg = LlavaNextConfig(
        vision_config=vis,
        text_config=txt,
        image_token_index=IMG_TOK,
        image_grid_pinpoints=[[32, 32], [32, 64], [64, 32], [64, 64]],
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    return LlavaNextForConditionalGeneration(cfg).eval(), cfg


def test_llava_next_anyres_engine_greedy_matches_hf(f32_matmuls):
    """Full anyres: base view + 2x2 tile grid, aspect unpad, newline
    rows — variable token count through the engine (r4; previously a
    documented base-resolution-only simplification)."""
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

    hf, cfg = tiny_hf_llava_next()
    d = cfg.to_dict()
    d["architectures"] = ["LlavaNextForConditionalGeneration"]
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

    # 40x50 original -> best fit (64, 64) -> 2x2 tiles + base = 5 patches;
    # packed tokens: 16 base + unpadded 6x8 grid + newline col = 70
    rng = np.random.default_rng(14)
    pv = rng.standard_normal((5, 3, 32, 32)).astype(np.float32) * 0.4
    image_size = (40, 50)
    n_feat = 70

    ids = [1, 2] + [IMG_TOK] * n_feat + [3, 4, 5]
    max_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(pv)[None],
            image_sizes=torch.tensor([list(image_size)]),
            max_new_tokens=max_new,
            do_sample=False,
        )
    hf_new = hf_out[0, len(ids) :].tolist()

    prompt = [1, 2, IMG_TOK, 3, 4, 5]
    eng.add_image_request(
        "r1", prompt, [(pv, image_size)],
        SamplingParams(max_tokens=max_new, temperature=0.0, ignore_eos=True),
    )
    seq = eng.requests["r1"]
    assert len(seq.prompt_token_ids) == len(ids)
    out = {}
    while eng.has_unfinished:
        for r in eng.step():
            out.setdefault(r.request_id, []).extend(r.new_token_ids)
    assert out["r1"] == hf_new, f"greedy diverged: {out['r1']} vs {hf_new}"

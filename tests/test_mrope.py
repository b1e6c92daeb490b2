"""3-axis mrope parity vs HF transformers (VERDICT r2 item #4).

Anchors, strongest-last:
1. multimodal/mrope.mrope_positions == Qwen2VLModel.get_rope_index
2. layers/rotary.apply_rope(mrope_section) == HF
   apply_multimodal_rotary_pos_emb
3. VlmEngine greedy decode on an image prompt == HF
   Qwen2VLForConditionalGeneration.generate (same tiny random weights,
   same pixel inputs) — exercises positions end-to-end through the
   packed batch, the step fn, and the KV cache.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

from vllm_rust_tpu.multimodal.mrope import mrope_positions

IMG_TOK = 9  # image placeholder token id in the tiny vocab
VISION_START = 8


def tiny_hf_qwen2vl(grid=4, merge=2):
    """Tiny random Qwen2-VL; post-merge tokens per image = (grid/merge)^2."""
    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        image_token_id=IMG_TOK,
        video_token_id=10,
        vision_start_token_id=VISION_START,
        vision_end_token_id=11,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(
            depth=2,
            embed_dim=32,
            hidden_size=64,  # LM hidden (projector output)
            hidden_size_per_head=16,
            num_heads=2,
            in_channels=3,
            patch_size=4,
            spatial_merge_size=merge,
            temporal_patch_size=2,
            image_size=32,  # our tower's fixed-grid preprocessor size
        ),
        tie_word_embeddings=False,
    )
    return Qwen2VLForConditionalGeneration(cfg).eval(), cfg


def hf_rope_index(model, ids, grid_thw):
    core = model.model if hasattr(model.model, "get_rope_index") else model
    pos, delta = core.get_rope_index(
        torch.tensor(ids, dtype=torch.long)[None],
        image_grid_thw=(
            torch.tensor([grid_thw], dtype=torch.long)
            if grid_thw is not None
            else None
        ),
        attention_mask=torch.ones(1, len(ids), dtype=torch.long),
    )
    return pos[:, 0].numpy(), int(delta[0, 0])


def expand_prompt(n_merged):
    """vision_start + n image tokens + text tail, HF-style."""
    ids = [1, 2, VISION_START] + [IMG_TOK] * n_merged + [11, 3, 4, 5]
    spans = [(3, n_merged)]
    return ids, spans


def test_mrope_positions_match_hf_get_rope_index():
    model, cfg = tiny_hf_qwen2vl()
    merge = cfg.vision_config.spatial_merge_size
    for g in (4, 8):  # pre-merge grids
        gm = g // merge
        ids, spans = expand_prompt(gm * gm)
        ours, delta = mrope_positions(len(ids), spans, [(1, gm, gm)])
        hf_pos, hf_delta = hf_rope_index(model, ids, [1, g, g])
        np.testing.assert_array_equal(ours, hf_pos)
        assert delta == hf_delta

    # text-only: all three axes sequential
    ids = [1, 2, 3, 4]
    ours, delta = mrope_positions(len(ids), [], [])
    hf_pos, hf_delta = hf_rope_index(model, ids, None)
    np.testing.assert_array_equal(ours, hf_pos)
    assert delta == hf_delta


def test_mrope_positions_video_grid():
    model, cfg = tiny_hf_qwen2vl()
    # 2-frame video = temporal grid (2, 2, 2) post-merge
    f, gm = 2, 2
    n = f * gm * gm
    ids = [1, VISION_START] + [10] * n + [11, 3]
    ours, delta = mrope_positions(len(ids), [(2, n)], [(f, gm, gm)])
    core = (
        model.model if hasattr(model.model, "get_rope_index") else model
    )
    pos, d = core.get_rope_index(
        torch.tensor(ids, dtype=torch.long)[None],
        video_grid_thw=torch.tensor([[f, gm * 2, gm * 2]], dtype=torch.long),
        attention_mask=torch.ones(1, len(ids), dtype=torch.long),
    )
    np.testing.assert_array_equal(ours, pos[:, 0].numpy())
    assert delta == int(d[0, 0])


def test_apply_rope_mrope_sections_match_hf():
    import jax.numpy as jnp

    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLRotaryEmbedding,
        apply_multimodal_rotary_pos_emb,
    )

    from vllm_rust_tpu.layers.rotary import apply_rope

    model, cfg = tiny_hf_qwen2vl()
    t, nh, nkv, hd = 7, 4, 2, 16
    rng = np.random.default_rng(0)
    q = rng.standard_normal((t, nh, hd)).astype(np.float32)
    k = rng.standard_normal((t, nkv, hd)).astype(np.float32)
    pos = np.stack(
        [np.arange(t), np.arange(t) % 3, np.arange(t) % 2]
    ).astype(np.int64)

    rot = Qwen2VLRotaryEmbedding(config=cfg)
    x = torch.zeros(3, 1, t, hd)
    cos, sin = rot(x, torch.tensor(pos)[:, None, :])  # [3, 1, T, hd]
    qh, kh = apply_multimodal_rotary_pos_emb(
        torch.tensor(q).permute(1, 0, 2)[None],
        torch.tensor(k).permute(1, 0, 2)[None],
        cos,
        sin,
        cfg.rope_scaling["mrope_section"],
    )

    cos_tab = np.cos(
        np.outer(
            np.arange(64),
            1.0 / cfg.rope_theta ** (np.arange(0, hd, 2) / hd),
        )
    ).astype(np.float32)
    sin_tab = np.sin(
        np.outer(
            np.arange(64),
            1.0 / cfg.rope_theta ** (np.arange(0, hd, 2) / hd),
        )
    ).astype(np.float32)
    qo, ko = apply_rope(
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(pos.astype(np.int32)),
        jnp.asarray(cos_tab),
        jnp.asarray(sin_tab),
        rotary_dim=hd,
        mrope_section=tuple(cfg.rope_scaling["mrope_section"]),
    )
    np.testing.assert_allclose(
        np.asarray(qo), qh[0].permute(1, 0, 2).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ko), kh[0].permute(1, 0, 2).numpy(), atol=1e-5
    )


def _our_vlm_engine(cfg, hf_model):
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

    d = cfg.to_dict()
    d["architectures"] = ["Qwen2VLForConditionalGeneration"]
    mc = ModelConfig.from_dict(d)
    model = from_config(mc, dtype=jnp.float32)
    params = model.load_weights(
        (n, t.float().numpy()) for n, t in hf_model.state_dict().items()
    )
    ec = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=64, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=256),
        max_model_len=256,
        token_buckets=(32, 64, 128, 256),
    )
    return VlmEngine(model, params, ec), model


def test_qwen2vl_engine_greedy_matches_hf_with_image():
    """Full e2e: same tiny weights, same image pixels through the HF
    processor path (pixel patches) and ours; greedy continuations must
    match token-for-token."""
    from vllm_rust_tpu.request import SamplingParams

    hf, cfg = tiny_hf_qwen2vl()
    eng, model = _our_vlm_engine(cfg, hf)
    assert eng._use_mrope, "engine did not detect mrope"

    vc = cfg.vision_config
    g = 8  # pre-merge grid (image 32x32, patch 4)
    gm = g // vc.spatial_merge_size
    n_merged = gm * gm
    side = g * vc.patch_size
    rng = np.random.default_rng(3)
    image = rng.standard_normal((3, side, side)).astype(np.float32) * 0.5

    # HF path: flatten patches exactly like Qwen2VLImageProcessor
    patches = np.tile(image[None], (2, 1, 1, 1))  # temporal repeat
    ch = patches.shape[1]
    patches = patches.reshape(
        1, 2, ch, gm, vc.spatial_merge_size, vc.patch_size,
        gm, vc.spatial_merge_size, vc.patch_size,
    )
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(
        g * g, ch * 2 * vc.patch_size * vc.patch_size
    )

    ids, spans = expand_prompt(n_merged)
    max_new = 8
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor(ids, dtype=torch.long)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.tensor(flat),
            image_grid_thw=torch.tensor([[1, g, g]], dtype=torch.long),
            max_new_tokens=max_new,
            do_sample=False,
        )
    hf_new = hf_out[0, len(ids) :].tolist()

    prompt = [1, 2, VISION_START, IMG_TOK, 11, 3, 4, 5]  # 1 placeholder
    eng.add_image_request(
        "r1",
        prompt,
        [image],
        SamplingParams(max_tokens=max_new, temperature=0.0, ignore_eos=True),
    )
    seq = eng.requests["r1"]
    assert seq.mrope_pos is not None and seq.mrope_pos.shape[1] == len(ids)
    out = {}
    while eng.has_unfinished:
        for r in eng.step():
            out.setdefault(r.request_id, []).extend(r.new_token_ids)
    assert out["r1"] == hf_new, f"greedy diverged: {out['r1']} vs {hf_new}"

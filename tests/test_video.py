"""Video pipeline + encoder-cache LRU/refcounts.

Reference: crates/core/src/multimodal/video.rs (frame sampling,
temporal encoding, token budget) + encoder_cache.rs:32-351 (byte-budget
LRU with refcounts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_rust_tpu.multimodal.video import (
    FrameSampling,
    add_temporal_encoding,
    compute_uniform_frame_indices,
    preprocess_video_frames,
    sample_frame_indices,
    video_token_budget,
)


def test_uniform_indices():
    assert compute_uniform_frame_indices(100, 4) == [0, 33, 66, 99]
    assert compute_uniform_frame_indices(3, 8) == [0, 1, 2]
    assert compute_uniform_frame_indices(9, 1) == [4]
    assert compute_uniform_frame_indices(0, 4) == []


def test_fps_sampling():
    idx = sample_frame_indices(90, FrameSampling(kind="fps", fps=1.0,
                                                 source_fps=30.0))
    assert idx == [0, 30, 60]
    assert sample_frame_indices(5, FrameSampling(kind="all")) == list(range(5))


def test_preprocess_video_frames():
    frames = [np.random.rand(40, 40, 3).astype(np.float32) for _ in range(10)]
    batch = preprocess_video_frames(
        frames, FrameSampling(num_frames=4), image_size=28
    )
    assert batch.shape == (4, 3, 28, 28)


def test_temporal_encoding_distinguishes_frames():
    e = np.zeros((3, 5, 16), np.float32)
    out = add_temporal_encoding(e)
    assert out.shape == e.shape
    # frames get distinct codes; tokens within a frame share theirs
    assert not np.allclose(out[0], out[1])
    assert np.allclose(out[1, 0], out[1, 3])


def test_token_budget():
    assert video_token_budget(8, 224, 14) == 8 * 16 * 16
    assert video_token_budget(4, 28, 14, spatial_merge=2) == 4


# --------------------------------------------------------------- engine level

def _llava_engine(max_images=8):
    import sys
    sys.path.insert(0, "tests")
    from test_vision import llava_pair

    builder = getattr(llava_pair, "__wrapped__", llava_pair)
    model, params, hf, mc, px = builder()
    from vllm_rust_tpu.config import CacheConfig, EngineConfig, SchedulerConfig
    from vllm_rust_tpu.engine.vlm import VlmEngine

    cfg = EngineConfig(
        model=mc,
        cache=CacheConfig(num_pages=32, page_size=16),
        scheduler=SchedulerConfig(max_num_seqs=4, max_tokens_per_step=128),
        max_model_len=256,
        token_buckets=(16, 32, 64, 128),
    )
    return VlmEngine(model, params, cfg, max_images_per_request=max_images), mc


def test_video_request_generates():
    from vllm_rust_tpu.request import SamplingParams

    eng, mc = _llava_engine()
    frames = [np.random.rand(28, 28, 3).astype(np.float32) for _ in range(6)]
    eng.add_video_request(
        "v1", [5, 6, 120, 7],  # one video placeholder
        frames,
        SamplingParams(max_tokens=3, temperature=0.0, ignore_eos=True),
        sampling=FrameSampling(num_frames=3),
    )
    outs = {}
    while eng.has_unfinished:
        for o in eng.step():
            outs[o.request_id] = o
    assert len(outs["v1"].token_ids) == 3
    # 3 frames x 4 tokens/frame laid out as consecutive spans
    _, spans = eng._mm.get("v1", (None, [])) if "v1" in eng._mm else (None, [])
    # finished request cleans up its mm state
    assert "v1" not in eng._mm


def test_encoder_cache_lru_and_refcounts():
    from vllm_rust_tpu.request import SamplingParams

    eng, mc = _llava_engine()
    img = np.random.rand(3, 28, 28).astype(np.float32)
    e1 = eng._encode_cached(img, "r1")
    assert eng._cache_used > 0
    # same image: cache hit (same array object), refcount bumped
    e2 = eng._encode_cached(img, "r2")
    assert e2 is e1
    key = next(iter(eng._encoder_cache))
    assert eng._cache_refs[key] == 2

    # shrink the budget: referenced entry survives eviction pressure
    eng.encoder_cache_bytes = 1
    other = np.random.rand(3, 28, 28).astype(np.float32)
    eng._encode_cached(other, None)
    assert key in eng._encoder_cache  # still pinned by refs

    # release refs via _finish bookkeeping
    class S:
        request_id = "r1"

    for k in eng._req_keys.pop("r1", []):
        left = eng._cache_refs.get(k, 0) - 1
        if left <= 0:
            eng._cache_refs.pop(k, None)
        else:
            eng._cache_refs[k] = left
    assert eng._cache_refs[key] == 1

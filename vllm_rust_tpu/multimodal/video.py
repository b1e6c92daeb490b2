"""Video input pipeline: frame sampling, preprocessing, temporal encoding.

Reference: crates/core/src/multimodal/video.rs (FrameSamplingStrategy,
compute_uniform_frame_indices:108, add_temporal_encoding:137, token
budgeting) — the reference, like this module, operates on DECODED frames
(codec decoding is out of scope in both; clients send frames). Frames
arrive as data-URL images or raw arrays; the pipeline samples them,
preprocesses each through the image path, and stacks a [F, 3, H, W]
batch for the vision tower, optionally adding sinusoidal temporal
position encoding to the per-frame embeddings.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .image import load_image, preprocess_image


@dataclass(frozen=True)
class FrameSampling:
    """Frame sampling strategy (reference FrameSamplingStrategy enum).

    kind: "uniform" (num_frames evenly spaced), "fps" (one frame per
    1/fps seconds given source_fps), or "all".
    """

    kind: str = "uniform"
    num_frames: int = 8
    fps: float = 1.0
    source_fps: float = 30.0


def compute_uniform_frame_indices(total_frames: int, num_samples: int) -> list[int]:
    """Evenly spaced frame indices, always including first and last
    (reference video.rs:108)."""
    if total_frames <= 0:
        return []
    if num_samples >= total_frames:
        return list(range(total_frames))
    if num_samples == 1:
        return [total_frames // 2]
    step = (total_frames - 1) / (num_samples - 1)
    return sorted({min(round(i * step), total_frames - 1) for i in range(num_samples)})


def sample_frame_indices(total_frames: int, strategy: FrameSampling) -> list[int]:
    if strategy.kind == "all":
        return list(range(total_frames))
    if strategy.kind == "fps":
        stride = max(1, int(round(strategy.source_fps / max(strategy.fps, 1e-6))))
        return list(range(0, total_frames, stride))
    return compute_uniform_frame_indices(total_frames, strategy.num_frames)


def preprocess_video_frames(
    frames: list,  # data URLs / bytes / [H, W, 3] arrays
    strategy: FrameSampling = FrameSampling(),
    *,
    image_size: int = 224,
    mean=None,
    std=None,
) -> np.ndarray:
    """Sample + preprocess -> [F, 3, image_size, image_size] float32."""
    idx = sample_frame_indices(len(frames), strategy)
    kw = {}
    if mean is not None:
        kw["mean"] = mean
    if std is not None:
        kw["std"] = std
    out = []
    for i in idx:
        f = frames[i]
        if isinstance(f, (bytes, str)):
            f = load_image(f)
        out.append(
            preprocess_image(
                np.asarray(f), size=image_size, crop=image_size, **kw
            )
        )
    return np.stack(out, axis=0) if out else np.zeros(
        (0, 3, image_size, image_size), np.float32
    )


def add_temporal_encoding(embeds: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Sinusoidal per-frame position encoding added to frame embeddings
    (reference video.rs:137): embeds [F, T, H] -> same shape, each
    frame's tokens offset by its temporal position code."""
    f, t, h = embeds.shape
    pos = np.arange(f, dtype=np.float32)[:, None]  # [F, 1]
    dim = np.arange(h // 2, dtype=np.float32)[None, :]  # [1, H/2]
    freq = np.exp(-np.log(10000.0) * 2.0 * dim / h)
    ang = pos * freq  # [F, H/2]
    code = np.zeros((f, h), np.float32)
    code[:, 0::2] = np.sin(ang)[:, : code[:, 0::2].shape[1]]
    code[:, 1::2] = np.cos(ang)[:, : code[:, 1::2].shape[1]]
    return embeds + scale * code[:, None, :]


def video_token_budget(
    num_frames: int, image_size: int, patch_size: int,
    spatial_merge: int = 1,
) -> int:
    """Total LM positions a video occupies (reference total_tokens:56)."""
    per_side = image_size // patch_size
    per_frame = (per_side // max(spatial_merge, 1)) ** 2
    return num_frames * per_frame

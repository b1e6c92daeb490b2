"""Image preprocessing, pure numpy.

Reference: crates/core/src/multimodal/vision.rs (image fetch +
preprocess) — CLIP-style pipeline: shortest-edge bilinear resize, center
crop, 1/255 rescale, channel normalization. Matches HF's
CLIPImageProcessor to resampler tolerance.
"""

from __future__ import annotations

import base64
import io

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
SIGLIP_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
SIGLIP_STD = np.array([0.5, 0.5, 0.5], np.float32)


def _bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """img [H, W, C] float32 -> [out_h, out_w, C], align_corners=False."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0).astype(np.float32)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0).astype(np.float32)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def preprocess_image(
    img: np.ndarray,
    *,
    size: int = 336,
    crop: int | None = 336,
    mean: np.ndarray = CLIP_MEAN,
    std: np.ndarray = CLIP_STD,
) -> np.ndarray:
    """[H, W, 3] uint8 -> [3, crop, crop] float32 normalized."""
    x = np.asarray(img, np.float32)
    if x.ndim == 2:
        x = np.stack([x] * 3, axis=-1)
    h, w = x.shape[:2]
    # shortest-edge resize
    if h < w:
        nh, nw = size, max(1, int(round(w * size / h)))
    else:
        nh, nw = max(1, int(round(h * size / w))), size
    try:
        # PIL bicubic matches HF's CLIPImageProcessor exactly
        from PIL import Image

        pil = Image.fromarray(np.asarray(img, np.uint8))
        x = np.asarray(
            pil.resize((nw, nh), Image.Resampling.BICUBIC), np.float32
        )
        if x.ndim == 2:
            x = np.stack([x] * 3, axis=-1)
    except ImportError:
        x = _bilinear_resize(x, nh, nw)
    if crop is not None:
        top = (nh - crop) // 2
        left = (nw - crop) // 2
        x = x[top : top + crop, left : left + crop]
    x = x / 255.0
    x = (x - mean) / std
    return x.transpose(2, 0, 1).astype(np.float32)


def load_image(data: bytes | str) -> np.ndarray:
    """Decode image bytes (or a base64 data URL) to [H, W, 3] uint8.

    Uses PIL when available; raw RGB/PNG fallbacks otherwise."""
    if isinstance(data, str):
        if data.startswith("data:"):
            data = base64.b64decode(data.split(",", 1)[1])
        else:
            data = base64.b64decode(data)
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("RGB")
        return np.asarray(img, np.uint8)
    except ImportError as e:
        raise ValueError(
            "image decoding requires PIL (pass a numpy array instead)"
        ) from e

"""3-axis mrope position computation (Qwen2-VL family).

Reference: crates/core/src/layers/rotary.rs (mrope scaling variant) +
models/qwen2_vl.rs; semantics match HF transformers
``Qwen2VLModel.get_rope_index``: text tokens advance a single counter on
all three axes; a vision span with post-merge grid (t, h, w) assigns
temporal/height/width indices from the span's base position, and the
counter resumes at base + max(t, h, w). The per-sequence decode delta
maps 1-D token indices to mrope positions after the prompt
(``pos3 = index + delta`` on every axis).
"""

from __future__ import annotations

import numpy as np


def mrope_positions(
    length: int,
    spans: list[tuple[int, int]],  # (start, len) vision spans, ascending
    grids: list[tuple[int, int, int]],  # per-span post-merge (t, h, w)
) -> tuple[np.ndarray, int]:
    """Returns (positions [3, length] int32, decode delta int)."""
    assert len(spans) == len(grids)
    pos = np.zeros((3, length), np.int64)
    cur = 0
    i = 0
    by_start = {s0: (ln, g) for (s0, ln), g in zip(spans, grids)}
    while i < length:
        hit = by_start.get(i)
        if hit is not None:
            ln, (t, h, w) = hit
            assert t * h * w == ln, f"grid {t}x{h}x{w} != span {ln}"
            base = cur
            pos[0, i : i + ln] = base + np.repeat(np.arange(t), h * w)
            pos[1, i : i + ln] = base + np.tile(
                np.repeat(np.arange(h), w), t
            )
            pos[2, i : i + ln] = base + np.tile(np.arange(w), t * h)
            cur = base + max(t, h, w)
            i += ln
        else:
            pos[:, i] = cur
            cur += 1
            i += 1
    return pos.astype(np.int32), cur - length

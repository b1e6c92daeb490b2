"""AnyRes (LLaVA-NeXT) grid geometry + feature packing helpers.

Reference: crates/core/src/models/llava_next.rs (anyres tiling) and the
public LLaVA-NeXT recipe (HF modeling_llava_next.py semantics —
select_best_resolution / get_anyres_image_grid_shape / unpad_image):
an image is served as a base-resolution view PLUS a best-fit grid of
full-resolution tiles; tile features are re-assembled spatially,
unpadded back to the true aspect ratio, and each row is terminated with
a learned image_newline embedding. All of this is host-side numpy — the
device work is just the tower+projector over the patch batch.
"""

from __future__ import annotations

import numpy as np


def select_best_resolution(
    original_size: tuple[int, int], possible: list[tuple[int, int]]
) -> tuple[int, int]:
    """Best-fit (height, width) from the pinpoint list: maximize the
    effective (non-wasted) resolution, then minimize waste."""
    oh, ow = original_size
    best = None
    best_eff = 0
    best_waste = float("inf")
    for h, w in possible:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best_eff, best_waste, best = eff, waste, (h, w)
    return best


def anyres_grid_shape(
    image_size: tuple[int, int], pinpoints: list, tile_size: int
) -> tuple[int, int]:
    """(num_tiles_high, num_tiles_wide) of the best-fit grid."""
    h, w = select_best_resolution(tuple(image_size), [tuple(p) for p in pinpoints])
    return h // tile_size, w // tile_size


def unpad_image(tensor: np.ndarray, original_size: tuple[int, int]) -> np.ndarray:
    """[C, H, W] feature map -> aspect-ratio-restored crop (inverse of
    the pad-to-square preprocessing)."""
    oh, ow = original_size
    c, ch, cw = tensor.shape
    if ow / oh > cw / ch:
        scale = cw / ow
        nh = int(round(oh * scale, 7))
        pad = (ch - nh) // 2
        return tensor[:, pad : ch - pad, :]
    scale = ch / oh
    nw = int(round(ow * scale, 7))
    pad = (cw - nw) // 2
    return tensor[:, :, pad : cw - pad]


def pack_anyres_features(
    per_patch: np.ndarray,  # [P, n, C] projected features, patch 0 = base
    image_size: tuple[int, int],
    pinpoints: list,
    tile_size: int,
    grid: int,  # patches per tile side (tile_size // vit_patch)
    image_newline: np.ndarray,  # [C]
) -> np.ndarray:
    """Assemble one image's token sequence: base view + spatially
    re-stitched, unpadded tile grid with a newline column per row."""
    base = per_patch[0]
    c = per_patch.shape[-1]
    if per_patch.shape[0] == 1:
        return np.concatenate([base, image_newline[None]], axis=0)
    nph, npw = anyres_grid_shape(image_size, pinpoints, tile_size)
    tiles = per_patch[1:].reshape(nph, npw, grid, grid, c)
    f = tiles.transpose(4, 0, 2, 1, 3).reshape(c, nph * grid, npw * grid)
    f = unpad_image(f, image_size)
    nl = np.broadcast_to(image_newline[:, None, None], (c, f.shape[1], 1))
    f = np.concatenate([f, nl], axis=2)
    f = f.reshape(c, -1).T  # row-major (h, w+1) token order
    return np.concatenate([base, f], axis=0)

"""LLaVA-NeXT "anyres" multi-patch image preprocessing (host side).

The reference's default model is LLaVA-NeXT-Llama3-8B driven through HF's
``LlavaNextForConditionalGeneration`` (/root/reference/src/encode.py:221-224),
whose image path is: pick the best grid resolution from ``image_grid_pinpoints``,
resize+pad the image onto that canvas, split it into 336² tiles, prepend the
336²-resized base image, run every tile through the ViT, then lay the tile
features back out spatially — cropping the padding rows/cols ("unpad") and
appending a learned ``image_newline`` embedding at the end of each feature
row — and finally splice ``576 + h'·(w'+1)`` embeddings into the prompt.

TPU-first design: all the irregular logic (grid choice, unpad arithmetic,
spatial layout) is a pure function of the ORIGINAL image size, so it runs on
host and compiles to nothing. The device sees only static shapes:

- ``pixels``        [max_tiles, S, S, 3] (invalid tiles zero-padded),
- ``feature_index`` [max_image_tokens] int32 — a gather map into the
  flattened per-image feature table ``[max_tiles·ppt + 1, H]`` whose last row
  is the ``image_newline`` embedding. ``mllm.forward_hidden`` runs the ViT on
  all tiles, builds that table, gathers, and splices — three static-shape ops.

Semantics mirror HF exactly (``select_best_resolution``,
``get_image_patches``, ``pack_image_features``/``unpad_image`` in
transformers' llava_next; verified in tests/test_llava_next_parity.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

# llava-hf/llama3-llava-next-8b-hf / llava-v1.6 default pinpoints.
DEFAULT_GRID_PINPOINTS: Tuple[Tuple[int, int], ...] = (
    (336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008))

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def select_best_resolution(
    original_size: Tuple[int, int],
    pinpoints: Sequence[Tuple[int, int]],
) -> Tuple[int, int]:
    """HF ``select_best_resolution``: maximize effective resolution, then
    minimize wasted canvas. Sizes are (height, width)."""
    oh, ow = original_size
    best = None
    max_eff = 0
    min_waste = float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (h, w)
    return best


def grid_shape(original_size: Tuple[int, int],
               pinpoints: Sequence[Tuple[int, int]],
               tile_size: int) -> Tuple[int, int]:
    """(num_patch_height, num_patch_width) for the chosen canvas."""
    h, w = select_best_resolution(original_size, pinpoints)
    return h // tile_size, w // tile_size


def _patch_output_size(original_size, target_resolution) -> Tuple[int, int]:
    """HF ``_get_patch_output_size``: aspect-preserving fit into the canvas."""
    oh, ow = original_size
    th, tw = target_resolution
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw = tw
        nh = min(math.ceil(oh * scale_w), th)
    else:
        nh = th
        nw = min(math.ceil(ow * scale_h), tw)
    return nh, nw


def unpad_dims(original_size: Tuple[int, int],
               current: Tuple[int, int]) -> Tuple[int, int, int, int]:
    """HF ``unpad_image`` arithmetic on the FEATURE grid.

    ``current`` = (nph·pps, npw·pps). Returns (h', w', pad_top, pad_left):
    the cropped grid dims and the crop offsets. Note HF crops
    ``[pad : cur - pad]`` so the result is ``cur - 2·pad`` (which can differ
    from the rounded new size by one when parities differ) — reproduced
    exactly.
    """
    oh, ow = original_size
    ch, cw = current
    if ow / oh > cw / ch:
        scale = cw / ow
        new_h = int(round(oh * scale, 7))
        pad = (ch - new_h) // 2
        return ch - 2 * pad, cw, pad, 0
    scale = ch / oh
    new_w = int(round(ow * scale, 7))
    pad = (cw - new_w) // 2
    return ch, cw - 2 * pad, 0, pad


def num_image_tokens(original_size: Tuple[int, int],
                     pinpoints: Sequence[Tuple[int, int]],
                     tile_size: int, pps: int) -> int:
    """Final spliced embedding count: base ppt + h'·(w'+1) (newlines).

    ``pps`` = patches per tile side (tile_size // vit_patch); ppt = pps².
    A 1×1 grid still takes the grid path (HF's ``pack_image_features`` does —
    its single-feature branch only fires for processors that emit no grid
    patches, which ``get_image_patches`` never does)."""
    nph, npw = grid_shape(original_size, pinpoints, tile_size)
    h, w, _, _ = unpad_dims(original_size, (nph * pps, npw * pps))
    return pps * pps + h * (w + 1)


def max_image_tokens(pinpoints: Sequence[Tuple[int, int]],
                     tile_size: int, pps: int) -> int:
    """Static upper bound over all pinpoints (no-crop worst case)."""
    best = pps * pps + 1
    for h, w in pinpoints:
        nph, npw = h // tile_size, w // tile_size
        best = max(best, pps * pps + (nph * pps) * (npw * pps + 1))
    return best


def max_tiles(pinpoints: Sequence[Tuple[int, int]], tile_size: int) -> int:
    """Static tile-count bound: base + largest grid."""
    return 1 + max((h // tile_size) * (w // tile_size) for h, w in pinpoints)


def feature_index(
    original_size: Tuple[int, int],
    pinpoints: Sequence[Tuple[int, int]],
    tile_size: int,
    pps: int,
    n_tiles_max: int,
    n_tokens_max: int,
) -> Tuple[np.ndarray, int]:
    """Gather map [n_tokens_max] into the flattened feature table.

    Table layout: tile t occupies rows ``t·ppt .. (t+1)·ppt - 1`` (tile 0 =
    base image, tiles 1.. = grid patches row-major); row ``n_tiles_max·ppt``
    is the ``image_newline`` embedding. Padding positions point at the
    newline row (in-bounds; never spliced). Returns (index, n_tokens).
    """
    ppt = pps * pps
    newline = n_tiles_max * ppt
    idx = np.full(n_tokens_max, newline, np.int32)
    pos = 0
    # base image features first
    idx[:ppt] = np.arange(ppt, dtype=np.int32)
    pos = ppt

    nph, npw = grid_shape(original_size, pinpoints, tile_size)
    h, w, pad_t, pad_l = unpad_dims(original_size, (nph * pps, npw * pps))
    rows = np.arange(h, dtype=np.int64)[:, None] + pad_t       # [h, 1]
    cols = np.arange(w, dtype=np.int64)[None, :] + pad_l       # [1, w]
    tile = 1 + (rows // pps) * npw + (cols // pps)             # [h, w]
    within = (rows % pps) * pps + (cols % pps)                 # [h, w]
    grid_idx = tile * ppt + within                             # [h, w]
    with_nl = np.concatenate(
        [grid_idx, np.full((h, 1), newline, np.int64)], axis=1)  # [h, w+1]
    flat = with_nl.reshape(-1)
    idx[pos:pos + flat.size] = flat.astype(np.int32)
    return idx, pos + flat.size


@dataclass
class AnyresImage:
    """Host-preprocessed image, static device shapes."""
    pixels: np.ndarray         # [n_tiles_max, S, S, 3] float32, normalized
    feature_index: np.ndarray  # [n_tokens_max] int32
    n_tokens: int              # actual spliced embedding count
    n_tiles: int               # actual tile count (incl. base)


def _resize(img_u8: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """PIL bicubic resize (HF image processors resample with PIL)."""
    from PIL import Image

    h, w = size_hw
    return np.asarray(
        Image.fromarray(img_u8).resize((w, h), Image.BICUBIC))


def preprocess_anyres(
    image: np.ndarray,            # [H, W, 3] float in [0,1] or uint8
    pinpoints: Sequence[Tuple[int, int]],
    tile_size: int,
    pps: int,
    n_tiles_max: int,
    n_tokens_max: int,
    mean: np.ndarray = CLIP_MEAN,
    std: np.ndarray = CLIP_STD,
) -> AnyresImage:
    """Full anyres host path: HF ``get_image_patches`` + the feature map.

    Tile order matches HF: [base-resized original] + canvas patches
    (row-major). Invalid (padding) tiles are zeros — their ViT outputs are
    computed but never gathered.
    """
    if image.dtype != np.uint8:
        img_u8 = (np.clip(image, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    else:
        img_u8 = image
    oh, ow = img_u8.shape[:2]
    best = select_best_resolution((oh, ow), pinpoints)
    nh, nw = _patch_output_size((oh, ow), best)
    resized = _resize(img_u8, (nh, nw))
    canvas = np.zeros((best[0], best[1], 3), np.uint8)
    top, left = (best[0] - nh) // 2, (best[1] - nw) // 2
    canvas[top:top + nh, left:left + nw] = resized

    tiles: List[np.ndarray] = [_resize(img_u8, (tile_size, tile_size))]
    for r in range(0, best[0], tile_size):
        for c in range(0, best[1], tile_size):
            tiles.append(canvas[r:r + tile_size, c:c + tile_size])
    n_tiles = len(tiles)

    pixels = np.zeros((n_tiles_max, tile_size, tile_size, 3), np.float32)
    for i, t in enumerate(tiles[:n_tiles_max]):
        pixels[i] = (t.astype(np.float32) / 255.0 - mean) / std

    idx, n_tokens = feature_index((oh, ow), pinpoints, tile_size, pps,
                                  n_tiles_max, n_tokens_max)
    return AnyresImage(pixels=pixels, feature_index=idx,
                       n_tokens=n_tokens, n_tiles=min(n_tiles, n_tiles_max))

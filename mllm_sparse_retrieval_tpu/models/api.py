"""Model-agnostic encode dispatch.

The LLaVA family (models/mllm.py) consumes resized pixel grids; the Qwen2.5-VL
family (models/qwen_vl.py) consumes pre-patchified sequences plus M-RoPE
position ids. This module gives the pipelines one surface:

- ``encode_any(params, arch, ids, mask, vision_input, ...)``
- ``image_input_spec(arch)`` → how to preprocess an image for the family and
  how many image tokens the prompt must carry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np

from mllm_sparse_retrieval_tpu.configs import RepsLoc
from mllm_sparse_retrieval_tpu.models import internvl, mllm, qwen_vl
from mllm_sparse_retrieval_tpu.models.internvl import InternVLConfig
from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
from mllm_sparse_retrieval_tpu.models.qwen_vl import QwenVLConfig


def encode_any(params, arch, input_ids, attention_mask, vision_input=None,
               reps_loc: RepsLoc = RepsLoc.BEFORE_PAD, lora=None,
               position_ids=None, remat: bool = False,
               allow_flash: bool = True, lora_rng=None,
               lora_dropout: float = 0.0):
    """(sparse [B,V], dense [B,H]) for any model family.

    ``remat=True`` gradient-checkpoints the decoder blocks (training-time
    memory/FLOPs trade). ``allow_flash``: True / False / a
    ``jax.sharding.Mesh`` — pass the mesh whenever this runs inside a
    GSPMD-sharded jit so long sequences keep the O(T) flash path through a
    shard_map wrap (the raw Pallas kernel has no SPMD partitioning rule);
    see llama.apply. ``lora_rng``/``lora_dropout`` enable train-time dropout on
    the decoder LoRA paths (reference ``--lora_dropout``); inference callers
    pass neither and stay deterministic."""
    if isinstance(arch, QwenVLConfig):
        return qwen_vl.encode(params, arch, input_ids, attention_mask,
                              patches=vision_input,
                              position_ids=position_ids,
                              reps_loc=reps_loc, lora=lora, remat=remat,
                              allow_flash=allow_flash, lora_rng=lora_rng,
                              lora_dropout=lora_dropout)
    if isinstance(arch, InternVLConfig):
        return internvl.encode(params, arch, input_ids, attention_mask,
                               vision_input, reps_loc, lora, remat=remat,
                               allow_flash=allow_flash, lora_rng=lora_rng,
                               lora_dropout=lora_dropout)
    return mllm.encode(params, arch, input_ids, attention_mask,
                       vision_input, reps_loc, lora, remat=remat,
                       allow_flash=allow_flash, lora_rng=lora_rng,
                       lora_dropout=lora_dropout)


@dataclass(frozen=True)
class ImageInputSpec:
    """How a family consumes images.

    Fixed families (``variable=False``): every image maps to the same token
    count; ``preprocess`` converts a square ``image_size`` pixel grid into
    the model's vision input.

    Variable families (``variable=True`` — LLaVA-NeXT anyres, InternVL
    dynamic tiling): the token count depends on the ORIGINAL image size.
    ``preprocess_example`` maps a raw original-resolution image ([H, W, 3]
    float in [0,1] or uint8, NOT pre-resized) to ``(vision_item, n_tokens)``
    with static per-example shapes; ``batch_vision`` stacks items into the
    model's vision input. ``max_image_tokens`` bounds n_tokens so callers can
    pad prompts to one fixed length (one compile for the whole corpus).
    """

    num_image_tokens: int
    image_size: int                       # square pixel size (fixed families)
    preprocess: Optional[Callable] = None
    needs_mrope: bool = False
    variable: bool = False
    preprocess_example: Optional[Callable] = None
    batch_vision: Optional[Callable] = None
    max_image_tokens: int = 0
    # variable M-RoPE families (Qwen native resolution): (input_ids,
    # attention_mask, vision_batch) -> [3, B, T] position ids from each
    # example's true grid
    mrope_from_batch: Optional[Callable] = None


def image_input_spec(arch) -> ImageInputSpec:
    if isinstance(arch, QwenVLConfig):
        if arch.native_resolution:
            # HF-processor-default behavior (/root/reference/src/model.py:119):
            # per-image smart-resized grids; layouts are host tables batched
            # as jit args (models/qwen_vl.py native-resolution section)
            def prep_native(image: np.ndarray):
                return qwen_vl.preprocess_native(image, arch)

            def mrope_fb(ids, mask, vision_batch):
                grids = np.asarray(vision_batch["grid_hw"])
                thw = np.concatenate(
                    [np.ones((grids.shape[0], 1), np.int64), grids], axis=1)
                return qwen_vl.mrope_position_ids(
                    np.asarray(ids), np.asarray(mask), arch.image_token_id,
                    thw, arch.vision.spatial_merge_size)

            return ImageInputSpec(
                num_image_tokens=0,
                image_size=arch.resize_factor,
                needs_mrope=True,
                variable=True,
                preprocess_example=prep_native,
                batch_vision=qwen_vl.batch_native,
                max_image_tokens=arch.max_merge_units,
                mrope_from_batch=mrope_fb,
            )

        size_h = arch.grid_h * arch.vision.patch_size
        assert arch.grid_h == arch.grid_w, "square grids only in pipelines"

        def prep(image: np.ndarray) -> np.ndarray:
            return qwen_vl.patchify(image, arch.vision)

        return ImageInputSpec(
            num_image_tokens=arch.num_image_tokens,
            image_size=size_h,
            preprocess=prep,
            needs_mrope=True,
        )

    if isinstance(arch, InternVLConfig):
        # dynamic tiling (data/tiling.py): <=12 aspect-matched 448^2 tiles +
        # thumbnail, padded to a static tile count; the prompt carries
        # num_image_token x n_tiles context tokens
        # (/root/reference/src/model.py:112-118, src/utils.py:72-117).
        from mllm_sparse_retrieval_tpu.data.tiling import (
            dynamic_tile, pad_tiles)

        size = arch.vision.image_size
        tiles_max = arch.max_dynamic_tiles + 1  # + thumbnail

        def prep_ex(image: np.ndarray):
            tiles = dynamic_tile(image, tile_size=size,
                                 max_num=arch.max_dynamic_tiles)
            padded, _ = pad_tiles(tiles, tiles_max)
            return padded, arch.num_image_tokens * tiles.shape[0]

        return ImageInputSpec(
            num_image_tokens=0,
            image_size=size,
            variable=True,
            preprocess_example=prep_ex,
            batch_vision=lambda items: np.stack(items),
            max_image_tokens=arch.num_image_tokens * tiles_max,
        )

    if isinstance(arch, MLLMConfig) and arch.anyres:
        # LLaVA-NeXT anyres (models/anyres.py): grid-pinpoint tiles + base,
        # host-computed feature gather map.
        from mllm_sparse_retrieval_tpu.models import anyres as A

        size = arch.vision.image_size
        pps = arch.patches_per_side
        mt, mtok = arch.max_tiles, arch.max_image_tokens

        def prep_anyres(image: np.ndarray):
            a = A.preprocess_anyres(image, arch.grid_pinpoints, size, pps,
                                    mt, mtok)
            return ({"pixels": a.pixels, "feature_index": a.feature_index},
                    a.n_tokens)

        def batch_anyres(items):
            return {"pixels": np.stack([i["pixels"] for i in items]),
                    "feature_index": np.stack([i["feature_index"]
                                               for i in items])}

        return ImageInputSpec(
            num_image_tokens=0,
            image_size=size,
            variable=True,
            preprocess_example=prep_anyres,
            batch_vision=batch_anyres,
            max_image_tokens=mtok,
        )

    # fixed-grid LLaVA families: pixels pass through
    return ImageInputSpec(
        num_image_tokens=arch.num_image_tokens,
        image_size=arch.vision.image_size,
        preprocess=lambda image: image,
        needs_mrope=False,
    )


def mrope_ids_for_batch(arch, input_ids: np.ndarray,
                        attention_mask: np.ndarray) -> Optional[np.ndarray]:
    """[3, B, T] M-RoPE ids for Qwen image batches; None otherwise."""
    if not isinstance(arch, QwenVLConfig):
        return None
    return qwen_vl.mrope_position_ids(
        np.asarray(input_ids), np.asarray(attention_mask),
        arch.image_token_id, (1, arch.grid_h, arch.grid_w),
        arch.vision.spatial_merge_size)


def text_hidden_size(arch) -> int:
    return arch.text.hidden_size


def vocab_size(arch) -> int:
    return arch.text.vocab_size

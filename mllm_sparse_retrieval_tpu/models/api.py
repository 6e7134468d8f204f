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
               position_ids=None):
    """(sparse [B,V], dense [B,H]) for any model family."""
    if isinstance(arch, QwenVLConfig):
        return qwen_vl.encode(params, arch, input_ids, attention_mask,
                              patches=vision_input,
                              position_ids=position_ids,
                              reps_loc=reps_loc, lora=lora)
    if isinstance(arch, InternVLConfig):
        return internvl.encode(params, arch, input_ids, attention_mask,
                               vision_input, reps_loc, lora)
    return mllm.encode(params, arch, input_ids, attention_mask,
                       vision_input, reps_loc, lora)


@dataclass(frozen=True)
class ImageInputSpec:
    num_image_tokens: int
    image_size: int                       # square pixel size to load at
    preprocess: Callable[[np.ndarray], np.ndarray]  # [H,W,3] -> model input
    needs_mrope: bool = False


def image_input_spec(arch) -> ImageInputSpec:
    if isinstance(arch, QwenVLConfig):
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
    # LLaVA / InternVL families: pixels pass through
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

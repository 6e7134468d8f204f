"""Explicit model-family registry.

Replaces the reference's substring dispatch on ``model_name_or_path``
(/root/reference/src/model.py:51-64, src/train.py:70-109, src/encode.py:200-226)
with a declared spec per family: architecture configs, prompt template,
tokenizer/processor source, and checkpoint converter hook.

``TINY_DEBUG`` is fully self-contained (random init + corpus-built tokenizer)
and is the family used by tests/benches in hermetic environments; real
families load converted checkpoints via ``models/convert.py`` when weights
are available on disk.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.configs import ModelConfig, ModelFamily
from mllm_sparse_retrieval_tpu.models import mllm, templates
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
from mllm_sparse_retrieval_tpu.models.templates import PromptTemplate
from mllm_sparse_retrieval_tpu.models.tokenizer import WordPieceLiteTokenizer
from mllm_sparse_retrieval_tpu.models.vit import ViTConfig


@dataclass(frozen=True)
class FamilySpec:
    family: ModelFamily
    arch: MLLMConfig
    template: PromptTemplate
    hf_repo: Optional[str] = None  # provenance note only; no network access


def _llava_next_llama3_arch() -> MLLMConfig:
    """LLaVA-NeXT-Llama3-8B — the reference's default model
    (/root/reference/src/encode.py:221-224) — with the anyres multi-patch
    vision path (models/anyres.py; HF-verified in
    tests/test_llava_next_parity.py)."""
    from mllm_sparse_retrieval_tpu.models.anyres import DEFAULT_GRID_PINPOINTS

    return MLLMConfig(
        vision=ViTConfig(image_size=336, patch_size=14, hidden_size=1024,
                         num_layers=24, num_heads=16, feature_layer=-2),
        text=LlamaConfig(vocab_size=128256, hidden_size=4096, num_layers=32,
                         num_heads=32, num_kv_heads=8,
                         intermediate_size=14336, rope_theta=500000.0),
        image_token_id=128256 - 1,
        grid_pinpoints=DEFAULT_GRID_PINPOINTS,
    )


def _llava_1_5_arch() -> MLLMConfig:
    return MLLMConfig(
        vision=ViTConfig(image_size=336, patch_size=14, hidden_size=1024,
                         num_layers=24, num_heads=16, feature_layer=-2),
        text=LlamaConfig(vocab_size=32064, hidden_size=4096, num_layers=32,
                         num_heads=32, num_kv_heads=32,
                         intermediate_size=11008, rope_theta=10000.0),
        image_token_id=32000,
    )


def _llava_1_6_vicuna_arch() -> MLLMConfig:
    """LLaVA-1.6 (NeXT) Vicuna-7B: the 1.5 tower/decoder dims but the anyres
    multi-patch image path (HF serves it as LlavaNextForConditionalGeneration;
    the reference only swaps the prompt wrapper, src/model.py:51-53)."""
    from mllm_sparse_retrieval_tpu.models.anyres import DEFAULT_GRID_PINPOINTS

    base = _llava_1_5_arch()
    return MLLMConfig(vision=base.vision, text=base.text,
                      image_token_id=base.image_token_id,
                      grid_pinpoints=DEFAULT_GRID_PINPOINTS)


def _qwen2_5_vl_3b_arch():
    """Qwen2.5-VL-3B: windowed ViT + M-RoPE Qwen2.5 backbone
    (models/qwen_vl.py; numerically verified vs HF in tests/test_qwen_parity.py).
    Pipelines run a fixed 448px grid (32x32 patches -> 256 merged tokens)."""
    from mllm_sparse_retrieval_tpu.models.qwen_vl import (
        QwenViTConfig, QwenVLConfig)

    return QwenVLConfig(
        vision=QwenViTConfig(hidden_size=1280, depth=32, num_heads=16,
                             intermediate_size=3420, out_hidden_size=2048,
                             patch_size=14, spatial_merge_size=2,
                             window_size=112,
                             fullatt_block_indexes=(7, 15, 23, 31)),
        text=LlamaConfig(vocab_size=151936, hidden_size=2048, num_layers=36,
                         num_heads=16, num_kv_heads=2,
                         intermediate_size=11008, rope_theta=1000000.0,
                         qkv_bias=True, tie_lm_head=True, rms_eps=1e-6,
                         mrope_section=(16, 24, 24)),
        image_token_id=151655, vision_start_token_id=151652,
        grid_h=32, grid_w=32,
        native_resolution=True,   # HF-processor default: per-image grids
    )


def _qwen2_5_vl_7b_arch():
    """Qwen2.5-VL-7B dims (same tower; 3584-wide 28-layer backbone, untied
    head). The registry default stays 3B; checkpoints select their size via
    the ``arch.json`` manifest (models/convert.py) — this entry documents
    the 7B dim set and feeds the arch-derivation tests.
    Ref: /root/reference/src/model.py:53 dispatches both sizes."""
    from mllm_sparse_retrieval_tpu.models.qwen_vl import QwenVLConfig

    base = _qwen2_5_vl_3b_arch()
    return QwenVLConfig(
        vision=base.vision,
        text=LlamaConfig(vocab_size=152064, hidden_size=3584, num_layers=28,
                         num_heads=28, num_kv_heads=4,
                         intermediate_size=18944, max_seq_len=128000,
                         rope_theta=1000000.0,
                         qkv_bias=True, tie_lm_head=False, rms_eps=1e-6,
                         mrope_section=(16, 24, 24)),
        image_token_id=base.image_token_id,
        vision_start_token_id=base.vision_start_token_id,
        grid_h=base.grid_h, grid_w=base.grid_w,
        native_resolution=True,
    )


def _internvl2_5_4b_arch():
    """InternVL2.5-4B dims: same InternViT-300M tower as the 8B, Qwen2.5-3B
    backbone (36 layers × 2048). Selected via checkpoint manifest; see
    ``_qwen2_5_vl_7b_arch`` note."""
    from mllm_sparse_retrieval_tpu.models.internvl import (
        InternViTConfig, InternVLConfig)

    base = _internvl2_5_arch()
    return InternVLConfig(
        vision=base.vision,
        text=LlamaConfig(vocab_size=151674, hidden_size=2048, num_layers=36,
                         num_heads=16, num_kv_heads=2,
                         intermediate_size=11008, rope_theta=1000000.0,
                         qkv_bias=True, rms_eps=1e-6),
        image_token_id=base.image_token_id,
    )


def _tiny_qwen_debug_arch(model_cfg: Optional[ModelConfig] = None):
    from mllm_sparse_retrieval_tpu.models.qwen_vl import (
        QwenViTConfig, QwenVLConfig)

    m = model_cfg or ModelConfig()
    hd = m.tiny_hidden_size // m.tiny_num_heads
    assert (hd // 2) % 4 == 0, "tiny qwen needs head_dim/2 divisible by 4"
    sec = (hd // 2 - 2 * (hd // 8), hd // 8, hd // 8)
    return QwenVLConfig(
        vision=QwenViTConfig(hidden_size=64, depth=2, num_heads=4,
                             intermediate_size=128,
                             out_hidden_size=m.tiny_hidden_size,
                             patch_size=14, spatial_merge_size=2,
                             window_size=56, fullatt_block_indexes=(1,)),
        text=LlamaConfig(vocab_size=m.tiny_vocab_size,
                         hidden_size=m.tiny_hidden_size,
                         num_layers=m.tiny_num_layers,
                         num_heads=m.tiny_num_heads,
                         num_kv_heads=max(1, m.tiny_num_heads // 2),
                         intermediate_size=m.tiny_hidden_size * 4,
                         rope_theta=10000.0, qkv_bias=True,
                         mrope_section=sec),
        image_token_id=4,  # WordPieceLiteTokenizer.IMAGE
        vision_start_token_id=2,
        grid_h=8, grid_w=8,
    )


def _internvl2_5_arch():
    """InternVL2.5-8B (HF-integrated layout): InternViT-300M tower + 8B
    backbone (models/internvl.py; HF-verified in tests/test_internvl_parity.py).
    Dynamic-tiling preprocessing lives in data/tiling.py."""
    from mllm_sparse_retrieval_tpu.models.internvl import (
        InternViTConfig, InternVLConfig)

    return InternVLConfig(
        vision=InternViTConfig(hidden_size=1024, num_layers=24, num_heads=16,
                               intermediate_size=4096, image_size=448,
                               patch_size=14, norm_type="layer_norm",
                               use_qk_norm=False),
        text=LlamaConfig(vocab_size=151674, hidden_size=3584, num_layers=28,
                         num_heads=28, num_kv_heads=4,
                         intermediate_size=18944, rope_theta=1000000.0,
                         qkv_bias=True, rms_eps=1e-6),
        image_token_id=151667,
    )


def tiny_debug_arch(model_cfg: Optional[ModelConfig] = None) -> MLLMConfig:
    m = model_cfg or ModelConfig()
    return MLLMConfig(
        vision=ViTConfig(
            image_size=m.tiny_image_size, patch_size=m.tiny_patch_size,
            hidden_size=m.tiny_hidden_size, num_layers=m.tiny_num_layers,
            num_heads=m.tiny_num_heads, feature_layer=-2),
        text=LlamaConfig(
            vocab_size=m.tiny_vocab_size, hidden_size=m.tiny_hidden_size,
            num_layers=m.tiny_num_layers, num_heads=m.tiny_num_heads,
            num_kv_heads=max(1, m.tiny_num_heads // 2),
            intermediate_size=m.tiny_hidden_size * 4, rope_theta=10000.0),
        image_token_id=4,  # WordPieceLiteTokenizer.IMAGE
    )


_SPECS: Dict[ModelFamily, Callable[[], MLLMConfig]] = {
    ModelFamily.LLAVA_NEXT_LLAMA3: _llava_next_llama3_arch,
    ModelFamily.LLAVA_1_5: _llava_1_5_arch,
    ModelFamily.LLAVA_1_6_VICUNA: _llava_1_6_vicuna_arch,
    ModelFamily.E5_V: _llava_next_llama3_arch,
    ModelFamily.QWEN2_5_VL: _qwen2_5_vl_3b_arch,
    ModelFamily.INTERNVL2_5: _internvl2_5_arch,
}

_TEMPLATES: Dict[ModelFamily, PromptTemplate] = {
    ModelFamily.TINY_QWEN_DEBUG: templates.TINY,
    ModelFamily.LLAVA_NEXT_LLAMA3: templates.LLAMA3,
    ModelFamily.E5_V: templates.LLAMA3,
    ModelFamily.LLAVA_1_5: templates.LLAVA_V1_5,
    ModelFamily.LLAVA_1_6_VICUNA: templates.LLAVA_V1_5,
    # Chat-message families: rendered through the checkpoint's own HF chat
    # template when available (templates.resolve_template); the fallback
    # wrappers reproduce the official templates' output.
    ModelFamily.QWEN2_5_VL: templates.QWEN2_5_VL,
    ModelFamily.INTERNVL2_5: templates.INTERNVL2_5,
    ModelFamily.TINY_DEBUG: templates.TINY,
}

_HF_REPOS: Dict[ModelFamily, str] = {
    ModelFamily.LLAVA_NEXT_LLAMA3: "llava-hf/llama3-llava-next-8b-hf",
    ModelFamily.LLAVA_1_5: "llava-hf/llava-1.5-7b-hf",
    ModelFamily.LLAVA_1_6_VICUNA: "llava-hf/llava-v1.6-vicuna-7b-hf",
    ModelFamily.E5_V: "royokong/e5-v",
    ModelFamily.QWEN2_5_VL: "Qwen/Qwen2.5-VL-3B-Instruct",
    ModelFamily.INTERNVL2_5: "OpenGVLab/InternVL2_5-8B",
}


def get_family_spec(family: ModelFamily,
                    model_cfg: Optional[ModelConfig] = None) -> FamilySpec:
    if family == ModelFamily.TINY_DEBUG:
        arch = tiny_debug_arch(model_cfg)
    elif family == ModelFamily.TINY_QWEN_DEBUG:
        arch = _tiny_qwen_debug_arch(model_cfg)
    else:
        arch = _SPECS[family]()
    return FamilySpec(family=family, arch=arch,
                      template=_TEMPLATES[family],
                      hf_repo=_HF_REPOS.get(family))


def build_model(
    model_cfg: ModelConfig,
    captions: Optional[list] = None,
    seed: int = 0,
) -> Tuple[Dict, MLLMConfig, object, PromptTemplate]:
    """Instantiate (params, arch, tokenizer, template) for a family.

    TINY_DEBUG: random params + corpus tokenizer (hermetic). Real families:
    requires ``checkpoint_path`` with converted weights (models/convert.py);
    raises with guidance otherwise — this environment has no model hub access.
    """
    spec = get_family_spec(model_cfg.family, model_cfg)
    dtype = jnp.bfloat16 if model_cfg.dtype == "bfloat16" else jnp.float32

    if model_cfg.family in (ModelFamily.TINY_DEBUG,
                            ModelFamily.TINY_QWEN_DEBUG):
        tok = WordPieceLiteTokenizer.from_corpus_captions(
            captions or ["a photo of a thing"],
            vocab_size=model_cfg.tiny_vocab_size)
        arch = spec.arch
        if tok.vocab_size > arch.text.vocab_size:
            # the tokenizer's specials + alphabet pieces form a floor on its
            # vocab; ids past the embed table silently clamp (garbage reps)
            raise ValueError(
                f"tokenizer vocab {tok.vocab_size} exceeds model vocab "
                f"{arch.text.vocab_size}; raise ModelConfig.tiny_vocab_size")
        if model_cfg.family == ModelFamily.TINY_QWEN_DEBUG:
            from mllm_sparse_retrieval_tpu.models import qwen_vl
            params = qwen_vl.init_params(jax.random.PRNGKey(seed), arch,
                                         dtype)
        else:
            params = mllm.init_params(jax.random.PRNGKey(seed), arch, dtype)
        return params, arch, tok, spec.template

    if model_cfg.checkpoint_path is None:
        raise FileNotFoundError(
            f"family {model_cfg.family.value} needs a converted checkpoint "
            f"(from {spec.hf_repo}); set ModelConfig.checkpoint_path. "
            "Use models/convert.py to convert an HF checkpoint directory.")
    from mllm_sparse_retrieval_tpu.models import convert
    params, tok, ckpt_arch = convert.load_converted(
        model_cfg.checkpoint_path, spec, dtype)
    template = templates.resolve_template(spec.template, tok)
    # the checkpoint's arch.json manifest (written by convert_hf_dir from
    # the HF config.json) overrides the registry's default dims — a 7B Qwen
    # or 4B InternVL directory loads with its true architecture
    return params, ckpt_arch or spec.arch, tok, template

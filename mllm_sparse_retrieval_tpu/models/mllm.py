"""LLaVA-style multimodal composition: vision tower → projector → decoder LM.

The image path mirrors the capability of the reference's HF
``Llava*ForConditionalGeneration`` forward (/root/reference/src/model.py:145):
``<image>`` placeholder tokens in the prompt are replaced, position-wise, by
projected ViT patch features, then the whole sequence runs through the
decoder. The splice is a static-shape cumsum-gather (no dynamic shapes):

    img_slot[b, t] = (number of image tokens at positions <= t) - 1
    embeds[b, t]   = is_image[b, t] ? projected[b, img_slot[b, t]] : token_emb

Representations come from ``reps.extract_reps`` (last-non-pad gather; LM head
applied at one position only).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.configs import RepsLoc
from mllm_sparse_retrieval_tpu.models import layers as L
from mllm_sparse_retrieval_tpu.models import llama, vit
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
from mllm_sparse_retrieval_tpu.models.vit import ViTConfig


@dataclass(frozen=True)
class MLLMConfig:
    vision: ViTConfig = field(default_factory=ViTConfig)
    text: LlamaConfig = field(default_factory=LlamaConfig)
    image_token_id: int = 4
    projector_hidden: Optional[int] = None  # default: text hidden size
    # LLaVA-NeXT anyres multi-patch mode (models/anyres.py). When set, image
    # inputs are [B, max_tiles, S, S, 3] + a per-image feature gather map, and
    # params carry a learned ``image_newline`` embedding.
    grid_pinpoints: Tuple[Tuple[int, int], ...] = ()

    @property
    def anyres(self) -> bool:
        return len(self.grid_pinpoints) > 0

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches

    @property
    def patches_per_side(self) -> int:
        return self.vision.image_size // self.vision.patch_size

    @property
    def max_tiles(self) -> int:
        from mllm_sparse_retrieval_tpu.models import anyres as A
        return A.max_tiles(self.grid_pinpoints, self.vision.image_size)

    @property
    def max_image_tokens(self) -> int:
        from mllm_sparse_retrieval_tpu.models import anyres as A
        return A.max_image_tokens(self.grid_pinpoints, self.vision.image_size,
                                  self.patches_per_side)


def init_params(key, cfg: MLLMConfig, dtype=jnp.float32) -> Dict:
    kv, kp1, kp2, kt, kn = jax.random.split(key, 5)
    ph = cfg.projector_hidden or cfg.text.hidden_size
    params = {
        "vision": vit.init_params(kv, cfg.vision, dtype),
        "projector": {
            "fc1": L.dense_init(kp1, cfg.vision.hidden_size, ph, dtype=dtype),
            "fc2": L.dense_init(kp2, ph, cfg.text.hidden_size, dtype=dtype),
        },
        "text": llama.init_params(kt, cfg.text, dtype),
    }
    if cfg.anyres:
        params["image_newline"] = jax.random.normal(
            kn, (cfg.text.hidden_size,), dtype) * 0.02
    return params


def project_image_features(params: Dict, feats: jax.Array,
                           lora: Optional[Dict] = None) -> jax.Array:
    """2-layer GELU MLP projector (LLaVA-1.5+ convention; exact-erf gelu,
    matching HF's default ``projector_hidden_act='gelu'``)."""
    lget = (lambda name: lora.get(name) if lora else None)
    x = L.dense(feats, params["projector"]["fc1"], lget("fc1"))
    x = jax.nn.gelu(x, approximate=False)
    return L.dense(x, params["projector"]["fc2"], lget("fc2"))


def splice_image_embeddings(
    token_embeds: jax.Array,   # [B, T, H]
    image_embeds: jax.Array,   # [B, P, H] projected patch features
    is_image: jax.Array,       # [B, T] bool: input_ids == image_token_id
) -> jax.Array:
    slots = jnp.cumsum(is_image.astype(jnp.int32), axis=1) - 1  # [B, T]
    slots = jnp.clip(slots, 0, image_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(
        image_embeds, slots[:, :, None], axis=1)                # [B, T, H]
    return jnp.where(is_image[:, :, None], gathered, token_embeds)


def anyres_image_features(
    params: Dict,
    cfg: MLLMConfig,
    pixel_values: jax.Array,    # [B, max_tiles, S, S, 3]
    feature_index: jax.Array,   # [B, max_image_tokens] int32
    lora: Optional[Dict] = None,
) -> jax.Array:
    """[B, max_image_tokens, H] spliceable features for anyres inputs.

    All tiles run through the ViT as one flat batch (static shape; invalid
    tiles cost FLOPs but their features are never gathered), the per-image
    feature table gets the learned ``image_newline`` row appended, and the
    host-computed gather map lays features out in HF ``pack_image_features``
    order (base tile, unpadded grid rows each ending in a newline).
    """
    lget = (lambda name: lora.get(name) if lora else None)
    b, mt, s, _, c = pixel_values.shape
    flat = pixel_values.reshape(b * mt, s, s, c)
    feats = vit.apply(params["vision"], flat, cfg.vision, lget("vision"))
    proj = project_image_features(params, feats, lget("projector"))
    ppt = proj.shape[1]
    table = proj.reshape(b, mt * ppt, proj.shape[-1])
    newline = jnp.broadcast_to(
        params["image_newline"].astype(table.dtype),
        (b, 1, table.shape[-1]))
    table = jnp.concatenate([table, newline], axis=1)  # [B, mt*ppt+1, H]
    return jnp.take_along_axis(table, feature_index[:, :, None], axis=1)


def forward_hidden(
    params: Dict,
    cfg: MLLMConfig,
    input_ids: jax.Array,                 # [B, T]
    attention_mask: jax.Array,            # [B, T]
    pixel_values=None,                    # [B, Himg, Wimg, 3]; anyres: dict
                                          # {"pixels": [B, mt, S, S, 3],
                                          #  "feature_index": [B, maxTok]}
    lora: Optional[Dict] = None,
    remat: bool = False,
    allow_flash: bool = True,
    lora_rng=None,
    lora_dropout: float = 0.0,
) -> jax.Array:
    """Final-layer hidden states [B, T, H] for text or image+text inputs.

    ``lora_rng``/``lora_dropout`` apply to the DECODER adapters (the text
    targets the reference recipe trains); vision/projector adapters, when
    enabled, train without dropout — a documented deviation (configs.py)."""
    if cfg.text.moe is not None:
        # all four product families are dense-FFN; MoE backbones plug in at
        # the models.llama / parallel.ep layer, where apply() returns the
        # (hidden, aux_loss) pair this wrapper's single-array contract
        # cannot carry.
        raise ValueError("MLLM wrapper does not support MoE text configs; "
                         "use models.llama.apply directly (returns "
                         "(hidden, moe_aux_loss))")
    lget = (lambda name: lora.get(name) if lora else None)
    embeds = llama.embed_tokens(params["text"], input_ids)
    if pixel_values is not None:
        if isinstance(pixel_values, dict):
            img = anyres_image_features(
                params, cfg, pixel_values["pixels"],
                pixel_values["feature_index"], lora)
        else:
            feats = vit.apply(params["vision"], pixel_values, cfg.vision,
                              lget("vision"))
            img = project_image_features(params, feats, lget("projector"))
        is_image = input_ids == cfg.image_token_id
        embeds = splice_image_embeddings(embeds, img.astype(embeds.dtype),
                                         is_image)
    return llama.apply(params["text"], embeds, attention_mask, cfg.text,
                       lget("text"), remat=remat, allow_flash=allow_flash,
                       lora_rng=lora_rng, lora_dropout=lora_dropout)


def encode(
    params: Dict,
    cfg: MLLMConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    reps_loc: RepsLoc = RepsLoc.BEFORE_PAD,
    lora: Optional[Dict] = None,
    remat: bool = False,
    allow_flash: bool = True,
    lora_rng=None,
    lora_dropout: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """(sparse_weights [B, V], dense_embs [B, H]) — the encode_data
    equivalent (/root/reference/src/model.py:42-160) as one jittable fn."""
    from mllm_sparse_retrieval_tpu.models import reps as R

    hidden = forward_hidden(params, cfg, input_ids, attention_mask,
                            pixel_values, lora, remat=remat,
                            allow_flash=allow_flash, lora_rng=lora_rng,
                            lora_dropout=lora_dropout)
    head = llama.lm_head_weight(params["text"], cfg.text)
    return R.extract_reps(hidden, attention_mask, head, reps_loc)

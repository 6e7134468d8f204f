"""InternVL2.5 family: InternViT tower + pixel-shuffle + projector + decoder.

The third MLLM family the reference drives through HF trust_remote_code
classes (/root/reference/src/train.py:81-89, src/model.py:58-62). Numerically
matches HF's integrated ``InternVLForConditionalGeneration`` (verified in
tests/test_internvl_parity.py against a random-init model):

- timm-style ViT: conv patch embed (as matmul, with bias), CLS token,
  absolute position embeddings, pre-norm blocks with **layer scale**
  (lambda_1/lambda_2) and optional **QK-norm** (RMSNorm over the full embed
  dim before head split), LayerNorm or RMSNorm selectable;
- pixel-shuffle 2× downsample of the patch grid (channels ×4);
- projector: LayerNorm → linear → GELU → linear;
- decoder: models/llama.py (Qwen2-style backbone configs supported via
  ``qkv_bias``).

The reference's ≤12-tile dynamic preprocessing lives in data/tiling.py; each
tile runs through this tower independently (tiles are just batch entries).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.configs import RepsLoc
from mllm_sparse_retrieval_tpu.models import layers as L
from mllm_sparse_retrieval_tpu.models import llama
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig


@dataclass(frozen=True)
class InternViTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 448
    patch_size: int = 14
    norm_type: str = "layer_norm"       # 'layer_norm' | 'rms_norm'
    use_qk_norm: bool = False
    layer_scale_init: float = 0.1
    attention_bias: bool = True
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclass(frozen=True)
class InternVLConfig:
    vision: InternViTConfig = field(default_factory=InternViTConfig)
    text: LlamaConfig = field(default_factory=LlamaConfig)
    image_token_id: int = 151667
    downsample_ratio: float = 0.5
    # dynamic preprocessing tile budget (reference max_num=12 + thumbnail,
    # /root/reference/src/utils.py:72-108); pipelines pad to
    # ``max_dynamic_tiles + 1`` tiles with zero tiles.
    max_dynamic_tiles: int = 12

    @property
    def num_image_tokens(self) -> int:
        """Per-TILE context-token count (num_image_token in the reference,
        /root/reference/src/model.py:112-118)."""
        grid = self.vision.image_size // self.vision.patch_size
        return int(grid * self.downsample_ratio) ** 2


def _norm_init(cfg: InternViTConfig, dtype):
    if cfg.norm_type == "rms_norm":
        return L.rmsnorm_init(cfg.hidden_size, dtype)
    return L.layernorm_init(cfg.hidden_size, dtype)


def _norm(x, p, cfg: InternViTConfig):
    if cfg.norm_type == "rms_norm":
        return L.rmsnorm(x, p, cfg.layer_norm_eps)
    return L.layernorm(x, p, cfg.layer_norm_eps)


def init_vision_params(key, cfg: InternViTConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 3 + cfg.num_layers)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    patch_dim = 3 * cfg.patch_size ** 2
    params = {
        "patch_embed": {**L.dense_init(keys[0], patch_dim, h, dtype=dtype),
                        "b": jnp.zeros((h,), dtype)},
        "cls_token": jnp.zeros((h,), dtype),
        "pos_embed": jax.random.normal(
            keys[1], (cfg.num_patches + 1, h), dtype) * 0.02,
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        bk = jax.random.split(keys[3 + i], 6)
        blk = {
            "norm1": _norm_init(cfg, dtype),
            "norm2": _norm_init(cfg, dtype),
            "q": L.dense_init(bk[0], h, h, dtype=dtype),
            "k": L.dense_init(bk[1], h, h, dtype=dtype),
            "v": L.dense_init(bk[2], h, h, dtype=dtype),
            "proj": {**L.dense_init(bk[3], h, h, dtype=dtype),
                     "b": jnp.zeros((h,), dtype)},
            "fc1": {**L.dense_init(bk[4], h, inter, dtype=dtype),
                    "b": jnp.zeros((inter,), dtype)},
            "fc2": {**L.dense_init(bk[5], inter, h, dtype=dtype),
                    "b": jnp.zeros((h,), dtype)},
            "lambda1": jnp.full((h,), cfg.layer_scale_init, dtype),
            "lambda2": jnp.full((h,), cfg.layer_scale_init, dtype),
        }
        if cfg.attention_bias:
            for name in ("q", "k", "v"):
                blk[name]["b"] = jnp.zeros((h,), dtype)
        if cfg.use_qk_norm:
            blk["q_norm"] = L.rmsnorm_init(h, dtype)
            blk["k_norm"] = L.rmsnorm_init(h, dtype)
        params["blocks"].append(blk)
    return params


def _vision_block(x, p, cfg: InternViTConfig):
    b, s, h = x.shape
    nh, dh = cfg.num_heads, cfg.head_dim

    y = _norm(x, p["norm1"], cfg)
    q = L.dense(y, p["q"])
    k = L.dense(y, p["k"])
    v = L.dense(y, p["v"])
    if cfg.use_qk_norm:
        # QK-norm applies over the FULL embed dim, before the head split
        q = L.rmsnorm(q, p["q_norm"], 1e-6)
        k = L.rmsnorm(k, p["k_norm"], 1e-6)
    q = q.reshape(b, s, nh, dh)
    k = k.reshape(b, s, nh, dh)
    v = v.reshape(b, s, nh, dh)
    mask = jnp.ones((b, 1, s, s), bool)
    attn = L.attention(q, k, v, mask).reshape(b, s, h)
    attn = L.dense(attn, p["proj"])
    x = x + attn * p["lambda1"]

    y = _norm(x, p["norm2"], cfg)
    y = L.dense(y, p["fc1"])
    y = jax.nn.gelu(y, approximate=False)
    y = L.dense(y, p["fc2"])
    return x + y * p["lambda2"]


def vision_apply(params: Dict, pixel_values: jax.Array,
                 cfg: InternViTConfig) -> jax.Array:
    """[B, H, W, 3] -> last hidden state [B, 1 + P, hidden] (CLS first)."""
    from mllm_sparse_retrieval_tpu.models.vit import patchify

    x = patchify(pixel_values.astype(params["patch_embed"]["w"].dtype),
                 cfg.patch_size)
    x = L.dense(x, params["patch_embed"])
    cls = jnp.broadcast_to(params["cls_token"],
                           (x.shape[0], 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None]
    for blk in params["blocks"]:
        x = _vision_block(x, blk, cfg)
    return x


def pixel_shuffle(features: jax.Array, scale: float) -> jax.Array:
    """[B, W, H, C] -> [B, W*s, H*s, C/s^2], HF InternVL convention
    (modeling_internvl.py pixel_shuffle, including the axis swaps)."""
    b, w, h, c = features.shape
    features = features.reshape(b, w, int(h * scale), int(c / scale))
    features = jnp.transpose(features, (0, 2, 1, 3))
    features = features.reshape(b, int(h * scale), int(w * scale),
                                int(c / (scale * scale)))
    return jnp.transpose(features, (0, 2, 1, 3))


def image_features(params: Dict, pixel_values: jax.Array,
                   cfg: InternVLConfig) -> jax.Array:
    """Vision tower -> drop CLS -> pixel shuffle -> projector.
    Returns [B, num_image_tokens, text_hidden]."""
    feats = vision_apply(params["vision"], pixel_values, cfg.vision)
    feats = feats[:, 1:]                                  # drop CLS
    b, s, c = feats.shape
    grid = int(s ** 0.5)
    feats = feats.reshape(b, grid, grid, c)
    feats = pixel_shuffle(feats, cfg.downsample_ratio)
    feats = feats.reshape(b, -1, feats.shape[-1])

    p = params["projector"]
    y = L.layernorm(feats, p["ln"])
    y = L.dense(y, p["fc1"])
    y = jax.nn.gelu(y, approximate=False)
    return L.dense(y, p["fc2"])


def init_params(key, cfg: InternVLConfig, dtype=jnp.float32) -> Dict:
    kv, kp1, kp2, kt = jax.random.split(key, 4)
    shuffle_dim = int(cfg.vision.hidden_size / cfg.downsample_ratio ** 2)
    return {
        "vision": init_vision_params(kv, cfg.vision, dtype),
        "projector": {
            "ln": L.layernorm_init(shuffle_dim, dtype),
            "fc1": {**L.dense_init(kp1, shuffle_dim, cfg.text.hidden_size,
                                   dtype=dtype),
                    "b": jnp.zeros((cfg.text.hidden_size,), dtype)},
            "fc2": {**L.dense_init(kp2, cfg.text.hidden_size,
                                   cfg.text.hidden_size, dtype=dtype),
                    "b": jnp.zeros((cfg.text.hidden_size,), dtype)},
        },
        "text": llama.init_params(kt, cfg.text, dtype),
    }


def encode(
    params: Dict,
    cfg: InternVLConfig,
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
    """(sparse_weights [B, V], dense_embs [B, H])."""
    from mllm_sparse_retrieval_tpu.models import reps as R
    from mllm_sparse_retrieval_tpu.models.mllm import splice_image_embeddings

    lget = (lambda name: lora.get(name) if lora else None)
    embeds = llama.embed_tokens(params["text"], input_ids)
    if pixel_values is not None:
        if pixel_values.ndim == 5:
            # dynamic tiling: [B, max_tiles, S, S, 3] -> per-tile features
            # concatenated in tile order (valid tiles lead; zero-padding
            # tiles trail and are never spliced — the prompt carries exactly
            # num_image_tokens x n_valid_tiles image tokens).
            b, mt = pixel_values.shape[:2]
            flat = pixel_values.reshape((b * mt,) + pixel_values.shape[2:])
            feats = image_features(params, flat, cfg)
            feats = feats.reshape(b, mt * feats.shape[1], feats.shape[2])
        else:
            feats = image_features(params, pixel_values, cfg)
        is_image = input_ids == cfg.image_token_id
        embeds = splice_image_embeddings(embeds, feats.astype(embeds.dtype),
                                         is_image)
    hidden = llama.apply(params["text"], embeds, attention_mask, cfg.text,
                         lget("text"), remat=remat,
                         allow_flash=allow_flash, lora_rng=lora_rng,
                         lora_dropout=lora_dropout)
    head = llama.lm_head_weight(params["text"], cfg.text)
    return R.extract_reps(hidden, attention_mask, head, reps_loc)

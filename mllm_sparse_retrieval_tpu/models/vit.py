"""Vision tower: CLIP-style ViT, TPU-first.

Patch embedding is expressed as reshape + matmul (a conv with stride ==
kernel is exactly a patchwise matmul — this keeps the op on the MXU with no
convolution lowering). Blocks are pre-LN with GELU MLPs; the feature output
is a selectable hidden layer with the CLS token dropped, matching LLaVA's
``vision_feature_layer=-2`` / ``vision_feature_select_strategy='default'``
defaults used by the reference's HF vision towers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.models import layers as L


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    feature_layer: int = -2       # hidden layer used as image features
    use_cls_token: bool = True
    act: str = "quick_gelu"       # CLIP towers use quick_gelu; 'gelu' for others

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_cls_token else 0)


def init_params(key, cfg: ViTConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 4 + cfg.num_layers)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    params = {
        "patch_embed": L.dense_init(keys[0], patch_dim, cfg.hidden_size,
                                    dtype=dtype),
        "pos_embed": jax.random.normal(
            keys[1], (cfg.seq_len, cfg.hidden_size), dtype) * 0.02,
        "pre_ln": L.layernorm_init(cfg.hidden_size, dtype),
        "blocks": [],
    }
    if cfg.use_cls_token:
        params["cls_token"] = jax.random.normal(
            keys[2], (cfg.hidden_size,), dtype) * 0.02
    for i in range(cfg.num_layers):
        bk = jax.random.split(keys[4 + i], 4)
        h, m = cfg.hidden_size, cfg.hidden_size * cfg.mlp_ratio
        params["blocks"].append({
            "ln1": L.layernorm_init(h, dtype),
            "qkv": L.dense_init(bk[0], h, 3 * h, dtype=dtype),
            "out": L.dense_init(bk[1], h, h, dtype=dtype),
            "ln2": L.layernorm_init(h, dtype),
            "fc1": L.dense_init(bk[2], h, m, dtype=dtype),
            "fc2": L.dense_init(bk[3], m, h, dtype=dtype),
        })
    return params


def patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] -> [B, P, patch*patch*3] without convolution."""
    b, h, w, c = pixel_values.shape
    gh, gw = h // patch, w // patch
    x = pixel_values.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, c]
    return x.reshape(b, gh * gw, patch * patch * c)


def _act(x, name: str):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=True)


def _block(x, p, num_heads: int, act: str, lora: Optional[Dict] = None):
    b, t, h = x.shape
    dh = h // num_heads
    lget = (lambda name: lora.get(name) if lora else None)

    y = L.layernorm(x, p["ln1"])
    qkv = L.dense(y, p["qkv"], lget("qkv"))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, num_heads, dh)
    k = k.reshape(b, t, num_heads, dh)
    v = v.reshape(b, t, num_heads, dh)
    mask = jnp.ones((b, 1, t, t), bool)
    attn = L.attention(q, k, v, mask).reshape(b, t, h)
    x = x + L.dense(attn, p["out"], lget("out"))

    y = L.layernorm(x, p["ln2"])
    y = L.dense(y, p["fc1"], lget("fc1"))
    y = _act(y, act)
    x = x + L.dense(y, p["fc2"], lget("fc2"))
    return x


def apply(params: Dict, pixel_values: jax.Array, cfg: ViTConfig,
          lora: Optional[Dict] = None) -> jax.Array:
    """Returns patch features [B, num_patches, hidden] from ``feature_layer``.

    ``pixel_values``: [B, H, W, 3] float, already normalized on host.
    """
    x = patchify(pixel_values.astype(params["patch_embed"]["w"].dtype),
                 cfg.patch_size)
    x = L.dense(x, params["patch_embed"])
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"],
                               (x.shape[0], 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None]
    x = L.layernorm(x, params["pre_ln"])

    hidden_states = []
    for i, blk in enumerate(params["blocks"]):
        blora = None
        if lora is not None and "blocks" in lora and lora["blocks"][i]:
            blora = lora["blocks"][i]
        x = _block(x, blk, cfg.num_heads, cfg.act, blora)
        hidden_states.append(x)

    feats = hidden_states[cfg.feature_layer]
    if cfg.use_cls_token:
        feats = feats[:, 1:]  # drop CLS: LLaVA 'default' feature select
    return feats

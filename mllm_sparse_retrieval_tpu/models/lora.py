"""LoRA adapter trees: init over targeted projections, merge, save/load.

The functional counterpart of PEFT's discovery + wrapping flow
(/root/reference/src/train.py:113-152, src/utils.py:120-134): instead of
walking ``nn.Linear`` module names, the adapter is a parallel pytree aligned
with the model params — language-model projections by default (every linear
except the LM head, as the reference's ``find_all_linear_names`` does),
optionally the vision tower and/or projector
(``train_vision_lora`` / ``train_projector_lora``).

Merging folds each low-rank delta into its dense weight, matching PEFT's
``merge_and_unload`` at inference (/root/reference/src/model.py:179-182).
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.models import layers as L
from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig

# Per-submodule linear names eligible for adapters (LM head excluded, matching
# the reference's exclusion in utils.py:120-134).
TEXT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")
VISION_TARGETS = ("qkv", "out", "fc1", "fc2")
PROJECTOR_TARGETS = ("fc1", "fc2")


def init_lora(
    key,
    params: Dict,
    cfg: MLLMConfig,
    rank: int = 8,
    alpha: float = 16.0,
    train_vision: bool = False,
    train_projector: bool = False,
    dtype=jnp.float32,
) -> Dict:
    """Build a LoRA tree aligned with ``params``."""
    lora: Dict = {}

    def make(key, w):
        return L.lora_init(key, w.shape[0], w.shape[1], rank, alpha, dtype)

    n_text = len(params["text"]["blocks"])
    keys = jax.random.split(key, 3)
    tkeys = jax.random.split(keys[0], n_text * len(TEXT_TARGETS))
    text_blocks = []
    ki = 0
    for blk in params["text"]["blocks"]:
        entry = {}
        for name in TEXT_TARGETS:
            if name in blk:   # MoE blocks have no dense gate/up/down —
                entry[name] = make(tkeys[ki], blk[name]["w"])
            ki += 1           # experts are not LoRA targets (attn only)
        text_blocks.append(entry)
    lora["text"] = {"blocks": text_blocks}

    if train_vision:
        n_vis = len(params["vision"]["blocks"])
        vkeys = jax.random.split(keys[1], n_vis * len(VISION_TARGETS))
        vis_blocks = []
        ki = 0
        for blk in params["vision"]["blocks"]:
            entry = {}
            for name in VISION_TARGETS:
                entry[name] = make(vkeys[ki], blk[name]["w"])
                ki += 1
            vis_blocks.append(entry)
        lora["vision"] = {"blocks": vis_blocks}

    if train_projector:
        pkeys = jax.random.split(keys[2], len(PROJECTOR_TARGETS))
        lora["projector"] = {
            name: make(pkeys[i], params["projector"][name]["w"])
            for i, name in enumerate(PROJECTOR_TARGETS)
        }
    return lora


def merge_lora(params: Dict, lora: Dict) -> Dict:
    """Fold adapters into dense weights; returns new params (inputs unchanged)."""
    merged = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree

    def merge_block(pblk: Dict, lblk: Dict) -> Dict:
        out = dict(pblk)
        for name, entry in lblk.items():
            out[name] = L.merge_lora_into_dense(pblk[name], entry)
        return out

    if "text" in lora:
        merged["text"] = dict(params["text"])
        merged["text"]["blocks"] = [
            merge_block(p, l) for p, l in
            zip(params["text"]["blocks"], lora["text"]["blocks"])]
    if "vision" in lora:
        merged["vision"] = dict(params["vision"])
        merged["vision"]["blocks"] = [
            merge_block(p, l) for p, l in
            zip(params["vision"]["blocks"], lora["vision"]["blocks"])]
    if "projector" in lora:
        merged["projector"] = merge_block(params["projector"],
                                          lora["projector"])
    return merged


def num_lora_params(lora: Dict) -> int:
    leaves = [x for x in jax.tree_util.tree_leaves(lora)
              if hasattr(x, "size") and x.ndim >= 2]
    return sum(int(x.size) for x in leaves)


def save_lora(lora: Dict, path: str) -> None:
    host = jax.tree_util.tree_map(lambda x: jax.device_get(x), lora)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_lora(path: str) -> Dict:
    with open(path, "rb") as f:
        host = pickle.load(f)
    return jax.tree_util.tree_map(jnp.asarray, host)

"""Representation heads: padding-aware last-token gather, dense + sparse reps.

Implements the PromptReps extraction the reference performs per forward pass
(/root/reference/src/model.py:72-104):

- ``reps_loc='before_pad'``: read the position of the last *non-pad* token,
  computed as ``attention_mask.sum(-1) - 1`` per sample;
- ``reps_loc='after_pad'``: read the raw final position ``[:, -1]``;
- dense embedding = final-layer hidden state at that position;
- sparse vocab weights = ``log(1 + relu(logits))`` at that position.

TPU-first difference: the LM head is applied only at the selected position —
``h_sel [B, H] @ W_head [H, V]`` — instead of materializing ``[B, T, V]``
logits for the whole sequence and then indexing (the reference's approach,
/root/reference/src/model.py:96). For T=100, V=128K that is a 100× logits
memory/FLOP reduction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.configs import RepsLoc


def select_rep_positions(attention_mask: jax.Array, reps_loc: RepsLoc) -> jax.Array:
    """[B, T] mask -> [B] gather positions."""
    if reps_loc == RepsLoc.AFTER_PAD:
        t = attention_mask.shape[1]
        return jnp.full((attention_mask.shape[0],), t - 1, jnp.int32)
    return attention_mask.astype(jnp.int32).sum(axis=-1) - 1


def extract_reps(
    hidden: jax.Array,          # [B, T, H] final-layer hidden states
    attention_mask: jax.Array,  # [B, T]
    head_weight: jax.Array,     # [H, V] lm head
    reps_loc: RepsLoc = RepsLoc.BEFORE_PAD,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (sparse_weights [B, V] float32, dense_embs [B, H])."""
    pos = select_rep_positions(attention_mask, reps_loc)
    batch = jnp.arange(hidden.shape[0])
    h_sel = hidden[batch, pos]                              # [B, H]
    logits = jnp.dot(h_sel, head_weight,
                     preferred_element_type=jnp.float32)    # [B, V]
    sparse = jnp.log1p(jax.nn.relu(logits))
    return sparse, h_sel


def normalize(embs: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along the last axis (torch.nn.functional.normalize
    semantics: denominator clamped at eps)."""
    norm = jnp.linalg.norm(embs.astype(jnp.float32), axis=-1, keepdims=True)
    return (embs.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(embs.dtype)


def cosine_similarity_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Normalized similarity matrix (reference compute_similarity,
    /root/reference/src/model.py:162-165)."""
    return normalize(a) @ normalize(b).T

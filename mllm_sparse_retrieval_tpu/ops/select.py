"""On-device sparse term selection: top-k on TPU, strings stay on host.

The reference pulls the full ``[B, V]`` logits tensor to host and runs
term selection per sample in numpy/torch (/root/reference/src/encode.py:
338-377) — 64 MB per batch at Llama-3 vocab size. Here the top-k runs on
device and only ``[B, k]`` ids+values cross to host:

- image / manual / fallback vectors: plain ``lax.top_k`` over the vocab;
- text vectors: logits gathered at the caption's candidate token ids
  (padded ``[B, C]`` with a validity mask), top-k within candidates.

Candidate ids must be sorted ascending per row (as ``text_candidate_ids``
returns them) so device tie-breaking (first occurrence wins in ``top_k``)
matches the host golden implementation's ``(-value, index)`` stable sort.

Expansion terms (``num_expanded_tokens > 0``): the device takes an
over-provisioned top-(exp_k + exclusion_bound) over the filtered-id pool
(``filtered_topk``); the host drops the per-sample excluded ids (selected
top-k for images, caption candidates for text) and keeps the first exp_k —
exact, because removing ≤ bound elements from a ranking leaves the remaining
order intact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = jnp.finfo(jnp.float32).min


@functools.partial(jax.jit, static_argnames=("k",))
def vocab_topk(sparse_logits: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the full vocabulary: (values [B,k], token ids [B,k])."""
    k = min(k, sparse_logits.shape[1])
    return lax.top_k(sparse_logits.astype(jnp.float32), k)


@functools.partial(jax.jit, static_argnames=("k",))
def candidate_topk(
    sparse_logits: jax.Array,  # [B, V] float
    cand_ids: jax.Array,       # [B, C] int32, sorted ascending, padded
    cand_mask: jax.Array,      # [B, C] bool, True = real candidate
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k of logits restricted to per-sample candidate ids.

    Returns (values [B,k], token ids [B,k], counts [B]). Rows are valid only
    up to ``min(counts[b], k)`` entries; padding candidates score -inf and
    sort last.
    """
    c = cand_ids.shape[1]
    k = min(k, c)
    gathered = jnp.take_along_axis(
        sparse_logits.astype(jnp.float32), cand_ids, axis=1)      # [B, C]
    gathered = jnp.where(cand_mask, gathered, NEG_INF)
    vals, pos = lax.top_k(gathered, k)
    ids = jnp.take_along_axis(cand_ids, pos, axis=1)
    counts = cand_mask.sum(axis=1).astype(jnp.int32)
    return vals, ids, counts


@functools.partial(jax.jit, static_argnames=("k",))
def filtered_topk(
    sparse_logits: jax.Array,   # [B, V] float
    filtered_mask: jax.Array,   # [V] bool, True = expansion-eligible id
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the filtered-id pool only: (values [B,k], ids [B,k]).

    Used for expansion terms: caller over-provisions k by its per-sample
    exclusion bound and drops excluded ids on host.
    """
    k = min(k, sparse_logits.shape[1])
    masked = jnp.where(filtered_mask[None, :],
                       sparse_logits.astype(jnp.float32), NEG_INF)
    return lax.top_k(masked, k)


def pad_candidates(rows, pad_multiple: int = 64):
    """Host helper: list of sorted id arrays -> (ids [B, C], mask [B, C])."""
    import numpy as np

    longest = max((len(r) for r in rows), default=1)
    c = max(-(-max(longest, 1) // pad_multiple) * pad_multiple, pad_multiple)
    ids = np.zeros((len(rows), c), np.int32)
    mask = np.zeros((len(rows), c), bool)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = True
    return ids, mask

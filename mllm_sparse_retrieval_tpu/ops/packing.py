"""Single-fetch top-k results: pack (scores, idx) into ONE int32 array.

Every device array the host resolves pays a full link round trip (~30 ms
through thin-link relays); fusing the two top-k outputs into one [B, 2k]
array halves per-chunk result latency for both index engines (impact and
dense MIPS).

The packed dtype is int32 with the SCORES bitcast, not float32 with the
indices bitcast: doc ids are < 2^23, whose f32 bit patterns are denormals,
and the v5e flushes denormals to zero somewhere in the copy pipeline of
some lowerings (measured: a packed-f32 MIPS program returned every index
as 0 on chip while the identical program on CPU was exact). Integer lanes
have no denormals, so int32 packing round-trips any score/index bits
exactly on every backend.

Note ties: recompiling the top-k epilogue can change XLA's ordering WITHIN
equal-score groups (observed on v5e) — the (score, id) multiset is
unchanged, which is the retrieval semantics Lucene/FAISS guarantee too.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax


def pack_topk(scores: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(scores [B,k] f32, idx [B,k] int) -> [B, 2k] i32 (traced context)."""
    return jnp.concatenate(
        [lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.int32),
         idx.astype(jnp.int32)],
        axis=1)


def unpack_topk(packed: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of ``pack_topk`` (exact bit round trip)."""
    k = packed.shape[1] // 2
    scores = np.ascontiguousarray(packed[:, :k]).view(np.float32)
    return scores, packed[:, k:]


def pack_blocks(blocks) -> jnp.ndarray:
    """Concat mixed-dtype [B, w] blocks into one [B, sum(w)] i32 array
    (traced context). ``blocks`` is a sequence of (array, is_float) pairs;
    float blocks are bitcast (int32 packing for the same denormal-flush
    reason as ``pack_topk``). A [B] vector may be passed and is widened to
    [B, 1]. Used by the encode pipeline to resolve a batch's entire
    device output in ONE fetch."""
    parts = []
    for a, is_float in blocks:
        if a.ndim == 1:
            a = a[:, None]
        if is_float:
            parts.append(lax.bitcast_convert_type(
                a.astype(jnp.float32), jnp.int32))
        else:
            parts.append(a.astype(jnp.int32))
    return jnp.concatenate(parts, axis=1)


def unpack_blocks(packed: np.ndarray, spec):
    """Host-side inverse of ``pack_blocks``: ``spec`` is a sequence of
    (width, is_float) pairs matching the packed layout."""
    out, off = [], 0
    for w, is_float in spec:
        blk = packed[:, off:off + w]
        off += w
        out.append(np.ascontiguousarray(blk).view(np.float32)
                   if is_float else blk)
    if off != packed.shape[1]:
        raise ValueError(f"spec covers {off} of {packed.shape[1]} columns")
    return out

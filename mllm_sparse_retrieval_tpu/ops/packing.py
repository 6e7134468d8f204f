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


def pack_topk48(scores: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(scores [B,k], idx [B,k]) -> [B, 3k] uint16: 6 wire bytes per result
    pair instead of ``pack_topk``'s 8 (traced context).

    For INTEGER-scored searches only (impact indexes): scores are clamped to
    [0, 2^24-1] — the same < 2^24 envelope f32 integer exactness already
    requires — and doc positions must be < 2^23 (single-chip corpora cap at
    ~300k docs, far below). Negative/-inf scores (rows with fewer than k
    valid docs) clamp to 0, which the resolve path already drops — identical
    semantics to the int32 wire. Layout: three [B, k] uint16 lanes
    ``(score_hi8 << 8) | idx_hi7``, ``score_lo16``, ``idx_lo16``.

    Why: at depth 1000 the packed result is the dominant device->host
    transfer (8 MB per 1024-query batch on the int32 wire); thin links
    (~25-30 MB/s relays) make the fetch the serving bottleneck, and 25%
    fewer bytes is 25% off that leg. On directly-attached hosts either wire
    is negligible.
    """
    s = jnp.clip(scores.astype(jnp.float32), 0.0, 16777215.0)
    s = s.astype(jnp.int32)
    i = idx.astype(jnp.int32)
    lane0 = ((s >> 16) << 8) | (i >> 16)
    return jnp.concatenate([lane0, s & 0xFFFF, i & 0xFFFF],
                           axis=1).astype(jnp.uint16)


def unpack_topk48(packed: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of ``pack_topk48`` -> (scores f32, idx i32)."""
    a = np.asarray(packed).astype(np.int32)
    k = a.shape[1] // 3
    l0, l1, l2 = a[:, :k], a[:, k:2 * k], a[:, 2 * k:]
    scores = (((l0 >> 8) << 16) | l1).astype(np.float32)
    idx = ((l0 & 0xFF) << 16) | l2
    return scores, idx


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

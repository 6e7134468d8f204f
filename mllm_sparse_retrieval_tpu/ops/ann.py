"""Approximate MIPS: low-rank prefilter + exact rescore, single-chip & mesh.

The reference serves FAISS *flat* (exact) search only
(/root/reference/src/search.py:227-270). This is the beyond-reference ANN
path, shaped for the TPU rather than ported from FAISS's cell-probe /
graph designs, whose data-dependent traversal does not map to XLA's
static-shape compilation model:

- **Stage 1 — low-rank scoring.** Queries and corpus are projected to
  ``rank`` dimensions with an IP-preserving PCA basis (no centering: MIPS
  ranks by inner product, and an orthonormal basis truncation is the
  rank-constrained projection minimizing E||x - PPᵀx||²). The [B, N]
  score pass is a ``rank/d``-cost MXU matmul.
- **Stage 2 — TPU-native selection.** ``lax.approx_max_k`` picks
  ``candidates`` per query — the hardware-optimized partial reduction
  (bitonic on aggregated tiles) that replaces cell probing; its
  ``recall_target`` is a compiled-in quality knob.
- **Stage 3 — exact rescore.** The candidate rows gather from the
  full-precision corpus and rescore with a ``precision=HIGHEST`` einsum:
  final scores match the exact path to f32 rounding (~1 ulp — the
  contraction orders differ), so ONLY the candidate set is approximate.
  Working set: B x candidates x d.

Everything is static-shaped: one compiled program per (k, candidates)
regardless of corpus content. The mesh variant row-shards both matrices,
selects ``candidates`` per shard, and merges per-shard exact top-k over
ICI exactly like ops/mips.py's sharded path (same packing contract).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mllm_sparse_retrieval_tpu.ops.packing import pack_topk
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS


def ip_projection(reps: np.ndarray, rank: int, sample: int = 65536,
                  seed: int = 0) -> np.ndarray:
    """Top-``rank`` eigenbasis of the (uncentered) Gram matrix -> [d, rank]
    f32. Uncentered on purpose: inner products, not distances, are being
    preserved, and centering would shift every score by a query-dependent
    constant that CAN reorder MIPS results."""
    x = np.asarray(reps, np.float32)
    if x.shape[0] > sample:
        keep = np.random.default_rng(seed).choice(x.shape[0], sample,
                                                  replace=False)
        x = x[keep]
    rank = min(int(rank), x.shape[1])
    gram = (x.astype(np.float64).T @ x.astype(np.float64)) / max(x.shape[0], 1)
    _, vecs = np.linalg.eigh(gram)           # ascending eigenvalues
    return np.ascontiguousarray(vecs[:, ::-1][:, :rank]).astype(np.float32)


def _rescore_exact(q: jax.Array, corpus: jax.Array, c_idx: jax.Array
                   ) -> jax.Array:
    """Gather candidate rows and rescore at full precision: [B, C] f32
    scores matching the exact path's to f32 rounding for the same rows."""
    cand = jnp.take(corpus, c_idx, axis=0)   # [B, C, d]
    return jnp.einsum("bd,bcd->bc", q, cand,
                      preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)


@functools.partial(jax.jit,
                   static_argnames=("k", "candidates", "recall_target"))
def ann_topk_packed(
    q: jax.Array,          # [B, d]
    corpus: jax.Array,     # [N, d] full-precision rows
    corpus_r: jax.Array,   # [N, r] projected rows
    proj: jax.Array,       # [d, r] projection basis
    k: int,
    candidates: int,
    recall_target: float = 0.95,
) -> jax.Array:
    """Single-device approximate MIPS, packed single-fetch form
    (``ops.packing.unpack_topk`` inverts — the DenseFlatIndex contract)."""
    q_r = jnp.dot(q, proj, preferred_element_type=jnp.float32)
    s1 = jnp.dot(q_r, corpus_r.T, preferred_element_type=jnp.float32)
    _, c_idx = lax.approx_max_k(s1, candidates, recall_target=recall_target)
    scores = _rescore_exact(q, corpus, c_idx)
    vals, pos = lax.top_k(scores, k)
    return pack_topk(vals, jnp.take_along_axis(c_idx, pos, axis=1))


def _ann_local(q, corpus_shard, corpus_r_shard, proj, *, n_valid, k, k_local,
               candidates, recall_target):
    """Per-shard stage1 + select + exact rescore + local top-k, then the
    ICI candidate merge (inside shard_map; mirrors ops/mips.py's
    _local_then_global_topk)."""
    shard_rows = corpus_shard.shape[0]
    base = lax.axis_index(DATA_AXIS) * shard_rows
    q_r = jnp.dot(q, proj, preferred_element_type=jnp.float32)
    s1 = jnp.dot(q_r, corpus_r_shard.T, preferred_element_type=jnp.float32)
    row_ids = base + lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
    s1 = jnp.where(row_ids < n_valid, s1, -jnp.inf)
    _, c_idx = lax.approx_max_k(s1, candidates,
                                recall_target=recall_target)
    scores = _rescore_exact(q, corpus_shard, c_idx)
    gidx = c_idx + base
    # padding rows can sneak into tiny shards' candidate sets; re-mask
    scores = jnp.where(gidx < n_valid, scores, -jnp.inf)
    local_vals, local_pos = lax.top_k(scores, k_local)
    local_gidx = jnp.take_along_axis(gidx, local_pos, axis=1)
    all_vals = lax.all_gather(local_vals, DATA_AXIS, axis=1, tiled=True)
    all_gidx = lax.all_gather(local_gidx, DATA_AXIS, axis=1, tiled=True)
    vals, pos = lax.top_k(all_vals, k)
    return vals, jnp.take_along_axis(all_gidx, pos, axis=1)


@functools.lru_cache(maxsize=64)
def _sharded_ann_fn(mesh: Mesh, n_valid: int, k: int, k_local: int,
                    candidates: int, recall_target: float):
    """Cached jitted shard_map program per (mesh, statics) — same retrace
    rule as ops/mips._sharded_mips_fn."""
    fn = shard_map(
        functools.partial(_ann_local, n_valid=n_valid, k=k, k_local=k_local,
                          candidates=candidates,
                          recall_target=recall_target),
        mesh=mesh,
        in_specs=(P(None, None), P(DATA_AXIS, None), P(DATA_AXIS, None),
                  P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_ann_topk(
    mesh: Mesh,
    q: jax.Array,            # [B, d] replicated
    corpus_sharded: jax.Array,    # [N_padded, d] row-sharded (data axis)
    corpus_r_sharded: jax.Array,  # [N_padded, r] row-sharded alike
    proj: jax.Array,              # [d, r] replicated
    n_valid: int,
    k: int,
    candidates: int,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate MIPS over a row-sharded corpus. ``candidates`` applies
    PER SHARD (the union candidate pool grows with the mesh — recall can
    only improve as shards are added). Same padding/n_valid contract as
    ``sharded_mips_topk``."""
    shard_rows = corpus_sharded.shape[0] // mesh.shape[DATA_AXIS]
    k = min(k, n_valid)
    k_local = min(k, shard_rows)
    candidates = max(min(candidates, shard_rows), k_local)
    fn = _sharded_ann_fn(mesh, n_valid, k, k_local, candidates,
                         float(recall_target))
    return fn(q, corpus_sharded, corpus_r_sharded, proj)


# ---- doc-filter variants (round 7) -------------------------------------------
# Appended (warm-cache rule). Masking happens on the STAGE-1 scores, so
# the candidate pool itself is drawn from allowed rows only — filter
# selectivity cannot starve the rescore pool below min(candidates,
# n_allowed); the rescore re-mask keeps -inf on any padding stragglers.


@functools.partial(jax.jit,
                   static_argnames=("k", "candidates", "recall_target"))
def ann_topk_packed_filtered(
    q: jax.Array,
    corpus: jax.Array,
    corpus_r: jax.Array,
    proj: jax.Array,
    mask: jax.Array,        # [N] bool
    k: int,
    candidates: int,
    recall_target: float = 0.95,
) -> jax.Array:
    """`ann_topk_packed` restricted to mask-allowed rows."""
    q_r = jnp.dot(q, proj, preferred_element_type=jnp.float32)
    s1 = jnp.dot(q_r, corpus_r.T, preferred_element_type=jnp.float32)
    s1 = jnp.where(mask[None, :], s1, -jnp.inf)
    _, c_idx = lax.approx_max_k(s1, candidates, recall_target=recall_target)
    scores = _rescore_exact(q, corpus, c_idx)
    scores = jnp.where(jnp.take(mask, c_idx), scores, -jnp.inf)
    vals, pos = lax.top_k(scores, k)
    return pack_topk(vals, jnp.take_along_axis(c_idx, pos, axis=1))


def _ann_local_filtered(q, corpus_shard, corpus_r_shard, proj, mask_shard,
                        *, n_valid, k, k_local, candidates, recall_target):
    shard_rows = corpus_shard.shape[0]
    base = lax.axis_index(DATA_AXIS) * shard_rows
    q_r = jnp.dot(q, proj, preferred_element_type=jnp.float32)
    s1 = jnp.dot(q_r, corpus_r_shard.T, preferred_element_type=jnp.float32)
    row_ids = base + lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
    s1 = jnp.where((row_ids < n_valid) & mask_shard[None, :], s1, -jnp.inf)
    _, c_idx = lax.approx_max_k(s1, candidates,
                                recall_target=recall_target)
    scores = _rescore_exact(q, corpus_shard, c_idx)
    gidx = c_idx + base
    allowed = jnp.take(mask_shard, c_idx) & (gidx < n_valid)
    scores = jnp.where(allowed, scores, -jnp.inf)
    local_vals, local_pos = lax.top_k(scores, k_local)
    local_gidx = jnp.take_along_axis(gidx, local_pos, axis=1)
    all_vals = lax.all_gather(local_vals, DATA_AXIS, axis=1, tiled=True)
    all_gidx = lax.all_gather(local_gidx, DATA_AXIS, axis=1, tiled=True)
    vals, pos = lax.top_k(all_vals, k)
    return vals, jnp.take_along_axis(all_gidx, pos, axis=1)


@functools.lru_cache(maxsize=64)
def _sharded_ann_fn_filtered(mesh: Mesh, n_valid: int, k: int, k_local: int,
                             candidates: int, recall_target: float):
    fn = shard_map(
        functools.partial(_ann_local_filtered, n_valid=n_valid, k=k,
                          k_local=k_local, candidates=candidates,
                          recall_target=recall_target),
        mesh=mesh,
        in_specs=(P(None, None), P(DATA_AXIS, None), P(DATA_AXIS, None),
                  P(None, None), P(DATA_AXIS)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_ann_topk_filtered(mesh, q, corpus_sharded, corpus_r_sharded,
                              proj, mask_sharded, n_valid, k, candidates,
                              recall_target=0.95):
    """`sharded_ann_topk` restricted to mask-allowed rows (mask row-sharded
    like the corpus; candidates apply per shard, drawn from allowed rows)."""
    shard_rows = corpus_sharded.shape[0] // mesh.shape[DATA_AXIS]
    k = min(k, n_valid)
    k_local = min(k, shard_rows)
    candidates = max(min(candidates, shard_rows), k_local)
    fn = _sharded_ann_fn_filtered(mesh, n_valid, k, k_local, candidates,
                                  float(recall_target))
    return fn(q, corpus_sharded, corpus_r_sharded, proj, mask_sharded)

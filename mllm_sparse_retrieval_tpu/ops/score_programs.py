"""Jitted device-scoring programs for the impact index.

Kept in their own leaf module ON PURPOSE: XLA's persistent compilation
cache keys include each op's source location, so any edit that shifts line
numbers in the defining file re-keys every program here — and the Pallas
TAAT program costs minutes to recompile through a remote-compile relay.
``index/impact.py`` (the frequently edited orchestration layer) imports
from here; edit THIS file only when the programs themselves change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS

@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("lane_w", "kernel_layout"))
def _scatter_block(mat, rows, cols, vals, lane_w, kernel_layout):
    """In-place CSR-triple scatter into the (donated) scoring matrix.
    ``kernel_layout`` matrices are [T+1, s, n_pad/s] — doc column c lives
    at (c // lane_w, c % lane_w). Padding triples target (row 0, col 0)
    with weight 0, which row 0's zero invariant absorbs (duplicates all
    write the same 0, so scatter-set stays deterministic)."""
    if kernel_layout:
        return mat.at[rows, cols // lane_w, cols % lane_w].set(
            vals, mode="drop")
    return mat.at[rows, cols].set(vals, mode="drop")


def _query_table(q_idx, q_w, num_rows):
    """Accumulate query weights into a dense [B, num_rows] table.

    Term t maps to column t+1; padded/non-positive entries route to the dead
    column 0. Duplicate term idxs (string-collision sums) add.

    Implemented as a scan of compare-select-add steps over the (small) query
    width rather than a scatter: XLA scatters at [B, T] scale lower to slow
    serialized updates on TPU and blow up remote compile time, while this
    form is pure VPU work that compiles in seconds.
    """
    b = q_idx.shape[0]
    cols = lax.broadcasted_iota(jnp.int32, (1, num_rows), 1)   # [1, rows]
    safe_idx = jnp.where(q_w > 0, q_idx + 1, 0)

    def step(table, term):
        idx, w = term                                          # [B], [B]
        hit = cols == idx[:, None]
        return table + jnp.where(hit, w[:, None], 0.0), None

    table0 = jnp.zeros((b, num_rows), jnp.float32)
    table, _ = lax.scan(step, table0, (safe_idx.T, q_w.T))
    return table


def _scores_from_matrix(matrix, q_idx, q_w):
    """[B, N_pad] impact scores = query table @ dense impact matrix.

    ``precision=HIGHEST`` keeps f32 integer weights exact on the MXU (scores
    are sums of integer products; the default bf16 passes would round
    weights > 256 and break Lucene-score parity).
    """
    table = _query_table(q_idx, q_w, matrix.shape[0])
    return jnp.dot(table, matrix, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)


def _taat_scores(matrix, q_idx, q_w):
    """Per-query Pallas TAAT scoring (traced context; q_idx = raw term ids).

    Shifts ids to matrix rows (+1), routes padding to the dead zero row, and
    runs interpreted on non-TPU backends (tests)."""
    from mllm_sparse_retrieval_tpu.ops.impact_kernel import impact_scores_taat

    safe_idx = jnp.where(q_w > 0, q_idx + 1, 0).astype(jnp.int32)
    safe_w = jnp.where(q_w > 0, q_w, 0.0).astype(jnp.float32)
    interpret = jax.default_backend() != "tpu"
    return impact_scores_taat(matrix, safe_idx, safe_w, interpret=interpret)


def _masked_topk(scores, n_valid, k):
    col_ids = lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
    scores = jnp.where(col_ids < n_valid, scores, -jnp.inf)
    return lax.top_k(scores, k)


# one packed result array per chunk = one host fetch (see ops/packing.py
# for the rationale and the tie-ordering note)
from mllm_sparse_retrieval_tpu.ops.packing import (
    pack_topk as _pack_results, unpack_topk as _unpack_results)


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _impact_topk(matrix, q_idx, q_w, n_valid, k):
    # accepts the compact int16 upload form (see _compact_queries); the
    # upcast is a trivial device op, the transfer saving is the point
    q_idx = q_idx.astype(jnp.int32)
    q_w = q_w.astype(jnp.float32)
    return _pack_results(*_masked_topk(
        _scores_from_matrix(matrix, q_idx, q_w), n_valid, k))


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _taat_topk(matrix, q_idx, q_w, n_valid, k):
    q_idx = q_idx.astype(jnp.int32)  # compact int16 upload form supported
    q_w = q_w.astype(jnp.float32)
    return _pack_results(*_masked_topk(
        _taat_scores(matrix, q_idx, q_w), n_valid, k))


# A head/tail split backend ('taat-split': hottest n_head df-ordered rows
# scored as one MXU matmul, Zipf-tail terms compacted left and walked by the
# kernel) was built, measured, and DELETED in round 5: at the headline shape
# (25k docs, Zipf queries, batch 4096) it ran 0.86x plain taat at head 512
# and 0.93x at head 2048 even though the head absorbed 65-78% of query term
# slots — the HIGHEST-precision head matmul plus the per-query tail argsort
# cost more than the kernel slots they removed, and at 200k docs the f32
# head matmul alone (~140 ms/batch) exceeds the whole kernel's budget.
# Numbers and analysis in BASELINE.md.


def _sharded_merge_topk(scores, base, shard_cols, n_valid, k):
    """Per-shard top-k + ICI all-gather candidate merge (the same pattern as
    sharded dense MIPS)."""
    col_ids = base + lax.broadcasted_iota(jnp.int32, (1, shard_cols), 1)
    scores = jnp.where(col_ids < n_valid, scores, -jnp.inf)
    lv, li = lax.top_k(scores, min(k, shard_cols))
    lg = li + base
    av = lax.all_gather(lv, DATA_AXIS, axis=1, tiled=True)
    ag = lax.all_gather(lg, DATA_AXIS, axis=1, tiled=True)
    vals, pos = lax.top_k(av, k)
    return vals, jnp.take_along_axis(ag, pos, axis=1)


_SHARDED_SCORERS = {
    "matmul": (_scores_from_matrix, (2, 2)),        # q_idx, q_w: [B, Q]
    "taat": (_taat_scores, (2, 2)),                 # idem
}


@functools.lru_cache(maxsize=64)
def _sharded_topk_fn(mesh, shard_cols, n_valid, k, backend):
    """Build-and-cache the jitted shard_map program per (mesh, shapes,
    backend) — a fresh closure per call would retrace every search.

    The matmul backend shards the 2-D matrix column-wise; the TAAT backend
    takes the 4-D ``[D, T+1, s, shard/s]`` pre-shaped layout sharded on the
    leading axis, so each shard hands the kernel its native 3-D form with no
    in-trace relayout (the local ``m[0]`` drops a unit leading dim — a
    layout-preserving reshape, not a copy)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    scores_fn, query_ndims = _SHARDED_SCORERS[backend]
    kernel_layout = backend != "matmul"

    def local_fn(m, *query_args):
        base = lax.axis_index(DATA_AXIS) * shard_cols
        local = m[0] if kernel_layout else m
        return _pack_results(*_sharded_merge_topk(
            scores_fn(local, *query_args), base, shard_cols, n_valid, k))

    query_specs = tuple(P(*(None,) * nd) for nd in query_ndims)
    matrix_spec = P(DATA_AXIS, None, None, None) if kernel_layout \
        else P(None, DATA_AXIS)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(matrix_spec,) + query_specs,
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(fn)


def _sharded_impact_topk(mesh, matrix, q_idx, q_w, n_valid, k):
    """Doc-column-sharded matmul scoring + ICI merge."""
    shard_cols = matrix.shape[1] // mesh.shape[DATA_AXIS]
    fn = _sharded_topk_fn(mesh, shard_cols, n_valid, k, "matmul")
    return fn(matrix, q_idx, q_w)


def _sharded_taat_topk(mesh, matrix, q_idx, q_w, n_valid, k):
    """Doc-column-sharded per-query TAAT scoring + ICI merge. ``matrix`` is
    the 4-D mesh kernel layout; shard d's doc block is contiguous, so global
    doc ids are ``d * shard_cols + local column``."""
    shard_cols = matrix.shape[2] * matrix.shape[3]
    fn = _sharded_topk_fn(mesh, shard_cols, n_valid, k, "taat")
    return fn(matrix, q_idx, q_w)



# ---- compact wire variants (round 6) ----------------------------------------
# Appended AFTER the existing programs on purpose: the jit-traced op
# locations of the functions above feed the persistent-compile-cache key,
# and keeping their line numbers stable keeps the already-compiled taat /
# matmul programs warm on the relay (see CLAUDE.md on Mosaic compile cost).
from mllm_sparse_retrieval_tpu.ops.packing import (  # noqa: E402
    pack_topk48 as _pack_results48)


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _impact_topk48(matrix, q_idx, q_w, n_valid, k):
    """`_impact_topk` with the 6-byte/result compact wire (integer scores
    only — see ops.packing.pack_topk48)."""
    q_idx = q_idx.astype(jnp.int32)
    q_w = q_w.astype(jnp.float32)
    return _pack_results48(*_masked_topk(
        _scores_from_matrix(matrix, q_idx, q_w), n_valid, k))


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _taat_topk48(matrix, q_idx, q_w, n_valid, k):
    """`_taat_topk` with the 6-byte/result compact wire."""
    q_idx = q_idx.astype(jnp.int32)
    q_w = q_w.astype(jnp.float32)
    return _pack_results48(*_masked_topk(
        _taat_scores(matrix, q_idx, q_w), n_valid, k))


# ---- doc-filter variants (round 7) -------------------------------------------
# Appended after the existing programs (same rule as the compact48 block:
# keep the warm programs' op locations stable). The filter is a [N_pad]
# bool operand; excluded docs score -inf before top_k, so they are never
# returned (the resolve paths drop non-positive scores). i32 wire only —
# the compact48 score lane is 24-bit non-negative and cannot carry the
# sentinel.


def _filtered(scores, mask):
    return jnp.where(mask[None, :], scores, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _impact_topk_filtered(matrix, q_idx, q_w, mask, n_valid, k):
    """`_impact_topk` restricted to mask-allowed doc columns."""
    q_idx = q_idx.astype(jnp.int32)
    q_w = q_w.astype(jnp.float32)
    return _pack_results(*_masked_topk(
        _filtered(_scores_from_matrix(matrix, q_idx, q_w), mask),
        n_valid, k))


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _taat_topk_filtered(matrix, q_idx, q_w, mask, n_valid, k):
    """`_taat_topk` restricted to mask-allowed doc columns."""
    q_idx = q_idx.astype(jnp.int32)
    q_w = q_w.astype(jnp.float32)
    return _pack_results(*_masked_topk(
        _filtered(_taat_scores(matrix, q_idx, q_w), mask), n_valid, k))


@functools.lru_cache(maxsize=64)
def _sharded_topk_fn_filtered(mesh, shard_cols, n_valid, k, backend):
    """Filtered counterpart of `_sharded_topk_fn`: the mask shards over the
    data axis exactly like the doc columns, so each shard filters its own
    block before the local top-k + ICI merge."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    scores_fn, query_ndims = _SHARDED_SCORERS[backend]
    kernel_layout = backend != "matmul"

    def local_fn(m, *rest):
        *query_args, mask = rest
        base = lax.axis_index(DATA_AXIS) * shard_cols
        local = m[0] if kernel_layout else m
        scores = _filtered(scores_fn(local, *query_args), mask)
        return _pack_results(*_sharded_merge_topk(
            scores, base, shard_cols, n_valid, k))

    query_specs = tuple(P(*(None,) * nd) for nd in query_ndims)
    matrix_spec = P(DATA_AXIS, None, None, None) if kernel_layout \
        else P(None, DATA_AXIS)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(matrix_spec,) + query_specs + (P(DATA_AXIS),),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(fn)


def _sharded_impact_topk_filtered(mesh, matrix, q_idx, q_w, mask,
                                  n_valid, k):
    shard_cols = matrix.shape[1] // mesh.shape[DATA_AXIS]
    fn = _sharded_topk_fn_filtered(mesh, shard_cols, n_valid, k, "matmul")
    return fn(matrix, q_idx, q_w, mask)


def _sharded_taat_topk_filtered(mesh, matrix, q_idx, q_w, mask, n_valid, k):
    shard_cols = matrix.shape[2] * matrix.shape[3]
    fn = _sharded_topk_fn_filtered(mesh, shard_cols, n_valid, k, "taat")
    return fn(matrix, q_idx, q_w, mask)


# ---- filtered compact48 variants (round 10, VERDICT r4 #8) -------------------
# Appended after the existing programs (warm-cache rule, see the compact48
# block note above). The original filter design kept filters i32-only
# because the compact 24-bit score lane cannot carry the -inf sentinel —
# but for the IMPACT engine the sentinel is redundant: ``pack_topk48``
# clamps negatives to 0 and ``ImpactIndex._resolve_encoded`` drops
# score <= 0 either way, and real impact scores are non-negative integers,
# so a masked doc can never outrank or be confused with a matching one.
# Dense filters stay i32-only: real dense scores can be negative, so a 0
# stand-in could outrank them.


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _impact_topk48_filtered(matrix, q_idx, q_w, mask, n_valid, k):
    """Filtered `_impact_topk48`: mask-excluded docs -> -inf -> clamp-to-0
    in the 48-bit pack -> dropped at resolve (score <= 0 rule)."""
    q_idx = q_idx.astype(jnp.int32)
    q_w = q_w.astype(jnp.float32)
    return _pack_results48(*_masked_topk(
        _filtered(_scores_from_matrix(matrix, q_idx, q_w), mask),
        n_valid, k))


@functools.partial(jax.jit, static_argnames=("n_valid", "k"))
def _taat_topk48_filtered(matrix, q_idx, q_w, mask, n_valid, k):
    """Filtered `_taat_topk48` (see `_impact_topk48_filtered`)."""
    q_idx = q_idx.astype(jnp.int32)
    q_w = q_w.astype(jnp.float32)
    return _pack_results48(*_masked_topk(
        _filtered(_taat_scores(matrix, q_idx, q_w), mask), n_valid, k))


# ---- mesh-incremental arena scatter (round 10, VERDICT r4 #7) ----------------
# Appended after the existing programs (warm-cache rule). Doc columns map to
# shards statically (shard = col // shard_cols), so the host routes each
# triple to its shard's block and every device scatters ONLY its local
# triples inside shard_map — no cross-device indexing, no gather, and the
# donated sharded matrix keeps its placement. Mutation-while-serving under
# a mesh therefore costs O(triples), not an O(corpus) re-placement.


@functools.lru_cache(maxsize=None)
def _sharded_scatter_fn(mesh, kernel_layout):
    """Jitted per-(mesh, layout) sharded triple scatter: matrix sharded as
    the search programs expect it (4-D ``[D, T+1, s, shard/s]`` kernel
    form on the leading axis; 2-D ``[T+1, N_pad]`` matmul form on
    columns), triples as ``[D, n]`` blocks sharded on the shard axis with
    LOCAL doc columns. Padding triples write weight 0 to (row 0, col 0),
    absorbed by row 0's zero invariant exactly as in `_scatter_block`."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_fn(m, rows, cols, vals):
        if kernel_layout:
            lane_w = m.shape[3]
            return m.at[0, rows[0], cols[0] // lane_w,
                        cols[0] % lane_w].set(vals[0], mode="drop")
        return m.at[rows[0], cols[0]].set(vals[0], mode="drop")

    matrix_spec = P(DATA_AXIS, None, None, None) if kernel_layout \
        else P(None, DATA_AXIS)
    tr_spec = P(DATA_AXIS, None)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(matrix_spec, tr_spec, tr_spec, tr_spec),
        out_specs=matrix_spec,
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))

"""Maximum-inner-product search: tiled matmul + top-k, single-chip and sharded.

TPU-native replacement for FAISS flat IP search
(/root/reference/src/search.py:227-270): the corpus embedding matrix lives in
HBM (optionally sharded row-wise across the mesh's data axis), scoring is a
bf16/f32 matmul on the MXU, and ranking is ``lax.top_k`` — per shard first,
then a global re-rank over the gathered per-shard candidates (the ICI
all-gather moves only ``shards × k`` candidates per query, not scores for the
whole corpus).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mllm_sparse_retrieval_tpu.ops.packing import pack_topk
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS


@functools.partial(jax.jit, static_argnames=("k",))
def mips_topk(
    queries: jax.Array,   # [B, d]
    corpus: jax.Array,    # [N, d]
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Single-device exact MIPS: returns (scores [B,k], indices [B,k]).

    ``precision=HIGHEST`` keeps float32 scoring exact on the MXU (the TPU
    default would down-convert operands to bf16); bf16 corpora are unaffected.
    """
    scores = jnp.dot(
        queries, corpus.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    return lax.top_k(scores, min(k, corpus.shape[0]))


@functools.partial(jax.jit, static_argnames=("k",))
def mips_topk_packed(queries: jax.Array, corpus: jax.Array, k: int
                     ) -> jax.Array:
    """``mips_topk`` with both outputs fused into one [B, 2k] **int32**
    array (scores bitcast; ``ops.packing.unpack_topk`` inverts) — one host
    fetch per chunk, the serving-path form used by ``DenseFlatIndex``."""
    return pack_topk(*mips_topk(queries, corpus, k))


def _mask_merge_topk(scores, base, n_valid, k, k_local):
    """Shared tail of the sharded scorers: mask padding rows, per-shard
    top-k, ICI candidate all-gather, global re-rank. Runs inside shard_map."""
    shard_rows = scores.shape[1]
    # Mask padding rows (global row id >= n_valid) to -inf.
    row_ids = base + lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
    scores = jnp.where(row_ids < n_valid, scores, -jnp.inf)

    local_vals, local_idx = lax.top_k(scores, k_local)
    local_gidx = local_idx + base

    all_vals = lax.all_gather(local_vals, DATA_AXIS, axis=1, tiled=True)
    all_gidx = lax.all_gather(local_gidx, DATA_AXIS, axis=1, tiled=True)
    vals, pos = lax.top_k(all_vals, k)
    gidx = jnp.take_along_axis(all_gidx, pos, axis=1)
    return vals, gidx


def _local_then_global_topk(queries, corpus_shard, n_valid, k, k_local):
    """Per-shard scoring + top-k, then cross-shard merge. Runs inside shard_map."""
    shard_idx = lax.axis_index(DATA_AXIS)
    base = shard_idx * corpus_shard.shape[0]
    scores = jnp.dot(queries, corpus_shard.T, preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
    return _mask_merge_topk(scores, base, n_valid, k, k_local)


def _q8_scores(q8, q_scale, corpus8, row_scale):
    """SQ8 scoring core: s8 x s8 -> s32 matmul on the MXU (2x the bf16
    rate on v5e, 4x less HBM traffic than f32), dequantized to f32 by the
    per-query x per-row scale outer product before ranking."""
    acc = jnp.dot(q8, corpus8.T, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (q_scale[:, None] * row_scale[None, :])


@functools.partial(jax.jit, static_argnames=("k",))
def mips_topk_packed_q8(
    q8: jax.Array,         # [B, d] int8
    q_scale: jax.Array,    # [B] f32 (per-query dequant scale)
    corpus8: jax.Array,    # [N, d] int8
    row_scale: jax.Array,  # [N] f32 (per-row dequant scale)
    k: int,
) -> jax.Array:
    """Scalar-quantized (SQ8) MIPS, packed single-fetch form.

    The FAISS ``SQ8``-class trade: approximate scores (symmetric int8
    quantization of both sides, exact int32 accumulation, f32 dequant) for
    1/4 the HBM footprint + host->device bytes of f32 and an int8-rate MXU
    pass. Ranking quality is covered by tests/test_dense_index.py; scores
    are exact whenever both sides' values are integer multiples of their
    scales (the bit-parity test's construction).
    """
    scores = _q8_scores(q8, q_scale, corpus8, row_scale)
    return pack_topk(*lax.top_k(scores, min(k, corpus8.shape[0])))


def _local_then_global_topk_q8(q8, q_scale, corpus8_shard, row_scale_shard,
                               n_valid, k, k_local):
    """SQ8 counterpart of _local_then_global_topk (inside shard_map)."""
    shard_idx = lax.axis_index(DATA_AXIS)
    base = shard_idx * corpus8_shard.shape[0]
    scores = _q8_scores(q8, q_scale, corpus8_shard, row_scale_shard)
    return _mask_merge_topk(scores, base, n_valid, k, k_local)


@functools.lru_cache(maxsize=64)
def _sharded_mips_fn(mesh: Mesh, n_valid: int, k: int, k_local: int,
                     q8: bool):
    """Build-and-cache the jitted shard_map MIPS program per (mesh, static
    params) — a fresh closure per call would retrace on EVERY chunk of a
    mesh batch_search (jax.jit caches on function identity; same pattern
    as ops/score_programs._sharded_topk_fn)."""
    local = _local_then_global_topk_q8 if q8 else _local_then_global_topk
    in_specs = (P(None, None), P(None), P(DATA_AXIS, None), P(DATA_AXIS)) \
        if q8 else (P(None, None), P(DATA_AXIS, None))
    fn = shard_map(
        functools.partial(local, n_valid=n_valid, k=k, k_local=k_local),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def _sharded_statics(mesh, n_padded, n_valid, k):
    n_shards = mesh.shape[DATA_AXIS]
    assert n_padded % n_shards == 0, "corpus must be padded to shard multiple"
    shard_rows = n_padded // n_shards
    k = min(k, n_valid)
    return k, min(k, shard_rows)


def sharded_mips_topk_q8(
    mesh: Mesh,
    q8: jax.Array,              # [B, d] int8, replicated
    q_scale: jax.Array,         # [B] f32, replicated
    corpus8_sharded: jax.Array, # [N_padded, d] int8, row-sharded (data axis)
    row_scale_sharded: jax.Array,  # [N_padded] f32, row-sharded alike
    n_valid: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """SQ8 MIPS over a row-sharded corpus with ICI candidate merge (the
    int8 form of ``sharded_mips_topk``; same padding/n_valid contract)."""
    k, k_local = _sharded_statics(mesh, corpus8_sharded.shape[0], n_valid, k)
    fn = _sharded_mips_fn(mesh, n_valid, k, k_local, True)
    return fn(q8, q_scale, corpus8_sharded, row_scale_sharded)


def sharded_mips_topk(
    mesh: Mesh,
    queries: jax.Array,        # [B, d] replicated
    corpus_sharded: jax.Array, # [N_padded, d] sharded over data axis (rows)
    n_valid: int,              # true corpus size before padding
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact MIPS over a row-sharded corpus with ICI candidate merge.

    The corpus must be padded to a multiple of the data-axis size; padded rows
    are excluded via ``n_valid``. Equivalent capability to FAISS's sharded GPU
    clone (/root/reference/src/search.py:266-270), re-designed as mesh SPMD.
    """
    k, k_local = _sharded_statics(mesh, corpus_sharded.shape[0], n_valid, k)
    fn = _sharded_mips_fn(mesh, n_valid, k, k_local, False)
    return fn(queries, corpus_sharded)


# ---- doc-filter variants (round 7) -------------------------------------------
# Appended after the existing programs (warm-cache rule, see
# ops/score_programs.py's compact48 note). The filter is a [N] bool
# operand: excluded rows score -inf before top_k; DenseFlatIndex's
# filtered resolve drops the sentinel rows (rows become ragged when fewer
# than k allowed docs exist).


def _row_filtered(scores, mask):
    return jnp.where(mask[None, :], scores, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("k",))
def mips_topk_packed_filtered(queries: jax.Array, corpus: jax.Array,
                              mask: jax.Array, k: int) -> jax.Array:
    """`mips_topk_packed` restricted to mask-allowed rows."""
    scores = jnp.dot(
        queries, corpus.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    return pack_topk(*lax.top_k(_row_filtered(scores, mask),
                                min(k, corpus.shape[0])))


@functools.partial(jax.jit, static_argnames=("k",))
def mips_topk_packed_q8_filtered(q8, q_scale, corpus8, row_scale,
                                 mask, k: int) -> jax.Array:
    """`mips_topk_packed_q8` restricted to mask-allowed rows."""
    scores = _row_filtered(_q8_scores(q8, q_scale, corpus8, row_scale), mask)
    return pack_topk(*lax.top_k(scores, min(k, corpus8.shape[0])))


def _local_then_global_topk_filtered(queries, corpus_shard, mask_shard,
                                     n_valid, k, k_local):
    shard_idx = lax.axis_index(DATA_AXIS)
    base = shard_idx * corpus_shard.shape[0]
    scores = jnp.dot(queries, corpus_shard.T,
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
    return _mask_merge_topk(_row_filtered(scores, mask_shard), base,
                            n_valid, k, k_local)


def _local_then_global_topk_q8_filtered(q8, q_scale, corpus8_shard,
                                        row_scale_shard, mask_shard,
                                        n_valid, k, k_local):
    shard_idx = lax.axis_index(DATA_AXIS)
    base = shard_idx * corpus8_shard.shape[0]
    scores = _q8_scores(q8, q_scale, corpus8_shard, row_scale_shard)
    return _mask_merge_topk(_row_filtered(scores, mask_shard), base,
                            n_valid, k, k_local)


@functools.lru_cache(maxsize=64)
def _sharded_mips_fn_filtered(mesh: Mesh, n_valid: int, k: int,
                              k_local: int, q8: bool):
    local = _local_then_global_topk_q8_filtered if q8 \
        else _local_then_global_topk_filtered
    in_specs = (P(None, None), P(None), P(DATA_AXIS, None), P(DATA_AXIS),
                P(DATA_AXIS)) if q8 else \
        (P(None, None), P(DATA_AXIS, None), P(DATA_AXIS))
    fn = shard_map(
        functools.partial(local, n_valid=n_valid, k=k, k_local=k_local),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_mips_topk_filtered(mesh, queries, corpus_sharded, mask_sharded,
                               n_valid, k):
    """`sharded_mips_topk` restricted to mask-allowed rows (mask row-sharded
    like the corpus)."""
    k, k_local = _sharded_statics(mesh, corpus_sharded.shape[0], n_valid, k)
    fn = _sharded_mips_fn_filtered(mesh, n_valid, k, k_local, False)
    return fn(queries, corpus_sharded, mask_sharded)


def sharded_mips_topk_q8_filtered(mesh, q8, q_scale, corpus8_sharded,
                                  row_scale_sharded, mask_sharded,
                                  n_valid, k):
    """`sharded_mips_topk_q8` restricted to mask-allowed rows."""
    k, k_local = _sharded_statics(mesh, corpus8_sharded.shape[0], n_valid, k)
    fn = _sharded_mips_fn_filtered(mesh, n_valid, k, k_local, True)
    return fn(q8, q_scale, corpus8_sharded, row_scale_sharded, mask_sharded)

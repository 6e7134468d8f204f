"""On-device evaluation consumer: target hit ranks from packed top-k.

The reference's retrieval pipeline exists to feed ``RecallMetrics``
(/root/reference/src/metrices.py:29-84) — at its default depth 1000
(/root/reference/src/arguments.py:60) the run has no other consumer, yet
fetching it is 8 MB per 1024-query batch on the i32 wire, the dominant cost
on thin-link hosts (~0.4 s/batch at the ~25-30 MB/s relay). These programs
compute each query's TARGET ranks on device from the packed top-k, so the
host fetches one [B, 1+T] int32 array (~28 KB for T=6) per batch instead;
recall@k, MRR@k, nDCG@k and MAP@k are all exact functions of those ranks
under binary relevance (eval/device_eval.py does that host arithmetic).

Rank semantics — bit-parity with the host consumer (eval/recall.py,
eval/metrics.py) on the SAME device output:

- entries are ranked in packed order, which IS the host ranking: the
  resolve paths hand rows score-descending, ``make_run`` preserves
  insertion order, and the host metrics' stable partial sort keeps it;
- invalid entries consume no rank, exactly as the host paths drop them
  before/at run assembly: non-positive scores for impact runs
  (``ImpactIndex._resolve_encoded``), non-finite scores for fused and
  filtered-dense runs, and the self doc under ``remove_query``
  (``make_run``, search/runs.py:73-76). Score-invalid entries always trail
  the valid ones (rows are score-descending), so only self-removal
  actually shifts ranks — the cumulative-count form handles both.

Pure XLA (compiles in seconds, composes with every backend/mesh variant);
appended as NEW programs so the cached TAAT/MIPS program keys stay warm
(warm-cache rule, CLAUDE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Rank value meaning "this target never appears among the valid top-k
# entries" — larger than any real depth, so every `rank <= k` test fails.
NO_HIT = 2 ** 30


def _ranks_core(scores: jax.Array, idx: jax.Array, tgt: jax.Array,
                self_pos: jax.Array, rule: str) -> jax.Array:
    """(scores [B,K], idx [B,K], tgt [B,T] (-1 pad), self_pos [B] (-1 none))
    -> [B, 1+T] int32: column 0 is the row's valid-entry count, columns
    1..T are each target's 1-based rank among valid entries (NO_HIT when
    absent)."""
    if rule == "positive":          # impact runs: resolve drops score <= 0
        valid = scores > 0.0
    elif rule == "finite":          # fused / filtered runs: -inf sentinels
        valid = jnp.isfinite(scores)
    elif rule == "all":
        valid = jnp.ones(scores.shape, dtype=bool)
    else:
        raise ValueError(f"unknown validity rule {rule!r}")
    valid = valid & (idx != self_pos[:, None])
    cum = jnp.cumsum(valid.astype(jnp.int32), axis=1)   # 1-based ranks
    hit = valid[:, :, None] & (idx[:, :, None] == tgt[:, None, :])
    ranks = jnp.where(hit, cum[:, :, None], NO_HIT).min(axis=1)
    n_row = cum[:, -1] if scores.shape[1] else \
        jnp.zeros(scores.shape[0], jnp.int32)
    return jnp.concatenate([n_row[:, None], ranks], axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("rule",))
def ranks_from_packed(packed: jax.Array, tgt: jax.Array, self_pos: jax.Array,
                      rule: str = "positive") -> jax.Array:
    """Target ranks from a packed [B, 2K] i32 top-k (ops.packing.pack_topk
    layout — scores bitcast in the left half, doc positions right)."""
    k = packed.shape[1] // 2
    scores = lax.bitcast_convert_type(packed[:, :k], jnp.float32)
    return _ranks_core(scores, packed[:, k:], tgt, self_pos, rule)


@functools.partial(jax.jit, static_argnames=("rule",))
def ranks_from_parts(scores: jax.Array, idx: jax.Array, tgt: jax.Array,
                     self_pos: jax.Array, rule: str = "finite") -> jax.Array:
    """Target ranks from separate (scores [B,K], idx [B,K]) arrays — the
    mesh dense programs' output form (ops/mips.sharded_mips_topk)."""
    return _ranks_core(scores.astype(jnp.float32), idx.astype(jnp.int32),
                       tgt, self_pos, rule)

"""On-device hybrid run fusion: one packed fetch instead of two runs + host fuse.

The reference's hybrid pipeline (/root/reference/src/search.py:348-447 +
src/hybrid.py:32-53) materializes a dense run and a sparse run on the host
and min-max-fuses them in Python. At the pipeline's default depth 1000 that
is two [B, 2*depth] result fetches per batch (8 MB each through thin-link
relays) plus ~2*depth dict operations per query of host fusion — both of
which dwarf device compute.

TPU-native redesign: both index engines already produce their top-k as
packed device arrays (ops/packing.py). This module fuses them ON DEVICE —
per-run min-max normalization, run-membership via per-query sort +
searchsorted (O(k log k), no [B, N] materialization), weighted sum with the
host ``fuse`` semantics (search/fusion.py), and a final top-k — so the host
fetches ONE packed [B, 2*out_k] array per chunk.

Exact-parity notes vs ``search.fusion.fuse``:
- a doc missing from one run contributes 0 from that run;
- each run's min/max is over ALL its returned scores, BEFORE the optional
  self-hit removal (``make_run`` convention, search/runs.py:46-49);
- the sparse run drops non-positive scores (``ImpactIndex._resolve_encoded``
  drops them before the run is built);
- normalization denominator is ``max(hi - lo, 1e-9)``.
Arithmetic is float32 on device vs float64 on host: fused scores agree to
f32 rounding, and equal-score ties can order differently (the multiset
semantics every engine here guarantees — see ops/packing.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from mllm_sparse_retrieval_tpu.ops.packing import pack_topk

_INT_MAX = 2**31 - 1


def _norm_stats(scores: jax.Array, valid: jax.Array):
    """Per-row min/max over ``valid`` entries and the fuse denominator.
    Rows with no valid entry get (0, 0, 1e-9) — their entries are masked
    out of the candidate lists anyway, this just keeps arithmetic NaN-free."""
    any_valid = valid.any(axis=1)
    lo = jnp.where(any_valid,
                   jnp.where(valid, scores, jnp.inf).min(axis=1), 0.0)
    hi = jnp.where(any_valid,
                   jnp.where(valid, scores, -jnp.inf).max(axis=1), 0.0)
    denom = jnp.maximum(hi - lo, 1e-9)
    return lo, denom


def _membership(ids_sorted: jax.Array, probe: jax.Array):
    """Row-wise membership of ``probe`` in ``ids_sorted`` (ascending rows).
    Returns (found [B,k] bool, pos [B,k] clipped gather positions)."""
    pos = jax.vmap(jnp.searchsorted)(ids_sorted, probe)
    pos_c = jnp.clip(pos, 0, ids_sorted.shape[1] - 1)
    found = (pos < ids_sorted.shape[1]) & \
        (jnp.take_along_axis(ids_sorted, pos_c, axis=1) == probe)
    return found, pos_c


def _fused_core(
    ss: jax.Array, si: jax.Array,    # sparse top-k: scores [B,ks] f32, impact-local idx [B,ks] i32
    ds: jax.Array, di: jax.Array,    # dense  top-k: scores [B,kd] f32, dense-local idx [B,kd] i32
    perm: jax.Array,                 # [n_impact] impact-local -> dense-local (-1 = absent)
    self_idx: jax.Array,             # [B] dense-local idx to self-remove (-1 = keep all)
    w_dense: jax.Array, w_sparse: jax.Array,   # scalar f32 weights
    out_k: int,
):
    ks, kd = si.shape[1], di.shape[1]

    # Sparse run membership: resolve drops non-positive scores; map the
    # surviving impact-local indices into the dense index's doc order.
    in_run_s = ss > 0.0
    gsi = jnp.where(
        in_run_s,
        perm[jnp.clip(si, 0, perm.shape[0] - 1)],
        -1)
    in_run_s = in_run_s & (gsi >= 0)
    in_run_d = jnp.ones_like(ds, dtype=bool)

    # min/max BEFORE self-hit removal (make_run convention).
    lo_s, den_s = _norm_stats(ss, in_run_s)
    lo_d, den_d = _norm_stats(ds, in_run_d)
    norm_s = jnp.where(in_run_s, (ss - lo_s[:, None]) / den_s[:, None], 0.0)
    norm_d = (ds - lo_d[:, None]) / den_d[:, None]

    # Self-hit removal AFTER the stats.
    valid_s = in_run_s & (gsi != self_idx[:, None])
    valid_d = in_run_d & (di != self_idx[:, None])

    # Sort each run's (valid) ids once; invalid entries sort to the top end
    # and can never match a probe (probes are < _INT_MAX).
    di_eff = jnp.where(valid_d, di, _INT_MAX)
    d_order = jnp.argsort(di_eff, axis=1)
    di_sorted = jnp.take_along_axis(di_eff, d_order, axis=1)
    norm_d_sorted = jnp.take_along_axis(norm_d, d_order, axis=1)

    gsi_eff = jnp.where(valid_s, gsi, _INT_MAX)
    s_order = jnp.argsort(gsi_eff, axis=1)
    gsi_sorted = jnp.take_along_axis(gsi_eff, s_order, axis=1)

    # Candidates from the sparse run: add the dense contribution when the
    # doc is also in the dense run.
    probe_s = jnp.where(valid_s, gsi, -1)
    found_d, pos_d = _membership(di_sorted, probe_s)
    d_at_s = jnp.where(found_d,
                       jnp.take_along_axis(norm_d_sorted, pos_d, axis=1), 0.0)
    cand_s = jnp.where(valid_s,
                       w_sparse * norm_s + w_dense * d_at_s, -jnp.inf)

    # Candidates from the dense run: docs ALSO in the sparse run were
    # already emitted above (with both contributions) — mask them here.
    found_s, _ = _membership(gsi_sorted, jnp.where(valid_d, di, -1))
    cand_d = jnp.where(valid_d & ~found_s, w_dense * norm_d, -jnp.inf)

    cand_scores = jnp.concatenate([cand_s, cand_d], axis=1)
    cand_ids = jnp.concatenate([probe_s, di], axis=1)
    k = min(out_k, ks + kd)
    out_s, pos = lax.top_k(cand_scores, k)
    out_i = jnp.take_along_axis(cand_ids, pos, axis=1)
    # -inf marks "fewer than k union docs for this row"; the resolver drops
    # those entries (a real fused score is always finite).
    return out_s, out_i


def _unpack_dev(packed: jax.Array):
    k = packed.shape[1] // 2
    return (lax.bitcast_convert_type(packed[:, :k], jnp.float32),
            packed[:, k:])


@functools.partial(jax.jit, static_argnames=("out_k",))
def fused_topk_packed(
    sparse_packed: jax.Array,   # [B, 2ks] i32 (ImpactIndex packed result)
    dense_packed: jax.Array,    # [B, 2kd] i32 (DenseFlatIndex packed result)
    perm: jax.Array,
    self_idx: jax.Array,
    w_dense: jax.Array,
    w_sparse: jax.Array,
    out_k: int,
) -> jax.Array:
    """Fuse two engines' packed device results into one packed [B, 2*out_k]
    array (int32, scores bitcast — ``ops.packing.unpack_topk`` inverts).
    Pure XLA (no Pallas), so it composes with either impact backend and
    compiles in seconds; the inputs stay on device (no host round trip)."""
    ss, si = _unpack_dev(sparse_packed)
    ds, di = _unpack_dev(dense_packed)
    return pack_topk(*_fused_core(ss, si, ds, di, perm, self_idx,
                                  w_dense, w_sparse, out_k))


@functools.partial(jax.jit, static_argnames=("out_k",))
def fused_topk_parts(
    sparse_packed: jax.Array,
    dense_scores: jax.Array, dense_idx: jax.Array,   # mesh dense form
    perm: jax.Array, self_idx: jax.Array,
    w_dense: jax.Array, w_sparse: jax.Array,
    out_k: int,
) -> jax.Array:
    """``fused_topk_packed`` for the mesh dense path, whose program returns
    (scores, idx) as separate replicated arrays (ops/mips.sharded_mips_topk)."""
    ss, si = _unpack_dev(sparse_packed)
    return pack_topk(*_fused_core(
        ss, si, dense_scores.astype(jnp.float32),
        dense_idx.astype(jnp.int32), perm, self_idx,
        w_dense, w_sparse, out_k))

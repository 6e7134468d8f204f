"""On-device evaluation consumer: recall/MRR/nDCG/MAP without fetching runs.

The reference's retrieval pipeline exists to feed ``RecallMetrics``
(/root/reference/src/metrices.py:29-84); at its default depth 1000
(/root/reference/src/arguments.py:60) the run dict has no other consumer,
yet materializing it costs an 8 MB/batch packed fetch (the measured bound
on the depth-1000 legs, BASELINE.md) plus host run assembly. When the
product IS the metrics, none of that needs to leave the device: the
programs in ops/eval_ranks.py compute each query's TARGET hit ranks from
the packed top-k on device, the host fetches one [B, 1+T] int32 array
(~28 KB at T=6), and this module turns accumulated ranks into the exact
same numbers ``eval.recall.recall_at_k`` / ``eval.metrics.ranking_metrics``
produce from the host-materialized run — recall/MRR/nDCG/MAP under binary
relevance are pure functions of (per-target hit rank, |targets|).

Parity contract (tested in tests/test_device_eval.py): for unique query
ids, metric values are EQUAL (same counts, same per-query float terms
summed in the same row order) to running the host consumer over the run
the host path would have materialized from the same compiled programs.
Duplicate query ids collapse last-write-wins exactly as run dicts do, but
keep the dict's first-insertion iteration position on host, so float SUMS
can associate differently there; values still agree to float tolerance.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from mllm_sparse_retrieval_tpu.eval.metrics import MetricResult
from mllm_sparse_retrieval_tpu.eval.recall import RecallResult
from mllm_sparse_retrieval_tpu.ops.eval_ranks import (NO_HIT,
                                                      ranks_from_packed,
                                                      ranks_from_parts)


def build_target_arrays(
    qids: Sequence[str],
    get_target: Callable,
    doc_pos: Dict[str, int],
    remove_query: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-query target/self arrays for the device rank programs.

    Returns ``(tgt [B, T] int32, n_targets [B] int32, self_pos [B] int32)``:
    ``tgt`` holds each target's doc POSITION in the index's id order (-1
    for padding and for targets absent from the corpus — they can never
    hit, exactly as an absent doc id never appears in the host run);
    ``n_targets`` is ``len(set(str(t)))`` — the host consumers' ``|T|``,
    which counts absent targets too (eval/metrics.py:_targets_of);
    ``self_pos`` is the query's own doc position (-1 when not removing or
    not a corpus doc), the ``remove_query`` rule of ``make_run``.
    """
    b = len(qids)
    per_q = []
    for q in qids:
        t = get_target(str(q))
        ts = {str(x) for x in t} if isinstance(t, (list, tuple, set)) \
            else {str(t)}
        per_q.append(ts)
    t_max = max((len(ts) for ts in per_q), default=1) or 1
    tgt = np.full((b, t_max), -1, np.int32)
    n_targets = np.zeros(b, np.int32)
    self_pos = np.full(b, -1, np.int32)
    for i, (q, ts) in enumerate(zip(qids, per_q)):
        n_targets[i] = len(ts)
        for j, t in enumerate(ts):
            tgt[i, j] = doc_pos.get(t, -1)
        if remove_query:
            self_pos[i] = doc_pos.get(str(q), -1)
    return tgt, n_targets, self_pos


def _pad_rows(a: np.ndarray, rows: int, fill) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    pad_shape = (rows - a.shape[0],) + a.shape[1:]
    return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])


def _ranks_pipeline(chunks, dispatch_fn, lookahead: int = 3) -> np.ndarray:
    """Shared dispatch-ahead loop: each chunk's [Bp, 1+T] ranks fetch
    overlaps the next chunk's programs (ops/stream.py pattern)."""
    from mllm_sparse_retrieval_tpu.ops.stream import pipeline_dispatch

    out = []

    def resolve(handle):
        r_dev, take = handle
        out.append(np.asarray(r_dev)[:take])

    import collections
    collections.deque(
        pipeline_dispatch(chunks, dispatch_fn, resolve, lookahead), maxlen=0)
    return np.concatenate(out) if out else np.zeros((0, 2), np.int32)


def impact_eval_ranks(
    index,
    q_idx: np.ndarray,
    q_w: np.ndarray,
    tgt: np.ndarray,
    self_pos: np.ndarray,
    depth: int,
    mesh=None,
    backend: str = "auto",
    lookahead: int = 3,
) -> np.ndarray:
    """Target hit ranks for an impact search, never fetching the run.

    Drives the index's own plan/chunk/dispatch internals (identical
    compiled scoring programs to ``search_encoded`` on the i32 wire — the
    wire never leaves the device here, so compact48 has nothing to
    compress), chains ``ranks_from_packed`` with the impact validity rule
    (score <= 0 drops, ImpactIndex._resolve_encoded), and fetches only
    [B, 1+T] per chunk. Returns the concatenated [B, 1+T] int32 ranks.
    """
    plan = index._search_plan(mesh, backend, depth, "i32")

    def chunk_iter():
        pos = 0
        for chunk_i, chunk_w, take in index._chunk_queries(plan, q_idx, q_w):
            yield chunk_i, chunk_w, take, pos
            pos += take

    def dispatch(item):
        chunk_i, chunk_w, take, pos = item
        packed = index._dispatch_encoded(plan, chunk_i, chunk_w)
        bp = packed.shape[0]
        tgt_c = jax.device_put(_pad_rows(tgt[pos:pos + take], bp, -1))
        self_c = jax.device_put(_pad_rows(self_pos[pos:pos + take], bp, -1))
        return ranks_from_packed(packed, tgt_c, self_c,
                                 rule="positive"), take

    return _ranks_pipeline(chunk_iter(), dispatch, lookahead)


def dense_eval_ranks(
    index,
    q_reps: np.ndarray,
    tgt: np.ndarray,
    self_pos: np.ndarray,
    depth: int,
    batch_size: int = 128,
    mesh=None,
    lookahead: int = 3,
) -> np.ndarray:
    """Target hit ranks for a dense MIPS search (``rule='all'`` — the
    unfiltered host path keeps every returned entry, DenseFlatIndex
    .search_ids). Positions in ``tgt``/``self_pos`` are dense lookup
    order."""
    index._materialize(mesh)
    q_reps = np.asarray(q_reps, dtype=np.float32)
    n = q_reps.shape[0]

    def chunk_iter():
        for start in range(0, n, batch_size):
            chunk = q_reps[start:start + batch_size]
            valid = chunk.shape[0]
            if valid < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - valid, chunk.shape[1]),
                                     chunk.dtype)])
            yield chunk, valid, start

    def dispatch(item):
        chunk, take, pos = item
        out = index._dispatch_chunk(chunk, depth, mesh)
        bp = (out[0] if isinstance(out, tuple) else out).shape[0]
        tgt_c = jax.device_put(_pad_rows(tgt[pos:pos + take], bp, -1))
        self_c = jax.device_put(_pad_rows(self_pos[pos:pos + take], bp, -1))
        if isinstance(out, tuple):          # mesh path: (scores, idx)
            return ranks_from_parts(out[0], out[1], tgt_c, self_c,
                                    rule="all"), take
        return ranks_from_packed(out, tgt_c, self_c, rule="all"), take

    return _ranks_pipeline(chunk_iter(), dispatch, lookahead)


def metrics_from_ranks(
    qids: Sequence[str],
    ranks: np.ndarray,             # [B, 1+T] from the rank programs
    n_targets: np.ndarray,         # [B] true |targets| per query
    ks: Sequence[int],
    which: Sequence[str] = (),
    denominator: Optional[int] = None,
) -> Tuple[RecallResult, Dict[str, MetricResult]]:
    """Host arithmetic from device ranks — numerically identical to
    ``recall_at_k`` + ``ranking_metrics`` over the host-materialized run
    (module docstring has the duplicate-qid caveat)."""
    ks = sorted(set(int(k) for k in ks))
    qarr = [str(q) for q in qids]
    if len(qarr) != ranks.shape[0]:
        raise ValueError("qids/ranks length mismatch")
    # run dicts collapse duplicate qids last-write-wins
    if len(set(qarr)) != len(qarr):
        keep_row = {q: i for i, q in enumerate(qarr)}
        sel = sorted(keep_row.values())
        qarr = [qarr[i] for i in sel]
        ranks = ranks[sel]
        n_targets = n_targets[sel]

    n_row = ranks[:, 0]
    tranks = ranks[:, 1:]
    hits = {k: 0 for k in ks}
    sums = {m: {k: 0.0 for k in ks} for m in which}
    evaluated = int((n_row > 0).sum())
    first = tranks.min(axis=1) if tranks.shape[1] else \
        np.full(len(qarr), NO_HIT, np.int64)
    for k in ks:
        hits[k] = int(((first <= k) & (n_row > 0)).sum())
    if which:
        for i in range(len(qarr)):
            if n_row[i] <= 0:
                continue
            hit_ranks = np.sort(tranks[i][tranks[i] < NO_HIT])
            if hit_ranks.size == 0:
                continue
            f = int(hit_ranks[0])
            nt = int(n_targets[i])
            for k in ks:
                if "mrr" in sums and f <= k:
                    sums["mrr"][k] += 1.0 / f
                within = hit_ranks[hit_ranks <= k]
                if within.size == 0:
                    continue
                if "ndcg" in sums:
                    dcg = sum(1.0 / math.log2(int(r) + 1) for r in within)
                    ideal = sum(1.0 / math.log2(j + 1)
                                for j in range(1, min(k, nt) + 1))
                    sums["ndcg"][k] += dcg / ideal
                if "map" in sums:
                    ap = sum((j + 1) / int(r)
                             for j, r in enumerate(within))
                    sums["map"][k] += ap / min(k, nt)
    denom = max(denominator if denominator is not None else len(qarr), 1)
    recall = RecallResult(
        recalls={k: hits[k] / denom for k in ks},
        hits=hits, num_queries=evaluated)
    extras = {m: MetricResult(name=m,
                              values={k: sums[m][k] / denom for k in ks},
                              num_queries=evaluated)
              for m in which}
    return recall, extras


def impact_doc_pos(index) -> Dict[str, int]:
    """Doc-id -> position map in the impact index's id order, cached on the
    index keyed on the id-list object (same rule as its resolve caches)."""
    if getattr(index, "_doc_pos_src", None) is not index.doc_ids:
        index._doc_pos = {d: i for i, d in enumerate(index.doc_ids)}
        index._doc_pos_src = index.doc_ids
    return index._doc_pos


def dense_doc_pos(index) -> Dict[str, int]:
    if getattr(index, "_lookup_pos_src", None) is not index.lookup:
        index._lookup_pos = {d: i for i, d in enumerate(index.lookup)}
        index._lookup_pos_src = index.lookup
    return index._lookup_pos

"""Recall@k over run dictionaries.

Semantics match ``RecallMetrics`` (/root/reference/src/metrices.py:29-84):
for each query, docs are sorted by score descending (ties keep insertion
order — Python's sort is stable, as is the reference's), the top-k doc-id set
is taken, and the query counts as a hit if *any* ground-truth id for it is in
the set (image queries have ~5 relevant captions, text queries exactly 1).

The reference's recall denominator is ``len(lookup_indices) * world_size``
(/root/reference/src/metrices.py:87) — the number of queries *issued*,
including DistributedSampler padding duplicates even though duplicated qids
collapse in the run dict. We default to the number of distinct evaluated
queries (the padding-free value; identical when the query count divides the
shard count) and accept an explicit denominator for bit-parity.
"""

from __future__ import annotations

import heapq
import operator
from dataclasses import dataclass, field
from typing import Dict, Mapping, Optional, Sequence, Union

DEFAULT_KS = (1, 5, 10, 100, 200)  # reference src/metrices.py:9

_SCORE = operator.itemgetter(1)


@dataclass
class RecallResult:
    recalls: Dict[int, float] = field(default_factory=dict)
    hits: Dict[int, int] = field(default_factory=dict)
    num_queries: int = 0

    def __getitem__(self, k: int) -> float:
        return self.recalls[k]

    def format(self, name: str = "") -> str:
        parts = ", ".join(f"r@{k} {self.recalls[k]:.4f}" for k in sorted(self.recalls))
        return f"{name} recall: {parts}" if name else f"recall: {parts}"


def _top_ids(docs: Mapping[str, float], k: int) -> set:
    ordered = sorted(docs.items(), key=lambda kv: kv[1], reverse=True)
    return {doc for doc, _ in ordered[:k]}


def recall_at_k(
    run: Mapping[str, Union[dict, Mapping[str, float]]],
    get_target,
    ks: Sequence[int] = DEFAULT_KS,
    denominator: Optional[int] = None,
) -> RecallResult:
    """Compute recall@k for a run.

    Args:
      run: ``qid -> {'docs': {docid: score}, ...}`` or ``qid -> {docid: score}``
        (the fused-run shape).
      get_target: callable ``qid -> docid | [docid, ...]`` (ground truth).
      ks: cutoffs.
      denominator: override the recall denominator (see module docstring).
    """
    ks = sorted(set(int(k) for k in ks))
    hits = {k: 0 for k in ks}
    evaluated = 0
    max_k = max(ks)
    rows = getattr(run, "ranked_rows", None)
    rows = rows() if rows is not None else None
    if rows is not None:
        # ArrayRun fast path (search/runs.py): rows are already
        # score-descending with stable ties == the dict path's nlargest
        # order, so the top-k prefix is a slice — no dict build, no sort.
        for qid, _s_row, i_row in rows:
            if len(i_row) == 0:
                continue
            evaluated += 1
            target = get_target(qid)
            targets = {str(t) for t in target} \
                if isinstance(target, (list, tuple, set)) else {str(target)}
            found_rank = None
            for rank, doc in enumerate(i_row[:max_k]):
                if str(doc) in targets:
                    found_rank = rank
                    break
            for k in ks:
                if found_rank is not None and found_rank < k:
                    hits[k] += 1
        denom = denominator if denominator is not None else len(run)
        denom = max(denom, 1)
        return RecallResult(
            recalls={k: hits[k] / denom for k in ks},
            hits=hits, num_queries=evaluated)
    for qid, entry in run.items():
        docs = entry["docs"] if isinstance(entry, dict) and "docs" in entry else entry
        if len(docs) == 0:
            continue
        evaluated += 1
        target = get_target(qid)
        targets = {str(t) for t in target} if isinstance(target, (list, tuple, set)) \
            else {str(target)}
        # nlargest is documented equivalent to sorted(..., reverse=True)[:n]
        # including tie stability, and skips sorting the depth-1000 tail the
        # cutoffs never look at; itemgetter keeps the 2000-per-query key
        # calls in C (a lambda here was ~60% of recall_at_k's runtime).
        ordered = heapq.nlargest(max_k, docs.items(), key=_SCORE)
        top_ids = [doc for doc, _ in ordered]
        # Walk cutoffs smallest-first, reusing the single sorted prefix.
        found_rank = None
        for rank, doc in enumerate(top_ids):
            if str(doc) in targets:
                found_rank = rank
                break
        for k in ks:
            if found_rank is not None and found_rank < k:
                hits[k] += 1

    denom = denominator if denominator is not None else len(run)
    denom = max(denom, 1)
    return RecallResult(
        recalls={k: hits[k] / denom for k in ks},
        hits=hits,
        num_queries=evaluated,
    )

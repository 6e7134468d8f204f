"""Run dictionaries: per-query ranked results with min/max score bookkeeping.

A "run" maps ``qid -> {'docs': {docid: score}, 'min_score': m, 'max_score': M}``,
the structure the reference threads between search, fusion, and metrics
(/root/reference/src/search.py:66-82).
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

import numpy as np

from mllm_sparse_retrieval_tpu import hostops as _hostops


Run = Dict[str, dict]


def make_run(
    batch_ids: Sequence[str],
    batch_scores: Sequence[Sequence[float]],
    batch_rankings: Sequence[Sequence[str]],
    remove_query: bool = False,
    scores_sorted: bool = False,
) -> Run:
    """Assemble a run dict from batched search output.

    Mirrors ``get_run_dict`` (/root/reference/src/search.py:66-82) including
    its min/max convention: min/max are computed over *all* returned scores,
    before the optional self-hit removal.

    ``scores_sorted=True`` promises each row is descending (what every
    search in this library returns — top-k output), making min/max O(1)
    per row instead of two O(depth) scans; at the reference's default
    depth 1000 those scans dominate the run assembly.

    All-list input (what the resolve paths produce) takes the C
    assembler (hostops/hostops.c — the per-row interpreter overhead was
    ~13 ms per 4096-query batch, serialized with the serving pipeline);
    this Python body is the fallback and the semantic reference,
    bit-parity tested in tests/test_hostops.py.
    """
    native = _hostops.get()
    if (native is not None and type(batch_ids) is list
            and type(batch_scores) is list and type(batch_rankings) is list):
        try:
            return native.build_runs(batch_ids, batch_scores,
                                     batch_rankings, bool(remove_query),
                                     bool(scores_sorted))
        except (TypeError, ValueError):
            # non-list rows, length-mismatched inputs etc.: route to the
            # Python body so behavior is identical with and without the
            # compiled extension (it zip-truncates mismatched lengths, the
            # historical semantics callers may rely on)
            pass
    run: Run = {}
    for qid, scores, rankings in zip(batch_ids, batch_scores, batch_rankings):
        # bulk dict build (C-level zip/map) — this runs once per serving
        # batch on the hot path; a per-doc Python loop here cost ~30 ms per
        # 4096-query batch at depth 10. The library's resolve paths hand
        # native str/float lists (ndarray .tolist()), so the per-element
        # coercions are usually skippable entirely.
        if isinstance(rankings, np.ndarray):   # raw batch_search output
            rankings = rankings.tolist()
        if isinstance(scores, np.ndarray):
            scores = scores.tolist()
        keys = rankings if (not rankings or type(rankings[0]) is str) \
            else map(str, rankings)
        vals = scores if (not scores or type(scores[0]) is float) \
            else map(float, scores)
        docs = dict(zip(keys, vals))
        if remove_query:
            # removal AFTER min/max would change them; reference computes
            # min/max over all returned scores BEFORE removal — keep that
            docs.pop(str(qid), None)
        entry = {"docs": docs}
        if len(scores) == 0:
            entry["min_score"] = 0.0
            entry["max_score"] = 0.0
        elif scores_sorted:
            entry["min_score"] = float(scores[-1])
            entry["max_score"] = float(scores[0])
        else:
            entry["min_score"] = float(min(scores))
            entry["max_score"] = float(max(scores))
        run[str(qid)] = entry
    return run


def merge_runs(runs: Iterable[Run]) -> Run:
    """Union per-shard runs (each query appears in exactly one shard)."""
    out: Run = {}
    for r in runs:
        out.update(r)
    return out

"""Score explain diagnostics: ImpactIndex.explain and explain_fusion must
reproduce the engines' arithmetic exactly (the whole point of an explain)."""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.search.fusion import explain_fusion, fuse


def _index():
    idx = ImpactIndex()
    idx.add("a", {1: 5, 2: 3, 7: 11})
    idx.add("b", {2: 9, 3: 1})
    idx.finalize()
    return idx


def test_impact_explain_matches_search_score():
    idx = _index()
    q = {1: 2.9, 2: 1.0, 3: -4.0, 99: 5.0}   # truncation, drop, OOV
    ex = idx.explain(q, "a")
    scores, ids = idx.search([q], 5, backend="matmul")
    engine = dict(zip(ids[0], scores[0]))
    assert ex["score"] == engine["a"]          # exact, both integer-f32
    # int(2.9) = 2: contributions 2*5 and 1*3, descending
    assert [(r["term"], r["contribution"]) for r in ex["terms"]] == \
        [(1, 10.0), (2, 3.0)]
    assert set(ex["dropped"]) == {3, 99}       # negative weight + OOV
    ex_b = idx.explain(q, "b")
    assert ex_b["score"] == engine["b"] == 9.0
    with pytest.raises(KeyError):
        idx.explain(q, "nope")


def test_impact_explain_zero_score_doc():
    idx = _index()
    ex = idx.explain({3: 2.0}, "a")            # term only in doc b
    assert ex["score"] == 0.0 and ex["terms"] == [] and ex["dropped"] == [3]


def test_explain_fusion_matches_fuse():
    rng = np.random.default_rng(0)
    runs = []
    for _ in range(2):
        run = {}
        for q in ("q1", "q2"):
            docs = {f"d{i}": float(rng.integers(1, 50)) for i in range(6)}
            run[q] = {"docs": docs, "max_score": max(docs.values()),
                      "min_score": min(docs.values())}
        runs.append(run)
    # make one doc asymmetric: present in run 0 only
    del runs[1]["q1"]["docs"]["d2"]
    weights = [0.3, 0.7]
    fused = fuse(runs, weights)
    for qid in ("q1", "q2"):
        for doc in fused[qid]:
            ex = explain_fusion(runs, weights, qid, doc)
            assert ex["score"] == pytest.approx(fused[qid][doc], abs=1e-12), \
                (qid, doc)
            assert ex["score"] == pytest.approx(
                sum(p["contribution"] for p in ex["runs"]))
    # the asymmetric doc: run 1 contributes exactly 0
    ex = explain_fusion(runs, weights, "q1", "d2")
    assert ex["runs"][1]["raw_score"] is None
    assert ex["runs"][1]["contribution"] == 0.0
    # unknown qid/doc -> all-zero breakdown, not an error
    assert explain_fusion(runs, weights, "zz", "d0")["score"] == 0.0

"""Fusion, TREC IO, and recall@k tests (reference hybrid.py / metrices.py semantics)."""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.eval import recall_at_k
from mllm_sparse_retrieval_tpu.search import (
    fuse,
    fuse_statistic,
    make_run,
    read_trec_run,
    write_trec_run,
)


def _run(entries):
    """entries: {qid: {doc: score}} -> run dict with min/max."""
    out = {}
    for qid, docs in entries.items():
        scores = list(docs.values())
        out[qid] = {
            "docs": dict(docs),
            "min_score": min(scores) if scores else 0.0,
            "max_score": max(scores) if scores else 0.0,
        }
    return out


def test_make_run_minmax_and_remove_query():
    run = make_run(["q1"], [[3.0, 1.0, 2.0]], [["q1", "d2", "d3"]],
                   remove_query=True)
    assert "q1" not in run["q1"]["docs"]
    # min/max computed before self-hit removal
    assert run["q1"]["max_score"] == 3.0
    assert run["q1"]["min_score"] == 1.0


def test_fuse_minmax_weighted_sum():
    dense = _run({"q": {"a": 10.0, "b": 5.0, "c": 0.0}})
    sparse = _run({"q": {"b": 4.0, "c": 2.0, "d": 0.0}})
    fused = fuse([dense, sparse], [0.5, 0.5])
    f = fused["q"]
    # a: dense-normalized 1.0 * 0.5 + 0 = 0.5
    assert f["a"] == pytest.approx(0.5)
    # b: dense (5-0)/10 * .5 + sparse (4-0)/4 * .5 = 0.25 + 0.5
    assert f["b"] == pytest.approx(0.75)
    # c: 0 + (2-0)/4 * .5 = 0.25
    assert f["c"] == pytest.approx(0.25)
    # d: only sparse with min score -> 0
    assert f["d"] == pytest.approx(0.0)


def test_fuse_degenerate_minmax_denominator():
    dense = _run({"q": {"a": 7.0}})  # max == min -> denom floored at 1e-9
    sparse = _run({"q": {}})
    sparse["q"] = {"docs": {}, "min_score": 0.0, "max_score": 0.0}
    fused = fuse([dense, sparse], [0.7, 0.3])
    assert fused["q"]["a"] == pytest.approx(0.0)  # (7-7)/1e-9 = 0


def test_fuse_statistic_provenance():
    dense = _run({"q": {"a": 2.0, "b": 1.0}})
    sparse = _run({"q": {"b": 5.0, "c": 3.0}})
    tagged = fuse_statistic([dense, sparse], [0.5, 0.5])
    assert tagged["q"]["a"].type == "dense"
    assert tagged["q"]["b"].type == "fuse"
    assert tagged["q"]["c"].type == "sparse"


def test_trec_roundtrip(tmp_path):
    run = _run({"q1": {"d1": 2.5, "d2": 1.5}, "q2": {"d3": 9.0}})
    path = tmp_path / "run.trec"
    write_trec_run(run, str(path), name="test")
    back = read_trec_run(str(path))
    assert back["q1"]["docs"] == {"d1": 2.5, "d2": 1.5}
    assert back["q1"]["max_score"] == 2.5
    assert back["q1"]["min_score"] == 1.5  # last (lowest-ranked) line
    assert back["q2"]["docs"] == {"d3": 9.0}


def test_recall_at_k_single_and_multi_target():
    run = _run({
        "t1": {"img1": 3.0, "img2": 2.0, "img3": 1.0},   # target img1 @ rank 1
        "t2": {"img9": 3.0, "img2": 2.0, "img1": 1.0},   # target img2 @ rank 2
        "t3": {"img9": 3.0, "img8": 2.0, "img7": 1.0},   # target missing
    })
    targets = {"t1": "img1", "t2": "img2", "t3": "img4"}
    res = recall_at_k(run, lambda q: targets[q], ks=(1, 2, 3))
    assert res[1] == pytest.approx(1 / 3)
    assert res[2] == pytest.approx(2 / 3)
    assert res[3] == pytest.approx(2 / 3)

    # image query: any of several caption targets counts (metrices.py:76-84)
    run_i = _run({"i1": {"c5": 3.0, "c2": 2.0}})
    res_i = recall_at_k(run_i, lambda q: ["c1", "c2", "c3"], ks=(1, 2))
    assert res_i[1] == 0.0
    assert res_i[2] == 1.0


def test_recall_empty_docs_skipped_but_counted_in_denominator():
    run = {"q1": {"docs": {"d1": 1.0}, "min_score": 1.0, "max_score": 1.0},
           "q2": {"docs": {}, "min_score": 0.0, "max_score": 0.0}}
    res = recall_at_k(run, lambda q: "d1", ks=(1,))
    assert res[1] == pytest.approx(0.5)
    assert res.num_queries == 1


def test_recall_fused_run_shape():
    fused = {"q": {"d1": 0.9, "d2": 0.1}}
    res = recall_at_k(fused, lambda q: "d1", ks=(1,))
    assert res[1] == 1.0


def test_fuse_tolerates_asymmetric_runs():
    """A qid present in only one run must fuse (contribution 0 from the
    missing run) instead of KeyError (VERDICT r1 weak #6)."""
    from mllm_sparse_retrieval_tpu.search.fusion import fuse, fuse_statistic

    dense = {"q1": {"docs": {"a": 2.0, "b": 1.0}, "max_score": 2.0,
                    "min_score": 1.0},
             "q2": {"docs": {"c": 5.0}, "max_score": 5.0, "min_score": 5.0}}
    sparse = {"q1": {"docs": {"a": 9.0}, "max_score": 9.0, "min_score": 9.0}}
    fused = fuse([dense, sparse], [0.5, 0.5])
    assert set(fused) == {"q1", "q2"}
    assert fused["q2"]["c"] == 0.0  # min==max -> normalized 0 (reference)
    assert fused["q1"]["a"] > fused["q1"]["b"]
    tagged = fuse_statistic([dense, sparse], [0.5, 0.5])
    assert tagged["q2"]["c"].type == "dense"
    assert tagged["q1"]["a"].type == "fuse"


def test_make_run_accepts_numpy_rows():
    """Raw batch_search output (2-D numpy arrays) must work — the
    pre-hostops body accepted it via per-element coercion (review r6)."""
    import numpy as np

    from mllm_sparse_retrieval_tpu.search.runs import make_run

    scores = np.array([[3.0, 2.0], [5.0, 1.0]])
    ids = np.array([["a", "b"], ["c", "d"]])
    run = make_run(["q1", "q2"], scores, ids)
    assert run["q1"]["docs"] == {"a": 3.0, "b": 2.0}
    assert run["q2"]["max_score"] == 5.0 and run["q2"]["min_score"] == 1.0


def test_fuse_rrf_hand_computed_and_properties():
    """Reciprocal Rank Fusion: hand-checked formula, stable tie ranks,
    missing-run contributes 0, scale invariance (min-max's weakness)."""
    from mllm_sparse_retrieval_tpu.search.fusion import fuse_rrf

    runs = [
        {"q": {"docs": {"a": 30.0, "b": 20.0, "c": 10.0},
               "max_score": 30.0, "min_score": 10.0}},
        {"q": {"docs": {"b": 0.9, "d": 0.8},
               "max_score": 0.9, "min_score": 0.8}},
    ]
    out = fuse_rrf(runs, k=60)["q"]
    assert out["a"] == pytest.approx(1 / 61)
    assert out["b"] == pytest.approx(1 / 62 + 1 / 61)   # rank 2 + rank 1
    assert out["c"] == pytest.approx(1 / 63)
    assert out["d"] == pytest.approx(1 / 62)
    # weights scale per-run contributions
    w = fuse_rrf(runs, weights=[2.0, 1.0], k=60)["q"]
    assert w["a"] == pytest.approx(2 / 61)
    # scale-free: multiplying one run's scores by 1000 changes nothing
    runs_scaled = [
        {"q": {"docs": {k: v * 1000 for k, v in
                        runs[0]["q"]["docs"].items()},
               "max_score": 30000.0, "min_score": 10000.0}},
        runs[1],
    ]
    assert fuse_rrf(runs_scaled, k=60)["q"] == out
    # plain-dict (fused-run) shape accepted too
    plain = [{"q": {"a": 3.0, "b": 2.0}}, {"q": {"b": 1.0}}]
    p = fuse_rrf(plain, k=10)["q"]
    assert p["b"] == pytest.approx(1 / 12 + 1 / 11)


def test_run_search_fusion_rule_validation():
    from mllm_sparse_retrieval_tpu.search.engine import run_search

    with pytest.raises(ValueError, match="fusion_rule"):
        run_search([], None, None, None, None, query_type="text",
                   sparse_cfg=None, search_cfg=None, fusion_rule="bogus")
    with pytest.raises(ValueError, match="host-path"):
        run_search([], None, None, None, None, query_type="text",
                   sparse_cfg=None, search_cfg=None, fusion_rule="rrf",
                   fusion_mode="device")

"""MRR/nDCG/MAP over run dicts (eval/metrics.py) — hand-computed values,
a naive per-metric oracle on random runs, and the run_search wiring."""

import math

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.eval import (map_at_k, mrr_at_k, ndcg_at_k,
                                            ranking_metrics)


RUN = {
    "q1": {"docs": {"a": 3.0, "b": 2.0, "c": 1.0}},
    "q2": {"docs": {"x": 5.0, "y": 4.0}},       # 'z' relevant but unranked
}
TARGETS = {"q1": ["b"], "q2": ["x", "z"]}
GET = TARGETS.__getitem__


def test_mrr_hand_computed():
    m = mrr_at_k(RUN, GET, ks=(1, 5))
    assert m[1] == pytest.approx(0.5)            # only q2 hits at rank 1
    assert m[5] == pytest.approx((0.5 + 1.0) / 2)


def test_ndcg_hand_computed():
    m = ndcg_at_k(RUN, GET, ks=(1, 5))
    assert m[1] == pytest.approx(0.5)            # q2 perfect, q1 zero
    q1 = (1 / math.log2(3)) / 1.0                # hit at rank 2, |T|=1
    q2 = 1.0 / (1.0 + 1 / math.log2(3))          # ideal has both relevants
    assert m[5] == pytest.approx((q1 + q2) / 2)


def test_map_hand_computed():
    m = map_at_k(RUN, GET, ks=(1, 5))
    assert m[1] == pytest.approx((0 + 1.0) / 2)  # q2: 1/min(1,2)=1
    # q1: prec@2 / min(5,1) = 0.5; q2: prec@1 / min(5,2) = 0.5
    assert m[5] == pytest.approx(0.5)


def test_fused_run_shape_and_denominator():
    fused = {q: e["docs"] for q, e in RUN.items()}    # plain-dict run shape
    assert mrr_at_k(fused, GET, ks=(5,))[5] == \
        mrr_at_k(RUN, GET, ks=(5,))[5]
    # denominator override (reference issued-query counting)
    assert mrr_at_k(RUN, GET, ks=(5,), denominator=4)[5] == \
        pytest.approx((0.5 + 1.0) / 4)
    # empty-doc queries are skipped but still count in the default denom
    run = dict(RUN, q3={"docs": {}})
    m = mrr_at_k(run, lambda q: TARGETS.get(q, "none"), ks=(5,))
    assert m.num_queries == 2
    assert m[5] == pytest.approx((0.5 + 1.0) / 3)


def test_one_pass_matches_individual_calls():
    got = ranking_metrics(RUN, GET, ks=(1, 5))
    assert got["mrr"].values == mrr_at_k(RUN, GET, ks=(1, 5)).values
    assert got["ndcg"].values == ndcg_at_k(RUN, GET, ks=(1, 5)).values
    assert got["map"].values == map_at_k(RUN, GET, ks=(1, 5)).values
    with pytest.raises(ValueError, match="unknown"):
        ranking_metrics(RUN, GET, which=("mrr", "bogus"))


def _naive(run, targets, k):
    """Independent oracle: full sort per query, textbook formulas."""
    mrr = ndcg = ap_sum = 0.0
    for qid, entry in run.items():
        docs = entry["docs"]
        if not docs:
            continue
        T = set(targets[qid])
        ranked = [d for d, _ in sorted(docs.items(), key=lambda kv: -kv[1])]
        rel = [1 if d in T else 0 for d in ranked[:k]]
        for i, r in enumerate(rel):
            if r:
                mrr += 1 / (i + 1)
                break
        dcg = sum(r / math.log2(i + 2) for i, r in enumerate(rel))
        idcg = sum(1 / math.log2(i + 2) for i in range(min(k, len(T))))
        if idcg and dcg:
            ndcg += dcg / idcg
        hits = 0
        ap = 0.0
        for i, r in enumerate(rel):
            if r:
                hits += 1
                ap += hits / (i + 1)
        ap_sum += ap / min(k, len(T))
    n = len(run)
    return mrr / n, ndcg / n, ap_sum / n


def test_random_runs_match_naive_oracle():
    rng = np.random.default_rng(0)
    docs = [f"d{i}" for i in range(30)]
    run, targets = {}, {}
    for q in range(25):
        scored = rng.choice(docs, size=12, replace=False)
        # integer scores force ties; both sides sort stably on identical
        # insertion order, so tie handling must agree too
        run[f"q{q}"] = {"docs": {d: float(rng.integers(0, 6))
                                 for d in scored}}
        targets[f"q{q}"] = list(rng.choice(docs, size=3, replace=False))
    for k in (1, 3, 10):
        got = ranking_metrics(run, targets.__getitem__, ks=(k,))
        ref_mrr, ref_ndcg, ref_map = _naive(run, targets, k)
        assert got["mrr"][k] == pytest.approx(ref_mrr)
        assert got["ndcg"][k] == pytest.approx(ref_ndcg)
        assert got["map"][k] == pytest.approx(ref_map)


def test_search_output_summary_includes_metrics():
    from mllm_sparse_retrieval_tpu.search.engine import (SearchOutput,
                                                         _extra_metrics)
    from mllm_sparse_retrieval_tpu.eval.recall import recall_at_k

    out = SearchOutput()
    out.sparse_run = {q: {"docs": e["docs"], "max_score": 1.0,
                          "min_score": 0.0} for q, e in RUN.items()}
    out.sparse_recall = recall_at_k(out.sparse_run, GET, ks=(5,))
    _extra_metrics(out, "sparse", out.sparse_run, GET, (5,),
                   ("mrr", "ndcg"))
    text = out.summary()
    assert "sparse mrr@5" in text and "sparse ndcg@5" in text
    assert "map" not in text                     # only requested metrics
    assert out.extra_metrics["sparse"]["mrr"][5] == pytest.approx(0.75)

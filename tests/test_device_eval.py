"""On-device evaluation consumer parity vs the host run consumer.

The device path (ops/eval_ranks.py + eval/device_eval.py) computes target
hit ranks from the packed top-k on device and fetches one [B, 1+T] int32
array; every metric it reports must EQUAL what eval/recall.recall_at_k and
eval/metrics.ranking_metrics produce from the run the host path would have
materialized from the SAME compiled scoring programs — including the host
paths' validity rules (impact score<=0 drop, fused -inf drop, dense
keep-all), remove_query semantics, multi-target queries, targets absent
from the corpus, and query chunking.
"""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.eval.device_eval import (build_target_arrays,
                                                        dense_doc_pos,
                                                        dense_eval_ranks,
                                                        impact_doc_pos,
                                                        impact_eval_ranks,
                                                        metrics_from_ranks)
from mllm_sparse_retrieval_tpu.eval.metrics import ranking_metrics
from mllm_sparse_retrieval_tpu.eval.recall import recall_at_k
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.search.runs import make_run

KS = (1, 3, 5, 10)
WHICH = ("mrr", "ndcg", "map")


def _build_impact(n_docs=60, n_terms=50, seed=0):
    rng = np.random.default_rng(seed)
    doc_ids = [f"d{i}" for i in range(n_docs)]
    imp = ImpactIndex()
    for d in doc_ids:
        terms = rng.choice(n_terms, size=rng.integers(3, 9), replace=False)
        imp.add(d, {f"t{t}": int(rng.integers(1, 40)) for t in terms})
    imp.finalize()
    return imp, doc_ids, rng


def _queries(rng, n_q, n_terms):
    q_dicts = []
    for q in range(n_q):
        if q == 4:          # out-of-vocab -> empty device row (n_row == 0)
            q_dicts.append({"zzz-oov": 5})
            continue
        terms = rng.choice(n_terms, size=5, replace=False)
        q_dicts.append({f"t{t}": int(rng.integers(1, 10)) for t in terms})
    return q_dicts


def _multi_targets(doc_ids, rng, n_q):
    """Target map: lists mixing in-corpus docs and an absent id."""
    tmap = {}
    for q in range(n_q):
        picks = [doc_ids[int(i)] for i in
                 rng.choice(len(doc_ids), size=3, replace=False)]
        if q % 3 == 0:
            picks.append(f"absent-{q}")
        tmap[f"q{q}"] = picks
    return tmap


def _assert_equal(host_recall, host_extras, dev_recall, dev_extras):
    assert dev_recall.recalls == host_recall.recalls
    assert dev_recall.hits == host_recall.hits
    assert dev_recall.num_queries == host_recall.num_queries
    for m in WHICH:
        assert dev_extras[m].values == host_extras[m].values, m


@pytest.mark.parametrize("remove_query", [False, True])
def test_impact_ranks_match_host_consumer(remove_query):
    imp, doc_ids, rng = _build_impact()
    n_q = 12
    q_dicts = _queries(rng, n_q, 50)
    # doc-namespace qids so remove_query actually removes self hits
    qids = [doc_ids[2 * q] for q in range(n_q)]
    tmap = {qids[q]: t for q, t in
            zip(range(n_q), _multi_targets(doc_ids, rng, n_q).values())}
    get_target = tmap.__getitem__
    depth = 10

    s, i = imp.search(q_dicts, depth)
    run = make_run(qids, s, i, remove_query=remove_query, scores_sorted=True)
    host_recall = recall_at_k(run, get_target, KS)
    host_extras = ranking_metrics(run, get_target, KS, which=WHICH)

    q_idx, q_w = imp.encode_queries(q_dicts)
    tgt, ntg, selfp = build_target_arrays(qids, get_target,
                                          impact_doc_pos(imp),
                                          remove_query=remove_query)
    ranks = impact_eval_ranks(imp, q_idx, q_w, tgt, selfp, depth)
    dev_recall, dev_extras = metrics_from_ranks(qids, ranks, ntg, KS, WHICH)
    _assert_equal(host_recall, host_extras, dev_recall, dev_extras)


def test_impact_ranks_chunked_and_mesh():
    """Forced query chunking (tiny HBM budget) and the sharded programs
    both reproduce the host consumer exactly."""
    from mllm_sparse_retrieval_tpu.parallel import make_mesh

    imp, doc_ids, rng = _build_impact(seed=2)
    n_q = 16
    q_dicts = _queries(rng, n_q, 50)
    qids = [f"q{q}" for q in range(n_q)]
    tmap = _multi_targets(doc_ids, rng, n_q)
    get_target = tmap.__getitem__
    depth = 8

    s, i = imp.search(q_dicts, depth)
    run = make_run(qids, s, i, scores_sorted=True)
    host_recall = recall_at_k(run, get_target, KS)

    q_idx, q_w = imp.encode_queries(q_dicts)
    tgt, ntg, selfp = build_target_arrays(qids, get_target,
                                          impact_doc_pos(imp))

    budget = imp.hbm_budget_bytes
    try:
        # tiny budget -> max_b floors at 8 -> 16 queries need two chunks
        imp.hbm_budget_bytes = 1
        ranks = impact_eval_ranks(imp, q_idx, q_w, tgt, selfp, depth)
    finally:
        imp.hbm_budget_bytes = budget
    dev_recall, _ = metrics_from_ranks(qids, ranks, ntg, KS)
    assert dev_recall.recalls == host_recall.recalls

    mesh = make_mesh()
    ranks_m = impact_eval_ranks(imp, q_idx, q_w, tgt, selfp, depth,
                                mesh=mesh)
    mesh_recall, _ = metrics_from_ranks(qids, ranks_m, ntg, KS)
    assert mesh_recall.recalls == host_recall.recalls


@pytest.mark.parametrize("remove_query", [False, True])
def test_dense_ranks_match_host_consumer(remove_query):
    rng = np.random.default_rng(1)
    n_docs, dim, n_q = 40, 16, 11
    doc_ids = [f"d{i}" for i in range(n_docs)]
    dense = DenseFlatIndex()
    dense.add(rng.normal(size=(n_docs, dim)).astype(np.float32), doc_ids)
    q_reps = rng.normal(size=(n_q, dim)).astype(np.float32)
    qids = [doc_ids[3 * q] for q in range(n_q)]
    tmap = {qids[q]: t for q, t in
            zip(range(n_q), _multi_targets(doc_ids, rng, n_q).values())}
    get_target = tmap.__getitem__
    depth = 10

    s, i = dense.search_ids(q_reps, depth, batch_size=4)
    run = make_run(qids, s.tolist(), i, remove_query=remove_query,
                   scores_sorted=True)
    host_recall = recall_at_k(run, get_target, KS)
    host_extras = ranking_metrics(run, get_target, KS, which=WHICH)

    tgt, ntg, selfp = build_target_arrays(qids, get_target,
                                          dense_doc_pos(dense),
                                          remove_query=remove_query)
    ranks = dense_eval_ranks(dense, q_reps, tgt, selfp, depth, batch_size=4)
    dev_recall, dev_extras = metrics_from_ranks(qids, ranks, ntg, KS, WHICH)
    _assert_equal(host_recall, host_extras, dev_recall, dev_extras)


def test_dense_ranks_mesh():
    from mllm_sparse_retrieval_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    n_docs, dim, n_q = 48, 8, 9
    doc_ids = [f"d{i}" for i in range(n_docs)]
    dense = DenseFlatIndex()
    dense.add(rng.normal(size=(n_docs, dim)).astype(np.float32), doc_ids)
    q_reps = rng.normal(size=(n_q, dim)).astype(np.float32)
    qids = [f"q{q}" for q in range(n_q)]
    tmap = _multi_targets(doc_ids, rng, n_q)
    get_target = tmap.__getitem__

    s, i = dense.search_ids(q_reps, 10, batch_size=16)
    run = make_run(qids, s.tolist(), i, scores_sorted=True)
    host_recall = recall_at_k(run, get_target, KS)

    mesh = make_mesh()
    tgt, ntg, selfp = build_target_arrays(qids, get_target,
                                          dense_doc_pos(dense))
    ranks = dense_eval_ranks(dense, q_reps, tgt, selfp, 10, batch_size=16,
                             mesh=mesh)
    dev_recall, _ = metrics_from_ranks(qids, ranks, ntg, KS)
    assert dev_recall.recalls == host_recall.recalls


@pytest.mark.parametrize("remove_query", [False, True])
def test_fused_eval_ranks_match_host(remove_query):
    from mllm_sparse_retrieval_tpu.eval.metrics import ranking_metrics
    from mllm_sparse_retrieval_tpu.search.device_fusion import (
        FusedHybridSearcher)

    imp, doc_ids, rng = _build_impact(seed=5)
    dim, n_q = 12, 10
    order = rng.permutation(len(doc_ids))     # shuffled dense doc order
    dense = DenseFlatIndex()
    reps = rng.normal(size=(len(doc_ids), dim)).astype(np.float32)
    dense.add(reps[order], [doc_ids[i] for i in order])
    q_dicts = _queries(rng, n_q, 50)
    q_reps = rng.normal(size=(n_q, dim)).astype(np.float32)
    qids = [doc_ids[q] for q in range(n_q)]
    tmap = {qids[q]: t for q, t in
            zip(range(n_q), _multi_targets(doc_ids, rng, n_q).values())}
    get_target = tmap.__getitem__
    depth = 12

    searcher = FusedHybridSearcher(dense, imp, alpha=0.4)
    q_idx, q_w = imp.encode_queries(q_dicts)
    run = searcher.search_run(q_reps, q_idx, q_w, qids, depth,
                              remove_query=remove_query)
    host_recall = recall_at_k(run, get_target, KS)
    host_extras = ranking_metrics(run, get_target, KS, which=WHICH)

    tgt, ntg, _ = build_target_arrays(qids, get_target,
                                      dense_doc_pos(dense))
    ranks = searcher.eval_ranks(q_reps, q_idx, q_w, tgt, depth,
                                qids=qids if remove_query else None)
    dev_recall, dev_extras = metrics_from_ranks(qids, ranks, ntg, KS, WHICH)
    _assert_equal(host_recall, host_extras, dev_recall, dev_extras)


def test_duplicate_qids_collapse_last_write():
    imp, doc_ids, rng = _build_impact(seed=7)
    q_dicts = _queries(rng, 6, 50)
    qids = ["qa", "qb", "qa", "qc", "qb", "qd"]   # duplicates
    tmap = {q: [doc_ids[i]] for i, q in enumerate(["qa", "qb", "qc", "qd"])}
    get_target = tmap.__getitem__
    depth = 10

    s, i = imp.search(q_dicts, depth)
    run = make_run(qids, s, i, scores_sorted=True)
    host_recall = recall_at_k(run, get_target, KS)

    q_idx, q_w = imp.encode_queries(q_dicts)
    tgt, ntg, selfp = build_target_arrays(qids, get_target,
                                          impact_doc_pos(imp))
    ranks = impact_eval_ranks(imp, q_idx, q_w, tgt, selfp, depth)
    dev_recall, _ = metrics_from_ranks(qids, ranks, ntg, KS)
    # last-write-wins collapse: denominators and hit counts must agree
    assert dev_recall.recalls == host_recall.recalls
    assert dev_recall.hits == host_recall.hits


def test_engine_eval_mode_validation():
    from mllm_sparse_retrieval_tpu.configs import SearchConfig, SparseConfig
    from mllm_sparse_retrieval_tpu.search.engine import run_search

    with pytest.raises(ValueError, match="requires get_target"):
        run_search([], None, None, None, None, query_type="text",
                   sparse_cfg=SparseConfig(), search_cfg=SearchConfig(),
                   dense_index=DenseFlatIndex(), eval_mode="device")
    with pytest.raises(ValueError, match="fusion_mode='device'"):
        run_search([], None, None, None, None, query_type="text",
                   sparse_cfg=SparseConfig(), search_cfg=SearchConfig(),
                   dense_index=DenseFlatIndex(), impact_index=ImpactIndex(),
                   eval_mode="device", get_target=lambda q: q)
    with pytest.raises(ValueError, match="eval_mode"):
        run_search([], None, None, None, None, query_type="text",
                   sparse_cfg=SparseConfig(), search_cfg=SearchConfig(),
                   eval_mode="nope", get_target=lambda q: q)

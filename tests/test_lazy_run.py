"""ArrayRun (lazy run) semantics: exactly a make_run dict, lazily.

The lazy run must (a) behave as the make_run dict through every Mapping
operation, (b) let recall/metrics/TREC consumers produce IDENTICAL output
from the row fast path, and (c) never materialize when only fast-path
consumers touch it.
"""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.eval.metrics import ranking_metrics
from mllm_sparse_retrieval_tpu.eval.recall import recall_at_k
from mllm_sparse_retrieval_tpu.search.fusion import (fuse, read_trec_run,
                                                     write_trec_run)
from mllm_sparse_retrieval_tpu.search.runs import ArrayRun, make_run


def _batch(seed=0, n_q=9, depth=7, n_docs=30, dup=False, ragged=True):
    rng = np.random.default_rng(seed)
    qids, scores, ids = [], [], []
    for q in range(n_q):
        qid = f"d{q}" if not dup else f"d{q % 3}"
        k = int(rng.integers(0, depth + 1)) if ragged and q % 4 == 0 \
            else depth
        picks = rng.choice(n_docs, size=k, replace=False)
        s = np.sort(rng.integers(1, 50, size=k))[::-1].astype(float)
        qids.append(qid)
        scores.append(s.tolist())
        ids.append([f"d{int(i)}" for i in picks])
    return qids, scores, ids


@pytest.mark.parametrize("remove_query", [False, True])
@pytest.mark.parametrize("dup", [False, True])
def test_mapping_equals_make_run(remove_query, dup):
    qids, scores, ids = _batch(dup=dup)
    eager = make_run(qids, scores, ids, remove_query=remove_query,
                     scores_sorted=True)
    lazy = ArrayRun(qids, scores, ids, remove_query=remove_query,
                    scores_sorted=True)
    # cheap ops before materialization
    assert len(lazy) == len(eager)
    assert list(lazy) == list(eager)            # iteration order
    assert all(q in lazy for q in eager)
    assert bool(lazy) is bool(eager)
    assert lazy._dict is None                   # still lazy
    # dict-style access materializes to the exact make_run output
    assert lazy == eager
    for q in eager:
        assert lazy[q] == eager[q]
    assert dict(lazy.items()) == eager


@pytest.mark.parametrize("remove_query", [False, True])
@pytest.mark.parametrize("dup", [False, True])
def test_consumers_fast_path_identical(remove_query, dup, tmp_path):
    qids, scores, ids = _batch(seed=3, dup=dup)
    eager = make_run(qids, scores, ids, remove_query=remove_query,
                     scores_sorted=True)
    lazy = ArrayRun(qids, scores, ids, remove_query=remove_query,
                    scores_sorted=True)
    rng = np.random.default_rng(9)
    tmap = {q: [f"d{int(i)}" for i in rng.choice(30, 3, replace=False)]
            for q in set(qids)}
    get = tmap.__getitem__
    ks = (1, 3, 5)

    r_e = recall_at_k(eager, get, ks)
    r_l = recall_at_k(lazy, get, ks)
    assert r_l.recalls == r_e.recalls and r_l.hits == r_e.hits
    assert r_l.num_queries == r_e.num_queries

    m_e = ranking_metrics(eager, get, ks)
    m_l = ranking_metrics(lazy, get, ks)
    for m in ("mrr", "ndcg", "map"):
        assert m_l[m].values == m_e[m].values

    write_trec_run(eager, str(tmp_path / "e.trec"), "x")
    write_trec_run(lazy, str(tmp_path / "l.trec"), "x")
    assert (tmp_path / "e.trec").read_text() == \
        (tmp_path / "l.trec").read_text()

    assert lazy._dict is None   # none of the consumers materialized it


def test_fast_path_disabled_after_materialize_or_unsorted():
    qids, scores, ids = _batch(seed=4)
    lazy = ArrayRun(qids, scores, ids, scores_sorted=True)
    assert lazy.ranked_rows() is not None
    lazy.materialize()
    assert lazy.ranked_rows() is None           # dict may have been mutated
    unsorted = ArrayRun(qids, scores, ids, scores_sorted=False)
    assert unsorted.ranked_rows() is None
    # consumers still work through the Mapping path
    r = recall_at_k(unsorted, lambda q: q, (1,))
    assert r.num_queries > 0


def test_fuse_accepts_lazy_runs():
    qids, scores, ids = _batch(seed=5)
    lazy_a = ArrayRun(qids, scores, ids, scores_sorted=True)
    lazy_b = ArrayRun(qids, scores[::-1], ids[::-1], scores_sorted=True)
    eager_a = make_run(qids, scores, ids, scores_sorted=True)
    eager_b = make_run(qids, scores[::-1], ids[::-1], scores_sorted=True)
    assert fuse([lazy_a, lazy_b], [0.4, 0.6]) == \
        fuse([eager_a, eager_b], [0.4, 0.6])


def test_trec_read_back_roundtrip(tmp_path):
    qids, scores, ids = _batch(seed=6, ragged=False)
    lazy = ArrayRun(qids, scores, ids, scores_sorted=True)
    write_trec_run(lazy, str(tmp_path / "r.trec"), "t")
    back = read_trec_run(str(tmp_path / "r.trec"))
    eager = make_run(qids, scores, ids, scores_sorted=True)
    for q in eager:
        assert back[q]["docs"] == eager[q]["docs"]

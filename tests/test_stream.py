"""ops/stream.pipeline_dispatch invariants: ordering, bounded lookahead,
drain, None swallowing — the scheduling contract all three serving loops
(impact stream, dense batch_search, encode) rely on."""

import collections

from mllm_sparse_retrieval_tpu.ops.stream import pipeline_dispatch


def test_order_and_drain():
    resolved = []
    out = list(pipeline_dispatch(
        range(7), dispatch=lambda x: x * 10,
        resolve=lambda h: (resolved.append(h), h)[1], lookahead=3))
    assert resolved == [0, 10, 20, 30, 40, 50, 60]
    assert out == resolved


def test_lookahead_bound():
    in_flight = []
    max_depth = 0

    def dispatch(x):
        in_flight.append(x)
        nonlocal max_depth
        max_depth = max(max_depth, len(in_flight))
        return x

    def resolve(h):
        in_flight.remove(h)
        return None

    collections.deque(pipeline_dispatch(range(20), dispatch, resolve,
                                        lookahead=2), maxlen=0)
    assert max_depth == 2
    assert in_flight == []


def test_none_results_swallowed_and_zero_lookahead_clamped():
    out = list(pipeline_dispatch(
        range(5), dispatch=lambda x: x,
        resolve=lambda h: h if h % 2 else None, lookahead=0))
    assert out == [1, 3]


def test_empty_items():
    assert list(pipeline_dispatch(
        [], dispatch=lambda x: x, resolve=lambda h: h)) == []


def test_prefetch_thread_preserves_order_and_drains():
    from mllm_sparse_retrieval_tpu.ops.stream import prefetch_thread

    out = list(prefetch_thread(iter(range(50)), depth=3))
    assert out == list(range(50))
    assert list(prefetch_thread(iter([]), depth=2)) == []


def test_prefetch_thread_reraises_producer_error():
    import pytest
    from mllm_sparse_retrieval_tpu.ops.stream import prefetch_thread

    def gen():
        yield 1
        yield 2
        raise RuntimeError("producer broke")

    it = prefetch_thread(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="producer broke"):
        next(it)


def test_prefetch_thread_abandoned_consumer_stops_worker():
    import threading
    import time as _time
    from mllm_sparse_retrieval_tpu.ops.stream import prefetch_thread

    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch_thread(gen(), depth=2)
    assert next(it) == 0
    it.close()  # abandon: generator finalizer must set the stop event
    n_after_close = len(produced)
    _time.sleep(0.3)
    # worker may finish the item it was blocked on, but must not run away
    assert len(produced) <= n_after_close + 3


def test_search_terms_stream_uses_prefetched_encode():
    """End-to-end through the id-keyed stream: results equal the serial
    search_terms path (the prefetch thread must not reorder batches)."""
    import numpy as np
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    rng = np.random.default_rng(7)
    doc_terms = rng.integers(0, 50, size=(64, 8)).astype(np.int32)
    doc_weights = rng.integers(1, 90, size=(64, 8)).astype(np.float32)
    index = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                           term_keys=range(50))
    batches = []
    for r in range(5):
        qi = rng.integers(0, 50, size=(6, 4)).astype(np.int32)
        qw = rng.integers(1, 40, size=(6, 4)).astype(np.int32)
        batches.append([SelectedTerms(qi[i], qw[i]) for i in range(6)])
    streamed = list(index.search_terms_stream(batches, depth=7))
    for tb, (s_st, i_st) in zip(batches, streamed):
        s_se, i_se = index.search_terms(tb, depth=7)
        assert s_se == s_st
        assert [set(zip(a, b)) for a, b in zip(s_se, i_se)] == \
            [set(zip(a, b)) for a, b in zip(s_st, i_st)]


def test_make_run_sorted_fast_path_matches_scan():
    from mllm_sparse_retrieval_tpu.search.runs import make_run

    ids = ["q0", "q1"]
    scores = [[9.0, 5.0, 1.0], []]
    ranks = [["a", "b", "c"], []]
    fast = make_run(ids, scores, ranks, scores_sorted=True)
    scan = make_run(ids, scores, ranks)
    assert fast == scan
    assert fast["q0"]["min_score"] == 1.0 and fast["q0"]["max_score"] == 9.0
    assert fast["q1"]["min_score"] == 0.0 and fast["q1"]["max_score"] == 0.0

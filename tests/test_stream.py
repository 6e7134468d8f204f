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

"""C host-ops vs the pure-Python reference implementations.

hostops/hostops.c accelerates the two GIL-bound serving residues
(make_run assembly, SelectedTerms row stacking); the Python bodies stay
the semantic reference. Every test asserts bit parity between the two
paths, including the fallback corners (non-list rows, non-int32 rows).
"""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu import hostops
from mllm_sparse_retrieval_tpu.search import runs as runs_mod
from mllm_sparse_retrieval_tpu.search.runs import make_run

native = hostops.get()
needs_native = pytest.mark.skipif(native is None,
                                  reason="hostops extension unavailable")


def _python_make_run(*args, **kw):
    """make_run forced down the Python body."""
    stub = type("stub", (), {"get": staticmethod(lambda: None)})
    runs_mod._hostops = stub
    try:
        return make_run(*args, **kw)
    finally:
        runs_mod._hostops = hostops


@needs_native
@pytest.mark.parametrize("remove_query", [False, True])
@pytest.mark.parametrize("scores_sorted", [False, True])
def test_build_runs_matches_python(remove_query, scores_sorted):
    rng = np.random.default_rng(0)
    n, k = 50, 12
    qids = [f"d{3 * i}" for i in range(n)]
    scores, ids = [], []
    for i in range(n):
        row = rng.normal(size=rng.integers(0, k + 1)).tolist()
        if scores_sorted:
            row.sort(reverse=True)
        scores.append(row)
        # make some rows contain the qid (self hits)
        row_ids = [f"d{int(x)}" for x in rng.integers(0, 3 * n, len(row))]
        if row and i % 3 == 0:
            row_ids[rng.integers(0, len(row))] = qids[i]
        ids.append(row_ids)

    got = make_run(qids, scores, ids, remove_query=remove_query,
                   scores_sorted=scores_sorted)
    want = _python_make_run(qids, scores, ids, remove_query=remove_query,
                            scores_sorted=scores_sorted)
    assert got == want


@needs_native
def test_build_runs_numeric_coercion_matches():
    """Non-str ids / non-float scores coerce exactly like the Python path
    (np.str_ keys compare equal to str; np floats coerce via float())."""
    qids = [np.str_("q0"), 7]
    scores = [[np.float32(1.5), np.float64(0.25)], []]
    ids = [[np.str_("a"), "b"], []]
    got = make_run(qids, scores, ids)
    want = _python_make_run(qids, scores, ids)
    assert got == want
    assert got["q0"]["docs"]["a"] == 1.5
    assert got["7"] == {"docs": {}, "min_score": 0.0, "max_score": 0.0}


@needs_native
def test_build_runs_rejects_non_list_rows():
    """Tuple rows raise TypeError in C; make_run falls back to Python and
    still succeeds."""
    with pytest.raises(TypeError):
        native.build_runs(["q"], [(1.0, 0.5)], [("a", "b")], False, False)
    out = make_run(["q"], [(1.0, 0.5)], [("a", "b")])
    assert out["q"]["docs"] == {"a": 1.0, "b": 0.5}


@needs_native
def test_stack_rows_matches_numpy():
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    rng = np.random.default_rng(1)
    b, w = 40, 16
    rows = [SelectedTerms(rng.integers(0, 999, w).astype(np.int32),
                          rng.integers(1, 99, w).astype(np.int32))
            for _ in range(b)]
    ti = np.empty((b, w), np.int32)
    tw = np.empty((b, w), np.int32)
    assert native.stack_rows(rows, "token_ids", "weights", ti, tw)
    np.testing.assert_array_equal(ti, np.stack([r.token_ids for r in rows]))
    np.testing.assert_array_equal(tw, np.stack([r.weights for r in rows]))


@needs_native
def test_stack_rows_refuses_wrong_dtype_or_shape():
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    b, w = 4, 8
    ti = np.empty((b, w), np.int32)
    tw = np.empty((b, w), np.int32)
    rows64 = [SelectedTerms(np.arange(w), np.arange(w))  # int64 rows
              for _ in range(b)]
    assert not native.stack_rows(rows64, "token_ids", "weights", ti, tw)
    short = [SelectedTerms(np.arange(w - 1, dtype=np.int32),
                           np.arange(w - 1, dtype=np.int32))
             for _ in range(b)]
    assert not native.stack_rows(short, "token_ids", "weights", ti, tw)


@needs_native
def test_encode_query_terms_native_path_bit_identical():
    """ImpactIndex.encode_query_terms equal-width output is identical with
    the native row stack and with it disabled."""
    from mllm_sparse_retrieval_tpu.index import impact as impact_mod
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    rng = np.random.default_rng(2)
    terms = 200
    idx = ImpactIndex.from_packed_arrays(
        rng.integers(0, terms, (30, 8)).astype(np.int32),
        rng.integers(1, 50, (30, 8)).astype(np.float32),
        term_keys=range(terms))
    rows = [SelectedTerms(rng.integers(0, 2 * terms, 12).astype(np.int32),
                          rng.integers(-3, 40, 12).astype(np.int32))
            for _ in range(20)]
    got = idx.encode_query_terms(rows)
    real = impact_mod._hostops
    try:
        impact_mod._hostops = type("stub", (),
                                   {"get": staticmethod(lambda: None)})
        want = idx.encode_query_terms(rows)
    finally:
        impact_mod._hostops = real
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


@needs_native
def test_encode_terms_fused_qmax_and_canonical_parity():
    """The fused C encode (hostops.encode_terms) must be bit-identical to
    the numpy path under q_max pad widening, and a canonical_map must
    bypass it (the C op doesn't implement the merge) while staying
    bit-identical end to end."""
    from mllm_sparse_retrieval_tpu.index import impact as impact_mod
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    rng = np.random.default_rng(3)
    terms = 150
    idx = ImpactIndex.from_packed_arrays(
        rng.integers(0, terms, (25, 6)).astype(np.int32),
        rng.integers(1, 30, (25, 6)).astype(np.float32),
        term_keys=range(terms))
    rows = [SelectedTerms(rng.integers(-5, terms + 40, 10).astype(np.int32),
                          rng.integers(-2, 25, 10).astype(np.int32))
            for _ in range(12)]
    canon = np.arange(terms + 40, dtype=np.int64)
    canon[terms // 2] = terms // 3      # fold one id into another

    real = impact_mod._hostops
    stub = type("stub", (), {"get": staticmethod(lambda: None)})
    for kwargs in ({"q_max": 130}, {"canonical_map": canon},
                   {"q_max": 130, "canonical_map": canon}):
        got = idx.encode_query_terms(rows, **kwargs)
        try:
            impact_mod._hostops = stub
            want = idx.encode_query_terms(rows, **kwargs)
        finally:
            impact_mod._hostops = real
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        if "q_max" in kwargs:
            assert got[0].shape[1] >= 130 and got[0].shape[1] % 64 == 0


@needs_native
def test_encode_terms_adversarial_inputs():
    """Edge cases straight at the C op: extreme/negative token ids vs a
    tiny lut (bounds check), pad-region zero fill over poisoned buffers,
    wrong-width rows / int64 rows / too-small outputs -> False (fallback),
    missing attribute -> AttributeError."""
    native = hostops.get()

    class Row:
        def __init__(self, i, w):
            self.token_ids, self.weights = i, w

    lut = np.array([3], np.int32)
    rows = [Row(np.array([0, -1, 2**31 - 1, 5], np.int32),
                np.array([1, 1, 1, 0], np.int32))]
    oi = np.full((1, 64), -9, np.int32)
    ow = np.full((1, 64), -9.0, np.float32)
    assert native.encode_terms(rows, "token_ids", "weights", lut, 4, oi, ow)
    assert oi[0, :4].tolist() == [3, 0, 0, 0]
    assert ow[0, :4].tolist() == [1.0, 0.0, 0.0, 0.0]
    assert (oi[0, 4:] == 0).all() and (ow[0, 4:] == 0).all()

    bad = [Row(np.array([0], np.int32), np.array([1], np.int32))]
    assert not native.encode_terms(bad, "token_ids", "weights", lut, 4,
                                   oi, ow)
    r64 = [Row(np.arange(4, dtype=np.int64), np.ones(4, np.int64))]
    assert not native.encode_terms(r64, "token_ids", "weights", lut, 4,
                                   oi, ow)
    small_i = np.zeros((1, 2), np.int32)
    small_w = np.zeros((1, 2), np.float32)
    assert not native.encode_terms(rows, "token_ids", "weights", lut, 4,
                                   small_i, small_w)

    class NoAttr:
        pass

    with pytest.raises(AttributeError):
        native.encode_terms([NoAttr()], "token_ids", "weights", lut, 4,
                            oi, ow)


def test_fuse_runs_native_bit_parity():
    """hostops.fuse_runs must produce BIT-identical doubles to the Python
    fuse() body across: overlapping/disjoint docs, asymmetric qids, int
    scores, zero-range runs (denominator floor), negative weights, and >2
    runs. Also: surprising entry shapes raise TypeError inside C and fall
    back to Python transparently via fuse()."""
    import random

    from mllm_sparse_retrieval_tpu.search import fusion as fusion_mod
    from mllm_sparse_retrieval_tpu.search.fusion import fuse

    rng = random.Random(7)

    def rand_run(n_q, present=1.0, int_scores=False, flat=False):
        run = {}
        for q in range(n_q):
            if rng.random() > present:
                continue
            docs = {}
            for d in rng.sample(range(40), rng.randint(0, 12)):
                s = rng.randint(0, 500) if int_scores else \
                    rng.uniform(-3, 9)
                docs[f"d{d}"] = s
            vals = list(docs.values())
            if flat and vals:          # zero-range -> 1e-9 denominator
                docs = {k: vals[0] for k in docs}
                vals = list(docs.values())
            run[f"q{q}"] = {
                "docs": docs,
                "min_score": float(min(vals)) if vals else 0.0,
                "max_score": float(max(vals)) if vals else 0.0,
            }
        return run

    cases = [
        ([rand_run(10), rand_run(10)], [0.3, 0.7]),
        ([rand_run(8, present=0.6), rand_run(8, present=0.7)], [0.5, 0.5]),
        ([rand_run(6, int_scores=True), rand_run(6)], [1.0, -0.25]),
        ([rand_run(5, flat=True), rand_run(5)], [0.4, 0.6]),
        ([rand_run(4), rand_run(4), rand_run(4, present=0.5)],
         [0.2, 0.3, 0.5]),
        ([rand_run(3), {}], [0.9, 0.1]),
    ]
    real = hostops.get()
    assert real is not None
    stub = type("stub", (), {"get": staticmethod(lambda: None)})
    for runs, weights in cases:
        got = fuse(runs, weights)
        try:
            fusion_mod._hostops = stub
            want = fuse(runs, weights)
        finally:
            fusion_mod._hostops = hostops
        assert set(got) == set(want)
        for qid in want:
            assert got[qid] == want[qid], f"fused values differ for {qid}"

    # malformed entry -> C raises TypeError -> fuse() falls back silently
    bad = [{"q0": {"docs": "not-a-dict", "min_score": 0.0,
                   "max_score": 1.0}}]
    try:
        fusion_mod._hostops = stub
        want_err = None
        try:
            fuse(bad, [1.0])
        except Exception as e:
            want_err = type(e)
    finally:
        fusion_mod._hostops = hostops
    if want_err is None:
        fuse(bad, [1.0])     # must not raise if Python path doesn't
    else:
        with pytest.raises(want_err):
            fuse(bad, [1.0])


@needs_native
def test_merge_topk_rows_bit_parity():
    """C live-segment merge == the Python reference in index.live, on
    ragged rows with ties (stable order matters), tombstones, and pads."""
    import numpy as np

    from mllm_sparse_retrieval_tpu.index import live as live_mod

    rng = np.random.default_rng(0)
    n_seg, b = 4, 12

    class Seg:
        def __init__(self, tombstones, n_pad):
            self.tombstones = tombstones
            self.n_pad = n_pad

    per_segment, segments = [], []
    for s in range(n_seg):
        scores, ids = [], []
        for q in range(b):
            m = int(rng.integers(0, 9))
            # integer scores force ties across and within segments
            scores.append([float(x) for x in rng.integers(0, 6, m)])
            ids.append([f"s{s}d{rng.integers(0, 30)}" for _ in range(m)]
                       + ([live_mod._PAD_ID] if m and s % 2 else []))
            if m and s % 2:          # pad entry needs a score too
                scores[-1].append(float(rng.integers(0, 6)))
        per_segment.append((scores, ids))
        tomb = {f"s{s}d{j}" for j in rng.integers(0, 30, 4)}
        segments.append(Seg(tomb, n_pad=1 if s % 2 else 0))

    got = native.merge_topk_rows(
        [p[0] for p in per_segment], [p[1] for p in per_segment],
        [seg.tombstones for seg in segments],
        [1 if seg.n_pad else 0 for seg in segments],
        live_mod._PAD_ID, 6)

    # force the Python reference by hiding the native module
    import unittest.mock as mock
    with mock.patch.object(live_mod._hostops, "get", lambda: None):
        ref = live_mod._merge_rows(per_segment, segments, 6)
    assert got[0] == ref[0]          # exact floats, exact order
    assert got[1] == ref[1]          # stable tie order preserved

"""Doc filters (tenant-scoped search): filtered search over the full index
must equal an unfiltered search over a fresh index holding ONLY the allowed
docs — for both engines, every backend/dtype, single-chip and mesh."""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index import (DenseFlatIndex, DocFilter)
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.parallel import make_mesh


def _int_reps(rng, n, d):
    return rng.integers(-9, 10, size=(n, d)).astype(np.float32)


def _sparse_docs(rng, ids, vocab, k=5):
    return {i: {int(t): int(rng.integers(1, 30))
                for t in rng.choice(vocab, k, replace=False)}
            for i in ids}


def _tie_rows_equal(a_rows, b_rows):
    """(scores, ids) ragged rows equal as (score, id) sets per row (tie
    order across different compiled programs is not part of the contract)."""
    (a_s, a_i), (b_s, b_i) = a_rows, b_rows
    assert len(a_s) == len(b_s)
    for sa, ia, sb, ib in zip(a_s, a_i, b_s, b_i):
        assert {(round(float(s), 4), d) for s, d in zip(sa, ia)} == \
            {(round(float(s), 4), d) for s, d in zip(sb, ib)}


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    ids = [f"d{i}" for i in range(60)]
    sparse = _sparse_docs(rng, ids, np.arange(40))
    reps = dict(zip(ids, _int_reps(rng, 60, 16)))
    allowed = [f"d{i}" for i in range(0, 60, 3)]          # every third doc
    terms = [{int(t): float(rng.integers(1, 9))
              for t in rng.choice(40, 4, replace=False)} for _ in range(7)]
    denses = _int_reps(rng, 7, 16)
    return ids, sparse, reps, allowed, terms, denses


def _impact(docs):
    idx = ImpactIndex()
    idx.add_many(sorted(docs.items()))
    idx.finalize()
    return idx


def _dense(reps, dtype=np.float32):
    idx = DenseFlatIndex(dtype=dtype)
    ids = sorted(reps)
    idx.add(np.stack([reps[i] for i in ids]), ids)
    return idx


def test_impact_filter_matches_subindex(corpus):
    ids, sparse, _, allowed, terms, _ = corpus
    full = _impact(sparse)
    sub = _impact({i: sparse[i] for i in allowed})
    filt = DocFilter.from_ids(full.doc_ids, allowed)
    assert filt.n_allowed == len(allowed)
    got = full.search(terms, 10, backend="matmul", doc_filter=filt)
    ref = sub.search(terms, 10, backend="matmul")
    _tie_rows_equal(got, ref)
    # taat backend (interpreted off-TPU) through the same filter
    got_t = full.search(terms, 10, backend="taat", doc_filter=filt)
    _tie_rows_equal(got_t, ref)
    # deny mode: the complement
    deny = DocFilter.from_ids(full.doc_ids, allowed, mode="deny")
    sub_c = _impact({i: sparse[i] for i in ids if i not in set(allowed)})
    _tie_rows_equal(full.search(terms, 10, backend="matmul",
                                doc_filter=deny),
                    sub_c.search(terms, 10, backend="matmul"))


def test_impact_filter_mesh_matches_single(corpus):
    _, sparse, _, allowed, terms, _ = corpus
    mesh = make_mesh()
    full = _impact(sparse)
    filt = DocFilter.from_ids(full.doc_ids, allowed)
    single = full.search(terms, 8, backend="matmul", doc_filter=filt)
    meshed = full.search(terms, 8, backend="taat", mesh=mesh,
                         doc_filter=filt)
    _tie_rows_equal(meshed, single)


def test_impact_filter_compact48_wire_parity(corpus):
    """Filtered search keeps the compact48 wire (round 10, VERDICT r4 #8):
    the mask's -inf clamps to 0 in the 48-bit pack and resolves away via
    the score<=0 drop — identical rows to the i32 filtered wire, including
    when the filter allows fewer docs than the depth."""
    ids, sparse, _, allowed, terms, _ = corpus
    full = _impact(sparse)
    filt = DocFilter.from_ids(full.doc_ids, allowed)
    for backend in ("matmul", "taat"):
        got = full.search(terms, 10, backend=backend, wire="compact48",
                          doc_filter=filt)
        ref = full.search(terms, 10, backend=backend, wire="i32",
                          doc_filter=filt)
        _tie_rows_equal(got, ref)
    # depth beyond the allowed count: rows go ragged identically
    two = DocFilter.from_ids(full.doc_ids, allowed[:2])
    _tie_rows_equal(
        full.search(terms, 10, backend="matmul", wire="compact48",
                    doc_filter=two),
        full.search(terms, 10, backend="matmul", wire="i32",
                    doc_filter=two))
    # mesh still rejects compact48 (the sharded programs keep i32)
    with pytest.raises(ValueError, match="single-chip"):
        full.search(terms, 5, backend="matmul", wire="compact48",
                    mesh=make_mesh(), doc_filter=filt)


def test_dense_filter_matches_subindex(corpus):
    _, _, reps, allowed, _, denses = corpus
    full = _dense(reps)
    sub = _dense({i: reps[i] for i in allowed})
    filt = DocFilter.from_ids(full.lookup, allowed)
    got = full.search_ids(denses, 10, batch_size=4, doc_filter=filt)
    ref_s, ref_i = sub.search_ids(denses, 10, batch_size=4)
    _tie_rows_equal(got, (np.asarray(ref_s).tolist(), ref_i))


def test_dense_filter_ragged_when_depth_exceeds_allowed(corpus):
    _, _, reps, _, _, denses = corpus
    full = _dense(reps)
    filt = DocFilter.from_ids(full.lookup, ["d1", "d2", "d3"])
    scores, ids = full.search_ids(denses[:2], 10, doc_filter=filt)
    for s_row, i_row in zip(scores, ids):
        assert len(i_row) == len(s_row) == 3
        assert set(i_row) == {"d1", "d2", "d3"}
        assert all(np.isfinite(s) for s in s_row)


def test_dense_filter_int8_and_mesh(corpus):
    _, _, reps, allowed, _, denses = corpus
    filt_ids = allowed
    sub = _dense({i: reps[i] for i in filt_ids})
    ref_s, ref_i = sub.search_ids(denses, 6, batch_size=4)
    # int8 (SQ8): per-row quantization is identical whether or not other
    # rows are filtered, so the right oracle is an int8 SUB-index
    q8 = _dense(reps, dtype="int8")
    sub8 = _dense({i: reps[i] for i in filt_ids}, dtype="int8")
    filt8 = DocFilter.from_ids(q8.lookup, filt_ids)
    got8 = q8.search_ids(denses, 6, batch_size=4, doc_filter=filt8)
    ref8_s, ref8_i = sub8.search_ids(denses, 6, batch_size=4)
    _tie_rows_equal(got8, (np.asarray(ref8_s).tolist(), ref8_i))
    # mesh f32
    mesh = make_mesh()
    full = _dense(reps)
    filt = DocFilter.from_ids(full.lookup, filt_ids)
    got_m = full.search_ids(denses, 6, batch_size=4, mesh=mesh,
                            doc_filter=filt)
    _tie_rows_equal(got_m, (np.asarray(ref_s).tolist(), ref_i))


def test_ann_filter_matches_exact_subindex(corpus):
    """ANN + filter: stage-1 masking draws the candidate pool from allowed
    rows only, so at saturated candidates the result equals the exact
    filtered search (same docs, f32-rounding-equal scores)."""
    from mllm_sparse_retrieval_tpu.index import DenseANNIndex

    _, _, reps, allowed, _, denses = corpus
    ann = DenseANNIndex(rank=16, candidates=64)   # full rank (d=16)
    ids = sorted(reps)
    ann.add(np.stack([reps[i] for i in ids]), ids)
    filt = DocFilter.from_ids(ann.lookup, allowed)
    got = ann.search_ids(denses, 8, batch_size=4, doc_filter=filt)
    sub = _dense({i: reps[i] for i in allowed})
    ref_s, ref_i = sub.search_ids(denses, 8, batch_size=4)
    _tie_rows_equal(got, (np.asarray(ref_s).tolist(), ref_i))
    # mesh form
    mesh = make_mesh()
    got_m = ann.search_ids(denses, 8, batch_size=4, mesh=mesh,
                           doc_filter=filt)
    _tie_rows_equal(got_m, (np.asarray(ref_s).tolist(), ref_i))
    # highly selective filter: fewer allowed docs than depth -> ragged
    tiny = DocFilter.from_ids(ann.lookup, ids[:3])
    _, rows = ann.search_ids(denses[:2], 8, doc_filter=tiny)
    assert all(set(r) == set(ids[:3]) for r in rows)


def test_doc_filter_validation_and_cache(corpus):
    ids, _, reps, _, _, _ = corpus
    with pytest.raises(ValueError, match="bool"):
        DocFilter(np.ones(5, np.int32))
    with pytest.raises(ValueError, match="mode"):
        DocFilter.from_ids(ids, ["d1"], mode="nope")
    f = DocFilter.from_ids(ids, ["d1", "ghost"])
    assert f.n_allowed == 1                         # unknown ids ignored
    m1 = f.device_mask(64)
    assert f.device_mask(64) is m1                  # cached per (pad, mesh)
    with pytest.raises(ValueError, match="padded"):
        f.device_mask(10)

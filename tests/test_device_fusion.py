"""On-device hybrid fusion parity vs the host ``fuse`` path.

The device program (ops/hybrid_fusion.py) must reproduce
``fuse([dense_run, sparse_run], [alpha, 1-alpha])`` — the reference's
min-max weighted fusion (/root/reference/src/hybrid.py:32-53) — to float32
rounding, for every semantic corner the host path has: sparse zero-drop,
missing-from-one-run docs, self-hit removal AFTER min/max, shuffled doc
order between the two indexes, and query chunking.
"""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.search.device_fusion import FusedHybridSearcher
from mllm_sparse_retrieval_tpu.search.fusion import fuse
from mllm_sparse_retrieval_tpu.search.runs import make_run

ALPHA = 0.3


def _build(n_docs=80, dim=12, n_terms=60, seed=0, shuffle_dense=True):
    rng = np.random.default_rng(seed)
    doc_ids = [f"d{i}" for i in range(n_docs)]

    impact = ImpactIndex()
    for d in doc_ids:
        terms = rng.choice(n_terms, size=rng.integers(3, 9), replace=False)
        impact.add(d, {f"t{t}": int(rng.integers(1, 40)) for t in terms})
    impact.finalize()

    dense = DenseFlatIndex()
    order = rng.permutation(n_docs) if shuffle_dense else np.arange(n_docs)
    reps = rng.normal(size=(n_docs, dim)).astype(np.float32)
    dense.add(reps[order], [doc_ids[i] for i in order])

    # query reps in the DENSE index's doc-rep space + sparse query dicts;
    # q8 has an empty sparse side (no in-vocab terms), q9 matches few docs
    n_q = 12
    q_reps = rng.normal(size=(n_q, dim)).astype(np.float32)
    q_dicts = []
    for q in range(n_q):
        if q == 8:
            q_dicts.append({"zzz-out-of-vocab": 5})
            continue
        terms = rng.choice(n_terms, size=(1 if q == 9 else 5), replace=False)
        q_dicts.append({f"t{t}": int(rng.integers(1, 10)) for t in terms})
    qids = [f"d{3 * q}" for q in range(n_q)]   # doc-namespace ids -> self hits
    return impact, dense, q_reps, q_dicts, qids


def _host_fused(impact, dense, q_reps, q_dicts, qids, depth, remove_query):
    d_scores, d_ids = dense.search_ids(q_reps, depth)
    dense_run = make_run(qids, d_scores.tolist(), d_ids,
                         remove_query=remove_query, scores_sorted=True)
    s_scores, s_ids = impact.search(q_dicts, depth)
    sparse_run = make_run(qids, s_scores, s_ids,
                          remove_query=remove_query, scores_sorted=True)
    return fuse([dense_run, sparse_run], [ALPHA, 1.0 - ALPHA])


@pytest.mark.parametrize("remove_query", [False, True])
def test_device_fusion_matches_host_fuse(remove_query):
    impact, dense, q_reps, q_dicts, qids = _build()
    depth = 25
    host = _host_fused(impact, dense, q_reps, q_dicts, qids, depth,
                       remove_query)

    searcher = FusedHybridSearcher(dense, impact, alpha=ALPHA)
    q_idx, q_w = impact.encode_queries(q_dicts)
    # out_depth = full union so the doc SETS must match exactly
    dev = searcher.search_run(q_reps, q_idx, q_w, qids, depth,
                              remove_query=remove_query, out_depth=2 * depth)

    assert set(dev) == set(host)
    for qid in host:
        assert set(dev[qid]) == set(host[qid]), qid
        for doc, s in host[qid].items():
            assert dev[qid][doc] == pytest.approx(s, abs=1e-5), (qid, doc)


def test_device_fusion_out_depth_prefix():
    """Truncated out_depth returns the top fused scores (set comparison —
    equal-score ties at the boundary may pick either doc)."""
    impact, dense, q_reps, q_dicts, qids = _build(seed=3)
    depth, out_depth = 25, 7
    host = _host_fused(impact, dense, q_reps, q_dicts, qids, depth, False)

    searcher = FusedHybridSearcher(dense, impact, alpha=ALPHA)
    q_idx, q_w = impact.encode_queries(q_dicts)
    scores, ids = searcher.search_encoded(q_reps, q_idx, q_w, depth,
                                          out_depth=out_depth)
    for qid, s_row, d_row in zip(qids, scores, ids):
        want = sorted(host[qid].values(), reverse=True)[:out_depth]
        assert len(s_row) == min(out_depth, len(host[qid]))
        assert s_row == sorted(s_row, reverse=True)
        np.testing.assert_allclose(s_row, want, atol=1e-5)
        assert set(d_row) <= set(host[qid])


def test_device_fusion_chunked_matches_single():
    """A tiny HBM budget forces multi-chunk pipelining with tail padding;
    results must equal the single-chunk run."""
    impact, dense, q_reps, q_dicts, qids = _build(seed=7)
    depth = 20
    q_idx, q_w = impact.encode_queries(q_dicts)

    searcher = FusedHybridSearcher(dense, impact, alpha=ALPHA)
    ref_s, ref_i = searcher.search_encoded(q_reps, q_idx, q_w, depth)

    impact.hbm_budget_bytes = \
        sum(d.nbytes for d in impact._dev.values()) + 8 * 80 * 4 * 6
    plan = impact._search_plan(None, "matmul", depth)
    assert plan["max_b"] < len(q_dicts), "budget did not force chunking"
    got_s, got_i = searcher.search_encoded(q_reps, q_idx, q_w, depth)

    for a, b in zip(ref_s, got_s):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # ties within equal scores may reorder across programs; compare sets
    for s_row, a, b in zip(ref_s, ref_i, got_i):
        assert set(a) == set(b)


def test_fused_stream_matches_per_batch():
    """Multi-batch stream (incl. a forced-subchunk leg and per-batch qids)
    yields exactly the per-batch search_encoded results."""
    impact, dense, q_reps, q_dicts, qids = _build(seed=5)
    depth = 20
    q_idx, q_w = impact.encode_queries(q_dicts)
    searcher = FusedHybridSearcher(dense, impact, alpha=ALPHA)

    cuts = [(0, 5), (5, 7), (7, 12)]
    batches = [(q_reps[a:b], q_idx[a:b], q_w[a:b], qids[a:b])
               for a, b in cuts]
    serial = [searcher.search_encoded(q_reps[a:b], q_idx[a:b], q_w[a:b],
                                      depth, qids=qids[a:b])
              for a, b in cuts]
    streamed = list(searcher.search_encoded_stream(batches, depth))
    assert streamed == serial

    impact.hbm_budget_bytes = \
        sum(d.nbytes for d in impact._dev.values()) + 8 * 80 * 4 * 6
    plan = impact._search_plan(None, "matmul", depth)
    assert plan["max_b"] < 12, "budget did not force chunking"
    chunked = list(searcher.search_encoded_stream(batches, depth))
    for (s_a, i_a), (s_b, i_b) in zip(streamed, chunked):
        for ra, rb in zip(s_a, s_b):
            np.testing.assert_allclose(ra, rb, atol=1e-6)
        for ra, rb in zip(i_a, i_b):
            assert set(ra) == set(rb)


def test_fused_stream_rejects_out_of_order_resolution(monkeypatch):
    """Same invariant + guard as ImpactIndex.search_encoded_stream: the
    batch-boundary accumulator depends on FIFO resolution; a deliberate
    reorder trips the monotone assert loudly."""
    import mllm_sparse_retrieval_tpu.ops.stream as stream_mod

    impact, dense, q_reps, q_dicts, qids = _build(seed=13)
    q_idx, q_w = impact.encode_queries(q_dicts)
    searcher = FusedHybridSearcher(dense, impact, alpha=ALPHA)
    batches = [(q_reps[:6], q_idx[:6], q_w[:6]),
               (q_reps[6:], q_idx[6:], q_w[6:])]

    real = stream_mod.pipeline_dispatch

    def reordering(items, dispatch, resolve, lookahead=2):
        handles = [dispatch(it) for it in items]
        for h in reversed(handles):
            out = resolve(h)
            if out is not None:
                yield out

    monkeypatch.setattr(stream_mod, "pipeline_dispatch", reordering)
    with pytest.raises(AssertionError, match="out of order"):
        list(searcher.search_encoded_stream(batches, 10))
    monkeypatch.setattr(stream_mod, "pipeline_dispatch", real)
    assert list(searcher.search_encoded_stream(batches, 10))


def test_device_fusion_requires_one_corpus():
    impact, dense, *_ = _build(n_docs=10)
    other = DenseFlatIndex()
    other.add(np.zeros((3, 12), np.float32), ["x0", "x1", "x2"])
    with pytest.raises(ValueError, match="absent from the dense index"):
        FusedHybridSearcher(other, impact)


def test_device_fusion_mesh_dense_path():
    """The mesh dense program returns (scores, idx) parts; fused results
    must match the single-chip packed form."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from mllm_sparse_retrieval_tpu.parallel import make_mesh

    impact, dense, q_reps, q_dicts, qids = _build(seed=11)
    depth = 15
    q_idx, q_w = impact.encode_queries(q_dicts)

    single = FusedHybridSearcher(dense, impact, alpha=ALPHA)
    ref_s, _ = single.search_encoded(q_reps, q_idx, q_w, depth)

    mesh = make_mesh()
    sharded = FusedHybridSearcher(dense, impact, alpha=ALPHA, mesh=mesh)
    got_s, _ = sharded.search_encoded(q_reps, q_idx, q_w, depth)
    for a, b in zip(ref_s, got_s):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_device_fusion_with_bf16_dense_index():
    """The fused program composes with a bf16-stored dense corpus
    (index/dense.py dtype mode): integer-valued reps are bf16-exact, so
    fused scores must still match the f32 host path to f32 rounding."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n_docs, dim, n_terms = 40, 8, 30
    doc_ids = [f"d{i}" for i in range(n_docs)]
    impact = ImpactIndex()
    for d in doc_ids:
        terms = rng.choice(n_terms, size=4, replace=False)
        impact.add(d, {f"t{t}": int(rng.integers(1, 20)) for t in terms})
    impact.finalize()

    reps = rng.integers(-6, 6, size=(n_docs, dim)).astype(np.float32)
    dense = DenseFlatIndex(dtype=jnp.bfloat16)
    dense.add(reps, doc_ids)
    dense_f32 = DenseFlatIndex()
    dense_f32.add(reps, doc_ids)

    q_reps = rng.integers(-6, 6, size=(6, dim)).astype(np.float32)
    q_dicts = [{f"t{t}": int(rng.integers(1, 8))
                for t in rng.choice(n_terms, size=3, replace=False)}
               for _ in range(6)]
    qids = [f"q{i}" for i in range(6)]
    depth = 15

    q_idx, q_w = impact.encode_queries(q_dicts)
    bf = FusedHybridSearcher(dense, impact, alpha=ALPHA)
    f32 = FusedHybridSearcher(dense_f32, impact, alpha=ALPHA)
    s_bf, i_bf = bf.search_encoded(q_reps, q_idx, q_w, depth)
    s_32, i_32 = f32.search_encoded(q_reps, q_idx, q_w, depth)
    for a, b in zip(s_bf, s_32):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for a, b in zip(i_bf, i_32):
        assert set(a) == set(b)


def test_device_fusion_with_q8_dense_index():
    """The fused program composes with an int8 (SQ8) dense corpus: reps
    crafted with per-row absmax 127 and integer entries quantize losslessly
    (per-row scale 1.0), so fused scores must match the f32 dense index's
    fusion to f32 rounding."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    n_docs, dim, n_terms = 40, 8, 30
    doc_ids = [f"d{i}" for i in range(n_docs)]
    impact = ImpactIndex()
    for d in doc_ids:
        terms = rng.choice(n_terms, size=4, replace=False)
        impact.add(d, {f"t{t}": int(rng.integers(1, 20)) for t in terms})
    impact.finalize()

    reps = rng.integers(-127, 128, size=(n_docs, dim)).astype(np.float32)
    reps[:, 0] = 127.0 * np.sign(reps[:, 0] + 0.5)
    dense = DenseFlatIndex(dtype=jnp.int8)
    dense.add(reps, doc_ids)
    dense_f32 = DenseFlatIndex()
    dense_f32.add(reps, doc_ids)

    q_reps = rng.integers(-127, 128, size=(6, dim)).astype(np.float32)
    q_reps[:, 0] = 127.0 * np.sign(q_reps[:, 0] + 0.5)
    q_dicts = [{f"t{t}": int(rng.integers(1, 8))
                for t in rng.choice(n_terms, size=3, replace=False)}
               for _ in range(6)]
    qids = [f"q{i}" for i in range(6)]
    depth = 15

    q_idx, q_w = impact.encode_queries(q_dicts)
    q8 = FusedHybridSearcher(dense, impact, alpha=ALPHA)
    f32 = FusedHybridSearcher(dense_f32, impact, alpha=ALPHA)
    s_q8, i_q8 = q8.search_encoded(q_reps, q_idx, q_w, depth)
    s_32, i_32 = f32.search_encoded(q_reps, q_idx, q_w, depth)
    for a, b in zip(s_q8, s_32):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for a, b in zip(i_q8, i_32):
        assert set(a) == set(b)


def test_searcher_rejects_index_mutation():
    """Growing either index after construction must raise — the doc
    permutation and id lookup are cached at init (stale caches would
    resolve new docs to old ids silently)."""
    import pytest

    rng = np.random.default_rng(5)
    n, dim = 12, 8
    doc_t = rng.integers(0, 10, size=(n, 3)).astype(np.int32)
    doc_w = rng.integers(1, 50, size=(n, 3)).astype(np.float32)
    impact = ImpactIndex.from_packed_arrays(doc_t, doc_w, term_keys=range(10))
    dense = DenseFlatIndex()
    reps = rng.normal(size=(n, dim)).astype(np.float32)
    dense.add(reps, impact.doc_ids)
    f = FusedHybridSearcher(dense, impact, alpha=0.5, backend="matmul")
    q_i = rng.integers(0, 10, size=(2, 3)).astype(np.int32)
    q_w = rng.integers(1, 20, size=(2, 3)).astype(np.float32)
    f.search_encoded(reps[:2], q_i, q_w, 4)            # fresh: fine
    dense.add(rng.normal(size=(2, dim)).astype(np.float32), ["zz0", "zz1"])
    with pytest.raises(RuntimeError, match="membership changed"):
        f.search_encoded(reps[:2], q_i, q_w, 4)

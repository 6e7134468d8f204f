"""DenseANNIndex: low-rank prefilter + exact rescore vs the exact oracle.

Quality contract: (a) at full rank the candidate set is provably complete,
so results EQUAL DenseFlatIndex's (scores bit-identical — stage 2 rescoring
uses the same HIGHEST-precision arithmetic on the same rows); (b) at low
rank on spectrally-concentrated data, candidate recall@k beats a floor;
(c) the class is a drop-in: same ids/artifacts/chunking/mesh contract.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.index import DenseANNIndex, DenseFlatIndex
from mllm_sparse_retrieval_tpu.ops.ann import ip_projection
from mllm_sparse_retrieval_tpu.parallel import make_mesh


def _low_rank_corpus(rng, n, d, true_rank, noise=0.02):
    """Rows living near a ``true_rank``-dim subspace — the regime a
    spectral prefilter is FOR (real embedding matrices are like this;
    isotropic Gaussian noise is its adversarial opposite)."""
    u = rng.normal(size=(n, true_rank))
    basis = np.linalg.qr(rng.normal(size=(d, true_rank)))[0]
    x = u @ basis.T + noise * rng.normal(size=(n, d))
    return x.astype(np.float32)


def _recall(approx_ids, exact_ids, k):
    hits = sum(len(set(a[:k]) & set(e[:k])) for a, e in
               zip(approx_ids, exact_ids))
    return hits / (k * len(exact_ids))


def test_full_rank_matches_exact_bitwise():
    rng = np.random.default_rng(0)
    reps = rng.normal(size=(300, 16)).astype(np.float32)
    ids = [f"d{i}" for i in range(300)]
    q = rng.normal(size=(9, 16)).astype(np.float32)

    exact = DenseFlatIndex()
    exact.add(reps, ids)
    ann = DenseANNIndex(rank=16, candidates=64)
    ann.add(reps, ids)

    es, ei = exact.search_ids(q, 10, batch_size=4)
    as_, ai = ann.search_ids(q, 10, batch_size=4)
    # full-rank orthonormal basis preserves every inner product, and
    # candidates(64) > k(10): identical top-k docs; scores agree to f32
    # rounding (the rescore einsum's contraction order differs from the
    # exact path's matmul by ~1 ulp even at HIGHEST precision)
    np.testing.assert_allclose(np.asarray(es), np.asarray(as_), rtol=2e-6)
    for e_row, a_row in zip(ei, ai):
        assert set(e_row) == set(a_row)


def test_low_rank_recall_on_spectral_data():
    rng = np.random.default_rng(1)
    reps = _low_rank_corpus(rng, 4000, 64, true_rank=12)
    ids = [f"d{i}" for i in range(4000)]
    q = _low_rank_corpus(rng, 32, 64, true_rank=12)

    exact = DenseFlatIndex()
    exact.add(reps, ids)
    ann = DenseANNIndex(rank=16, candidates=128)
    ann.add(reps, ids)

    _, ei = exact.search_ids(q, 10, batch_size=16)
    _, ai = ann.search_ids(q, 10, batch_size=16)
    r = _recall(ai, ei, 10)
    assert r >= 0.95, f"candidate recall@10 {r:.3f}"
    # returned scores for found docs are EXACT: check against brute force
    s, i_rows = ann.search_ids(q[:2], 5, batch_size=16)
    brute = q[:2] @ reps.T
    for qi, (srow, irow) in enumerate(zip(np.asarray(s), i_rows)):
        for sc, doc in zip(srow, irow):
            assert sc == pytest.approx(brute[qi, int(doc[1:])], abs=1e-3)


def test_candidates_clamp_to_depth_and_corpus():
    rng = np.random.default_rng(2)
    reps = rng.normal(size=(20, 8)).astype(np.float32)
    ann = DenseANNIndex(rank=4, candidates=4)      # candidates < depth
    ann.add(reps, [f"d{i}" for i in range(20)])
    s, i = ann.search_ids(rng.normal(size=(3, 8)).astype(np.float32), 12)
    assert np.asarray(s).shape == (3, 12) and len(i[0]) == 12


def test_add_invalidates_projection():
    rng = np.random.default_rng(3)
    ann = DenseANNIndex(rank=8, candidates=32)
    ann.add(rng.normal(size=(50, 16)).astype(np.float32),
            [f"a{i}" for i in range(50)])
    q = rng.normal(size=(2, 16)).astype(np.float32)
    ann.search_ids(q, 5)
    # grow the corpus; the basis and projected rows must rebuild
    target = np.ones((1, 16), np.float32) * 9
    ann.add(target, ["new"])
    s, i = ann.search_ids(np.ones((1, 16), np.float32), 1)
    assert i[0] == ["new"]


def test_mesh_matches_single_chip():
    mesh = make_mesh()
    rng = np.random.default_rng(4)
    reps = _low_rank_corpus(rng, 1000, 32, true_rank=8)
    ids = [f"d{i}" for i in range(1000)]
    q = _low_rank_corpus(rng, 8, 32, true_rank=8)

    single = DenseANNIndex(rank=12, candidates=900)
    single.add(reps, ids)
    sharded = DenseANNIndex(rank=12, candidates=128)   # 128/shard x 8
    sharded.add(reps, ids)

    ss, si = single.search_ids(q, 10, batch_size=8)
    ms, mi = sharded.search_ids(q, 10, batch_size=8, mesh=mesh)
    # near-saturated candidate pools on both sides: same docs, same exact
    # scores (tie-aware set compare per row)
    for a, b, arow, brow in zip(np.asarray(ss), np.asarray(ms), si, mi):
        assert set(zip(a.tolist(), arow)) == set(zip(b.tolist(), brow))


def test_artifact_interchange_with_flat(tmp_path):
    rng = np.random.default_rng(5)
    reps = rng.normal(size=(100, 8)).astype(np.float32)
    ids = [f"d{i}" for i in range(100)]
    flat = DenseFlatIndex()
    flat.add(reps, ids)
    flat.save_shard(str(tmp_path / "corpus_0.pkl"))

    ann = DenseANNIndex.load(str(tmp_path / "corpus_0.pkl"))
    assert isinstance(ann, DenseANNIndex) and ann.size == 100
    q = rng.normal(size=(2, 8)).astype(np.float32)
    _, i = ann.search_ids(q, 3)
    _, ie = flat.search_ids(q, 3)
    # default rank 64 >= d=8 -> full-rank -> identical results
    assert i == ie
    # and from_flat shares rows without copying
    ann2 = DenseANNIndex.from_flat(flat, rank=8, candidates=16)
    assert ann2._chunks[0] is flat._chunks[0]
    _, i2 = ann2.search_ids(q, 3)
    assert i2 == ie


def test_int8_rejected():
    with pytest.raises(ValueError, match="int8"):
        DenseANNIndex(dtype="int8")


def test_ip_projection_properties():
    rng = np.random.default_rng(6)
    x = _low_rank_corpus(rng, 500, 24, true_rank=6, noise=0.0)
    p = ip_projection(x, 6)
    assert p.shape == (24, 6)
    # orthonormal columns
    np.testing.assert_allclose(p.T @ p, np.eye(6), atol=1e-5)
    # noise-free rank-6 data: projection is lossless on inner products
    q = x[:3]
    np.testing.assert_allclose((q @ p) @ (x @ p).T, q @ x.T,
                               rtol=1e-4, atol=1e-3)
    # rank clamps to d
    assert ip_projection(x, 99).shape == (24, 24)
"""Dense MIPS index tests: exactness vs numpy brute force, sharded merge parity."""

import numpy as np
import pytest

import jax

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.ops.mips import mips_topk, sharded_mips_topk
from mllm_sparse_retrieval_tpu.parallel import make_mesh


def _brute_topk(q, c, k):
    scores = q.astype(np.float64) @ c.astype(np.float64).T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_mips_topk_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 32)).astype(np.float32)
    c = rng.normal(size=(150, 32)).astype(np.float32)
    scores, idx = mips_topk(q, c, 10)
    ref_scores, ref_idx = _brute_topk(q, c, 10)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)


def test_sharded_mips_matches_single_device():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    c = rng.normal(size=(203, 16)).astype(np.float32)  # not divisible by 8
    mesh = make_mesh()
    assert mesh.devices.size == 8

    n_shards = mesh.shape["data"]
    pad = (-c.shape[0]) % n_shards
    c_padded = np.concatenate([c, np.zeros((pad, 16), np.float32)])
    from jax.sharding import NamedSharding, PartitionSpec as P
    c_dev = jax.device_put(c_padded, NamedSharding(mesh, P("data", None)))

    scores, idx = sharded_mips_topk(mesh, q, c_dev, c.shape[0], 20)
    ref_scores, ref_idx = _brute_topk(q, c, 20)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    # padded rows never surface
    assert np.asarray(idx).max() < c.shape[0]


def test_depth_larger_than_corpus_is_clamped():
    rng = np.random.default_rng(2)
    index = DenseFlatIndex()
    index.add(rng.normal(size=(12, 8)).astype(np.float32), [f"d{i}" for i in range(12)])
    scores, ids = index.search_ids(rng.normal(size=(3, 8)).astype(np.float32),
                                   depth=100, batch_size=4)
    assert scores.shape == (3, 12)
    assert len(ids[0]) == 12


def test_index_add_search_ids_and_pickle_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    c = rng.normal(size=(40, 8)).astype(np.float32)
    ids = [f"doc{i}" for i in range(40)]
    index = DenseFlatIndex()
    index.add(c[:25], ids[:25])
    index.add(c[25:], ids[25:])
    q = c[[3, 17, 39]] # exact-match queries
    scores, rids = index.search_ids(q, depth=1)
    assert [r[0] for r in rids] == ["doc3", "doc17", "doc39"]

    path = tmp_path / "corpus_0.pkl"
    index.save_shard(str(path))
    back = DenseFlatIndex.load(str(path))
    assert back.size == 40
    scores2, rids2 = back.search_ids(q, depth=5)
    assert [r[0] for r in rids2] == ["doc3", "doc17", "doc39"]
    np.testing.assert_allclose(scores2[:, 0], scores[:, 0], rtol=1e-6)


def test_index_sharded_search_on_mesh(tmp_path):
    rng = np.random.default_rng(4)
    c = rng.normal(size=(100, 8)).astype(np.float32)
    ids = [str(i) for i in range(100)]
    index = DenseFlatIndex()
    index.add(c, ids)
    mesh = make_mesh()
    q = rng.normal(size=(6, 8)).astype(np.float32)
    scores_m, idx_m = index.batch_search(q, depth=10, batch_size=6, mesh=mesh)
    scores_s, idx_s = index.batch_search(q, depth=10, batch_size=6)
    np.testing.assert_array_equal(idx_m, idx_s)
    np.testing.assert_allclose(scores_m, scores_s, rtol=1e-5)


def test_batch_search_partial_final_batch():
    rng = np.random.default_rng(5)
    index = DenseFlatIndex()
    index.add(rng.normal(size=(30, 8)).astype(np.float32), list(range(30)))
    q = rng.normal(size=(10, 8)).astype(np.float32)
    s1, i1 = index.batch_search(q, depth=5, batch_size=4)  # 4+4+2
    s2, i2 = index.batch_search(q, depth=5, batch_size=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)

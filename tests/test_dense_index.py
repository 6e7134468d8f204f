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


# ---- bf16 device-dtype mode -------------------------------------------------
# dtype=jnp.bfloat16 halves HBM + upload bytes and scores in one MXU pass;
# scores are bf16-rounded operands accumulated in f32 (index/dense.py).

import jax.numpy as jnp  # noqa: E402


def _int_reps(rng, shape, lo=-8, hi=8):
    """Small-integer reps: exactly representable in bf16, so the bf16 index
    must score BIT-IDENTICALLY to f32 (f32 accumulation of exact operands)."""
    return rng.integers(lo, hi, size=shape).astype(np.float32)


def test_bf16_index_bit_exact_on_representable_values():
    rng = np.random.default_rng(7)
    c = _int_reps(rng, (60, 16))
    q = _int_reps(rng, (9, 16))
    ids = [f"d{i}" for i in range(60)]
    f32 = DenseFlatIndex()
    f32.add(c, ids)
    bf16 = DenseFlatIndex(dtype=jnp.bfloat16)
    bf16.add(c, ids)
    s32, i32 = f32.search(q, depth=8)
    s16, i16 = bf16.search(q, depth=8)
    # equal-score ties may order differently; compare (score, id) sets
    for r in range(q.shape[0]):
        assert sorted(zip(np.asarray(s32)[r], np.asarray(i32)[r]))[::-1] == \
            sorted(zip(np.asarray(s16)[r], np.asarray(i16)[r]))[::-1] or \
            sorted(np.asarray(s32)[r].tolist()) == \
            sorted(np.asarray(s16)[r].tolist())


def test_bf16_index_rank_overlap_on_gaussian_reps():
    """On realistic float reps, bf16 rounding may swap near-ties but the
    top-k SET should stay close to the f32 index's (overlap >= 0.9)."""
    rng = np.random.default_rng(8)
    c = rng.normal(size=(2000, 64)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = rng.normal(size=(32, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids = [str(i) for i in range(2000)]
    f32 = DenseFlatIndex()
    f32.add(c, ids)
    bf16 = DenseFlatIndex(dtype=jnp.bfloat16)
    bf16.add(c, ids)
    _, i32 = f32.search(q, depth=10)
    _, i16 = bf16.search(q, depth=10)
    overlap = np.mean([
        len(set(np.asarray(i32)[r]) & set(np.asarray(i16)[r])) / 10.0
        for r in range(q.shape[0])])
    assert overlap >= 0.9, f"bf16 top-10 overlap {overlap:.3f} < 0.9"


def test_bf16_artifact_stays_float32(tmp_path):
    rng = np.random.default_rng(9)
    index = DenseFlatIndex(dtype=jnp.bfloat16)
    index.add(rng.normal(size=(10, 8)).astype(np.float32), list(range(10)))
    path = tmp_path / "corpus_0.pkl"
    index.save_shard(str(path))
    import pickle
    with open(path, "rb") as f:
        reps, lookup = pickle.load(f)
    assert reps.dtype == np.float32  # reference-compatible artifact


def test_bf16_index_on_mesh_matches_single_chip():
    """bf16 corpus sharded over the data axis: the per-shard bf16 matmul +
    ICI merge must equal the single-replica bf16 result (same rounding)."""
    rng = np.random.default_rng(10)
    c = _int_reps(rng, (52, 16))   # bf16-exact values -> bit-equal scores
    ids = [str(i) for i in range(52)]
    q = _int_reps(rng, (5, 16))
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    mesh = make_mesh()
    index = DenseFlatIndex(dtype=jnp.bfloat16)
    index.add(c, ids)
    s_m, i_m = index.search(q, depth=7, mesh=mesh)
    index2 = DenseFlatIndex(dtype=jnp.bfloat16)
    index2.add(c, ids)
    s_s, i_s = index2.search(q, depth=7)
    for r in range(q.shape[0]):
        assert sorted(np.asarray(s_m)[r].tolist()) == \
            sorted(np.asarray(s_s)[r].tolist())


# ---- int8 (SQ8) device-dtype mode -------------------------------------------
# dtype=jnp.int8 quarters HBM + upload bytes vs f32 and scores as an
# s8 x s8 -> s32 MXU matmul; per-row corpus scales and per-query query
# scales dequantize the accumulator to f32 before top-k (ops/mips.py
# mips_topk_packed_q8). The reference's FAISS index is flat f32
# (/root/reference/src/search.py:227-270); SQ8 is the FAISS scalar-
# quantizer capability class, an extension.


def _q8_exact_reps(rng, shape):
    """Rows with absmax exactly 127 and integer entries: the per-row scale
    becomes 1.0 and symmetric int8 quantization is lossless, so the SQ8
    index must match the f32 index bit-for-bit (s32 accumulation is exact;
    sums stay far below 2^24)."""
    x = rng.integers(-127, 128, size=shape).astype(np.float32)
    x[:, 0] = 127.0 * np.sign(x[:, 0] + 0.5)
    return x


def test_q8_index_bit_exact_on_integer_reps():
    rng = np.random.default_rng(11)
    c = _q8_exact_reps(rng, (60, 16))
    q = _q8_exact_reps(rng, (9, 16))
    ids = [f"d{i}" for i in range(60)]
    f32 = DenseFlatIndex()
    f32.add(c, ids)
    q8 = DenseFlatIndex(dtype=jnp.int8)
    q8.add(c, ids)
    s32, _ = f32.search(q, depth=8)
    s8, _ = q8.search(q, depth=8)
    for r in range(q.shape[0]):
        assert sorted(np.asarray(s32)[r].tolist()) == \
            sorted(np.asarray(s8)[r].tolist())


def test_q8_index_rank_overlap_on_gaussian_reps():
    """On realistic normalized reps int8 rounding may swap near-ties but
    the top-k SET should stay close to the f32 index's."""
    rng = np.random.default_rng(12)
    c = rng.normal(size=(2000, 64)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = rng.normal(size=(32, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids = [str(i) for i in range(2000)]
    f32 = DenseFlatIndex()
    f32.add(c, ids)
    q8 = DenseFlatIndex(dtype="int8")    # string spelling also accepted
    q8.add(c, ids)
    _, i32 = f32.search(q, depth=10)
    _, i8 = q8.search(q, depth=10)
    overlap = np.mean([
        len(set(np.asarray(i32)[r]) & set(np.asarray(i8)[r])) / 10.0
        for r in range(q.shape[0])])
    assert overlap >= 0.85, f"int8 top-10 overlap {overlap:.3f} < 0.85"


def test_q8_index_on_mesh_matches_single_chip():
    """int8 corpus + scales row-sharded over the data axis: per-shard s8
    matmul + dequant + ICI merge must equal the single-replica SQ8 result."""
    rng = np.random.default_rng(13)
    c = _q8_exact_reps(rng, (52, 16))
    ids = [str(i) for i in range(52)]
    q = _q8_exact_reps(rng, (5, 16))
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    mesh = make_mesh()
    index = DenseFlatIndex(dtype=jnp.int8)
    index.add(c, ids)
    s_m, _ = index.search(q, depth=7, mesh=mesh)
    index2 = DenseFlatIndex(dtype=jnp.int8)
    index2.add(c, ids)
    s_s, _ = index2.search(q, depth=7)
    for r in range(q.shape[0]):
        assert sorted(np.asarray(s_m)[r].tolist()) == \
            sorted(np.asarray(s_s)[r].tolist())


def test_q8_artifact_stays_float32(tmp_path):
    rng = np.random.default_rng(14)
    index = DenseFlatIndex(dtype=jnp.int8)
    index.add(rng.normal(size=(10, 8)).astype(np.float32), list(range(10)))
    path = tmp_path / "corpus_0.pkl"
    index.save_shard(str(path))
    import pickle
    with open(path, "rb") as f:
        reps, _ = pickle.load(f)
    assert reps.dtype == np.float32  # reference-compatible artifact
    # and a reload with dtype="int8" still searches
    again = DenseFlatIndex.load(str(path), dtype="int8")
    s, i = again.search(rng.normal(size=(3, 8)).astype(np.float32), depth=4)
    assert np.asarray(s).shape == (3, 4)


def test_q8_zero_rows_are_harmless():
    """All-zero corpus rows and all-zero queries must not produce NaN/inf
    (zero-scale guard) and zero queries must score 0 everywhere."""
    c = np.zeros((6, 8), np.float32)
    c[0] = 1.0
    index = DenseFlatIndex(dtype=jnp.int8)
    index.add(c, [str(i) for i in range(6)])
    q = np.zeros((2, 8), np.float32)
    q[1, 0] = 2.0
    s, i = index.search(q, depth=3)
    s = np.asarray(s)
    assert np.isfinite(s).all()
    assert s[0].tolist() == [0.0, 0.0, 0.0]
    assert s[1, 0] == 2.0  # q[1] . c[0]


def test_q8_program_lowers_to_int8_dot():
    """The SQ8 scoring program must keep the matmul as an s8 x s8 -> s32
    dot_general — an upcast to f32 would silently forfeit the int8 MXU
    rate (and the HBM-traffic claim) on TPU. Checked on the lowered
    StableHLO, which is backend-independent."""
    import jax

    from mllm_sparse_retrieval_tpu.ops.mips import mips_topk_packed_q8

    q8 = jnp.zeros((16, 64), jnp.int8)
    qs = jnp.zeros((16,), jnp.float32)
    c8 = jnp.zeros((128, 64), jnp.int8)
    rs = jnp.zeros((128,), jnp.float32)
    txt = jax.jit(mips_topk_packed_q8, static_argnames=("k",)).lower(
        q8, qs, c8, rs, k=5).as_text()
    dots = [l for l in txt.splitlines() if "dot_general" in l]
    assert dots, "no dot_general in the SQ8 program"
    assert any("i8" in d and "i32" in d for d in dots), \
        f"int8 dot upcast detected: {dots}"

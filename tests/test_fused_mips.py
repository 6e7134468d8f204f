"""Fused MIPS top-k kernel: parity with the ops/mips.py XLA path.

Runs in interpreter mode on the CPU test backend; real-TPU timing lives in
`tools/dense_ab.py --fused` and the BASELINE.md fused-kernel section.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from mllm_sparse_retrieval_tpu.ops.fused_mips import (
    TAIL, fused_mips_topk, fused_mips_topk_packed, plan_tiles)
from mllm_sparse_retrieval_tpu.ops.packing import unpack_topk


def _run(q, c, k):
    vals, idx = fused_mips_topk(jnp.asarray(q), jnp.asarray(c), k,
                                interpret=True)
    return np.asarray(vals), np.asarray(idx)


def _oracle(q, c, k):
    scores = q.astype(np.float64) @ c.astype(np.float64).T
    return lax.top_k(jnp.asarray(scores, jnp.float32), k)


def test_integer_reps_bit_exact():
    """Integer-valued reps make the matmul exact in every dtype — scores
    and (tie-ordered) ids must match lax.top_k bit for bit."""
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 9, size=(37, 256)).astype(np.float32)
    c = rng.integers(-8, 9, size=(1100, 256)).astype(np.float32)
    vals, idx = _run(q, c, 10)
    ref_v, ref_i = _oracle(q, c, 10)
    np.testing.assert_array_equal(vals, np.asarray(ref_v))
    np.testing.assert_array_equal(idx, np.asarray(ref_i))


def test_bf16_matches_xla_bf16_path():
    rng = np.random.default_rng(1)
    q = rng.integers(-4, 5, size=(16, 128)).astype(np.float32)
    c = rng.integers(-4, 5, size=(700, 128)).astype(np.float32)
    vals, idx = _run(q.astype(jnp.bfloat16), c.astype(jnp.bfloat16), 5)
    ref_v, ref_i = _oracle(q, c, 5)   # small ints are bf16-exact
    np.testing.assert_array_equal(vals, np.asarray(ref_v))
    np.testing.assert_array_equal(idx, np.asarray(ref_i))


def test_random_floats_close():
    """Float accumulation order may differ from XLA's; scores must agree
    to f32 tolerance and the (score, id) sets must match."""
    rng = np.random.default_rng(2)
    q = rng.standard_normal((24, 64)).astype(np.float32)
    c = rng.standard_normal((900, 64)).astype(np.float32)
    vals, idx = _run(q, c, 10)
    ref_v, ref_i = map(np.asarray, _oracle(q, c, 10))
    np.testing.assert_allclose(vals, ref_v, rtol=1e-5, atol=1e-5)
    # well-separated Gaussian scores: id sets must agree exactly
    assert [set(r) for r in idx] == [set(r) for r in ref_i]


def test_all_negative_scores_padding_masked():
    """Zero-vector padding rows score 0.0; with all-negative real scores
    they would win top-k unless masked. N chosen to force padding."""
    rng = np.random.default_rng(3)
    q = np.abs(rng.standard_normal((9, 128))).astype(np.float32)
    c = -np.abs(rng.standard_normal((517, 128))).astype(np.float32)
    vals, idx = _run(q, c, 7)
    assert (vals < 0).all()
    assert (idx < 517).all()
    ref_v, _ = _oracle(q, c, 7)
    np.testing.assert_allclose(vals, np.asarray(ref_v), rtol=1e-5)


def test_tie_order_matches_lax_top_k():
    """Equal scores order by ascending doc id, lax.top_k's stable rule —
    including ties that straddle doc blocks."""
    q = np.ones((4, 128), np.float32)
    c = np.zeros((1300, 128), np.float32)
    c[[7, 600, 1200], 0] = 5.0       # three-way tie across blocks
    c[[3, 90], 1] = 3.0              # two-way tie in the first block
    vals, idx = _run(q, c, 6)
    ref_v, ref_i = _oracle(q, c, 6)
    np.testing.assert_array_equal(vals, np.asarray(ref_v))
    np.testing.assert_array_equal(idx, np.asarray(ref_i))


def test_k_edges_and_errors():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((3, 64)).astype(np.float32)
    c = rng.standard_normal((200, 64)).astype(np.float32)
    vals, idx = _run(q, c, 1)
    assert vals.shape == (3, 1) and idx.shape == (3, 1)
    ref_v, ref_i = _oracle(q, c, 1)
    np.testing.assert_array_equal(idx, np.asarray(ref_i))
    with pytest.raises(ValueError):
        fused_mips_topk(jnp.asarray(q), jnp.asarray(c), TAIL + 1,
                        interpret=True)
    with pytest.raises(ValueError):
        fused_mips_topk(jnp.asarray(q), jnp.asarray(c[:2]), 3,
                        interpret=True)


def test_packed_round_trip():
    rng = np.random.default_rng(5)
    q = rng.integers(0, 9, size=(12, 128)).astype(np.float32)
    c = rng.integers(0, 9, size=(300, 128)).astype(np.float32)
    packed = fused_mips_topk_packed(jnp.asarray(q), jnp.asarray(c), 4,
                                    interpret=True)
    vals, idx = unpack_topk(np.asarray(packed))
    ref_v, ref_i = _oracle(q, c, 4)
    np.testing.assert_array_equal(vals, np.asarray(ref_v))
    np.testing.assert_array_equal(idx, np.asarray(ref_i))


def test_plan_tiles_fits_budget():
    for dim in (128, 512, 1024, 4096):
        for q_bytes in (2, 4):
            bt, nc = plan_tiles(4096, dim, q_bytes)
            assert bt >= 8 and nc in (256, 512)
            assert bt * dim * q_bytes + 2 * nc * dim * q_bytes <= 12 << 20

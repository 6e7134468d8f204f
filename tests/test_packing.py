"""Packed top-k result invariants (ops/packing.py).

The pack MUST stay int32-typed: doc ids < 2^23 bitcast into f32 are
denormals, and the v5e flushes denormals to zero in some copy lowerings —
a packed-f32 MIPS program returned every index as 0 on chip while being
exact on CPU (caught by tools/corpus_e2e.py self-retrieval, round 3).
CPU tests cannot reproduce the flush, so this pins the invariant that
makes it impossible instead.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.ops.packing import pack_topk, unpack_topk


def test_packed_dtype_is_int32():
    scores = jnp.asarray([[1.5, -2.25]], jnp.float32)
    idx = jnp.asarray([[3, 70000]], jnp.int32)
    packed = pack_topk(scores, idx)
    assert packed.dtype == jnp.int32, (
        "pack_topk must pack in integer space — f32-bitcast ids are "
        "denormals that TPUs may flush to zero (see module docstring)")


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_roundtrip_exact(seed):
    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(16, 10)).astype(np.float32) * 1e3
    scores[0, 0] = 0.0
    scores[1, :] = -np.inf          # masked rows survive bit-exactly
    idx = rng.integers(0, 2 ** 23, size=(16, 10)).astype(np.int32)
    idx[2, 0] = 0                   # the denormal-critical small ids
    idx[2, 1] = 1
    packed = np.asarray(pack_topk(jnp.asarray(scores), jnp.asarray(idx)))
    s2, i2 = unpack_topk(packed)
    np.testing.assert_array_equal(s2, scores)
    np.testing.assert_array_equal(i2, idx)


def test_pack_roundtrip_under_jit():
    scores = jnp.arange(8, dtype=jnp.float32).reshape(2, 4) / 7.0
    idx = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)
    packed = jax.jit(pack_topk)(scores, idx)
    s2, i2 = unpack_topk(np.asarray(packed))
    np.testing.assert_array_equal(s2, np.asarray(scores))
    np.testing.assert_array_equal(i2, np.asarray(idx))


def test_pack48_roundtrip_boundaries():
    from mllm_sparse_retrieval_tpu.ops.packing import (pack_topk48,
                                                       unpack_topk48)

    rng = np.random.default_rng(3)
    scores = rng.integers(0, 2 ** 24, size=(16, 10)).astype(np.float32)
    scores[0, 0] = 0.0
    scores[0, 1] = 2 ** 24 - 1          # top of the 24-bit lane
    scores[0, 2] = 65535.0              # lo-lane boundary
    scores[0, 3] = 65536.0              # first hi-lane bit
    scores[1, :] = -np.inf              # masked rows clamp to 0 (dropped
    idx = rng.integers(0, 2 ** 23, size=(16, 10)).astype(np.int32)
    idx[2, 0] = 0                       # by the resolve path either way)
    idx[2, 1] = 2 ** 23 - 1
    idx[2, 2] = 65535
    idx[2, 3] = 65536
    packed = np.asarray(pack_topk48(jnp.asarray(scores), jnp.asarray(idx)))
    assert packed.dtype == np.uint16 and packed.shape == (16, 30)
    s2, i2 = unpack_topk48(packed)
    expect = np.where(np.isfinite(scores), scores, 0.0)
    np.testing.assert_array_equal(s2, expect)
    np.testing.assert_array_equal(i2, idx)


def test_pack48_under_jit_and_bytes():
    from mllm_sparse_retrieval_tpu.ops.packing import (pack_topk48,
                                                       unpack_topk48)

    scores = jnp.arange(8, dtype=jnp.float32).reshape(2, 4) * 3.0
    idx = (jnp.arange(8, dtype=jnp.int32) * 70000).reshape(2, 4)
    packed = jax.jit(pack_topk48)(scores, idx)
    assert packed.nbytes == (scores.nbytes + idx.nbytes) * 3 // 4  # 6 vs 8 B
    s2, i2 = unpack_topk48(np.asarray(packed))
    np.testing.assert_array_equal(s2, np.asarray(scores))
    np.testing.assert_array_equal(i2, np.asarray(idx))

"""Weight quantization tests: round-trip accuracy, packing, tree mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.models.quantization import (
    dequantize_params, dequantize_weight, quantize_params, quantize_weight,
    quantized_bytes)


def test_int8_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    entry = quantize_weight(jnp.asarray(w), bits=8)
    back = np.asarray(dequantize_weight(entry))
    # per-channel max error <= scale/2
    scale = np.asarray(entry["scale"])[0]
    assert np.all(np.abs(back - w) <= scale / 2 + 1e-7)
    assert entry["q"].dtype == jnp.int8


def test_int4_pack_unpack_exact():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(33, 16)).astype(np.float32)  # odd rows
    entry = quantize_weight(jnp.asarray(w), bits=4)
    assert entry["q"].shape == (17, 16)  # packed
    back = np.asarray(dequantize_weight(entry))
    assert back.shape == w.shape
    scale = np.asarray(entry["scale"])[0]
    assert np.all(np.abs(back - w) <= scale / 2 + 1e-6)


def test_zero_channel_does_not_divide_by_zero():
    w = jnp.zeros((16, 4))
    entry = quantize_weight(w, bits=8)
    back = np.asarray(dequantize_weight(entry))
    np.testing.assert_array_equal(back, np.zeros((16, 4)))


def test_quantize_params_tree_and_memory():
    from mllm_sparse_retrieval_tpu.configs import ModelConfig, ModelFamily
    from mllm_sparse_retrieval_tpu.models import build_model, mllm

    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_hidden_size=64, tiny_num_layers=2,
                      tiny_num_heads=4)
    params, arch, tok, template = build_model(cfg, captions=["a dog runs"])
    q = quantize_params(params, bits=8)
    assert quantized_bytes(q) < 0.5 * quantized_bytes(params)
    # embeddings stay full precision
    assert q["text"]["embed"].dtype == params["text"]["embed"].dtype

    restored = dequantize_params(q)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    s0, d0 = mllm.encode(params, arch, ids, mask, None)
    s1, d1 = mllm.encode(restored, arch, ids, mask, None)
    # quantized model behaves like the original within quantization noise
    cos = float((jnp.sum(d0 * d1) /
                 (jnp.linalg.norm(d0) * jnp.linalg.norm(d1))))
    assert cos > 0.99

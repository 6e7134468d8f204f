"""Mesh/TP/multihost helper tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mllm_sparse_retrieval_tpu.configs import ModelConfig, ModelFamily
from mllm_sparse_retrieval_tpu.models import build_model
from mllm_sparse_retrieval_tpu.parallel import make_mesh
from mllm_sparse_retrieval_tpu.parallel.multihost import (
    initialize_multihost, is_primary_host)
from mllm_sparse_retrieval_tpu.parallel.tp import (
    shard_params_tp, tp_param_shardings)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh2 = make_mesh(model_parallel=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data_parallel=3, model_parallel=2)


def test_tp_shardings_layout():
    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_hidden_size=64, tiny_num_layers=2,
                      tiny_num_heads=4)
    params, arch, _, _ = build_model(cfg, captions=["a dog"])
    mesh = make_mesh(model_parallel=2)
    sh = tp_param_shardings(params, mesh)
    blk = sh["text"]["blocks"][0]
    assert blk["q"]["w"].spec == P(None, "model")
    assert blk["o"]["w"].spec == P("model", None)
    assert blk["gate"]["w"].spec == P(None, "model")
    assert blk["down"]["w"].spec == P("model", None)
    # norms/embeddings replicated
    assert sh["text"]["embed"].spec == P()
    assert sh["text"]["blocks"][0]["attn_norm"]["scale"].spec == P()

    # placing + running the model under TP gives identical outputs
    from mllm_sparse_retrieval_tpu.models import mllm
    tok_ids = jnp.ones((2, 16), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    base = np.asarray(mllm.encode(params, arch, tok_ids, mask, None)[1])
    params_tp = shard_params_tp(params, mesh)
    with mesh:
        tp_out = np.asarray(mllm.encode(params_tp, arch, tok_ids, mask,
                                        None)[1])
    np.testing.assert_allclose(base, tp_out, rtol=1e-4, atol=1e-6)


def test_tp_indivisible_dims_replicate():
    mesh = make_mesh(model_parallel=2)
    params = {"blocks": [{"q": {"w": jnp.zeros((7, 9))}}]}
    sh = tp_param_shardings(params, mesh)
    assert sh["blocks"][0]["q"]["w"].spec == P()


def test_multihost_noop_single_process():
    assert initialize_multihost(num_processes=1) is False
    assert is_primary_host()

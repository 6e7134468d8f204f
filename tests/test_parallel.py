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


def test_fsdp_composes_with_tensor_parallel():
    """2-D param sharding: TP places leaves over the model axis, FSDP then
    adds the data axis on a different dim — leaves carry both axes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from mllm_sparse_retrieval_tpu.parallel.fsdp import fsdp_shardings
    from mllm_sparse_retrieval_tpu.parallel.mesh import make_mesh
    from mllm_sparse_retrieval_tpu.parallel.tp import shard_params_tp
    from mllm_sparse_retrieval_tpu.models import mllm
    from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
    from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
    from mllm_sparse_retrieval_tpu.models.vit import ViTConfig

    mesh = make_mesh(data_parallel=4, model_parallel=2)
    arch = MLLMConfig(
        vision=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                         num_layers=2, num_heads=4, feature_layer=-2),
        text=LlamaConfig(vocab_size=512, hidden_size=64, num_layers=2,
                         num_heads=4, num_kv_heads=2, intermediate_size=256,
                         rope_theta=10000.0),
        image_token_id=4)
    params = mllm.init_params(jax.random.PRNGKey(0), arch, jnp.float32)
    params = shard_params_tp(params, mesh)
    params = jax.device_put(params, fsdp_shardings(params, mesh, min_size=1024))

    both = 0
    for leaf in jax.tree_util.tree_leaves(params):
        spec = tuple(leaf.sharding.spec)
        axes = {a for e in spec if e is not None
                for a in (e if isinstance(e, tuple) else (e,))}
        assert not (len(axes) > 0 and len(spec) > leaf.ndim)
        if {"data", "model"} <= axes:
            both += 1
    assert both > 0, "no leaf carries both mesh axes"

    # the sharded tree still runs a forward
    ids = jnp.ones((4, 8), jnp.int32)
    mask = jnp.ones((4, 8), jnp.int32)
    out = mllm.forward_hidden(params, arch, ids, mask, None)
    assert out.shape == (4, 8, 64)

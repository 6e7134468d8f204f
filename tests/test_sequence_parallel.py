"""Sequence parallelism (parallel/sp.py): ring attention parity + grads.

The sequence axis shards over the ``model`` mesh axis; attention becomes a
KV ring (flash-style accumulation + ppermute). Must match the sequential
decoder (``models.llama.apply`` with the masked XLA attention) to f32
rounding on forward AND gradients — the ring is restructuring, not an
approximation. Exceeds reference parity (DeepSpeed ZeRO shards only
data/params, /root/reference/ds_configs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.models import layers as L
from mllm_sparse_retrieval_tpu.models import llama
from mllm_sparse_retrieval_tpu.parallel import sp
from mllm_sparse_retrieval_tpu.parallel.mesh import make_mesh


def _tiny(num_layers=3):
    cfg = llama.LlamaConfig(vocab_size=64, hidden_size=32,
                            num_layers=num_layers, num_heads=4,
                            num_kv_heads=2, intermediate_size=64)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 4, 32
    x = jnp.asarray(rng.normal(size=(B, T, 32)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[1, 20:] = 0        # padding must not leak across ring steps
    mask[3, 7:] = 0         # heavy padding: whole KV chunks masked
    return cfg, params, x, jnp.asarray(mask)


def test_ring_attention_unit_parity():
    """Raw ring_attention inside a hand-built shard_map == layers.attention."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(1)
    B, T, Hq, Hkv, D = 2, 32, 4, 2, 8
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    am = np.ones((B, T), np.int32)
    am[0, 25:] = 0
    am = jnp.asarray(am)
    ref = L.attention(q, k, v, L.causal_padding_mask(am))

    mesh = make_mesh(data_parallel=2, model_parallel=4)
    fn = shard_map(
        lambda lq, lk, lv, lm: sp.ring_attention(lq, lk, lv, lm, "model", 4),
        mesh=mesh,
        in_specs=(P("data", "model"), P("data", "model"),
                  P("data", "model"), P("data", "model")),
        out_specs=P("data", "model"), check_vma=False)
    out = fn(q, k, v, am)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("data,model", [(2, 4), (1, 8), (4, 2)])
def test_decoder_forward_parity(data, model):
    cfg, params, x, mask = _tiny()
    ref = llama.apply(params, x, mask, cfg, allow_flash=False)
    mesh = make_mesh(data_parallel=data, model_parallel=model)
    out = sp.apply_sequence_parallel(params, x, mask, cfg, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_grad_parity():
    cfg, params, x, mask = _tiny()
    mesh = make_mesh(data_parallel=2, model_parallel=4)
    probe = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 32, 32)).astype(np.float32))

    def loss_sp(p):
        return jnp.sum(sp.apply_sequence_parallel(p, x, mask, cfg, mesh)
                       * probe)

    def loss_ref(p):
        return jnp.sum(llama.apply(p, x, mask, cfg, allow_flash=False)
                       * probe)

    g1 = jax.grad(loss_sp)(params)
    g2 = jax.grad(loss_ref)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4), g1, g2)


def test_lora_parity():
    cfg, params, x, mask = _tiny()
    key = jax.random.PRNGKey(7)
    blocks = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 2)
        h, dh = cfg.hidden_size, cfg.head_dim
        blocks.append({
            "q": L.lora_init(ks[0], h, cfg.num_heads * dh, 2, 4.0),
            "down": L.lora_init(ks[1], cfg.intermediate_size, h, 2, 4.0),
        })
    blocks = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jnp.ones_like(a), blocks)
    lora = {"blocks": blocks}
    ref = llama.apply(params, x, mask, cfg, lora=lora, allow_flash=False)
    mesh = make_mesh(data_parallel=2, model_parallel=4)
    out = sp.apply_sequence_parallel(params, x, mask, cfg, mesh, lora=lora)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_seq_not_divisible_raises():
    cfg, params, x, mask = _tiny()
    mesh = make_mesh(data_parallel=2, model_parallel=4)
    with pytest.raises(ValueError):
        sp.apply_sequence_parallel(params, x[:, :30], mask[:, :30], cfg,
                                   mesh)


def test_mrope_position_ids_parity():
    """3-D M-RoPE per-sample tables shard over (data, model) like the
    activations; ring decoder must match the sequential one."""
    cfg = llama.LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2,
                            num_heads=4, num_kv_heads=2,
                            intermediate_size=64, qkv_bias=True,
                            mrope_section=(2, 1, 1))
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    B, T = 4, 32
    x = jnp.asarray(rng.normal(size=(B, T, 32)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[2, 25:] = 0
    mask = jnp.asarray(mask)
    pos = jnp.asarray(rng.integers(0, T, size=(3, B, T)).astype(np.int32))
    ref = llama.apply(params, x, mask, cfg, position_ids=pos,
                      allow_flash=False)
    mesh = make_mesh(data_parallel=2, model_parallel=4)
    out = sp.apply_sequence_parallel(params, x, mask, cfg, mesh,
                                     position_ids=pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

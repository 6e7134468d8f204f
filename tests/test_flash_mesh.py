"""Flash attention under a mesh (VERDICT r3 #3).

The Pallas flash kernel has no SPMD partitioning rule; layers._sharded_flash
wraps it in a data/model-axis shard_map so GSPMD-sharded encode/train keep
the O(T) fused path for long (anyres ~3k-token) prompts.

What runs where: the TPU interpreter deadlocks under shard_map on CPU
devices (measured: plain interpret-mode flash finishes in seconds, the same
call inside shard_map hangs), so these tests verify the NEW code — the
shard_map wrapper: partition specs, GQA head split, segment-id masking,
gradient flow — by substituting the stock kernel with a bit-equivalent
pure-JAX reference. The real kernel's numerics (single chip AND inside the
shard_map wrap on a 1×1 mesh) are covered on hardware by
tools/tpu_checks.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import mllm_sparse_retrieval_tpu.models.layers as L
from mllm_sparse_retrieval_tpu.parallel import make_mesh

B, T, DH = 8, 1024, 128


def _ref_flash(q, k, v, ab=None, segment_ids=None, *, causal=False,
               sm_scale=1.0, block_sizes=None, debug=False):
    """Pure-JAX stand-in for pallas flash_attention (same contract:
    q/k/v [B, H, T, D] heads-first, segment-id + causal masking)."""
    assert ab is None and causal
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    t = q.shape[2]
    mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
    if segment_ids is not None:
        mask = mask & (segment_ids.q[:, None, :, None] ==
                       segment_ids.kv[:, None, None, :])
    logits = jnp.where(mask, logits, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, axis=-1), v)


@pytest.fixture
def ref_kernel(monkeypatch):
    """Swap the stock Pallas op for the reference (counting calls)."""
    import jax.experimental.pallas.ops.tpu.flash_attention as fa

    calls = {"n": 0}

    def spy(*a, **kw):
        calls["n"] += 1
        return _ref_flash(*a, **kw)

    monkeypatch.setattr(fa, "flash_attention", spy)
    return calls


def _qkv(rng, hq, hkv):
    q = rng.normal(size=(B, T, hq, DH)).astype(np.float32) * 0.1
    k = rng.normal(size=(B, T, hkv, DH)).astype(np.float32) * 0.1
    v = rng.normal(size=(B, T, hkv, DH)).astype(np.float32) * 0.1
    mask = np.ones((B, T), np.int32)
    mask[:, -64:] = 0  # trailing padding
    return q, k, v, mask


def _naive(q, k, v, mask):
    return L.attention(q, k, v, L.causal_padding_mask(mask))


@pytest.mark.parametrize("hq,hkv,model_parallel",
                         [(2, 2, 1), (4, 2, 2), (8, 4, 4)])
def test_sharded_flash_matches_naive(ref_kernel, hq, hkv, model_parallel):
    """The shard_map wrap (data×model split, GQA repeat per shard, segment
    masking) is numerically transparent vs the naive masked attention."""
    mesh = make_mesh(model_parallel=model_parallel)
    rng = np.random.default_rng(0)
    q, k, v, mask = _qkv(rng, hq, hkv)

    ref = np.asarray(_naive(q, k, v, mask))

    data_sh = NamedSharding(mesh, P("data", None, None, None))
    qd = jax.device_put(q, data_sh)
    kd = jax.device_put(k, data_sh)
    vd = jax.device_put(v, data_sh)
    md = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    out = np.asarray(jax.jit(
        functools.partial(L.flash_causal_attention, mesh=mesh)
    )(qd, kd, vd, md))
    assert ref_kernel["n"] > 0, "wrapped kernel never ran"

    valid = mask.astype(bool)
    diff = np.abs(out - ref)[valid].max()
    assert diff < 2e-5, f"sharded flash diverged from naive: {diff}"


def test_decoder_takes_flash_path_on_mesh(ref_kernel, monkeypatch):
    """llama.apply with allow_flash=mesh engages the shard_map'd kernel and
    matches the naive path's pooled loss and parameter gradients (the
    trainer configuration: value_and_grad over a mesh-sharded batch)."""
    from mllm_sparse_retrieval_tpu.models import llama

    # eligibility normally requires a real TPU backend; force the shape rule
    monkeypatch.setattr(L, "flash_attention_eligible",
                        lambda t, dh: t >= 1024 and t % 512 == 0
                        and dh % 128 == 0)

    mesh = make_mesh()
    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=2 * DH, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=128)
    assert cfg.head_dim == DH
    params = llama.init_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, cfg.hidden_size)).astype(np.float32) * 0.02
    mask = np.ones((B, T), np.int32)
    mask[:, -128:] = 0

    def pooled(p, xx, mm, allow):
        h = llama.apply(p, xx, mm, cfg, allow_flash=allow)
        w = mm.astype(h.dtype)[:, :, None]
        return jnp.sum(h * w) / jnp.sum(w)

    data_sh = NamedSharding(mesh, P("data", None, None))
    xd = jax.device_put(x, data_sh)
    md = jax.device_put(mask, NamedSharding(mesh, P("data", None)))

    ref_val, ref_grad = jax.value_and_grad(
        lambda p: pooled(p, x, mask, False))(params)
    val, grad = jax.jit(jax.value_and_grad(
        lambda p, a, b: pooled(p, a, b, mesh)))(params, xd, md)
    assert ref_kernel["n"] > 0, "flash kernel never engaged under the mesh"

    assert abs(float(val) - float(ref_val)) < \
        5e-5 * max(1.0, abs(float(ref_val)))
    flat_a, _ = jax.tree_util.tree_flatten(jax.device_get(grad))
    flat_b, _ = jax.tree_util.tree_flatten(jax.device_get(ref_grad))
    for a, b in zip(flat_a, flat_b):
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 5e-4

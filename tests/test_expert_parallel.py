"""Expert parallelism (parallel/ep.py): routing semantics + sharded parity.

The MoE FFN is three dense einsums over capacity-bucketed expert batches
(GShard formulation) — verified here against a naive per-token Python
reference for seating priority, drop behavior, gate math, and the Switch
load-balance aux loss, then for GSPMD parity with the expert axis sharded
over the model mesh axis. Exceeds reference parity (the reference's
DeepSpeed configs are ZeRO-only, /root/reference/ds_configs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.parallel import ep
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS, make_mesh


def _probs(n, e, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, e)).astype(np.float32)
    p = np.exp(logits - logits.max(axis=1, keepdims=True))
    return (p / p.sum(axis=1, keepdims=True)).astype(np.float32)


def _naive_route(probs, cfg, capacity):
    """Per-token reference: slot-major seating, token order within a slot,
    counters advance even for dropped (over-capacity) assignments — the
    semantics ep._dispatch_combine implements with cumsums."""
    n, e = probs.shape
    idx = np.argsort(-probs, kind="stable", axis=1)[:, :cfg.top_k]
    gates = np.take_along_axis(probs, idx, axis=1)
    if cfg.normalize_gates:
        gates = gates / np.maximum(gates.sum(axis=1, keepdims=True), 1e-9)
    dispatch = np.zeros((n, e, capacity), np.float32)
    combine = np.zeros((n, e, capacity), np.float32)
    count = np.zeros(e, np.int64)
    for s in range(cfg.top_k):
        for t in range(n):
            ex = idx[t, s]
            pos = count[ex]
            count[ex] += 1
            if pos < capacity:
                dispatch[t, ex, pos] = 1.0
                combine[t, ex, pos] = gates[t, s]
    f_e = count / (n * cfg.top_k)
    p_e = probs.mean(axis=0)
    aux = e * float((f_e * p_e).sum())
    return dispatch, combine, aux


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("normalize", [True, False])
def test_dispatch_matches_naive(top_k, normalize):
    cfg = ep.MoEConfig(num_experts=4, top_k=top_k, capacity_factor=1.0,
                       normalize_gates=normalize)
    n = 24
    capacity = ep.expert_capacity(n, cfg)
    probs = _probs(n, cfg.num_experts, seed=top_k * 7 + normalize)
    d, c, aux = ep._dispatch_combine(jnp.asarray(probs), cfg, capacity)
    d_ref, c_ref, aux_ref = _naive_route(probs, cfg, capacity)
    np.testing.assert_array_equal(np.asarray(d), d_ref)
    np.testing.assert_allclose(np.asarray(c), c_ref, atol=1e-6)
    assert float(aux) == pytest.approx(aux_ref, abs=1e-6)


def test_overflow_drops_second_choice_first():
    """With capacity 1 slot per expert, every token's FIRST choice for a
    fresh expert is seated before any second choice (slot-major)."""
    e = 2
    cfg = ep.MoEConfig(num_experts=e, top_k=2, normalize_gates=False)
    # every token prefers expert 0 then expert 1
    probs = jnp.asarray(np.tile([0.9, 0.1], (6, 1)).astype(np.float32))
    d, c, _ = ep._dispatch_combine(probs, cfg, capacity=1)
    d = np.asarray(d)
    # token 0 seats its first choice at expert 0; token 0's SECOND choice
    # (expert 1) seats too — second choices run after all first choices,
    # but expert 1 received no first choices.
    assert d[0, 0, 0] == 1 and d[0, 1, 0] == 1
    # every later token is fully dropped at both experts
    assert d[1:].sum() == 0


def test_no_drop_equals_dense_experts():
    """With capacity == n (no drops) the bucketed einsum form equals the
    naive per-token sum over top-k experts of gate * SwiGLU_e(x)."""
    cfg = ep.MoEConfig(num_experts=4, top_k=2, capacity_factor=32.0)
    h, f, n = 16, 24, 32
    assert ep.expert_capacity(n, cfg) == n
    p = ep.moe_init(jax.random.PRNGKey(0), h, f, cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, n // 2, h)).astype(np.float32))

    y, aux = ep.moe_ffn(x, p, cfg)

    xf = np.asarray(x, np.float64).reshape(-1, h)
    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(xf, jnp.float32) @ p["router"], axis=-1), np.float64)
    idx = np.argsort(-probs, kind="stable", axis=1)[:, :cfg.top_k]
    gates = np.take_along_axis(probs, idx, axis=1)
    gates = gates / np.maximum(gates.sum(axis=1, keepdims=True), 1e-9)
    gate_w = np.asarray(p["gate"], np.float64)
    up_w = np.asarray(p["up"], np.float64)
    down_w = np.asarray(p["down"], np.float64)

    def silu(a):
        return a / (1.0 + np.exp(-a))

    y_ref = np.zeros_like(xf)
    for t in range(xf.shape[0]):
        for s in range(cfg.top_k):
            ex = idx[t, s]
            hid = silu(xf[t] @ gate_w[ex]) * (xf[t] @ up_w[ex])
            y_ref[t] += gates[t, s] * (hid @ down_w[ex])
    np.testing.assert_allclose(np.asarray(y).reshape(-1, h), y_ref,
                               atol=2e-5)
    assert np.isfinite(float(aux))


def test_dropped_token_gets_partial_output():
    """A token whose assignment overflows contributes only its surviving
    experts — the standard GShard drop, not an error."""
    cfg = ep.MoEConfig(num_experts=2, top_k=1, capacity_factor=0.5,
                       normalize_gates=False)
    h, f = 8, 12
    p = ep.moe_init(jax.random.PRNGKey(1), h, f, cfg)
    # steer ALL tokens to expert 0: router reads only feature 0, which is
    # pinned to a constant positive value for every token
    p = dict(p)
    p["router"] = jnp.zeros_like(p["router"]).at[0, 0].set(1.0)
    rng = np.random.default_rng(4)
    x_np = rng.normal(size=(16, h)).astype(np.float32)
    x_np[:, 0] = 5.0
    x = jnp.asarray(x_np)
    capacity = ep.expert_capacity(16, cfg)   # 8-aligned: 8 < 16 tokens
    assert capacity < 16
    y, _ = ep.moe_ffn(x, p, cfg)
    y = np.asarray(y)
    # first `capacity` tokens are seated (non-zero output), the rest dropped
    assert np.abs(y[:capacity]).max() > 0
    np.testing.assert_array_equal(y[capacity:], 0.0)


def test_aux_loss_uniform_routing_is_one():
    cfg = ep.MoEConfig(num_experts=8, top_k=1, normalize_gates=False)
    n = 64
    probs = jnp.full((n, 8), 1.0 / 8, jnp.float32)
    # break argmax ties deterministically: tiny tilt, one expert per token
    tilt = jnp.eye(8, dtype=jnp.float32)[jnp.arange(n) % 8] * 1e-6
    _, _, aux = ep._dispatch_combine(probs + tilt, cfg,
                                     ep.expert_capacity(n, cfg))
    assert float(aux) == pytest.approx(1.0, abs=1e-4)


def test_gradients_flow_to_router_and_experts():
    cfg = ep.MoEConfig(num_experts=4, top_k=2)
    h, f = 8, 12
    p = ep.moe_init(jax.random.PRNGKey(2), h, f, cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, h)).astype(np.float32))

    def loss(p):
        y, aux = ep.moe_ffn(x, p, cfg)
        return jnp.sum(y ** 2) + cfg.aux_loss_coef * aux

    g = jax.grad(loss)(p)
    for name, leaf in g.items():
        assert np.all(np.isfinite(np.asarray(leaf))), name
        assert np.abs(np.asarray(leaf)).max() > 0, f"zero grad for {name}"


def test_sharded_parity_and_divisibility():
    """Expert axis sharded over the model mesh axis + tokens over data:
    jitted output under the mesh matches the unsharded single-device run."""
    cfg = ep.MoEConfig(num_experts=8, top_k=2)
    h, f = 16, 24
    p = ep.moe_init(jax.random.PRNGKey(3), h, f, cfg)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(8, 4, h)).astype(np.float32))
    y_ref, aux_ref = ep.moe_ffn(x, p, cfg)

    mesh = make_mesh(data_parallel=2, model_parallel=4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ps = ep.shard_moe_params(p, mesh)
    for name, leaf in ps.items():
        spec = leaf.sharding.spec
        if name == "router":
            assert spec == P()
        else:
            assert spec[0] == "model"
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    with mesh:
        y, aux = jax.jit(ep.moe_ffn, static_argnums=2)(xs, ps, cfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    assert float(aux) == pytest.approx(float(aux_ref), abs=1e-6)

    bad = make_mesh(data_parallel=1, model_parallel=3,
                    devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        ep.shard_moe_params(p, bad, axis="model")


# ---- MoE decoder integration (models/llama.py cfg.moe) ----------------


def _moe_decoder(num_experts=4, top_k=2):
    from mllm_sparse_retrieval_tpu.models import llama

    cfg = llama.LlamaConfig(vocab_size=64, hidden_size=32, num_layers=2,
                            num_heads=4, num_kv_heads=2,
                            intermediate_size=48,
                            moe=ep.MoEConfig(num_experts=num_experts,
                                             top_k=top_k))
    params = llama.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def test_moe_decoder_forward_contract():
    from mllm_sparse_retrieval_tpu.models import llama

    cfg, params = _moe_decoder()
    for blk in params["blocks"]:
        assert "moe" in blk and "gate" not in blk
    rng = np.random.default_rng(8)
    ids = rng.integers(1, cfg.vocab_size, size=(4, 16)).astype(np.int32)
    mask = jnp.ones((4, 16), jnp.int32)
    emb = llama.embed_tokens(params, jnp.asarray(ids))
    hidden, aux = llama.apply(params, emb, mask, cfg, allow_flash=False)
    assert hidden.shape == (4, 16, 32)
    assert np.isfinite(float(aux)) and float(aux) > 0
    # remat path carries the (hidden, aux) pair identically
    h2, a2 = llama.apply(params, emb, mask, cfg, allow_flash=False,
                         remat=True)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(hidden),
                               atol=1e-6)
    assert float(a2) == pytest.approx(float(aux), abs=1e-6)


def test_moe_decoder_trains():
    """Full-finetune contrastive steps on a tiny MoE decoder: total loss
    (InfoNCE + weighted aux) decreases and stays finite."""
    import optax

    from mllm_sparse_retrieval_tpu.models import llama
    from mllm_sparse_retrieval_tpu.train.contrastive import info_nce_loss

    cfg, params = _moe_decoder()
    rng = np.random.default_rng(9)
    a_ids = rng.integers(1, cfg.vocab_size, size=(8, 12)).astype(np.int32)
    b_ids = np.roll(a_ids, 1, axis=1)
    mask = jnp.ones((8, 12), jnp.int32)

    def loss_fn(p):
        ha, aux_a = llama.apply(p, llama.embed_tokens(p, jnp.asarray(a_ids)),
                                mask, cfg, allow_flash=False)
        hb, aux_b = llama.apply(p, llama.embed_tokens(p, jnp.asarray(b_ids)),
                                mask, cfg, allow_flash=False)
        nce = info_nce_loss(ha.mean(axis=1), hb.mean(axis=1), tau=0.1)
        return nce + cfg.moe.aux_loss_coef * (aux_a + aux_b)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt):
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, upd), opt, l

    losses = []
    for _ in range(25):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] - 0.1, losses[:3] + losses[-3:]


def test_moe_unsupported_surfaces_raise():
    from mllm_sparse_retrieval_tpu.parallel import sp

    cfg, params = _moe_decoder()
    emb = jnp.zeros((4, 16, 32), jnp.float32)
    mask = jnp.ones((4, 16), jnp.int32)
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    with pytest.raises(ValueError, match="dense-FFN"):
        sp.apply_sequence_parallel(params, emb, mask, cfg, mesh)

    from mllm_sparse_retrieval_tpu.parallel import pp

    pmesh = pp.make_pp_mesh(pipeline_parallel=2, data_parallel=4)
    with pytest.raises(ValueError, match="dense-FFN"):
        pp.apply_pipelined(params, emb, mask, cfg, pmesh, 2)
    with pytest.raises(ValueError, match="dense-FFN"):
        pp.apply_pipelined_gspmd(params, emb, mask, cfg, pmesh, 2)

    from mllm_sparse_retrieval_tpu.models import mllm, vit

    arch = mllm.MLLMConfig(
        vision=vit.ViTConfig(image_size=32, patch_size=16, hidden_size=16,
                             num_layers=1, num_heads=2),
        text=cfg, image_token_id=4)
    with pytest.raises(ValueError, match="MoE"):
        mllm.forward_hidden({"text": params}, arch,
                            jnp.zeros((2, 8), jnp.int32), mask[:2, :8])


def test_init_lora_skips_moe_ffn_targets():
    """LoRA on a MoE decoder adapts attention projections only."""
    from mllm_sparse_retrieval_tpu.models import lora as lora_lib
    from mllm_sparse_retrieval_tpu.models import mllm, vit

    cfg, params = _moe_decoder()
    arch = mllm.MLLMConfig(
        vision=vit.ViTConfig(image_size=32, patch_size=16, hidden_size=16,
                             num_layers=1, num_heads=2),
        text=cfg, image_token_id=4)
    full = {"text": params, "vision": None, "projector": None}
    lora = lora_lib.init_lora(jax.random.PRNGKey(0), full, arch, rank=2)
    for entry in lora["text"]["blocks"]:
        assert set(entry) == {"q", "k", "v", "o"}

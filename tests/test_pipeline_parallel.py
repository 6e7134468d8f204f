"""Pipeline parallelism (parallel/pp.py): GPipe schedule parity + training.

Runs on the virtual 8-device CPU mesh (conftest). The pipelined decoder must
match ``models.llama.apply`` bit-for-float on forward AND gradients — the
schedule (shard_map + ppermute + scan) is pure restructuring, not an
approximation. Capability slot: the reference's DeepSpeed engine scale-out
(/root/reference/ds_configs, src/train.py:41-57); its ds_configs use ZeRO
only, so pipeline support exceeds reference parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.models import llama
from mllm_sparse_retrieval_tpu.parallel import pp


def _tiny(num_layers=4, hidden=32):
    cfg = llama.LlamaConfig(vocab_size=97, hidden_size=hidden, num_layers=num_layers,
                            num_heads=4, num_kv_heads=2,
                            intermediate_size=2 * hidden)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 4, 16
    x = jnp.asarray(rng.normal(size=(B, T, hidden)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[1, 10:] = 0          # ragged padding must ride with its microbatch
    mask[3, 5:] = 0
    return cfg, params, x, jnp.asarray(mask)


def test_stack_unstack_roundtrip():
    cfg, params, _, _ = _tiny()
    stacked = pp.stack_block_params(params["blocks"])
    back = pp.unstack_block_params(stacked, cfg.num_layers)
    for a, b in zip(params["blocks"], back):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                       np.asarray(y)), a, b)


@pytest.mark.parametrize("pipe,data,n_micro", [(4, 2, 2), (2, 4, 4),
                                               (4, 2, 4), (8, 1, 2)])
def test_forward_parity(pipe, data, n_micro):
    num_layers = 8 if pipe == 8 else 4   # keep layers % stages == 0
    cfg, params, x, mask = _tiny(num_layers=num_layers)
    ref = llama.apply(params, x, mask, cfg, allow_flash=False)
    mesh = pp.make_pp_mesh(pipeline_parallel=pipe, data_parallel=data)
    out = pp.apply_pipelined(params, x, mask, cfg, mesh,
                             n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_multiple_layers_per_stage():
    cfg, params, x, mask = _tiny(num_layers=8)
    ref = llama.apply(params, x, mask, cfg, allow_flash=False)
    mesh = pp.make_pp_mesh(pipeline_parallel=4, data_parallel=2)
    out = pp.apply_pipelined(params, x, mask, cfg, mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grad_parity_full_params():
    cfg, params, x, mask = _tiny()
    mesh = pp.make_pp_mesh(pipeline_parallel=4, data_parallel=2)
    rng = np.random.default_rng(1)
    probe = jnp.asarray(rng.normal(
        size=(x.shape[0], x.shape[1], cfg.hidden_size)).astype(np.float32))
    stacked = pp.stack_block_params(params["blocks"])

    def loss_pp(st):
        y = pp.apply_pipelined(params, x, mask, cfg, mesh, 2, stacked=st)
        return jnp.sum(y * probe)

    def loss_ref(blocks):
        p2 = dict(params)
        p2["blocks"] = blocks
        y = llama.apply(p2, x, mask, cfg, allow_flash=False)
        return jnp.sum(y * probe)

    g_pp = jax.grad(loss_pp)(stacked)
    g_ref = pp.stack_block_params(jax.grad(loss_ref)(params["blocks"]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4), g_pp, g_ref)


def test_lora_pipelined_parity():
    from mllm_sparse_retrieval_tpu.models import layers as L

    cfg, params, x, mask = _tiny()
    key = jax.random.PRNGKey(7)
    lora_blocks = []
    for i in range(cfg.num_layers):
        ks = jax.random.split(jax.random.fold_in(key, i), 4)
        h, dh = cfg.hidden_size, cfg.head_dim
        lora_blocks.append({
            "q": L.lora_init(ks[0], h, cfg.num_heads * dh, 2, 4.0),
            "k": L.lora_init(ks[1], h, cfg.num_kv_heads * dh, 2, 4.0),
            "v": L.lora_init(ks[2], h, cfg.num_kv_heads * dh, 2, 4.0),
            "o": L.lora_init(ks[3], cfg.num_heads * dh, h, 2, 4.0),
        })
    # make the adapters non-trivial (b init is usually zeros)
    lora_blocks = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jnp.ones_like(a), lora_blocks)
    lora = {"blocks": lora_blocks}

    ref = llama.apply(params, x, mask, cfg, lora=lora, allow_flash=False)
    mesh = pp.make_pp_mesh(pipeline_parallel=4, data_parallel=2)
    out = pp.apply_pipelined(params, x, mask, cfg, mesh, n_microbatches=2,
                             lora=lora)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # and LoRA gradients through the schedule match the sequential ones
    probe = jnp.asarray(np.random.default_rng(2).normal(
        size=ref.shape).astype(np.float32))
    lstacked = pp.stack_block_params(lora_blocks)

    def loss_pp(ls):
        y = pp.apply_pipelined(params, x, mask, cfg, mesh, 2,
                               lora_stacked=ls)
        return jnp.sum(y * probe)

    def loss_ref(lb):
        y = llama.apply(params, x, mask, cfg, lora={"blocks": lb},
                        allow_flash=False)
        return jnp.sum(y * probe)

    g_pp = jax.grad(loss_pp)(lstacked)
    g_ref = pp.stack_block_params(jax.grad(loss_ref)(lora_blocks))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4), g_pp, g_ref)


def test_pipelined_training_step_learns():
    """A jitted full-param pipelined contrastive step reduces the loss."""
    import optax

    from mllm_sparse_retrieval_tpu.train.contrastive import info_nce_loss

    cfg, params, _, _ = _tiny()
    mesh = pp.make_pp_mesh(pipeline_parallel=4, data_parallel=2)
    rng = np.random.default_rng(3)
    B, T = 8, 16
    a_ids = rng.integers(1, cfg.vocab_size, size=(B, T)).astype(np.int32)
    b_ids = a_ids.copy()
    b_ids[:, ::3] = rng.integers(1, cfg.vocab_size,
                                 size=b_ids[:, ::3].shape)
    mask = jnp.ones((B, T), jnp.int32)

    stacked = pp.stack_block_params(params["blocks"])
    rest = {k: v for k, v in params.items() if k != "blocks"}
    tx = optax.adam(1e-2)

    def loss_fn(trainable):
        st, rs = trainable
        pr = dict(rs)
        pr["blocks"] = []          # apply_pipelined only reads final_norm
        ea = llama.embed_tokens(rs, jnp.asarray(a_ids))
        eb = llama.embed_tokens(rs, jnp.asarray(b_ids))
        ya = pp.apply_pipelined(pr, ea, mask, cfg, mesh, 2, stacked=st)
        yb = pp.apply_pipelined(pr, eb, mask, cfg, mesh, 2, stacked=st)
        return info_nce_loss(ya.mean(axis=1), yb.mean(axis=1), tau=0.1)

    trainable = (stacked, rest)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    losses = []
    for _ in range(5):
        trainable, opt_state, loss = step(trainable, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_errors():
    cfg, params, x, mask = _tiny(num_layers=4)
    with pytest.raises(ValueError):
        pp.make_pp_mesh(pipeline_parallel=3)          # 8 % 3 != 0
    mesh = pp.make_pp_mesh(pipeline_parallel=8)
    with pytest.raises(ValueError):                   # 4 layers, 8 stages
        pp.apply_pipelined(params, x, mask, cfg, mesh, n_microbatches=2)
    mesh4 = pp.make_pp_mesh(pipeline_parallel=4, data_parallel=2)
    with pytest.raises(ValueError):                   # batch 4, 3 microbatches
        pp.apply_pipelined(params, x, mask, cfg, mesh4, n_microbatches=3)


def test_partial_layer_lora_rejected():
    """Adapters on only some blocks can't ride the homogeneous pipeline —
    must raise rather than silently run the bare base model."""
    from mllm_sparse_retrieval_tpu.models import layers as L

    cfg, params, x, mask = _tiny()
    mesh = pp.make_pp_mesh(pipeline_parallel=4, data_parallel=2)
    h = cfg.hidden_size
    partial = {"blocks": [
        {"q": L.lora_init(jax.random.PRNGKey(0), h,
                          cfg.num_heads * cfg.head_dim, 2, 4.0)},
        {}, {}, {}]}
    with pytest.raises(ValueError, match="EVERY block"):
        pp.apply_pipelined(params, x, mask, cfg, mesh, n_microbatches=2,
                           lora=partial)


def test_mrope_position_ids_parity():
    """Qwen2.5-VL-style 3-D M-RoPE position ids through the pipeline."""
    cfg = llama.LlamaConfig(vocab_size=97, hidden_size=32, num_layers=4,
                            num_heads=4, num_kv_heads=2,
                            intermediate_size=64, qkv_bias=True,
                            mrope_section=(2, 1, 1))
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    B, T = 4, 16
    x = jnp.asarray(rng.normal(size=(B, T, 32)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.asarray(rng.integers(0, T, size=(3, B, T)).astype(np.int32))
    ref = llama.apply(params, x, mask, cfg, position_ids=pos,
                      allow_flash=False)
    mesh = pp.make_pp_mesh(pipeline_parallel=4, data_parallel=2)
    out = pp.apply_pipelined(params, x, mask, cfg, mesh, n_microbatches=2,
                             position_ids=pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestGspmd3D:
    """Circular pipeline in pure GSPMD (apply_pipelined_gspmd): composes
    dp x pp x tp on a 3-D mesh with zero manual collectives."""

    def _setup(self, num_layers=4):
        cfg, params, x, mask = _tiny(num_layers=num_layers)
        # batch 8 so dp x microbatching stays divisible
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32))
        mask = np.ones((8, 16), np.int32)
        mask[1, 10:] = 0
        mask[5, 4:] = 0
        return cfg, params, x, jnp.asarray(mask)

    @pytest.mark.parametrize("dims", [(2, 2, 2), (1, 4, 2), (2, 4, 1)])
    def test_forward_parity(self, dims):
        cfg, params, x, mask = self._setup()
        ref = llama.apply(params, x, mask, cfg, allow_flash=False)
        mesh = pp.make_pp3_mesh(*dims)
        stacked = pp.stack_block_params(params["blocks"])
        stacked = jax.device_put(stacked,
                                 pp.stacked_tp_shardings(stacked, mesh))
        with mesh:
            out = jax.jit(lambda st: pp.apply_pipelined_gspmd(
                params, x, mask, cfg, mesh, 2, stacked=st))(stacked)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    def test_grad_parity_and_tp_sharding(self):
        cfg, params, x, mask = self._setup()
        mesh = pp.make_pp3_mesh(2, 2, 2)
        stacked = pp.stack_block_params(params["blocks"])
        shardings = pp.stacked_tp_shardings(stacked, mesh)
        # megatron layout really applied: col-sharded out-dim, row-sharded
        # in-dim, layer axis over pipe
        from jax.sharding import PartitionSpec as P
        assert shardings["q"]["w"].spec == P("pipe", None, "model")
        assert shardings["down"]["w"].spec == P("pipe", "model", None)
        assert shardings["attn_norm"]["scale"].spec == P("pipe")
        stacked = jax.device_put(stacked, shardings)
        probe = jnp.asarray(np.random.default_rng(10).normal(
            size=(8, 16, cfg.hidden_size)).astype(np.float32))

        def loss3(st):
            return jnp.sum(pp.apply_pipelined_gspmd(
                params, x, mask, cfg, mesh, 2, stacked=st) * probe)

        def lossr(blocks):
            p2 = dict(params)
            p2["blocks"] = blocks
            return jnp.sum(llama.apply(p2, x, mask, cfg, allow_flash=False)
                           * probe)

        with mesh:
            g3 = jax.jit(jax.grad(loss3))(stacked)
        gr = pp.stack_block_params(jax.grad(lossr)(params["blocks"]))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4), g3, gr)
        # grads come back in the same 3-D layout (no silent gather)
        assert g3["q"]["w"].sharding.spec == P("pipe", None, "model")

    def test_training_step_learns_3d(self):
        import optax

        from mllm_sparse_retrieval_tpu.train.contrastive import info_nce_loss

        cfg, params, _, _ = self._setup()
        mesh = pp.make_pp3_mesh(2, 2, 2)
        rng = np.random.default_rng(11)
        B, T = 8, 16
        a_ids = rng.integers(1, cfg.vocab_size, size=(B, T)).astype(np.int32)
        b_ids = a_ids.copy()
        b_ids[:, ::3] = rng.integers(1, cfg.vocab_size,
                                     size=b_ids[:, ::3].shape)
        mask = jnp.ones((B, T), jnp.int32)
        stacked = pp.stack_block_params(params["blocks"])
        stacked = jax.device_put(stacked,
                                 pp.stacked_tp_shardings(stacked, mesh))
        rest = {k: v for k, v in params.items() if k != "blocks"}
        tx = optax.adam(1e-2)

        def loss_fn(trainable):
            st, rs = trainable
            pr = {"final_norm": rs["final_norm"], "blocks": []}
            ea = llama.embed_tokens(rs, jnp.asarray(a_ids))
            eb = llama.embed_tokens(rs, jnp.asarray(b_ids))
            ya = pp.apply_pipelined_gspmd(pr, ea, mask, cfg, mesh, 2,
                                          stacked=st)
            yb = pp.apply_pipelined_gspmd(pr, eb, mask, cfg, mesh, 2,
                                          stacked=st)
            return info_nce_loss(ya.mean(axis=1), yb.mean(axis=1), tau=0.1)

        trainable = (stacked, rest)
        opt_state = tx.init(trainable)

        @jax.jit
        def step(trainable, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            upd, opt_state = tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, upd), opt_state, loss

        losses = []
        with mesh:
            for _ in range(5):
                trainable, opt_state, loss = step(trainable, opt_state)
                losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses


def test_gspmd_remat_grad_parity():
    """remat=True recomputes stage activations in backward — gradients
    must be identical (to f32 noise) to the non-remat pipeline."""
    cfg, params, _, _ = _tiny()
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32))
    mask = jnp.ones((8, 16), jnp.int32)
    mesh = pp.make_pp3_mesh(2, 2, 2)
    stacked = pp.stack_block_params(params["blocks"])
    stacked = jax.device_put(stacked, pp.stacked_tp_shardings(stacked, mesh))
    probe = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32))

    def loss(st, rm):
        return jnp.sum(pp.apply_pipelined_gspmd(
            params, x, mask, cfg, mesh, 2, stacked=st, remat=rm) * probe)

    with mesh:
        g_plain = jax.jit(jax.grad(lambda s: loss(s, False)))(stacked)
        g_remat = jax.jit(jax.grad(lambda s: loss(s, True)))(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5), g_plain, g_remat)

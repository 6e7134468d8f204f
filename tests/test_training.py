"""Training tests: loss semantics, sharded-vs-local equivalence, learning,
ZeRO-1 sharding, checkpoint/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mllm_sparse_retrieval_tpu.configs import (
    ModelConfig, ModelFamily, SearchConfig, SparseConfig, TrainConfig)
from mllm_sparse_retrieval_tpu.data.karpathy import Example
from mllm_sparse_retrieval_tpu.models import build_model, lora as lora_lib
from mllm_sparse_retrieval_tpu.parallel import make_mesh
from mllm_sparse_retrieval_tpu.train import (
    ContrastiveTrainer, info_nce_loss, sharded_info_nce_loss)
from mllm_sparse_retrieval_tpu.train.trainer import make_collator, zero1_shardings

CAPTIONS = [
    "a red car parked on the street",
    "two dogs running through tall grass",
    "a man surfing a large ocean wave",
    "a plate of pasta with tomato sauce",
    "children playing soccer in a park",
    "a snowy mountain under a clear sky",
    "a woman reading a book in a cafe",
    "a train crossing a steel bridge",
]


def _reps(key, b, d):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, (b, d)), jax.random.normal(k2, (b, d)))


def test_info_nce_perfect_alignment_is_low():
    t = jnp.eye(4, 8)
    loss_aligned = info_nce_loss(t, t, tau=0.05)
    t2, i2 = _reps(jax.random.PRNGKey(0), 4, 8)
    loss_random = info_nce_loss(t2, i2, tau=0.05)
    assert float(loss_aligned) < 0.01
    assert float(loss_random) > float(loss_aligned)


def test_sharded_loss_matches_global_loss_and_grads():
    mesh = make_mesh()
    t, i = _reps(jax.random.PRNGKey(1), 16, 32)

    def global_fn(t, i):
        return info_nce_loss(t, i, tau=0.1)

    def sharded_fn(t, i):
        return sharded_info_nce_loss(mesh, t, i, tau=0.1,
                                     gather_save_gradient=True)

    lg, gg = jax.value_and_grad(global_fn, argnums=(0, 1))(t, i)
    ls, gs = jax.value_and_grad(sharded_fn, argnums=(0, 1))(t, i)
    np.testing.assert_allclose(float(lg), float(ls), rtol=1e-5)
    for a, b in zip(gg, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_gather_save_gradient_false_changes_grads_not_loss():
    mesh = make_mesh()
    t, i = _reps(jax.random.PRNGKey(2), 16, 32)

    def with_grad(t, i):
        return sharded_info_nce_loss(mesh, t, i, 0.1, True)

    def no_grad(t, i):
        return sharded_info_nce_loss(mesh, t, i, 0.1, False)

    l1, g1 = jax.value_and_grad(with_grad)(t, i)
    l2, g2 = jax.value_and_grad(no_grad)(t, i)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    assert not np.allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_vocab_size=512, tiny_hidden_size=64,
                      tiny_num_layers=2, tiny_num_heads=4,
                      tiny_image_size=32, tiny_patch_size=16)
    params, arch, tok, template = build_model(cfg, captions=CAPTIONS)
    examples = [Example(c, f"/nonexistent/img_{k}.jpg", f"t{k}", f"i{k}")
                for k, c in enumerate(CAPTIONS)]
    return params, arch, tok, template, examples


def test_training_reduces_loss_and_learns_retrieval(tiny_setup):
    params, arch, tok, template, examples = tiny_setup
    tcfg = TrainConfig(learning_rate=3e-3, tau=0.1, lora_rank=4, lora_alpha=8,
                       shard_optimizer_state=False)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=tcfg.lora_rank, alpha=tcfg.lora_alpha,
                                  train_projector=True)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
    collate = make_collator(tok, template, arch)

    # NOTE: no text_max_len — truncating prompts in training but not at encode
    # time silently breaks retrieval (cut prompts train different reps).
    losses = trainer.train(examples, collate, batch_size=8, num_epochs=40,
                           logger=None)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # merged model retrieves the right image per caption (overfit check)
    from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples
    from mllm_sparse_retrieval_tpu.search.engine import run_search

    merged = trainer.merged_params()
    scfg = SparseConfig()
    img_res = encode_examples(examples, merged, arch, tok, template,
                              encode_type="image", sparse_cfg=scfg,
                              batch_size=8)
    index = DenseFlatIndex()
    index.add(img_res.dense, img_res.ids)
    out = run_search(examples, merged, arch, tok, template,
                     query_type="text", sparse_cfg=scfg,
                     search_cfg=SearchConfig(depth=8),
                     dense_index=index, batch_size=8,
                     get_target=lambda qid: f"i{qid[1:]}")
    assert out.dense_recall[1] >= 0.75  # random baseline is 1/8


def test_async_stepping_matches_blocking(tiny_setup):
    """The epoch loop only host-syncs on logged steps (train_on_batch
    blocking=False elsewhere) — the returned loss history must be floats
    and bit-identical to fully-blocking stepping."""
    params, arch, tok, template, examples = tiny_setup
    collate = make_collator(tok, template, arch)
    histories = []
    for log_every in (1, 5):    # 1 = every step blocking; 5 = mostly async
        tcfg = TrainConfig(learning_rate=1e-3, tau=0.1, lora_dropout=0.0,
                           shard_optimizer_state=False)
        adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                      rank=4, alpha=8)
        trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
        hist = trainer.train(examples, collate, batch_size=8, num_epochs=4,
                             log_every=log_every, logger=lambda m: None)
        assert all(isinstance(x, float) for x in hist)
        histories.append(hist)
    assert histories[0] == histories[1]
    # logger=None is the fully-async path
    tcfg = TrainConfig(learning_rate=1e-3, tau=0.1, lora_dropout=0.0,
                       shard_optimizer_state=False)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=4, alpha=8)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
    hist = trainer.train(examples, collate, batch_size=8, num_epochs=4,
                         logger=None)
    assert hist == histories[0]


def test_training_on_mesh_with_zero1(tiny_setup):
    params, arch, tok, template, examples = tiny_setup
    mesh = make_mesh()
    tcfg = TrainConfig(learning_rate=1e-3, tau=0.1, shard_optimizer_state=True)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=4, alpha=8)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg, mesh=mesh)
    collate = make_collator(tok, template, arch)
    l0 = trainer.train_on_batch(collate(examples))
    l1 = trainer.train_on_batch(collate(examples))
    assert np.isfinite(l0) and np.isfinite(l1)
    # optimizer state leaves with shardable first dims are actually sharded
    sharded_leaf = None
    for leaf in jax.tree_util.tree_leaves(trainer.opt_state):
        if hasattr(leaf, "sharding") and hasattr(leaf, "shape") and \
                leaf.ndim >= 1 and leaf.shape and leaf.shape[0] % 8 == 0 \
                and leaf.shape[0] > 0:
            sharded_leaf = leaf
            break
    assert sharded_leaf is not None
    assert not sharded_leaf.sharding.is_fully_replicated


def test_zero1_shardings_helper():
    mesh = make_mesh()
    tree = {"a": jnp.zeros((16, 4)), "b": jnp.zeros((3, 4)),
            "c": jnp.zeros(())}
    sh = zero1_shardings(tree, mesh)
    assert sh["a"].spec == P("data")
    assert sh["b"].spec == P()
    assert sh["c"].spec == P()


def test_checkpoint_save_restore(tiny_setup, tmp_path):
    params, arch, tok, template, examples = tiny_setup
    tcfg = TrainConfig(learning_rate=1e-3, shard_optimizer_state=False)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(3), params, arch,
                                  rank=2, alpha=4)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
    collate = make_collator(tok, template, arch)
    trainer.train_on_batch(collate(examples))
    trainer.train_on_batch(collate(examples))
    trainer.save_checkpoint(str(tmp_path))

    trainer2 = ContrastiveTrainer(
        params, arch,
        lora_lib.init_lora(jax.random.PRNGKey(9), params, arch, rank=2,
                           alpha=4),
        tcfg)
    restored_step = trainer2.restore_checkpoint(str(tmp_path))
    assert restored_step == 2
    for a, b in zip(jax.tree_util.tree_leaves(trainer.adapters),
                    jax.tree_util.tree_leaves(trainer2.adapters)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continued training from restore produces identical next loss
    l_a = trainer.train_on_batch(collate(examples))
    l_b = trainer2.train_on_batch(collate(examples))
    np.testing.assert_allclose(l_a, l_b, rtol=1e-6)


def test_fsdp_shardings_helper():
    from mllm_sparse_retrieval_tpu.parallel.fsdp import (assert_fsdp_sharded,
                                                         fsdp_shardings)

    mesh = make_mesh()  # 8 virtual devices, data axis = 8
    tree = {"big": jnp.zeros((128, 256)),       # sharded on dim 1 (largest)
            "tall": jnp.zeros((64, 7)),         # wait: 64*7 < MIN -> repl
            "vec": jnp.zeros((2 ** 16,)),       # sharded on dim 0
            "odd": jnp.zeros((129, 255)),       # no divisible dim -> repl
            "scalar": jnp.zeros(())}
    sh = fsdp_shardings(tree, mesh, min_size=1024)
    assert sh["big"].spec == P(None, "data")
    assert sh["vec"].spec == P("data")
    assert sh["odd"].spec == P()
    assert sh["scalar"].spec == P()
    placed = jax.device_put(tree, sh)
    assert assert_fsdp_sharded(placed, mesh, min_size=1024) == 2


def test_full_finetune_fsdp_on_mesh(tiny_setup):
    """ZeRO-3 capability parity (ds_configs/zero3.json): full-param training
    with params + optimizer moments sharded over the data axis."""
    from mllm_sparse_retrieval_tpu.parallel.fsdp import assert_fsdp_sharded

    params, arch, tok, template, examples = tiny_setup
    mesh = make_mesh()
    tcfg = TrainConfig(learning_rate=1e-4, tau=0.1,
                       shard_optimizer_state=True,
                       shard_params_data_axis=True, train_full=True)
    trainer = ContrastiveTrainer(params, arch, None, tcfg, mesh=mesh)

    # params and adam moments actually carry data-axis shardings
    n_param = assert_fsdp_sharded(trainer.params, mesh)
    n_opt = assert_fsdp_sharded(
        [l for l in jax.tree_util.tree_leaves(trainer.opt_state)
         if hasattr(l, "ndim") and l.ndim > 0], mesh)
    assert n_param > 0 and n_opt > 0

    collate = make_collator(tok, template, arch)
    l0 = trainer.train_on_batch(collate(examples))
    l1 = trainer.train_on_batch(collate(examples))
    assert np.isfinite(l0) and np.isfinite(l1)
    # updated params keep their FSDP layout across steps
    assert_fsdp_sharded(trainer.params, mesh)
    assert trainer.merged_params() is trainer.params


def test_full_finetune_matches_lora_free_gradients(tiny_setup):
    """Single-chip full finetune trains (loss decreases on an overfit batch)."""
    params, arch, tok, template, examples = tiny_setup
    tcfg = TrainConfig(learning_rate=3e-3, tau=0.1,
                       shard_optimizer_state=False, train_full=True)
    trainer = ContrastiveTrainer(params, arch, None, tcfg)
    collate = make_collator(tok, template, arch)
    batch = collate(examples)
    losses = [trainer.train_on_batch(batch) for _ in range(12)]
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_trainer_honors_gather_save_gradient_false(tiny_setup):
    """cfg.gather_save_gradient=False routes the loss through the shard_map
    stop-gradient variant (reference detach-and-reinsert semantics); the loss
    VALUE equals the default, gradients differ, training still converges."""
    params, arch, tok, template, examples = tiny_setup
    mesh = make_mesh()
    collate = make_collator(tok, template, arch)
    batch = collate(examples)

    losses = {}
    for gsg in (True, False):
        tcfg = TrainConfig(learning_rate=1e-3, tau=0.1,
                           gather_save_gradient=gsg,
                           shard_optimizer_state=False)
        adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                      rank=4, alpha=8)
        trainer = ContrastiveTrainer(params, arch, adapters, tcfg, mesh=mesh)
        losses[gsg] = [trainer.train_on_batch(batch) for _ in range(3)]
    # first-step loss identical (same params, same forward); training moves
    np.testing.assert_allclose(losses[True][0], losses[False][0], rtol=1e-5)
    assert losses[False][2] < losses[False][0] + 1e-6


def test_remat_training_matches_no_remat(tiny_setup):
    """Gradient checkpointing changes memory, not math: losses match the
    non-remat run step for step."""
    params, arch, tok, template, examples = tiny_setup
    collate = make_collator(tok, template, arch)
    batch = collate(examples)
    runs = {}
    for remat in (False, True):
        tcfg = TrainConfig(learning_rate=1e-3, tau=0.1, remat=remat,
                           shard_optimizer_state=False)
        adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                      rank=4, alpha=8)
        trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
        runs[remat] = [trainer.train_on_batch(batch) for _ in range(3)]
    np.testing.assert_allclose(runs[True], runs[False], rtol=1e-5)


def test_linear_lr_schedule_decays_to_zero(tiny_setup):
    """lr_schedule='linear' (the reference's implicit HF default) decays to
    ~0 by total_steps; training still improves early."""
    params, arch, tok, template, examples = tiny_setup
    # lora_dropout=0: the post-decay "loss stops moving" check needs a
    # deterministic forward (dropout masks differ per step by design)
    tcfg = TrainConfig(learning_rate=3e-3, tau=0.1, lr_schedule="linear",
                       total_steps=10, shard_optimizer_state=False,
                       lora_dropout=0.0)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=4, alpha=8)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
    collate = make_collator(tok, template, arch)
    batch = collate(examples)
    losses = [trainer.train_on_batch(batch) for _ in range(12)]
    assert losses[5] < losses[0]
    # after total_steps the lr is ~0 -> loss stops moving
    assert abs(losses[-1] - losses[-2]) < 1e-4

    with pytest.raises(ValueError, match="total_steps"):
        ContrastiveTrainer(params, arch, adapters,
                           TrainConfig(lr_schedule="linear"))


def test_cosine_lr_schedule_learns_and_decays(tiny_setup):
    """lr_schedule='cosine' (beyond-reference recipe knob): warmup + cosine
    decay to ~0 by total_steps; training improves, then flattens."""
    params, arch, tok, template, examples = tiny_setup
    tcfg = TrainConfig(learning_rate=3e-3, tau=0.1, lr_schedule="cosine",
                       warmup_steps=2, total_steps=10,
                       shard_optimizer_state=False, lora_dropout=0.0)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=4, alpha=8)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
    collate = make_collator(tok, template, arch)
    batch = collate(examples)
    losses = [trainer.train_on_batch(batch) for _ in range(12)]
    assert losses[6] < losses[0]
    assert abs(losses[-1] - losses[-2]) < 1e-4   # lr ~0 past total_steps

    with pytest.raises(ValueError, match="total_steps"):
        ContrastiveTrainer(params, arch, adapters,
                           TrainConfig(lr_schedule="cosine"))
    with pytest.raises(ValueError, match="lr_schedule"):
        ContrastiveTrainer(params, arch, adapters,
                           TrainConfig(lr_schedule="bogus"))


def test_grad_accum_identical_micros_match_single_micro(tiny_setup):
    """grad_accum_steps=2 on a batch whose two microbatches are IDENTICAL
    must produce exactly the single-microbatch step: averaged grads of two
    equal micros == the micro's grads, so the updated adapters match an
    accum=1 trainer stepped on one micro (bitwise up to f32 averaging)."""
    params, arch, tok, template, examples = tiny_setup
    collate = make_collator(tok, template, arch)
    micro = collate(examples[:4])

    def _dup(a, batch_axis=0):
        return None if a is None else np.concatenate(
            [np.asarray(a)] * 2, axis=batch_axis)

    from mllm_sparse_retrieval_tpu.train.trainer import TrainBatch
    doubled = TrainBatch(
        _dup(micro.text_ids), _dup(micro.text_mask),
        _dup(micro.image_ids), _dup(micro.image_mask), _dup(micro.pixels),
        image_pos_ids=_dup(micro.image_pos_ids, batch_axis=1))

    outs = []
    for accum, batch in ((1, micro), (2, doubled)):
        tcfg = TrainConfig(learning_rate=1e-3, tau=0.1, lora_dropout=0.0,
                           shard_optimizer_state=False,
                           grad_accum_steps=accum)
        adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                      rank=4, alpha=8)
        trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
        loss = trainer.train_on_batch(batch)
        outs.append((loss, jax.device_get(trainer.adapters)))

    (l1, a1), (l2, a2) = outs
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(a1),
                    jax.tree_util.tree_leaves(a2)):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-7)


def test_grad_accum_learns_and_validates(tiny_setup):
    """Accumulated training still learns (loss halves over the epochs) and
    a non-divisible batch raises loudly."""
    params, arch, tok, template, examples = tiny_setup
    collate = make_collator(tok, template, arch)
    tcfg = TrainConfig(learning_rate=3e-3, tau=0.1, lora_dropout=0.0,
                       shard_optimizer_state=False, grad_accum_steps=2)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=4, alpha=8)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg)
    losses = trainer.train(examples, collate, batch_size=8, num_epochs=30,
                           logger=None)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    with pytest.raises(ValueError, match="divisible"):
        trainer.train_on_batch(collate(examples[:5]))


def test_grad_accum_on_mesh(tiny_setup):
    """Accumulation composes with the data-sharded mesh step: [A, m, ...]
    microbatches shard on the m axis; training runs and learns."""
    params, arch, tok, template, examples = tiny_setup
    mesh = make_mesh()
    collate = make_collator(tok, template, arch)
    tcfg = TrainConfig(learning_rate=3e-3, tau=0.1, lora_dropout=0.0,
                       grad_accum_steps=2)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=4, alpha=8)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg, mesh=mesh)
    # batch 16 -> 2 micros of 8, each sharded over the 8-device data axis
    losses = trainer.train(examples * 2, collate, batch_size=16,
                           num_epochs=20, logger=None)
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])

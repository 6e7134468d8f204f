"""Few-shot contrastive LoRA fine-tuning.

CLI equivalent of ``deepspeed src/train.py`` (/root/reference/scripts/train.sh):
trains LoRA adapters on a few-shot train split with symmetric InfoNCE over
mesh-global negatives, then saves the adapters (and optionally the merged
encoder params).
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax

from mllm_sparse_retrieval_tpu.cli.common import (
    StepTimer, add_common_args, get_logger, model_config_from_args)
from mllm_sparse_retrieval_tpu.configs import RepsLoc, TrainConfig
from mllm_sparse_retrieval_tpu.data.karpathy import CrossModalCorpus
from mllm_sparse_retrieval_tpu.models import build_model, lora as lora_lib
from mllm_sparse_retrieval_tpu.parallel import make_mesh
from mllm_sparse_retrieval_tpu.train.trainer import (
    ContrastiveTrainer, make_collator)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--few-shot-sum", type=int, default=200,
                        help="few-shot train CSV size (scripts/train.sh)")
    parser.add_argument("--learning-rate", type=float, default=5e-5)
    parser.add_argument("--num-epochs", type=int, default=5)
    parser.add_argument("--lr-schedule", default="linear",
                        choices=["linear", "cosine", "constant"],
                        help="HF Trainer defaults to linear decay; the "
                             "reference trains with it implicitly. cosine "
                             "= warmup + cosine decay to 0 (beyond-"
                             "reference recipe knob)")
    parser.add_argument("--tau", type=float, default=0.05)
    parser.add_argument("--lora-rank", type=int, default=8)
    parser.add_argument("--lora-alpha", type=float, default=16)
    parser.add_argument("--lora-dropout", type=float, default=0.1,
                        help="dropout on decoder LoRA paths "
                             "(scripts/train.sh --lora_dropout)")
    parser.add_argument("--load-kbit", type=int, default=0, choices=[0, 4, 8],
                        help="store base weights quantized, dequantized per "
                             "use (QLoRA; reference --load_kbit)")
    parser.add_argument("--quant-format", default="nf4",
                        choices=["nf4", "linear"],
                        help="4-bit storage format: nf4 (blockwise "
                             "NormalFloat + double-quant scales, the "
                             "reference's bnb_4bit_quant_type) or linear "
                             "per-channel int4; 8-bit is always linear")
    parser.add_argument("--train-vision-lora", action="store_true")
    parser.add_argument("--train-projector-lora", action="store_true")
    parser.add_argument("--no-gather-gradient", action="store_true",
                        help="stop gradients through remote-shard negatives")
    parser.add_argument("--train-full", action="store_true",
                        help="full finetune (no LoRA; reference --lora off)")
    parser.add_argument("--remat", action="store_true",
                        help="gradient-checkpoint decoder blocks")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3/FSDP-equivalent param sharding over the "
                             "data axis (ds_configs/zero3.json parity)")
    parser.add_argument("--no-zero1", action="store_true",
                        help="replicate optimizer state instead of sharding")
    parser.add_argument("--output-dir", default="./output")
    parser.add_argument("--log-every", type=int, default=10,
                        help="log (and host-sync) every N steps; unlogged "
                             "steps dispatch asynchronously, which hides "
                             "the per-step link round trip on remote "
                             "chips; 0 disables periodic step logging")
    parser.add_argument("--checkpoint-every", type=int, default=0)
    parser.add_argument("--merge", action="store_true",
                        help="also save merged encoder params")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--grad-accum-steps", type=int, default=1,
                        help="split each step batch into this many "
                             "microbatches scanned inside one jit step "
                             "(DeepSpeed gradient_accumulation_steps: "
                             "negatives per microbatch, activation memory "
                             "at microbatch scale)")
    args = parser.parse_args(argv)

    logger = get_logger("train")
    timer = StepTimer(logger)
    timer.phase("setup")
    corpus = CrossModalCorpus(args.dataset, "train", args.data_root,
                              few_shot_sum=args.few_shot_sum)
    captions = list(corpus.text_dict.values())
    params, arch, tok, template = build_model(
        model_config_from_args(args), captions=captions)
    if args.load_kbit:
        if args.train_full:
            parser.error("--load-kbit pairs with LoRA (QLoRA); "
                         "--train-full needs trainable fp weights")
        if args.merge:
            parser.error("--merge cannot fold adapters into a quantized "
                         "base; serve adapters separately (--lora-path)")
        from mllm_sparse_retrieval_tpu.models.quantization import (
            quantize_params, quantized_bytes)
        fp_bytes = quantized_bytes(params)
        mode = args.quant_format if args.load_kbit == 4 else "linear"
        params = quantize_params(params, bits=args.load_kbit, mode=mode)
        logger.info("kbit load: %d-bit (%s) base, %.1f MB -> %.1f MB (%.2fx)",
                    args.load_kbit, mode, fp_bytes / 1e6,
                    quantized_bytes(params) / 1e6,
                    fp_bytes / max(quantized_bytes(params), 1))
    mesh = make_mesh(model_parallel=args.model_parallel) if args.mesh else None

    total_steps = ContrastiveTrainer.total_train_steps(
        len(corpus.examples_single()), args.batch_size, args.num_epochs)
    tcfg = TrainConfig(
        learning_rate=args.learning_rate, num_epochs=args.num_epochs,
        lr_schedule=args.lr_schedule if total_steps > 0 else "constant",
        total_steps=total_steps,
        tau=args.tau, lora_rank=args.lora_rank, lora_alpha=args.lora_alpha,
        lora_dropout=args.lora_dropout, load_kbit=args.load_kbit,
        gather_save_gradient=not args.no_gather_gradient,
        train_vision_lora=args.train_vision_lora,
        train_projector_lora=args.train_projector_lora,
        shard_optimizer_state=not args.no_zero1,
        shard_params_data_axis=args.fsdp, train_full=args.train_full,
        remat=args.remat,
        output_dir=args.output_dir, seed=args.seed,
        checkpoint_every_steps=args.checkpoint_every,
        grad_accum_steps=args.grad_accum_steps)

    if args.train_full:
        adapters = None
        logger.info("full finetune (%s)",
                    "FSDP param sharding" if args.fsdp else "replicated params")
    else:
        adapters = lora_lib.init_lora(
            jax.random.PRNGKey(args.seed), params, arch,
            rank=tcfg.lora_rank, alpha=tcfg.lora_alpha,
            train_vision=tcfg.train_vision_lora,
            train_projector=tcfg.train_projector_lora)
        logger.info("LoRA params: %d", lora_lib.num_lora_params(adapters))

    trainer = ContrastiveTrainer(params, arch, adapters, tcfg, mesh=mesh,
                                 reps_loc=RepsLoc(args.reps_loc))
    collate = make_collator(tok, template, arch)
    examples = corpus.examples_single()  # one caption per image, as reference

    timer.phase("train")
    trainer.train(examples, collate, batch_size=args.batch_size,
                  num_epochs=args.num_epochs, log_every=args.log_every,
                  logger=lambda m: logger.info(m),
                  checkpoint_dir=os.path.join(args.output_dir, "ckpts")
                  if args.checkpoint_every else None,
                  seed=args.seed)

    timer.phase("save")
    os.makedirs(args.output_dir, exist_ok=True)
    if args.train_full:
        lora_path = os.path.join(args.output_dir, "params.pkl")
        with open(lora_path, "wb") as f:
            pickle.dump(jax.device_get(trainer.params), f)
        logger.info("full params -> %s", lora_path)
    else:
        lora_path = os.path.join(args.output_dir, "lora.pkl")
        lora_lib.save_lora(trainer.adapters, lora_path)
        logger.info("adapters -> %s", lora_path)
    if not args.train_full and args.merge:
        merged = trainer.merged_params()
        with open(os.path.join(args.output_dir, "params.pkl"), "wb") as f:
            pickle.dump(jax.device_get(merged), f)
        logger.info("merged params -> %s/params.pkl", args.output_dir)
    timer.close()
    print(lora_path)


if __name__ == "__main__":
    main()

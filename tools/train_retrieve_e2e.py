"""Full training-loop system check on real hardware: few-shot contrastive
LoRA training must IMPROVE retrieval, end to end, at the reference recipe's
scale.

Runs the reference's few-shot recipe shape (`scripts/train.sh` +
`src/train.py:169`: the `{dataset}_train_{N}.csv` 200-image split in
dataset mode='single' — ONE caption per image, so no batch ever holds two
columns of the same image, which would poison the in-batch InfoNCE targets
— LoRA r=8/alpha=16, tau=0.05) on the hermetic tiny family, then encodes
the split's image corpus + caption queries with the BEFORE and AFTER
weights, builds dense + impact indexes, and reports t2i recall@{1,5,10}
for both. Synthetic pixels are deterministic per image id, so the
caption<->image association is learnable; the trained model must beat the
random-init model by a wide margin on the SEEN captions (a random-init
tiny model can only memorize — the unseen-caption generalization the
reference gets from pretrained language understanding is reported as a
secondary line, not asserted). This validates the entire loop (collation,
trainer, LoRA merge, encode, both indexes, fusion, recall) as a system,
which is everything short of real checkpoint weights
(tools/reproduce_recall.py covers that day).

    python tools/train_retrieve_e2e.py [--dataset flickr] [--few-shot 200]
        [--epochs 24] [--batch-size 16] [--lr 3e-3] [--depth 10] [--mesh]

Exits non-zero if trained seen-caption recall@1 fails to beat the
untrained model's by at least --min-lift (default 0.3).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def evaluate(tag, params, arch, tok, template, examples, images, depth,
             batch_size, mesh, get_target):
    from mllm_sparse_retrieval_tpu.configs import SearchConfig, SparseConfig
    from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples
    from mllm_sparse_retrieval_tpu.search.engine import run_search

    scfg = SparseConfig()
    t0 = time.time()
    img_enc = encode_examples(images, params, arch, tok, template,
                              encode_type="image", sparse_cfg=scfg,
                              batch_size=batch_size, mesh=mesh)
    dense = DenseFlatIndex()
    dense.add(img_enc.dense, img_enc.ids)
    imp = ImpactIndex()
    for i, v in zip(img_enc.ids, img_enc.sparse_vectors):
        imp.add(i, v)
    imp.finalize()
    out = run_search(examples, params, arch, tok, template,
                     query_type="text", sparse_cfg=scfg,
                     search_cfg=SearchConfig(depth=depth, alpha=0.5),
                     dense_index=dense, impact_index=imp,
                     batch_size=batch_size, mesh=mesh,
                     get_target=get_target)
    print(f"[{tag}] ({time.time() - t0:.0f}s)", flush=True)
    print(out.summary(), flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="flickr", choices=["coco", "flickr"])
    ap.add_argument("--data-root", default="/root/reference/data")
    ap.add_argument("--few-shot", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=24,
                    help="recipe trains 5 epochs on a pretrained 8B; the "
                         "random-init tiny model needs more passes to "
                         "memorize (200 imgs / batch 16 = 13 steps/epoch)")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-3,
                    help="recipe uses 5e-5 for 8B models; the tiny model "
                         "needs a larger step to converge in minutes")
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--min-lift", type=float, default=0.3)
    ap.add_argument("--limit-images", type=int, default=0,
                    help="slice the split to the first N images "
                         "(test-speed knob; 0 = the whole split)")
    ap.add_argument("--mesh", action="store_true")
    args = ap.parse_args(argv)

    from mllm_sparse_retrieval_tpu.configs import (ModelConfig, ModelFamily,
                                                   TrainConfig)
    from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
    from mllm_sparse_retrieval_tpu.models import build_model
    from mllm_sparse_retrieval_tpu.models import lora as lora_lib
    from mllm_sparse_retrieval_tpu.train.trainer import (ContrastiveTrainer,
                                                         make_collator)

    t_start = time.time()
    corpus = CrossModalCorpus(args.dataset, "train", args.data_root,
                              few_shot_sum=args.few_shot)
    # reference src/train.py:169 trains mode='single': one caption per
    # image — every in-batch negative is a DISTINCT image (the full view
    # would put two captions of one image in ~half the batches, making the
    # InfoNCE target ambiguous and collapsing training to chance)
    examples = corpus.examples("single")
    if args.limit_images:
        examples = examples[:args.limit_images]
        keep = {e.img_id for e in examples}
    images = examples
    full_captions = [e for e in corpus.examples("full")
                     if not args.limit_images or e.img_id in keep]
    target = {e.text_id: e.img_id for e in full_captions}
    print(f"few-shot split: {len(examples)} train pairs / "
          f"{len(full_captions)} total captions "
          f"(backend={jax.default_backend()})", flush=True)

    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_vocab_size=2048, tiny_hidden_size=128)
    params, arch, tok, template = build_model(
        cfg, captions=[e.text for e in examples])
    mesh = None
    if args.mesh:
        from mllm_sparse_retrieval_tpu.parallel import make_mesh
        mesh = make_mesh()

    before = evaluate("before training (random init)", params, arch, tok,
                      template, examples, images, args.depth,
                      args.batch_size, mesh, target.__getitem__)

    # reference recipe shape: LoRA r=8 alpha=16, tau=0.05, few-shot split
    tcfg = TrainConfig(learning_rate=args.lr, tau=0.05, lora_rank=8,
                       lora_alpha=16, num_epochs=args.epochs,
                       shard_optimizer_state=mesh is not None)
    adapters = lora_lib.init_lora(jax.random.PRNGKey(0), params, arch,
                                  rank=tcfg.lora_rank, alpha=tcfg.lora_alpha,
                                  train_projector=True)
    trainer = ContrastiveTrainer(params, arch, adapters, tcfg, mesh=mesh)
    collate = make_collator(tok, template, arch)
    t0 = time.time()
    losses = trainer.train(examples, collate, batch_size=args.batch_size,
                           num_epochs=args.epochs, logger=None)
    print(f"trained {args.epochs} epochs in {time.time() - t0:.0f}s: "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"({len(losses)} steps)", flush=True)

    merged = trainer.merged_params()
    after = evaluate("after training (LoRA merged), seen captions", merged,
                     arch, tok, template, examples, images, args.depth,
                     args.batch_size, mesh, target.__getitem__)
    # secondary: all 5 captions/image — the 4 unseen ones need caption
    # semantics a random-init model doesn't have; reported, not asserted
    evaluate("after training, ALL captions (generalization, informational)",
             merged, arch, tok, template, full_captions, images, args.depth,
             args.batch_size, mesh, target.__getitem__)

    b1 = before.fusion_recall[1]
    a1 = after.fusion_recall[1]
    lift = a1 - b1
    print(f"\nseen-caption fusion recall@1: {b1:.3f} -> {a1:.3f} "
          f"(lift {lift:+.3f}); "
          f"dense {before.dense_recall[1]:.3f} -> "
          f"{after.dense_recall[1]:.3f}; sparse "
          f"{before.sparse_recall[1]:.3f} -> {after.sparse_recall[1]:.3f}",
          flush=True)
    print(f"TRAIN->RETRIEVE E2E DONE in {time.time() - t_start:.0f}s",
          flush=True)
    if lift < args.min_lift:
        print(f"FAIL: recall@1 lift {lift:.3f} < {args.min_lift}",
              flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

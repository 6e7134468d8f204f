"""Search + evaluate: encode queries live, search indexes, fuse, print recall.

CLI equivalent of ``deepspeed src/search.py`` (/root/reference/scripts/search.sh):
dense-only (--passage-reps), sparse-only (--sparse-index), or hybrid (both,
fused with --alpha).
"""

from __future__ import annotations

import argparse
import os

from mllm_sparse_retrieval_tpu.cli.common import (
    Profiler, StepTimer, add_common_args, build_everything, get_logger,
    sparse_config_from_args)
from mllm_sparse_retrieval_tpu.configs import RepsLoc, SearchConfig
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.search.engine import run_search
from mllm_sparse_retrieval_tpu.search.fusion import write_trec_run


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--passage-reps", default=None,
                        help="dense corpus dir (corpus_*.pkl)")
    parser.add_argument("--sparse-index", default=None,
                        help="impact index dir")
    parser.add_argument("--query-type", default="text",
                        choices=["text", "image"])
    parser.add_argument("--depth", type=int, default=1000)
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--remove-query", action="store_true")
    parser.add_argument("--impact-backend", default="auto",
                        choices=["auto", "taat", "matmul"],
                        help="sparse scoring backend (auto = Pallas TAAT "
                             "kernel on TPU, MXU matmul elsewhere)")
    parser.add_argument("--impact-wire", default="i32",
                        choices=["i32", "compact48"],
                        help="sparse result fetch format: 'compact48' ships "
                             "6 bytes per (score, id) pair instead of 8 "
                             "(integer weights only; wins on thin "
                             "device->host links at deep depths)")
    parser.add_argument("--fusion-mode", default="host",
                        choices=["host", "device"],
                        help="hybrid fusion route: 'host' = reference-parity "
                             "run fusion in Python; 'device' = on-device "
                             "fused top-k, one packed fetch per chunk "
                             "(fusion run/recall only)")
    parser.add_argument("--fusion-rule", default="minmax",
                        choices=["minmax", "rrf"],
                        help="hybrid fusion formula: minmax = the "
                             "reference's weighted min-max sum; rrf = "
                             "Reciprocal Rank Fusion (scale-free, "
                             "host-path only)")
    parser.add_argument("--ann-rank", type=int, default=0,
                        help="enable the ANN dense tier: low-rank prefilter "
                             "dimensionality (0 = exact flat search; see "
                             "index/ann.py — final scores stay exact, only "
                             "candidate generation is approximate)")
    parser.add_argument("--ann-candidates", type=int, default=1024,
                        help="rescored candidate pool per query when "
                             "--ann-rank is set")
    parser.add_argument("--eval-mode", default="host",
                        choices=["host", "device"],
                        help="device: compute recall (and --metrics) from "
                             "on-device target ranks — fetches ~28 KB of "
                             "ranks per batch instead of the depth-sized "
                             "run (the reference-default depth-1000 "
                             "fetch), bit-equal metrics; no TREC runs are "
                             "materialized (incompatible with --save-dir)")
    parser.add_argument("--metrics", default="",
                        help="extra ranking metrics beyond recall, comma-"
                             "separated from {mrr,ndcg,map} (the reference "
                             "reports recall only; these are standard "
                             "companions, eval/metrics.py)")
    parser.add_argument("--dense-dtype", default="float32",
                        choices=["float32", "bfloat16", "int8"],
                        help="device dtype for the dense corpus matrix: "
                             "bfloat16 halves HBM + host->device bytes and "
                             "scores on the MXU in one pass (f32 accumulate); "
                             "int8 is FAISS-SQ8-class scalar quantization "
                             "(1/4 the bytes, s8 MXU rate, per-row/per-query "
                             "dequant scales); float32 is bit-exact "
                             "FAISS-flat parity")
    parser.add_argument("--save-dir", default=None,
                        help="write TREC run files here")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args(argv)

    if args.ann_rank and args.dense_dtype == "int8":
        parser.error("--ann-rank is incompatible with --dense-dtype int8 "
                     "(pick ONE approximation; bf16 composes with ANN)")
    if args.fusion_rule == "rrf" and args.fusion_mode == "device":
        parser.error("--fusion-rule rrf is host-path only (the device-"
                     "fused program implements the min-max rule)")
    if args.passage_reps is None and args.sparse_index is None:
        parser.error("need --passage-reps and/or --sparse-index")
    if args.fusion_mode == "device" and (
            args.passage_reps is None or args.sparse_index is None):
        parser.error("--fusion-mode device needs both --passage-reps "
                     "and --sparse-index")
    if args.eval_mode == "device":
        if args.save_dir:
            parser.error("--eval-mode device never materializes runs; "
                         "drop --save-dir or use --eval-mode host")
        if args.passage_reps and args.sparse_index \
                and args.fusion_mode != "device":
            parser.error("--eval-mode device with both indexes needs "
                         "--fusion-mode device (host fusion materializes "
                         "the runs this mode avoids fetching)")

    logger = get_logger("search")
    timer = StepTimer(logger)
    timer.phase("setup")
    corpus, params, arch, tok, template, mesh, lora = build_everything(args)
    sparse_cfg = sparse_config_from_args(args)
    search_cfg = SearchConfig(
        passage_reps=args.passage_reps, sparse_index=args.sparse_index,
        depth=args.depth, alpha=args.alpha, remove_query=args.remove_query,
        query_type=args.query_type, batch_size=max(args.batch_size, 1))

    dense_index = None
    impact_index = None
    if args.passage_reps:
        timer.phase("load dense index")
        import jax.numpy as jnp
        dense_index = DenseFlatIndex.load(
            args.passage_reps,
            dtype={"bfloat16": jnp.bfloat16, "int8": jnp.int8}.get(
                args.dense_dtype, jnp.float32))
        if args.ann_rank:
            from mllm_sparse_retrieval_tpu.index.ann import DenseANNIndex
            dense_index = DenseANNIndex.from_flat(
                dense_index, rank=args.ann_rank,
                candidates=args.ann_candidates)
            logger.info("ANN tier: rank=%d candidates=%d (exact rescore)",
                        args.ann_rank, args.ann_candidates)
        logger.info("dense index: %d vectors", dense_index.size)
    if args.sparse_index:
        timer.phase("load sparse index")
        impact_index = ImpactIndex.load(args.sparse_index)
        logger.info("impact index: %d docs / %d terms",
                    impact_index.num_docs, impact_index.num_terms)

    mode = "full" if args.query_type == "text" else "single"
    queries = corpus.examples(mode)
    if args.limit:
        queries = queries[: args.limit]
    logger.info("searching %d %s queries", len(queries), args.query_type)

    timer.phase("search")
    with Profiler(args.profile_dir):
        out = run_search(
            queries, params, arch, tok, template,
            query_type=args.query_type, sparse_cfg=sparse_cfg,
            search_cfg=search_cfg, dense_index=dense_index,
            impact_index=impact_index, reps_loc=RepsLoc(args.reps_loc),
            batch_size=args.batch_size, mesh=mesh, lora=lora,
            impact_backend=args.impact_backend,
            impact_wire=args.impact_wire,
            fusion_mode=args.fusion_mode,
            fusion_rule=args.fusion_rule,
            eval_mode=args.eval_mode,
            metrics=[m for m in args.metrics.split(",") if m],
            get_target=lambda qid: corpus.get_target(qid, args.query_type))
    timer.close()

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        if out.dense_run:
            write_trec_run(out.dense_run,
                           os.path.join(args.save_dir, "dense.trec"), "dense")
        if out.sparse_run:
            write_trec_run(out.sparse_run,
                           os.path.join(args.save_dir, "sparse.trec"), "sparse")
        if out.fusion_run:
            write_trec_run(out.fusion_run,
                           os.path.join(args.save_dir, "fusion.trec"), "fusion")

    print(out.summary())


if __name__ == "__main__":
    main()

"""Diagnostics CLI: term-weight histograms + fusion-provenance analysis.

CLI equivalent of ``src/sparse_statistic.py`` (--mode term-weights) and
``src/score_statistic.py`` (--mode provenance) from the reference.
"""

from __future__ import annotations

import argparse

from mllm_sparse_retrieval_tpu.cli.common import (
    StepTimer, add_common_args, build_everything, get_logger,
    sparse_config_from_args)
from mllm_sparse_retrieval_tpu.configs import RepsLoc, SearchConfig
from mllm_sparse_retrieval_tpu.eval.statistics import (
    fusion_provenance_statistics, plot_provenance_stats,
    plot_term_weight_stats, term_weight_statistics)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--mode", default="term-weights",
                        choices=["term-weights", "provenance"])
    parser.add_argument("--num-images", type=int, default=50)
    parser.add_argument("--passage-reps", default=None)
    parser.add_argument("--sparse-index", default=None)
    parser.add_argument("--query-type", default="text",
                        choices=["text", "image"])
    parser.add_argument("--depth", type=int, default=1000)
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--top-n", type=int, default=200)
    parser.add_argument("--out-dir", default="./stats_output")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args(argv)

    logger = get_logger("stats")
    timer = StepTimer(logger)
    timer.phase("setup")
    corpus, params, arch, tok, template, mesh, lora = build_everything(args)
    sparse_cfg = sparse_config_from_args(args)

    if args.mode == "term-weights":
        timer.phase("encode+collect")
        stats = term_weight_statistics(
            corpus, params, arch, tok, template, sparse_cfg=sparse_cfg,
            num_images=args.num_images, batch_size=args.batch_size,
            mesh=mesh, lora=lora)
        logger.info(stats.summary())
        timer.phase("plot")
        paths = plot_term_weight_stats(stats, args.out_dir)
        timer.close()
        print(stats.summary())
        for p in paths:
            print(p)
        return

    # provenance mode: full hybrid search, then rank analysis
    if not (args.passage_reps and args.sparse_index):
        parser.error("provenance mode needs --passage-reps and --sparse-index")
    from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
    from mllm_sparse_retrieval_tpu.search.engine import run_search

    timer.phase("load indexes")
    dense_index = DenseFlatIndex.load(args.passage_reps)
    impact_index = ImpactIndex.load(args.sparse_index)

    mode = "full" if args.query_type == "text" else "single"
    queries = corpus.examples(mode)
    if args.limit:
        queries = queries[: args.limit]

    timer.phase("search")
    out = run_search(
        queries, params, arch, tok, template,
        query_type=args.query_type, sparse_cfg=sparse_cfg,
        search_cfg=SearchConfig(depth=args.depth, alpha=args.alpha),
        dense_index=dense_index, impact_index=impact_index,
        reps_loc=RepsLoc(args.reps_loc), batch_size=args.batch_size,
        mesh=mesh, lora=lora)

    timer.phase("analyze")
    stats = fusion_provenance_statistics(out.dense_run, out.sparse_run,
                                         alpha=args.alpha, top_n=args.top_n)
    logger.info(stats.summary())
    path = plot_provenance_stats(stats, args.out_dir)
    timer.close()
    print(stats.summary())
    print(path)


if __name__ == "__main__":
    main()

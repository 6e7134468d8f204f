"""Build the impact index from encoded corpus jsonl shards.

CLI equivalent of the reference's Lucene build
(/root/reference/scripts/sparse_index.sh: ``python -m pyserini.index.lucene
--collection JsonVectorCollection --impact --pretokenized``): reads
``corpus_*.jsonl`` from the sparse output directory and writes the packed +
CSR index (C++ builder when available).
"""

from __future__ import annotations

import argparse
import glob
import os
import time

from mllm_sparse_retrieval_tpu.cli.common import StepTimer, get_logger
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True,
                        help="directory containing corpus_*.jsonl")
    parser.add_argument("--index", required=True,
                        help="output index directory")
    parser.add_argument("--no-native", action="store_true",
                        help="force the pure-Python builder")
    parser.add_argument("--hbm-warm", action="store_true",
                        help="also place the scoring matrix in device HBM "
                             "(the exact dtype/layout the auto search "
                             "backend uses) and report placement time — a "
                             "build-time measurement of the placement cost "
                             "each serving process pays at first search")
    args = parser.parse_args(argv)

    logger = get_logger("index")
    timer = StepTimer(logger)
    timer.phase("build")
    paths = sorted(glob.glob(os.path.join(args.input, "corpus_*.jsonl")))
    if not paths:
        raise FileNotFoundError(f"no corpus_*.jsonl under {args.input}")
    t0 = time.time()
    index = ImpactIndex.from_jsonl(paths, use_native=not args.no_native)
    build_s = time.time() - t0
    timer.phase("save")
    index.save(args.index)
    timer.close()
    # index-build time metric (BASELINE.md target table; the reference's
    # equivalent cost is the 16-thread Lucene build, scripts/sparse_index.sh)
    logger.info("metric index_build_seconds=%.2f docs=%d terms=%d",
                build_s, index.num_docs, index.num_terms)
    if args.hbm_warm:
        import jax
        t0 = time.time()
        # materialize exactly the (dtype, layout) the auto search backend
        # will key — the plan owns that choice (taat/i16 on TPU, matmul/f32
        # elsewhere), so timing anything else measures an unused matrix
        dev = index._search_plan(None, "auto", 10)["dev"]
        jax.block_until_ready(dev)
        logger.info("metric hbm_placement_seconds=%.2f bytes=%d "
                    "(CSR triples uploaded, scattered on device)",
                    time.time() - t0, dev.nbytes)
    logger.info("indexed %d docs, %d terms -> %s",
                index.num_docs, index.num_terms, args.index)
    print(args.index)


if __name__ == "__main__":
    main()

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
    args = parser.parse_args(argv)

    logger = get_logger("index")
    timer = StepTimer(logger)
    timer.phase("build")
    paths = sorted(glob.glob(os.path.join(args.input, "corpus_*.jsonl")))
    if not paths:
        raise FileNotFoundError(f"no corpus_*.jsonl under {args.input}")
    index = ImpactIndex.from_jsonl(paths, use_native=not args.no_native)
    timer.phase("save")
    index.save(args.index)
    timer.close()
    logger.info("indexed %d docs, %d terms -> %s",
                index.num_docs, index.num_terms, args.index)
    print(args.index)


if __name__ == "__main__":
    main()

"""Search layer: run dictionaries, score fusion, TREC run IO."""

from mllm_sparse_retrieval_tpu.search.fusion import (
    fuse,
    fuse_statistic,
    read_trec_run,
    write_trec_run,
)
from mllm_sparse_retrieval_tpu.search.runs import (ArrayRun, make_run,
                                                   merge_runs)

__all__ = [
    "fuse",
    "fuse_statistic",
    "read_trec_run",
    "write_trec_run",
    "ArrayRun",
    "make_run",
    "merge_runs",
]

"""Retrieval indexes: sharded dense flat MIPS + impact-ordered inverted index,
plus the live (segments + tombstones) update layer over both."""

from mllm_sparse_retrieval_tpu.index.ann import DenseANNIndex
from mllm_sparse_retrieval_tpu.index.arena import (ArenaDenseIndex,
                                                   ArenaImpactIndex)
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.filter import DocFilter
from mllm_sparse_retrieval_tpu.index.live import (LiveDenseIndex,
                                                  LiveImpactIndex)

__all__ = ["ArenaDenseIndex", "ArenaImpactIndex", "DenseFlatIndex",
           "DenseANNIndex", "DocFilter", "LiveDenseIndex",
           "LiveImpactIndex"]

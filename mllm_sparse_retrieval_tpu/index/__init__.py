"""Retrieval indexes: sharded dense flat MIPS + impact-ordered inverted index."""

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex

__all__ = ["DenseFlatIndex"]

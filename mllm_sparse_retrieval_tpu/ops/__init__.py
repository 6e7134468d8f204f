"""TPU compute paths: XLA formulations + Pallas kernels for the hot ops."""

from mllm_sparse_retrieval_tpu.ops.mips import mips_topk, sharded_mips_topk

__all__ = ["mips_topk", "sharded_mips_topk"]

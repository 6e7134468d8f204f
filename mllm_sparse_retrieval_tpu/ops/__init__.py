"""TPU compute paths: XLA formulations + Pallas kernels for the hot ops."""

from mllm_sparse_retrieval_tpu.ops.mips import (mips_topk, mips_topk_packed,
                                                sharded_mips_topk)
from mllm_sparse_retrieval_tpu.ops.packing import (pack_topk, unpack_topk,
                                                   pack_blocks, unpack_blocks)
from mllm_sparse_retrieval_tpu.ops.stream import pipeline_dispatch

__all__ = ["mips_topk", "mips_topk_packed", "sharded_mips_topk",
           "pack_topk", "unpack_topk", "pack_blocks", "unpack_blocks",
           "pipeline_dispatch"]

"""Evaluation: recall@k over runs, plus diagnostics/statistics tools."""

from mllm_sparse_retrieval_tpu.eval.recall import RecallResult, recall_at_k

__all__ = ["RecallResult", "recall_at_k"]

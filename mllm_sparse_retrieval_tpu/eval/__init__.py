"""Evaluation: recall@k (reference parity) plus MRR/nDCG/MAP and
diagnostics/statistics tools."""

from mllm_sparse_retrieval_tpu.eval.metrics import (MetricResult, map_at_k,
                                                    mrr_at_k, ndcg_at_k,
                                                    ranking_metrics)
from mllm_sparse_retrieval_tpu.eval.recall import RecallResult, recall_at_k

__all__ = ["RecallResult", "recall_at_k", "MetricResult", "mrr_at_k",
           "ndcg_at_k", "map_at_k", "ranking_metrics"]

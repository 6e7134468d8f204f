"""Functional JAX MLLM encoders: vision tower + projector + decoder LM + heads."""

from mllm_sparse_retrieval_tpu.models.registry import build_model, get_family_spec

__all__ = ["build_model", "get_family_spec"]

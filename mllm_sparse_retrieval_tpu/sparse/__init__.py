"""SPLADE-style sparse representation math: term selection, quantization, expansion."""

from mllm_sparse_retrieval_tpu.sparse.term_selection import (
    SelectedTerms,
    canonical_id_map,
    filter_token,
    get_filtered_ids,
    quantize_weights,
    select_image_terms,
    select_text_terms,
    doc_string_vector,
    query_string_weights,
    text_candidate_ids,
)

__all__ = [
    "SelectedTerms",
    "canonical_id_map",
    "filter_token",
    "get_filtered_ids",
    "quantize_weights",
    "select_image_terms",
    "select_text_terms",
    "doc_string_vector",
    "query_string_weights",
    "text_candidate_ids",
]

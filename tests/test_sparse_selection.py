"""Golden tests for sparse term selection against the reference semantics.

These verify our numpy implementation byte-for-byte against a straightforward
transcription of the reference math (top-k, rint*100 quantization, in-text
candidate restriction, expansion) on synthetic logits — the reference's own
functions are torch/NLTK-bound and not importable here, so the oracle is the
documented arithmetic of /root/reference/src/encode.py:38-153.
"""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.configs import SparseConfig
from mllm_sparse_retrieval_tpu.sparse import (
    doc_string_vector,
    filter_token,
    get_filtered_ids,
    query_string_weights,
    quantize_weights,
    select_image_terms,
    select_text_terms,
    text_candidate_ids,
)

# A small synthetic vocabulary exercising the filtering rules:
VOCAB = {
    "▁dog": 0, "▁Cat": 1, "bird": 2, "▁7": 3, "!": 4, "▁": 5,
    "▁horse": 6, "<s>": 7, "Fish": 8, "▁run": 9, "ning": 10, "▁blue": 11,
}
ID2TOK = {v: k for k, v in VOCAB.items()}
V = len(VOCAB)


def simple_encode(word):
    """Greedy longest-match toy sub-tokenizer over VOCAB for tests."""
    pieces = {"dog": [0], "cat": [1], "bird": [2], "horse": [6],
              "running": [9, 10], "blue": [11], "fish": [8], "7": [3]}
    return pieces.get(word, [])


def test_get_filtered_ids():
    ids = set(get_filtered_ids(VOCAB).tolist())
    # '▁dog'->dog ok; '▁Cat'->Cat starts uppercase, out; 'bird' ok; '▁7' digit
    # but starts '7' not a-z, out; '!' out; '▁'->'' out; '<s>' out;
    # 'Fish' uppercase out; '▁run' ok; 'ning' ok; '▁horse' ok; '▁blue' ok.
    assert ids == {0, 2, 6, 9, 10, 11}


def test_filter_token():
    assert filter_token("▁dog") == "dog"
    assert filter_token("dog") == "dog"
    assert filter_token("7up") == "up"
    assert filter_token("") == ""


def test_quantize_matches_rint():
    vals = np.array([0.0, 0.004, 0.005, 0.015, 1.2345, -0.3])
    np.testing.assert_array_equal(
        quantize_weights(vals), np.rint(vals * 100).astype(int)
    )


def test_image_terms_topk_order_and_quantization():
    rng = np.random.default_rng(0)
    logits = np.log1p(np.maximum(rng.normal(size=V), 0)).astype(np.float32)
    cfg = SparseConfig(sparse_length=4, sparse_manual=True)
    terms = select_image_terms(logits, cfg, get_filtered_ids(VOCAB))
    assert terms.token_ids.shape == (4,)
    # descending by value, ties by lower index
    order = np.argsort(-logits, kind="stable")[:4]
    np.testing.assert_array_equal(terms.token_ids, order)
    np.testing.assert_array_equal(
        terms.weights, np.rint(logits[order] * 100).astype(int))


def test_image_terms_default_k_caps_at_vocab():
    logits = np.arange(V, dtype=np.float32)
    cfg = SparseConfig()  # default top-128 > V
    terms = select_image_terms(logits, cfg, get_filtered_ids(VOCAB))
    assert terms.token_ids.shape == (V,)
    assert terms.token_ids[0] == V - 1  # highest logit first


def test_text_candidates_and_selection():
    logits = np.arange(V, dtype=np.float32) * 0.01
    text = "A dog and a cat running."
    cands = text_candidate_ids(text, simple_encode)
    np.testing.assert_array_equal(cands, [0, 1, 9, 10])
    cfg = SparseConfig()
    terms = select_text_terms(text, simple_encode, logits, cfg,
                              get_filtered_ids(VOCAB))
    # k = min(4, 128) = 4, all candidates, sorted by logit desc: 10, 9, 1, 0
    np.testing.assert_array_equal(terms.token_ids, [10, 9, 1, 0])
    np.testing.assert_array_equal(terms.weights, [10, 9, 1, 0])


def test_text_no_candidates_falls_back_to_top10():
    logits = np.arange(V, dtype=np.float32)
    cfg = SparseConfig()
    terms = select_text_terms("the of and", simple_encode, logits, cfg,
                              get_filtered_ids(VOCAB))
    assert terms.token_ids.shape == (min(10, V),)
    assert terms.token_ids[0] == V - 1


def test_text_manual_mode_uses_full_vocab():
    logits = np.arange(V, dtype=np.float32)
    cfg = SparseConfig(sparse_manual=True, sparse_length=3)
    terms = select_text_terms("a dog", simple_encode, logits, cfg,
                              get_filtered_ids(VOCAB))
    np.testing.assert_array_equal(terms.token_ids, [V - 1, V - 2, V - 3])


def test_expansion_excludes_in_text_candidates():
    logits = np.arange(V, dtype=np.float32)
    cfg = SparseConfig(num_expanded_tokens=2)
    filtered = get_filtered_ids(VOCAB)  # {0,2,6,9,10,11}
    terms = select_text_terms("a dog", simple_encode, logits, cfg, filtered)
    # candidates = {0}; expansion pool = filtered - {0} = {2,6,9,10,11};
    # top-2 by logit: 11, 10
    assert terms.token_ids[0] == 0
    np.testing.assert_array_equal(terms.token_ids[1:], [11, 10])


def test_doc_string_vector_collision_last_write_wins():
    import numpy as np
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    # ids 1 ('▁Cat') and 8 ('Fish') lower+filter to 'cat' and 'fish'; craft a
    # collision: '▁Cat'.lower()='▁cat' -> filter -> 'cat'.
    terms = SelectedTerms(np.array([1, 8, 1], dtype=np.int32),
                          np.array([5, 7, 3], dtype=np.int32))
    vec = doc_string_vector(terms, ID2TOK, is_filtered=True)
    assert vec == {"cat": 3, "fish": 7}  # last write for 'cat' wins


def test_query_string_weights_sum_and_drop_nonpositive():
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    terms = SelectedTerms(np.array([1, 1, 8, 2], dtype=np.int32),
                          np.array([5, 3, 0, -2], dtype=np.int32))
    vec = query_string_weights(terms, ID2TOK, is_filtered=True)
    assert vec == {"cat": 8}  # 5+3 summed; 0 and negative dropped


def test_out_of_vocab_ids_dropped():
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    terms = SelectedTerms(np.array([0, 999], dtype=np.int32),
                          np.array([4, 9], dtype=np.int32))
    vec = doc_string_vector(terms, ID2TOK, is_filtered=True)
    assert vec == {"dog": 4}

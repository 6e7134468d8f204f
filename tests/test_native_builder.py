"""Native (C++) impact builder: parity with the pure-Python builder."""

import json

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index import native
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex

needs_native = pytest.mark.skipif(
    not native.available(), reason="C++ toolchain unavailable")


def _write_jsonl(path, docs):
    with open(path, "w") as f:
        for doc_id, vec in docs:
            f.write(json.dumps({"id": doc_id, "content": "", "vector": vec}) + "\n")


@needs_native
def test_native_matches_python_builder(tmp_path):
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(60)] + ["café", "naïve", "éclair"]
    docs = []
    for i in range(100):
        terms = rng.choice(vocab, size=10, replace=False)
        weights = rng.integers(1, 500, size=10)
        docs.append((f"doc{i}", dict(zip(terms.tolist(),
                                         [int(w) for w in weights]))))
    path = tmp_path / "corpus_0.jsonl"
    _write_jsonl(path, docs)

    nat = ImpactIndex.from_jsonl([str(path)], use_native=True)
    py = ImpactIndex.from_jsonl([str(path)], use_native=False)

    assert nat.doc_ids == py.doc_ids
    assert nat.term_to_idx == py.term_to_idx
    np.testing.assert_array_equal(nat.doc_terms, py.doc_terms)
    np.testing.assert_array_equal(nat.doc_weights, py.doc_weights)
    np.testing.assert_array_equal(nat.csr_offsets, py.csr_offsets)
    np.testing.assert_array_equal(nat.csr_weights, py.csr_weights)
    # csr_docs may differ only inside equal-weight ties; verify grouped sets
    for t in range(len(nat.term_to_idx)):
        lo, hi = nat.csr_offsets[t], nat.csr_offsets[t + 1]
        pairs_n = set(zip(nat.csr_weights[lo:hi].tolist(),
                          nat.csr_docs[lo:hi].tolist()))
        pairs_p = set(zip(py.csr_weights[lo:hi].tolist(),
                          py.csr_docs[lo:hi].tolist()))
        assert pairs_n == pairs_p


@needs_native
def test_native_numeric_ids_and_escapes(tmp_path):
    path = tmp_path / "c.jsonl"
    with open(path, "w") as f:
        f.write('{"id": 42, "content": "", "vector": {"a\\"b": 3, "\\u00e9": 2}}\n')
        f.write('{"id": "x7", "content": "ignored", "vector": {"plain": 1}}\n')
    idx = ImpactIndex.from_jsonl([str(path)], use_native=True)
    assert idx.doc_ids == ["42", "x7"]
    assert 'a"b' in idx.term_to_idx
    assert "é" in idx.term_to_idx
    scores, ids = idx.search([{'a"b': 2}], depth=5)
    assert ids[0] == ["42"]
    assert scores[0] == [6.0]


@needs_native
def test_native_rejects_malformed(tmp_path):
    path = tmp_path / "bad.jsonl"
    with open(path, "w") as f:
        f.write('{"id": "ok", "vector": {"a": 1}}\n')
        f.write('this is not json\n')
    builder = native.NativeImpactBuilder()
    with pytest.raises(ValueError):
        builder.add_jsonl_file(str(path))


@needs_native
def test_native_search_end_to_end(tmp_path):
    docs = [("d1", {"cat": 3, "dog": 2}), ("d2", {"dog": 7})]
    path = tmp_path / "c.jsonl"
    _write_jsonl(path, docs)
    idx = ImpactIndex.from_jsonl([str(path)], use_native=True)
    scores, ids = idx.search([{"dog": 1, "cat": 1}], depth=10)
    assert ids[0] == ["d2", "d1"]
    assert scores[0] == [7.0, 5.0]

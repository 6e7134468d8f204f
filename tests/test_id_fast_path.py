"""Id-keyed fast path: SelectedTerms → device with no string round trip.

The product stack's own term space is token ids; the string key space exists
only for Lucene-artifact interchange. These tests pin the fast path
(ImpactIndex.from_selected_terms / encode_query_terms / search_terms) to the
string path bit-exactly, including the collision semantics the string dicts
encode implicitly (lowercase/filter merges, doc last-write-wins, query sums)
via sparse.canonical_id_map. VERDICT r3 #1.
"""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.sparse import (
    SelectedTerms,
    canonical_id_map,
    doc_string_vector,
    query_string_weights,
)

# toy vocab with deliberate collisions: "The"/"the" lowercase-collide;
# "-cat"/"cat" collide only under is_filtered (leading '-' stripped)
VOCAB = {"the": 0, "The": 1, "cat": 2, "-cat": 3, "dog": 4, "bird": 5,
         "Zebra": 6}
ID2TOK = {v: k for k, v in VOCAB.items()}


def _terms(ids, ws):
    return SelectedTerms(np.asarray(ids, np.int32), np.asarray(ws, np.int32))


def test_canonical_id_map_collisions():
    m = canonical_id_map(VOCAB, is_filtered=False)
    assert m[1] == m[0] == 0          # The -> the
    assert m[2] == 2 and m[3] == 3    # -cat distinct without filtering
    assert m[6] == 6                  # zebra has no lowercase partner
    mf = canonical_id_map(VOCAB, is_filtered=True)
    assert mf[3] == mf[2] == 2        # -cat -> cat under filter
    assert mf[1] == 0
    # out-of-vocab slots are -1
    m_wide = canonical_id_map(VOCAB, is_filtered=False, vocab_size=10)
    assert m_wide.size == 10 and m_wide[9] == -1


def _string_index(doc_ids, terms_list, is_filtered):
    idx = ImpactIndex()
    for did, t in zip(doc_ids, terms_list):
        idx.add(did, doc_string_vector(t, ID2TOK, is_filtered))
    idx.finalize()
    return idx


def _rows_match(fast, slow):
    """Row-wise equality as (score, id) multisets (equal-score ties may
    order differently across distinct programs — CLAUDE.md)."""
    fs, fi = fast
    ss, si = slow
    assert len(fs) == len(ss)
    for a_s, a_i, b_s, b_i in zip(fs, fi, ss, si):
        assert sorted(zip(a_s, a_i)) == sorted(zip(b_s, b_i))


@pytest.mark.parametrize("is_filtered", [False, True])
def test_fast_path_matches_string_path(is_filtered):
    docs = [
        _terms([0, 2, 4], [5, 3, 2]),          # the cat dog
        _terms([1, 0, 5], [4, 6, 1]),          # The(4) the(6): last wins -> 6
        _terms([3, 2], [7, 2]),                # -cat(7) cat(2)
        _terms([6, 4], [9, 1]),
    ]
    ids = ["a", "b", "c", "d"]
    cmap = canonical_id_map(VOCAB, is_filtered)
    slow = _string_index(ids, docs, is_filtered)
    fast = ImpactIndex.from_selected_terms(ids, docs, cmap)
    assert fast.int_keyed and not slow.int_keyed

    queries = [
        _terms([0, 1, 2], [2, 3, 1]),          # the+The sum to 5
        _terms([3, 4], [2, 2]),
        _terms([6], [1]),
        _terms([], []),                        # empty query
    ]
    q_dicts = [query_string_weights(q, ID2TOK, is_filtered) for q in queries]
    _rows_match(fast.search_terms(queries, 10, canonical_map=cmap),
                slow.search(q_dicts, 10))


def test_doc_last_write_wins_and_negative_erase():
    # same term twice: later weight overwrites; trailing non-positive erases
    docs = [_terms([2, 2], [5, 3]), _terms([4, 4], [9, 0]),
            _terms([5], [2])]
    cmap = canonical_id_map(VOCAB, False)
    fast = ImpactIndex.from_selected_terms(["x", "y", "z"], docs, cmap)
    slow = _string_index(["x", "y", "z"], docs, False)
    s, i = fast.search_terms([_terms([2, 4, 5], [1, 1, 1])], 10,
                             canonical_map=cmap)
    assert dict(zip(i[0], s[0])) == {"x": 3.0, "z": 2.0}  # y's dog erased
    _rows_match((s, i),
                slow.search([{"cat": 1, "dog": 1, "bird": 1}], 10))


def test_oov_ids_dropped():
    docs = [_terms([2, 99], [5, 7])]           # 99 outside the vocab map
    cmap = canonical_id_map(VOCAB, False)
    fast = ImpactIndex.from_selected_terms(["x"], docs, cmap)
    assert fast.num_terms == 1
    s, i = fast.search_terms([_terms([2, 99, 1000], [1, 4, 4])], 5,
                             canonical_map=cmap)
    assert s[0] == [5.0] and i[0] == ["x"]
    # without a canonical map, raw ids key directly (id-native corpora)
    fast2 = ImpactIndex.from_selected_terms(["x"], [_terms([2, 99], [5, 7])])
    s2, _ = fast2.search_terms([_terms([99], [2])], 5)
    assert s2[0] == [14.0]


def test_string_index_rejects_term_queries():
    slow = _string_index(["a"], [_terms([2], [5])], False)
    with pytest.raises(TypeError):
        slow.search_terms([_terms([2], [1])], 5)


def test_encode_queries_vectorized_semantics():
    """The bulk encode_queries reproduces the old per-term loop exactly:
    int(w) truncation, non-positive drop, OOV drop, left-compaction."""
    idx = ImpactIndex()
    idx.add("a", {"x": 3, "y": 2})
    idx.add("b", {"y": 7, "z": 1})
    idx.finalize()

    vecs = [
        {"x": 2, "zzz": 9, "y": 5},            # OOV term in the middle
        {"x": 0.9, "y": -3, "z": 2.5},         # trunc -> 0 drop, neg drop
        {},                                     # empty
        {"z": 4},
    ]

    def old_loop(query_vectors, q_max=0):
        rows = []
        for vec in query_vectors:
            rows.append([(idx.term_to_idx[k], int(w))
                         for k, w in vec.items()
                         if int(w) > 0 and k in idx.term_to_idx])
        q_m = max(q_max, max((len(r) for r in rows), default=1), 1)
        q_m = -(-q_m // 64) * 64
        qi = np.zeros((len(rows), q_m), np.int32)
        qw = np.zeros((len(rows), q_m), np.float32)
        for i, row in enumerate(rows):
            for j, (t, w) in enumerate(row):
                qi[i, j], qw[i, j] = t, w
        return qi, qw

    got_i, got_w = idx.encode_queries(vecs)
    want_i, want_w = old_loop(vecs)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_w, want_w)


def test_int_keys_survive_save_load(tmp_path):
    docs = [_terms([2, 4], [5, 3]), _terms([5], [2])]
    fast = ImpactIndex.from_selected_terms(["a", "b"], docs)
    fast.save(str(tmp_path / "idx"))
    back = ImpactIndex.load(str(tmp_path / "idx"))
    assert back.int_keyed
    _rows_match(back.search_terms([_terms([2, 5], [1, 1])], 5),
                fast.search_terms([_terms([2, 5], [1, 1])], 5))

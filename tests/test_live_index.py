"""Live index layer (segments + tombstones) vs rebuilt-from-scratch oracles.

Equal scores may order differently between a segmented search and a fresh
single-matrix index (different compiled programs — the repo-wide tie rule),
so comparisons are tie-aware: exact score sequences, id SETS within each
equal-score group.
"""

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.index.live import (LiveDenseIndex,
                                                  LiveImpactIndex, _bucket,
                                                  _fetch_depth)


def assert_rows_match(live_rows, oracle_rows):
    """Tie-aware ragged-row equality: same scores rank-for-rank, same ids
    within every equal-score run. When the depth cutoff falls INSIDE a tie
    group, both sides hold an equally-valid subset of that group — the
    lowest score group is compared by size only, every other group by set."""
    (ls, li), (os_, oi) = live_rows, oracle_rows
    assert len(ls) == len(os_)
    for q, (s_a, i_a, s_b, i_b) in enumerate(zip(ls, li, os_, oi)):
        np.testing.assert_allclose(s_a, s_b, rtol=1e-6, atol=1e-6,
                                   err_msg=f"query {q} scores")
        groups_a, groups_b = {}, {}
        for s, i in zip(s_a, i_a):
            groups_a.setdefault(round(float(s), 4), set()).add(i)
        for s, i in zip(s_b, i_b):
            groups_b.setdefault(round(float(s), 4), set()).add(i)
        assert set(groups_a) == set(groups_b), f"query {q} score groups"
        boundary = min(groups_a) if groups_a else None
        for score, ids_a in groups_a.items():
            ids_b = groups_b[score]
            if score == boundary:
                assert len(ids_a) == len(ids_b), \
                    f"query {q} boundary group size at score {score}"
            else:
                assert ids_a == ids_b, f"query {q} id group at score {score}"


# ---------------------------------------------------------------------------
# dense
# ---------------------------------------------------------------------------

def _dense_oracle_rows(reps_by_id, queries, depth):
    """Fresh flat index over the live doc set -> ragged (scores, ids)."""
    index = DenseFlatIndex()
    ids = sorted(reps_by_id)
    if not ids:
        b = len(queries)
        return [[] for _ in range(b)], [[] for _ in range(b)]
    index.add(np.stack([reps_by_id[i] for i in ids]), ids)
    scores, id_rows = index.search_ids(queries, depth, batch_size=8)
    return [list(map(float, r)) for r in scores], id_rows


def _int_reps(rng, n, d):
    # integer-valued f32 reps: dot products are exact, so live-vs-oracle
    # score equality is bitwise, not approximate
    return rng.integers(-9, 10, size=(n, d)).astype(np.float32)


def test_live_dense_add_delete_update_matches_fresh_index():
    rng = np.random.default_rng(0)
    d = 16
    base_reps = _int_reps(rng, 30, d)
    base_ids = [f"b{i}" for i in range(30)]
    base = DenseFlatIndex()
    base.add(base_reps, base_ids)

    live = LiveDenseIndex(base, bucket_min=4)
    state = dict(zip(base_ids, base_reps))
    queries = _int_reps(rng, 5, d)

    # adds (two delta segments)
    for tag, n in (("x", 7), ("y", 3)):
        reps = _int_reps(rng, n, d)
        ids = [f"{tag}{i}" for i in range(n)]
        live.add_documents(reps, ids)
        state.update(zip(ids, reps))
    # deletes across base and delta
    live.delete_documents(["b0", "b5", "x2", "nope"])
    for dead in ("b0", "b5", "x2"):
        state.pop(dead)
    # update: re-add an existing id with new reps — latest must win
    new_b1 = _int_reps(rng, 1, d)
    live.add_documents(new_b1, ["b1"])
    state["b1"] = new_b1[0]

    assert live.num_docs == len(state)
    live_rows = live.search_rows(queries, depth=10, batch_size=8)
    assert_rows_match(live_rows, _dense_oracle_rows(state, queries, 10))

    # compaction preserves results exactly and collapses to one segment
    live.compact()
    assert live.num_segments == 1
    assert live.num_docs == len(state)
    assert_rows_match(live.search_rows(queries, depth=10, batch_size=8),
                      _dense_oracle_rows(state, queries, 10))


def test_live_dense_delta_bucket_padding_and_auto_compaction():
    rng = np.random.default_rng(1)
    live = LiveDenseIndex(None, bucket_min=8, max_delta_segments=3)
    state = {}
    for batch in range(6):
        ids = [f"s{batch}_{i}" for i in range(3)]
        reps = _int_reps(rng, 3, 8)
        live.add_documents(reps, ids)
        state.update(zip(ids, reps))
    # deltas auto-merged: never more than max_delta_segments + base
    assert live.num_segments <= 4
    # every delta row count is a bucket (power of two >= bucket_min)
    for seg in live._snapshot():
        assert seg.index.size in (8, 16, 32), seg.index.size
    queries = _int_reps(rng, 4, 8)
    assert_rows_match(live.search_rows(queries, depth=6, batch_size=4),
                      _dense_oracle_rows(state, queries, 6))


def test_live_dense_duplicate_ids_within_one_add_keep_last():
    live = LiveDenseIndex(None, bucket_min=4)
    reps = np.array([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]], np.float32)
    live.add_documents(reps, ["a", "dup", "dup"])
    assert live.num_docs == 2
    scores, ids = live.search_rows(np.array([[1.0, 0.0]], np.float32), 5)
    assert ids[0] == ["dup", "a"]
    assert scores[0] == [3.0, 1.0]


def test_live_dense_empty_and_fully_deleted():
    live = LiveDenseIndex(None, bucket_min=4)
    q = np.ones((2, 4), np.float32)
    assert live.search_rows(q, 3) == ([[], []], [[], []])
    live.add_documents(np.ones((2, 4), np.float32), ["a", "b"])
    live.delete_documents(["a", "b"])
    assert live.num_docs == 0
    assert live.search_rows(q, 3) == ([[], []], [[], []])
    live.compact()
    assert live.num_segments == 0
    assert live.search_rows(q, 3) == ([[], []], [[], []])


def test_live_dense_pad_rows_never_served():
    # pad rows score 0.0, which outranks negative docs — they must be
    # filtered even when every real doc scores below zero
    live = LiveDenseIndex(None, bucket_min=8)
    reps = -np.ones((2, 4), np.float32)
    live.add_documents(reps, ["n1", "n2"])
    scores, ids = live.search_rows(np.ones((1, 4), np.float32), 8)
    assert ids[0] == ["n1", "n2"] and scores[0] == [-4.0, -4.0] or \
        ids[0] == ["n2", "n1"]
    assert all(i in ("n1", "n2") for i in ids[0])
    assert len(ids[0]) == 2


def test_live_dense_reserved_pad_id_rejected():
    live = LiveDenseIndex(None)
    with pytest.raises(ValueError, match="reserved"):
        live.add_documents(np.ones((1, 4), np.float32), ["\x00__pad__"])


# ---------------------------------------------------------------------------
# sparse
# ---------------------------------------------------------------------------

def _sparse_oracle_rows(docs_by_id, queries, depth):
    index = ImpactIndex()
    if docs_by_id:
        index.add_many(sorted(docs_by_id.items()))
        return index.search(queries, depth, backend="matmul")
    b = len(queries)
    return [[] for _ in range(b)], [[] for _ in range(b)]


def _random_sparse_docs(rng, ids, vocab, k):
    out = {}
    for i in ids:
        terms = rng.choice(vocab, size=k, replace=False)
        out[i] = {int(t): int(rng.integers(1, 40)) for t in terms}
    return out


def test_live_impact_add_delete_update_matches_fresh_index():
    rng = np.random.default_rng(2)
    vocab = np.arange(60)
    state = _random_sparse_docs(rng, [f"b{i}" for i in range(25)], vocab, 6)
    base = ImpactIndex()
    base.add_many(state.items())
    live = LiveImpactIndex(base)

    extra = _random_sparse_docs(rng, [f"x{i}" for i in range(8)], vocab, 6)
    live.add_documents(list(extra.items()))
    state.update(extra)
    more = _random_sparse_docs(rng, [f"y{i}" for i in range(4)], vocab, 6)
    live.add_documents(list(more.items()))
    state.update(more)

    live.delete_documents(["b3", "x1", "ghost"])
    state.pop("b3")
    state.pop("x1")
    # update an existing base doc — new vector must fully replace the old
    live.add_documents([("b7", {0: 99, 1: 1})])
    state["b7"] = {0: 99, 1: 1}

    queries = [{int(t): 1 for t in rng.choice(vocab, 5, replace=False)}
               for _ in range(6)]
    assert live.num_docs == len(state)
    assert_rows_match(live.search_rows(queries, depth=12, backend="matmul"),
                      _sparse_oracle_rows(state, queries, 12))

    live.compact()
    assert live.num_segments == 1
    assert_rows_match(live.search_rows(queries, depth=12, backend="matmul"),
                      _sparse_oracle_rows(state, queries, 12))


def test_live_impact_new_vocabulary_in_delta():
    # delta docs may use terms the base never saw; base encode drops them
    # (OOV per segment, the Lucene rule) but the delta still matches
    base = ImpactIndex()
    base.add_many([("old", {1: 5})])
    live = LiveImpactIndex(base)
    live.add_documents([("new", {999: 7})])
    scores, ids = live.search_rows([{999: 2}], depth=5, backend="matmul")
    assert ids[0] == ["new"] and scores[0] == [14.0]
    # after compaction the union vocabulary serves both
    live.compact()
    scores, ids = live.search_rows([{1: 1, 999: 1}], depth=5,
                                   backend="matmul")
    assert set(ids[0]) == {"old", "new"}


def test_live_impact_zero_score_docs_still_excluded():
    live = LiveImpactIndex(None)
    live.add_documents([("a", {1: 3}), ("b", {2: 4})])
    scores, ids = live.search_rows([{1: 2}], depth=5, backend="matmul")
    assert ids[0] == ["a"] and scores[0] == [6.0]


def test_live_impact_auto_compaction_bound():
    rng = np.random.default_rng(3)
    live = LiveImpactIndex(None, max_delta_segments=2)
    state = {}
    for batch in range(5):
        docs = _random_sparse_docs(rng, [f"s{batch}_{i}" for i in range(3)],
                                   np.arange(30), 4)
        live.add_documents(list(docs.items()))
        state.update(docs)
    assert live.num_segments <= 3
    queries = [{int(t): 1 for t in rng.choice(30, 4, replace=False)}
               for _ in range(3)]
    assert_rows_match(live.search_rows(queries, depth=8, backend="matmul"),
                      _sparse_oracle_rows(state, queries, 8))


# ---------------------------------------------------------------------------
# mutation/compaction race rules (review findings, round 7)
# ---------------------------------------------------------------------------

def test_delete_racing_compaction_is_never_resurrected():
    """A delete landing between a compaction's snapshot and its install
    must abort the install (the merged segment was built from pre-delete
    tombstone sets): per-merged-segment tombstone identity check."""
    live = LiveDenseIndex(None, bucket_min=4)
    live.add_documents(np.eye(4, dtype=np.float32), list("abcd"))

    segs, tombs = live._atomic_snapshot()
    merged = live._merge_segments(segs, tombs)          # pre-delete merge
    assert live.delete_documents(["b"]) == 1            # racing delete
    assert not live._install_merge((), segs, tombs, merged), \
        "stale merge installed over a newer delete"
    # the retry loop (compact) sees the delete and converges correctly
    live.compact()
    _, ids = live.search_rows(np.eye(4, dtype=np.float32), 4)
    assert all("b" not in row for row in ids)
    assert live.num_docs == 3


def test_unrelated_mutations_do_not_abort_delta_merge():
    """The livelock fix: a delete on the BASE segment and an appended delta
    must NOT invalidate a delta merge — the install splices around them
    (base deletes live on the base segment object; new deltas become the
    tail)."""
    live = LiveDenseIndex(None, bucket_min=4, max_delta_segments=8)
    live.add_documents(np.eye(4, dtype=np.float32), list("abcd"))   # base
    live.compact()
    live.add_documents(np.ones((1, 4), np.float32), ["x"])          # delta 1
    live.add_documents(np.ones((1, 4), np.float32) * 2, ["y"])      # delta 2

    segs, tombs = live._atomic_snapshot()
    merged = live._merge_segments(segs[1:], tombs[1:])
    # racing, NON-conflicting mutations: base-only delete + appended delta
    live.delete_documents(["a"])
    live.add_documents(np.ones((1, 4), np.float32) * 3, ["z"])
    assert live._install_merge(segs[:1], segs[1:], tombs[1:], merged), \
        "non-conflicting mutations aborted the merge (livelock regression)"
    # state: base(with 'a' tombstoned) + merged(x,y) + tail delta(z)
    assert live.num_segments == 3
    assert live.num_docs == 3 + 2 + 1
    _, ids = live.search_rows(np.ones((1, 4), np.float32), 10)
    assert set(ids[0]) == {"b", "c", "d", "x", "y", "z"}
    # but a delete ON a merged delta does abort
    segs2, tombs2 = live._atomic_snapshot()
    merged2 = live._merge_segments(segs2[1:], tombs2[1:])
    live.delete_documents(["x"])
    assert not live._install_merge(segs2[:1], segs2[1:], tombs2[1:],
                                   merged2)


def test_save_snapshot_is_atomic_vs_replace_add(tmp_path):
    """A replace-add racing save() must not persist the OLD copy's
    tombstone without the replacement segment: tombstones are read in the
    same atomic snapshot as the segment tuple."""
    live = LiveDenseIndex(None, bucket_min=4)
    live.add_documents(np.eye(4, dtype=np.float32), list("abcd"))

    real_save_segment = live._save_segment
    raced = []

    def racing_save_segment(seg, directory, i):
        if not raced:
            raced.append(True)
            # interleave: the replace-add lands mid-save, AFTER the
            # snapshot was taken
            live.add_documents(np.ones((1, 4), np.float32) * 7, ["a"])
        return real_save_segment(seg, directory, i)

    live._save_segment = racing_save_segment
    live.save(str(tmp_path / "s"))
    back = LiveDenseIndex.load(str(tmp_path / "s"))
    # the save captured the PRE-add snapshot: 'a' is intact (old vector,
    # no tombstone), and the replacement segment is absent — consistent
    assert back.num_docs == 4
    scores, ids = back.search_rows(np.eye(4, dtype=np.float32)[:1], 1)
    assert ids[0] == ["a"] and scores[0] == [1.0]


def test_live_dense_dim_mismatch_rejected():
    live = LiveDenseIndex(None, bucket_min=4)
    live.add_documents(np.ones((1, 8), np.float32), ["a"])
    with pytest.raises(ValueError, match="dim mismatch"):
        live.add_documents(np.ones((1, 16), np.float32), ["b"])
    assert live.num_docs == 1


def test_live_impact_term_keys_declaration():
    live = LiveImpactIndex(None, term_keys="str")
    assert not live.int_keyed                 # empty but declared string
    live.add_documents([("d1", {"apple": 3})])
    assert not live.int_keyed
    _, ids = live.search_rows([{"apple": 1}], 5, backend="matmul")
    assert ids[0] == ["d1"]
    with pytest.raises(ValueError, match="term_keys"):
        LiveImpactIndex(None, term_keys="bogus")
    assert LiveImpactIndex(None).int_keyed    # default stays int


def test_background_compaction_converges_and_serves():
    """Serving-mode merge scheduler: adds return without paying the merge;
    the compactor converges to the bound; results stay oracle-correct."""
    rng = np.random.default_rng(9)
    live = LiveDenseIndex(None, bucket_min=4, max_delta_segments=2,
                          background_compaction=True)
    state = {}
    try:
        for batch in range(8):
            ids = [f"s{batch}_{i}" for i in range(3)]
            reps = _int_reps(rng, 3, 8)
            live.add_documents(reps, ids)
            state.update(zip(ids, reps))
        live.delete_documents(["s0_0"])
        state.pop("s0_0")
        live.wait_compacted(timeout=30)
        assert live.num_segments <= 3
        queries = _int_reps(rng, 3, 8)
        assert_rows_match(live.search_rows(queries, depth=8, batch_size=4),
                          _dense_oracle_rows(state, queries, 8))
        assert live.num_docs == len(state)
    finally:
        live.close()
    # close() is idempotent and stops the compactor thread
    live.close()


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------

def test_live_dense_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    base = DenseFlatIndex()
    base.add(_int_reps(rng, 20, 8), [f"b{i}" for i in range(20)])
    live = LiveDenseIndex(base, bucket_min=4, max_delta_segments=3)
    live.add_documents(_int_reps(rng, 3, 8), ["x0", "x1", "x2"])
    live.delete_documents(["b2", "x1"])
    live.save(str(tmp_path / "state"))

    back = LiveDenseIndex.load(str(tmp_path / "state"))
    assert back.num_docs == live.num_docs
    assert back.num_segments == live.num_segments
    assert back.bucket_min == 4 and back.max_delta_segments == 3
    q = _int_reps(rng, 3, 8)
    assert_rows_match(back.search_rows(q, depth=8),
                      live.search_rows(q, depth=8))
    # the restored index keeps updating correctly
    back.delete_documents(["b0"])
    back.add_documents(_int_reps(rng, 1, 8), ["y0"])
    s, ids = back.search_rows(q, depth=back.num_docs)
    assert "b0" not in ids[0] and "y0" in ids[0]


def test_live_dense_save_load_int8_dtype(tmp_path):
    live = LiveDenseIndex(None, dtype="int8", bucket_min=4)
    live.add_documents(np.eye(4, dtype=np.float32) * 5, list("abcd"))
    live.save(str(tmp_path / "s"))
    back = LiveDenseIndex.load(str(tmp_path / "s"))
    assert back.dtype == "int8"
    _, ids = back.search_rows(np.eye(4, dtype=np.float32)[:1], 2)
    assert ids[0][0] == "a"
    # dtype override on load
    f32 = LiveDenseIndex.load(str(tmp_path / "s"), dtype=np.float32)
    assert f32.dtype != "int8"


def test_live_impact_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    base = ImpactIndex()
    base.add_many(sorted(_random_sparse_docs(
        rng, [f"b{i}" for i in range(15)], np.arange(40), 5).items()))
    base.query_canonical = True
    live = LiveImpactIndex(base, max_delta_segments=5)
    live.add_documents([("n0", {99: 7}), ("n1", {3: 2, 99: 1})])
    live.delete_documents(["b1", "n0"])
    live.save(str(tmp_path / "state"))

    back = LiveImpactIndex.load(str(tmp_path / "state"))
    assert back.num_docs == live.num_docs
    assert back.num_segments == live.num_segments
    assert back.query_canonical and back.max_delta_segments == 5
    assert back.int_keyed
    queries = [{int(t): 1.0 for t in rng.choice(40, 4, replace=False)},
               {99: 2.0}]
    assert_rows_match(back.search_rows(queries, 10, backend="matmul"),
                      live.search_rows(queries, 10, backend="matmul"))
    # kind mismatch is loud
    with pytest.raises(ValueError, match="impact"):
        LiveDenseIndex.load(str(tmp_path / "state"))


def test_live_empty_save_load(tmp_path):
    live = LiveImpactIndex(None)
    live.save(str(tmp_path / "e"))
    back = LiveImpactIndex.load(str(tmp_path / "e"))
    assert back.num_docs == 0 and back.num_segments == 0
    assert back.search_rows([{1: 1.0}], 5) == ([[]], [[]])


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def test_bucket_and_fetch_depth_quantization():
    assert _bucket(1, 256) == 256
    assert _bucket(257, 256) == 512
    assert _bucket(8, 4) == 8
    assert _fetch_depth(10, 0, 1000) == 10
    assert _fetch_depth(10, 1, 1000) == 11
    assert _fetch_depth(10, 5, 1000) == 18      # 10 + 8
    assert _fetch_depth(10, 5, 12) == 12        # capped at segment size
    # quantized: growing deletions reuse the same program shape in runs
    assert _fetch_depth(10, 3, 1000) == _fetch_depth(10, 4, 1000) == 14


def test_live_dense_concurrent_updates_and_searches():
    """Thread-safety smoke: concurrent adders/deleters/searchers never
    corrupt the snapshot or serve a pad id."""
    import threading

    rng = np.random.default_rng(4)
    live = LiveDenseIndex(None, bucket_min=4, max_delta_segments=2)
    live.add_documents(_int_reps(rng, 8, 8), [f"init{i}" for i in range(8)])
    errors = []

    def adder(tag):
        try:
            r = np.random.default_rng(hash(tag) % 2**31)
            for step in range(5):
                ids = [f"{tag}_{step}_{i}" for i in range(3)]
                live.add_documents(_int_reps(r, 3, 8), ids)
                live.delete_documents([ids[0]])
        except Exception as e:                    # pragma: no cover
            errors.append(e)

    def searcher():
        try:
            q = _int_reps(np.random.default_rng(9), 2, 8)
            for _ in range(10):
                scores, ids = live.search_rows(q, depth=6, batch_size=4)
                for row in ids:
                    assert "\x00__pad__" not in row
        except Exception as e:                    # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=adder, args=(f"t{j}",))
               for j in range(3)] + [threading.Thread(target=searcher)
                                     for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    live.compact()
    assert live.num_segments == 1
    # 8 init + 3 adders x 5 steps x (3 added - 1 deleted)
    assert live.num_docs == 8 + 3 * 5 * 2


# ---------------------------------------------------------------------------
# tiered merges + write stalls (round 10: the on-chip loadtest drove the
# all-deltas-per-pass policy to 13,533 segments and 300 s searches)
# ---------------------------------------------------------------------------

def test_tiered_compaction_never_remerges_the_big_delta_every_pass():
    """Sustained small adds must NOT re-merge the accumulated big delta on
    every pass (the quadratic regime): total rows merged across N adds
    stays O(N log N), and big-delta re-merges are O(log N), not O(N)."""
    rng = np.random.default_rng(0)
    live = LiveDenseIndex(max_delta_segments=2, bucket_min=1)
    merged_sizes = []
    orig = live._merge_segments

    def spying_merge(segs, tombs):
        merged_sizes.append(sum(len(s.id_set) for s in segs))
        return orig(segs, tombs)

    live._merge_segments = spying_merge
    n_adds, d = 64, 4
    for i in range(n_adds):
        live.add_documents(_int_reps(rng, 1, d), [f"d{i}"])
    assert live.num_docs == n_adds
    assert live.num_segments - 1 <= live.max_delta_segments
    total_merged = sum(merged_sizes)
    # all-deltas-per-pass would merge ~N^2/2 rows (= 2016 at N=64);
    # tiered merging is O(N log N) (~N log2 N = 384 plus cascade slack)
    # — assert well under the quadratic cost
    assert total_merged < n_adds * 10, (total_merged, merged_sizes)
    # the largest merge (the big delta's doubling) happens rarely
    big = [m for m in merged_sizes if m > n_adds // 2]
    assert len(big) <= 3, merged_sizes

    # correctness after all that: matches a fresh index
    queries = _int_reps(rng, 4, d)
    reps_by_id = {}
    rng2 = np.random.default_rng(0)
    for i in range(n_adds):
        reps_by_id[f"d{i}"] = _int_reps(rng2, 1, d)[0]
    assert_rows_match(live.search_rows(queries, 10),
                      _dense_oracle_rows(reps_by_id, queries, 10))


def test_write_stall_bounds_segment_count_under_slow_merges():
    """Background mode + an artificially slow compactor: writers stall at
    max_stalled_segments instead of letting the snapshot grow unboundedly."""
    import time
    rng = np.random.default_rng(1)
    live = LiveDenseIndex(max_delta_segments=2, bucket_min=1,
                          background_compaction=True,
                          max_stalled_segments=6)
    orig = live._merge_segments
    peak = [0]

    def slow_merge(segs, tombs):
        time.sleep(0.03)
        return orig(segs, tombs)

    live._merge_segments = slow_merge
    try:
        for i in range(40):
            live.add_documents(_int_reps(rng, 1, 4), [f"d{i}"])
            peak[0] = max(peak[0], live.num_segments)
        # stall bound: deltas never exceeded the stall limit by more than
        # the one in-flight append per writer thread
        assert peak[0] - 1 <= live.max_stalled_segments + 1, peak[0]
        live.wait_compacted(timeout=30)
        assert live.num_docs == 40
    finally:
        live.close()


def test_stall_released_by_close():
    """close() releases a stalled writer promptly (no 120 s hang)."""
    import threading
    import time
    rng = np.random.default_rng(2)
    live = LiveImpactIndex(max_delta_segments=1,
                           background_compaction=True,
                           max_stalled_segments=1)

    def never_merge(segs, tombs):
        time.sleep(3600)

    live._merge_segments = never_merge
    docs = [(f"d{i}", {i % 7: 1 + i % 3, 7 + i % 5: 2}) for i in range(8)]
    done = threading.Event()

    def writer():
        for d in docs:
            live.add_documents([d])
        done.set()

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    time.sleep(0.3)          # let it stall
    live.close()
    assert done.wait(5.0), "writer stayed stalled after close()"
    t.join(5.0)

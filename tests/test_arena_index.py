"""Arena live indexes (index/arena.py) vs rebuilt-from-scratch oracles and
the segment implementation (index/live.py).

Same tie-aware comparison rules as test_live_index.py: exact score
sequences, id SETS within equal-score groups (compiled-program tie order
is not stable across different programs, the repo-wide rule).
"""

import threading

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index.arena import (ArenaDenseIndex,
                                                   ArenaImpactIndex, _RWLock)
from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.index.live import (LiveDenseIndex,
                                                  LiveImpactIndex)

from tests.test_live_index import (_dense_oracle_rows, _int_reps,
                                   _random_sparse_docs, _sparse_oracle_rows,
                                   assert_rows_match)


# ---------------------------------------------------------------------------
# dense
# ---------------------------------------------------------------------------

def test_arena_dense_add_delete_update_matches_fresh_index():
    rng = np.random.default_rng(0)
    d = 16
    base_reps = _int_reps(rng, 30, d)
    base_ids = [f"b{i}" for i in range(30)]
    base = DenseFlatIndex()
    base.add(base_reps, base_ids)

    arena = ArenaDenseIndex(base, doc_headroom=64)
    state = dict(zip(base_ids, base_reps))
    queries = _int_reps(rng, 5, d)

    for tag, n in (("x", 7), ("y", 3)):
        reps = _int_reps(rng, n, d)
        ids = [f"{tag}{i}" for i in range(n)]
        arena.add_documents(reps, ids)
        state.update(zip(ids, reps))
    arena.delete_documents(["b0", "b5", "x2", "nope"])
    for dead in ("b0", "b5", "x2"):
        state.pop(dead)
    new_b1 = _int_reps(rng, 1, d)
    arena.add_documents(new_b1, ["b1"])         # update: latest wins
    state["b1"] = new_b1[0]

    assert arena.num_docs == len(state)
    assert arena.num_segments == 1
    assert_rows_match(arena.search_rows(queries, depth=10, batch_size=8),
                      _dense_oracle_rows(state, queries, 10))

    arena.compact()
    assert arena.num_docs == len(state)
    assert_rows_match(arena.search_rows(queries, depth=10, batch_size=8),
                      _dense_oracle_rows(state, queries, 10))


def test_arena_dense_in_place_append_keeps_placement_shape():
    """Adds within capacity must UPDATE the placed corpus, not rebuild it:
    same device buffer shape, no re-placement."""
    rng = np.random.default_rng(1)
    d = 8
    arena = ArenaDenseIndex(None, doc_headroom=64)
    arena.add_documents(_int_reps(rng, 10, d), [f"a{i}" for i in range(10)])
    q = _int_reps(rng, 3, d)
    arena.search_rows(q, depth=5, batch_size=4)          # materializes
    dev0 = arena._inner._corpus_dev
    shape0 = dev0.shape
    extra = _int_reps(rng, 5, d)
    arena.add_documents(extra, [f"n{i}" for i in range(5)])
    assert arena._inner._corpus_dev is not None, \
        "append within capacity must not drop the placement"
    assert arena._inner._corpus_dev.shape == shape0
    state = {f"a{i}": r for i, r in
             enumerate(arena._inner._chunks[0][:10])}
    state.update({f"n{i}": r for i, r in enumerate(extra)})
    assert_rows_match(arena.search_rows(q, depth=8, batch_size=4),
                      _dense_oracle_rows(state, q, 8))


def test_arena_dense_growth_over_capacity():
    rng = np.random.default_rng(2)
    d = 8
    arena = ArenaDenseIndex(None, doc_headroom=4)
    state = {}
    for batch in range(6):                     # overflows the tiny headroom
        reps = _int_reps(rng, 300, d)
        ids = [f"s{batch}_{i}" for i in range(300)]
        arena.add_documents(reps, ids)
        state.update(zip(ids, reps))
    q = _int_reps(rng, 4, d)
    assert arena.num_docs == len(state)
    assert_rows_match(arena.search_rows(q, depth=10, batch_size=4),
                      _dense_oracle_rows(state, q, 10))


def test_arena_dense_duplicate_ids_within_one_add_keep_last():
    arena = ArenaDenseIndex(None, doc_headroom=16)
    reps = np.asarray([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]], np.float32)
    arena.add_documents(reps, ["a", "b", "a"])
    assert arena.num_docs == 2
    scores, ids = arena.search_rows(np.asarray([[1.0, 0.0]], np.float32),
                                    depth=5, batch_size=2)
    assert dict(zip(ids[0], scores[0])) == {"a": 3.0, "b": 2.0}


def test_arena_dense_empty_and_fully_deleted():
    arena = ArenaDenseIndex(None, doc_headroom=8)
    s, i = arena.search_rows(np.zeros((2, 4), np.float32), depth=3)
    assert s == [[], []] and i == [[], []]
    arena.add_documents(np.ones((2, 4), np.float32), ["a", "b"])
    arena.delete_documents(["a", "b"])
    s, i = arena.search_rows(np.ones((1, 4), np.float32), depth=3)
    assert s == [[]] and i == [[]]


def test_arena_dense_int8_mode():
    rng = np.random.default_rng(3)
    d = 8
    arena = ArenaDenseIndex(None, dtype="int8", doc_headroom=32)
    reps = _int_reps(rng, 12, d)               # small ints: SQ8 is exact
    ids = [f"a{i}" for i in range(12)]
    arena.add_documents(reps, ids)
    q = _int_reps(rng, 3, d)
    arena.search_rows(q, depth=4, batch_size=4)     # place, then append
    more = _int_reps(rng, 4, d)
    arena.add_documents(more, [f"n{i}" for i in range(4)])
    state = dict(zip(ids, reps))
    state.update(zip([f"n{i}" for i in range(4)], more))
    oracle = DenseFlatIndex(dtype="int8")
    okeys = sorted(state)
    oracle.add(np.stack([state[k] for k in okeys]), okeys)
    o_scores, o_ids = oracle.search_ids(q, 6, batch_size=4)
    a_scores, a_ids = arena.search_rows(q, depth=6, batch_size=4)
    assert_rows_match((a_scores, a_ids),
                      ([list(map(float, r)) for r in o_scores], o_ids))


def test_arena_dense_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    arena = ArenaDenseIndex(None, doc_headroom=16)
    reps = _int_reps(rng, 9, 6)
    arena.add_documents(reps, [f"a{i}" for i in range(9)])
    arena.delete_documents(["a4"])
    arena.save(str(tmp_path / "dense"))
    back = ArenaDenseIndex.load(str(tmp_path / "dense"))
    assert back.num_docs == 8
    q = _int_reps(rng, 2, 6)
    assert_rows_match(back.search_rows(q, depth=8, batch_size=4),
                      arena.search_rows(q, depth=8, batch_size=4))


# ---------------------------------------------------------------------------
# sparse
# ---------------------------------------------------------------------------

def _small_arena(base=None, **kw):
    kw.setdefault("doc_headroom", 64)
    kw.setdefault("term_headroom", 32)
    return ArenaImpactIndex(base, **kw)


def test_arena_impact_add_delete_update_matches_fresh_index():
    rng = np.random.default_rng(5)
    vocab = np.arange(60)
    state = _random_sparse_docs(rng, [f"b{i}" for i in range(25)], vocab, 6)
    base = ImpactIndex()
    base.add_many(state.items())
    arena = _small_arena(base)

    extra = _random_sparse_docs(rng, [f"x{i}" for i in range(8)], vocab, 6)
    arena.add_documents(list(extra.items()))
    state.update(extra)
    more = _random_sparse_docs(rng, [f"y{i}" for i in range(4)], vocab, 6)
    arena.add_documents(list(more.items()))
    state.update(more)

    arena.delete_documents(["b3", "x1", "ghost"])
    state.pop("b3")
    state.pop("x1")
    arena.add_documents([("b7", {0: 99, 1: 1})])     # update: latest wins
    state["b7"] = {0: 99, 1: 1}

    queries = [{int(t): 1 for t in rng.choice(vocab, 5, replace=False)}
               for _ in range(6)]
    assert arena.num_docs == len(state)
    assert_rows_match(arena.search_rows(queries, depth=12, backend="matmul"),
                      _sparse_oracle_rows(state, queries, 12))

    arena.compact()
    assert_rows_match(arena.search_rows(queries, depth=12, backend="matmul"),
                      _sparse_oracle_rows(state, queries, 12))


def test_arena_impact_in_place_append_keeps_matrix_shape():
    """The core arena property: an add after placement scatters into the
    SAME matrix (no shape change, no re-placement) and the very next
    search — with no fold — serves the new doc."""
    base = ImpactIndex()
    base.add_many([("old", {1: 5}), ("old2", {2: 3})])
    arena = _small_arena(base)
    arena.search_rows([{1: 1}], depth=5, backend="matmul")  # materialize
    dev = arena._inner._dev
    assert dev and "f32" in dev
    shape0 = dev["f32"].shape
    arena.add_documents([("new", {1: 7})])
    assert arena._pend_count == 1
    assert arena._inner._dev["f32"].shape == shape0
    scores, ids = arena.search_rows([{1: 2}], depth=5, backend="matmul")
    assert arena._pend_count == 1, "cached-form search must not fold"
    assert dict(zip(ids[0], scores[0])) == {"old": 10.0, "new": 14.0}


def test_arena_impact_new_vocabulary_in_append():
    """Appended docs may carry terms the base never saw: they take reserved
    matrix rows and are queryable IMMEDIATELY (the segment design only
    matches them via the per-delta vocab; the arena's vocab is live)."""
    base = ImpactIndex()
    base.add_many([("old", {1: 5})])
    arena = _small_arena(base)
    arena.search_rows([{1: 1}], depth=5, backend="matmul")
    arena.add_documents([("new", {999: 7})])
    scores, ids = arena.search_rows([{999: 2}], depth=5, backend="matmul")
    assert ids[0] == ["new"] and scores[0] == [14.0]
    scores, ids = arena.search_rows([{1: 1, 999: 1}], depth=5,
                                    backend="matmul")
    assert set(ids[0]) == {"old", "new"}


def test_arena_impact_term_capacity_growth():
    rng = np.random.default_rng(6)
    arena = _small_arena(None, term_headroom=8)
    state = {}
    for batch in range(5):                   # each batch brings ~12 new terms
        docs = _random_sparse_docs(
            rng, [f"s{batch}_{i}" for i in range(3)],
            np.arange(batch * 50, batch * 50 + 40), 4)
        arena.add_documents(list(docs.items()))
        state.update(docs)
        arena.search_rows([{int(batch * 50): 1}], depth=4, backend="matmul")
    queries = [{int(t): 1 for t in rng.choice(250, 6, replace=False)}
               for _ in range(4)]
    assert_rows_match(arena.search_rows(queries, depth=8, backend="matmul"),
                      _sparse_oracle_rows(state, queries, 8))


def test_arena_impact_zero_score_docs_still_excluded():
    arena = _small_arena(None)
    arena.add_documents([("a", {1: 3}), ("b", {2: 4})])
    scores, ids = arena.search_rows([{1: 2}], depth=5, backend="matmul")
    assert ids[0] == ["a"] and scores[0] == [6.0]


def test_arena_impact_delete_serves_unfiltered_single_chip():
    """Impact deletes zero the dead doc's matrix columns in place, so the
    single-chip search must serve the UNFILTERED static program (no
    DocFilter ever built) and keep the compact48 wire."""
    arena = _small_arena(None)
    arena.add_documents([("a", {1: 3, 2: 2}), ("b", {1: 7}),
                         ("c", {2: 5})])
    arena.search_rows([{1: 1}], depth=5, backend="matmul")  # materialize
    arena.delete_documents(["b"])
    scores, ids = arena.search_rows([{1: 2, 2: 1}], depth=5,
                                    backend="matmul", wire="compact48")
    assert dict(zip(ids[0], scores[0])) == {"a": 8.0, "c": 5.0}
    assert arena._filter is None, \
        "single-chip impact search with tombstones must not build a filter"
    assert arena._tomb_count == 1


def test_arena_impact_delete_survives_fresh_materialization():
    """The CSR still holds tombstoned docs until compaction; a FRESH
    device form built from it must re-zero the dead columns (the
    resurrect guard in search_rows' write-side block)."""
    arena = _small_arena(None)
    arena.add_documents([("a", {1: 3}), ("b", {1: 7}), ("c", {2: 5})])
    arena.search_rows([{1: 1}], depth=5, backend="matmul")
    arena.delete_documents(["b"])
    # force every cached form away: the next search rebuilds from CSR
    arena._inner.drop_device_cache()
    scores, ids = arena.search_rows([{1: 1}], depth=5, backend="matmul")
    assert ids[0] == ["a"] and scores[0] == [3.0]
    # and again after a pending-fold rebuild (add triggers no fold, the
    # fresh-form search does)
    arena.add_documents([("d", {1: 2})])
    arena._inner.drop_device_cache()
    scores, ids = arena.search_rows([{1: 1}], depth=5, backend="matmul")
    assert dict(zip(ids[0], scores[0])) == {"a": 3.0, "d": 2.0}


def test_arena_impact_race_invalidated_form_does_not_resurrect():
    """ADVICE r4 (medium): a write that invalidates cached device forms
    BETWEEN search_rows' unlocked _needs_fold check and its read lock
    (e.g. an add with weight >= 32768 dropping the i16 forms) must not
    let the read-locked search materialize a fresh form straight from the
    CSR — that form still holds tombstoned docs at full weight and, with
    no re-zero and no filter, deletes resurrect and the bad form stays
    cached. The fix re-checks staleness under the read lock and loops
    back to the write-side fold/materialize/re-zero path."""
    arena = _small_arena(None)
    arena.add_documents([("a", {1: 3}), ("dead", {1: 9}), ("c", {2: 5})])
    arena.search_rows([{1: 1}], depth=5, backend="matmul")   # warm form
    arena.delete_documents(["dead"])                         # zeroed cols

    orig = arena._needs_fold
    state = {"raced": False}

    def stale_needs_fold(mesh, backend):
        if not state["raced"]:
            state["raced"] = True
            ans = orig(mesh, backend)          # the unlocked check: False
            arena._inner.drop_device_cache()   # the racing invalidation
            return ans
        return orig(mesh, backend)

    arena._needs_fold = stale_needs_fold
    try:
        scores, ids = arena.search_rows([{1: 1}], depth=5,
                                        backend="matmul")
    finally:
        arena._needs_fold = orig
    assert state["raced"]
    assert ids[0] == ["a"] and scores[0] == [3.0], \
        "deleted doc resurrected through a race-built device form"
    # the recovered form must be the re-zeroed one, i.e. cached + clean
    scores, ids = arena.search_rows([{1: 1}], depth=5, backend="matmul")
    assert ids[0] == ["a"] and scores[0] == [3.0]


def test_arena_impact_update_zeroes_old_copy():
    """updateDocument: the old copy's columns are zeroed at re-add time —
    the replaced doc must not appear twice nor with stale scores, with no
    filter involved."""
    arena = _small_arena(None)
    arena.add_documents([("a", {1: 10}), ("b", {2: 4})])
    arena.search_rows([{1: 1}], depth=5, backend="matmul")
    arena.add_documents([("a", {1: 2, 2: 1})])      # replace in place
    scores, ids = arena.search_rows([{1: 3, 2: 1}], depth=5,
                                    backend="matmul")
    assert arena._filter is None
    assert dict(zip(ids[0], scores[0])) == {"a": 7.0, "b": 4.0}


def test_arena_impact_i16_overflowing_append():
    """A weight past int16 must invalidate any cached i16 kernel matrix
    (silent int16 overflow would corrupt scores) and keep serving
    correctly via f32."""
    base = ImpactIndex()
    base.add_many([("old", {1: 5})])
    arena = _small_arena(base)
    arena.search_rows([{1: 1}], depth=5, backend="matmul")
    assert arena._inner._int16_exact()
    arena.add_documents([("big", {1: 40_000})])
    assert arena._inner._i16_ok is False
    assert not any(k.startswith("i16") for k in arena._inner._dev or {})
    scores, ids = arena.search_rows([{1: 1}], depth=5, backend="matmul")
    assert dict(zip(ids[0], scores[0])) == {"old": 5.0, "big": 40_000.0}


def test_arena_impact_matches_segment_live_random_workload():
    """Cross-implementation equivalence on a randomized add/update/delete/
    search schedule: the arena and the segment classes must serve
    identical result multisets at every step."""
    rng = np.random.default_rng(7)
    vocab = np.arange(80)
    seg = LiveImpactIndex(None)
    arena = _small_arena(None)
    state = {}
    for step in range(6):
        docs = _random_sparse_docs(
            rng, [f"d{step}_{i}" for i in range(5)], vocab, 5)
        if step >= 2:   # rewrite one older doc (updateDocument path)
            victim = rng.choice(sorted(state))
            docs[victim] = {int(vocab[0]): int(rng.integers(1, 30))}
        seg.add_documents(list(docs.items()))
        arena.add_documents(list(docs.items()))
        state.update(docs)
        if step % 2:
            dead = [str(rng.choice(sorted(state)))]
            seg.delete_documents(dead)
            arena.delete_documents(dead)
            state.pop(dead[0])
        queries = [{int(t): 1 for t in rng.choice(vocab, 5, replace=False)}
                   for _ in range(4)]
        a = arena.search_rows(queries, depth=9, backend="matmul")
        s = seg.search_rows(queries, depth=9, backend="matmul")
        assert_rows_match(a, s)
        assert_rows_match(a, _sparse_oracle_rows(state, queries, 9))


def test_arena_impact_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    arena = _small_arena(None, query_canonical=False)
    docs = _random_sparse_docs(rng, [f"a{i}" for i in range(12)],
                               np.arange(40), 5)
    arena.add_documents(list(docs.items()))
    arena.delete_documents(["a3"])
    arena.save(str(tmp_path / "sparse"))
    back = ArenaImpactIndex.load(str(tmp_path / "sparse"))
    assert back.num_docs == 11
    queries = [{int(t): 1 for t in rng.choice(40, 5, replace=False)}
               for _ in range(3)]
    assert_rows_match(back.search_rows(queries, depth=8, backend="matmul"),
                      arena.search_rows(queries, depth=8, backend="matmul"))


def test_arena_impact_string_keys():
    arena = _small_arena(None, term_keys="str")
    assert not arena.int_keyed
    arena.add_documents([("a", {"hello": 3}), ("b", {"world": 4})])
    scores, ids = arena.search_rows([{"hello": 2, "none": 9}], depth=5,
                                    backend="matmul")
    assert ids[0] == ["a"] and scores[0] == [6.0]


def test_arena_impact_mesh_search_after_appends():
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    cpu_mesh = make_mesh()
    rng = np.random.default_rng(9)
    vocab = np.arange(50)
    state = _random_sparse_docs(rng, [f"b{i}" for i in range(10)], vocab, 4)
    base = ImpactIndex()
    base.add_many(state.items())
    arena = _small_arena(base)
    extra = _random_sparse_docs(rng, [f"x{i}" for i in range(6)], vocab, 4)
    arena.add_documents(list(extra.items()))
    state.update(extra)
    arena.delete_documents(["b2"])
    state.pop("b2")
    queries = [{int(t): 1 for t in rng.choice(vocab, 4, replace=False)}
               for _ in range(3)]
    assert_rows_match(
        arena.search_rows(queries, depth=8, mesh=cpu_mesh,
                          backend="matmul"),
        _sparse_oracle_rows(state, queries, 8))


def test_arena_dense_mesh_search_after_appends():
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    cpu_mesh = make_mesh()
    rng = np.random.default_rng(10)
    d = 8
    arena = ArenaDenseIndex(None, doc_headroom=32)
    reps = _int_reps(rng, 10, d)
    ids = [f"a{i}" for i in range(10)]
    arena.add_documents(reps, ids)
    state = dict(zip(ids, reps))
    q = _int_reps(rng, 3, d)
    arena.search_rows(q, depth=5, batch_size=4, mesh=cpu_mesh)
    more = _int_reps(rng, 4, d)
    arena.add_documents(more, [f"n{i}" for i in range(4)])
    state.update(zip([f"n{i}" for i in range(4)], more))
    assert_rows_match(
        arena.search_rows(q, depth=8, batch_size=4, mesh=cpu_mesh),
        _dense_oracle_rows(state, q, 8))


# ---------------------------------------------------------------------------
# concurrency
# ---------------------------------------------------------------------------

def test_rwlock_writer_excludes_readers():
    lock = _RWLock()
    log = []
    with lock.read():
        with lock.read():          # readers share
            log.append("r2")
    t_done = threading.Event()

    def writer():
        with lock.write():
            log.append("w")
        t_done.set()

    with lock.read():
        t = threading.Thread(target=writer)
        t.start()
        # the writer must WAIT while a reader is active
        assert not t_done.wait(0.05)
        log.append("r-exit")
    assert t_done.wait(2.0)
    t.join()
    assert log == ["r2", "r-exit", "w"]


def test_arena_concurrent_updates_and_searches():
    """Smoke the donated-scatter safety: sustained writer + reader threads
    must never crash (a donated buffer reaching an in-flight search would
    raise) and every returned id must resolve to a doc that existed."""
    rng = np.random.default_rng(11)
    arena = _small_arena(None, doc_headroom=256)
    arena.add_documents([(f"seed{i}", {int(i % 20): 5})
                         for i in range(20)])
    stop = threading.Event()
    errors = []

    def writer():
        step = 0
        try:
            while not stop.is_set():
                arena.add_documents(
                    [(f"w{step}_{i}", {int(rng.integers(0, 20)): 3})
                     for i in range(2)])
                if step % 3 == 0:
                    arena.delete_documents([f"w{step}_0"])
                step += 1
        except Exception as e:               # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for _ in range(30):
                queries = [{int(t): 1 for t in rng.choice(20, 3,
                                                          replace=False)}
                           for _ in range(4)]
                scores, ids = arena.search_rows(queries, depth=6,
                                                backend="matmul")
                for s_row in scores:
                    assert all(s > 0 for s in s_row)
        except Exception as e:               # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + \
        [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    threads[1].join()
    threads[2].join()
    stop.set()
    threads[0].join()
    assert not errors, errors


# ---------------------------------------------------------------------------
# mesh-incremental mutations (round 10, VERDICT r4 #7): adds/deletes scatter
# into the SHARDED device forms in place — no O(corpus) re-placement
# ---------------------------------------------------------------------------

def test_arena_impact_mesh_mutations_are_incremental():
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS
    cpu_mesh = make_mesh()
    rng = np.random.default_rng(11)
    vocab = np.arange(60)
    state = _random_sparse_docs(rng, [f"b{i}" for i in range(12)], vocab, 4)
    base = ImpactIndex()
    base.add_many(state.items())
    arena = ArenaImpactIndex(base, doc_headroom=64, term_headroom=32)

    builds = []
    orig = ImpactIndex._materialize

    def spy(self, mesh=None, dtype="f32", kernel_layout=False):
        key = dtype + ("/kernel" if kernel_layout else "")
        if self is arena._inner and (
                self._dev is None or self._mesh is not mesh
                or key not in self._dev):
            builds.append(key)             # oracle indexes don't count
        return orig(self, mesh, dtype, kernel_layout)

    ImpactIndex._materialize = spy
    try:
        queries = [{int(t): 1 for t in rng.choice(vocab, 4, replace=False)}
                   for _ in range(3)]
        arena.search_rows(queries, depth=8, mesh=cpu_mesh, backend="matmul")
        assert builds == ["f32"], builds          # the one initial placement

        for wave in range(3):                     # adds, deletes, searches
            extra = _random_sparse_docs(
                rng, [f"w{wave}_{i}" for i in range(5)], vocab, 4)
            arena.add_documents(list(extra.items()))
            state.update(extra)
            victim = f"b{wave}"
            arena.delete_documents([victim])
            state.pop(victim)
            got = arena.search_rows(queries, depth=8, mesh=cpu_mesh,
                                    backend="matmul")
            assert_rows_match(got, _sparse_oracle_rows(state, queries, 8))
        # mutations never re-placed the sharded form
        assert builds == ["f32"], builds
        # and the form stayed sharded over the mesh
        dev = arena._inner._dev["f32"]
        spec = dev.sharding.spec
        assert tuple(spec) == (None, DATA_AXIS), spec
    finally:
        ImpactIndex._materialize = orig


def test_arena_dense_mesh_mutations_are_incremental():
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS
    cpu_mesh = make_mesh()
    rng = np.random.default_rng(12)
    d = 8
    arena = ArenaDenseIndex(None, doc_headroom=64)
    ids = [f"a{i}" for i in range(10)]
    reps = _int_reps(rng, 10, d)
    arena.add_documents(reps, ids)
    state = dict(zip(ids, reps))
    q = _int_reps(rng, 3, d)
    arena.search_rows(q, depth=5, batch_size=4, mesh=cpu_mesh)
    placed = arena._inner._corpus_dev
    assert placed is not None

    placements = []
    orig = ArenaDenseIndex._ensure_dev

    def spy(self, mesh):
        inner = self._inner
        if inner._corpus_dev is None or inner._mesh is not mesh:
            placements.append(mesh)
        return orig(self, mesh)

    ArenaDenseIndex._ensure_dev = spy
    try:
        for wave in range(3):
            more = _int_reps(rng, 4, d)
            new_ids = [f"w{wave}_{i}" for i in range(4)]
            arena.add_documents(more, new_ids)
            state.update(zip(new_ids, more))
            arena.delete_documents([f"a{wave}"])
            state.pop(f"a{wave}")
            # the placement survived the mutation (not dropped)
            assert arena._inner._corpus_dev is not None
            assert_rows_match(
                arena.search_rows(q, depth=8, batch_size=4, mesh=cpu_mesh),
                _dense_oracle_rows(state, q, 8))
        assert placements == [], placements       # zero re-placements
        spec = arena._inner._corpus_dev.sharding.spec
        assert tuple(spec)[0] == DATA_AXIS, spec  # row sharding preserved
    finally:
        ArenaDenseIndex._ensure_dev = orig


def test_arena_impact_mesh_delete_serves_unfiltered():
    """Mesh arena searches serve the UNFILTERED sharded program now —
    deletes are zeroed per shard (compact48 itself stays single-chip-only,
    an orthogonal wire constraint asserted below)."""
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    cpu_mesh = make_mesh()
    rng = np.random.default_rng(13)
    vocab = np.arange(40)
    state = _random_sparse_docs(rng, [f"b{i}" for i in range(10)], vocab, 4)
    base = ImpactIndex()
    base.add_many(state.items())
    arena = ArenaImpactIndex(base, doc_headroom=32)
    arena.delete_documents(["b3", "b7"])
    state.pop("b3"); state.pop("b7")
    queries = [{int(t): 2 for t in rng.choice(vocab, 4, replace=False)}
               for _ in range(3)]
    got = arena.search_rows(queries, depth=6, mesh=cpu_mesh,
                            backend="matmul")
    for row in got[1]:
        assert "b3" not in row and "b7" not in row
    assert_rows_match(got, _sparse_oracle_rows(state, queries, 6))
    with pytest.raises(ValueError, match="single-chip"):
        arena.search_rows(queries, depth=6, mesh=cpu_mesh,
                          backend="matmul", wire="compact48")


def test_sharded_scatter_kernel_layout_parity():
    """The 4-D TAAT kernel form's sharded scatter (only reachable via
    search on a real chip) against a numpy oracle: triples land at
    (shard, row, col//lane_w, col%lane_w) of the owning shard."""
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    from mllm_sparse_retrieval_tpu.ops.score_programs import (
        _sharded_scatter_fn)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS

    mesh = make_mesh()
    n_shards = mesh.shape[DATA_AXIS]
    t, s_lanes, lane_w = 6, 2, 4
    shard_cols = s_lanes * lane_w
    mat = np.zeros((n_shards, t + 1, s_lanes, lane_w), np.float32)
    dev = jax.device_put(mat, NamedSharding(mesh, P(DATA_AXIS, None, None,
                                                    None)))
    rng = np.random.default_rng(3)
    n_tr = 16
    rows = rng.integers(1, t + 1, size=(n_shards, n_tr)).astype(np.int32)
    cols = rng.integers(0, shard_cols, size=(n_shards, n_tr)).astype(
        np.int32)
    # avoid duplicate (row, col) per shard: deterministic scatter-set
    for s in range(n_shards):
        seen, k = set(), 0
        for j in range(n_tr):
            while (int(rows[s, j]), int(cols[s, j])) in seen:
                cols[s, j] = (cols[s, j] + 1) % shard_cols
                rows[s, j] = 1 + (rows[s, j] % t)
            seen.add((int(rows[s, j]), int(cols[s, j])))
    vals = rng.integers(1, 90, size=(n_shards, n_tr)).astype(np.float32)
    spec = NamedSharding(mesh, P(DATA_AXIS, None))
    out = _sharded_scatter_fn(mesh, True)(
        dev, jax.device_put(rows, spec), jax.device_put(cols, spec),
        jax.device_put(vals, spec))
    expect = mat.copy()
    for s in range(n_shards):
        for j in range(n_tr):
            c = int(cols[s, j])
            expect[s, rows[s, j], c // lane_w, c % lane_w] = vals[s, j]
    np.testing.assert_array_equal(np.asarray(out), expect)
    assert tuple(out.sharding.spec)[0] == DATA_AXIS

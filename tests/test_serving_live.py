"""Serving over LIVE indexes: mutate-while-serving through the service and
HTTP layers.

Contract: (a) served results always equal a fresh offline search over the
current live doc set (the live layer's own oracle rule, tie-aware);
(b) live hybrid fusion is bit-equal to ``search.fusion.fuse`` over the
engines' candidate runs; (c) mutation endpoints round-trip through HTTP
with the same key-coercion rule as /search.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index import (DenseFlatIndex, LiveDenseIndex,
                                             LiveImpactIndex)
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.search.fusion import fuse
from mllm_sparse_retrieval_tpu.serving import RetrievalService
from mllm_sparse_retrieval_tpu.serving.http import make_server


def _int_reps(rng, n, d):
    # integer-valued reps -> exact dot products -> exact parity asserts
    return rng.integers(-9, 10, size=(n, d)).astype(np.float32)


def _sparse_docs(rng, ids, vocab, k=5):
    return {i: {int(t): int(rng.integers(1, 30))
                for t in rng.choice(vocab, k, replace=False)}
            for i in ids}


def _row_set(row):
    return {(d, round(float(s), 4)) for d, s in row}


@pytest.fixture(params=["segments", "arena"])
def live_pair(request):
    """Live dense + sparse indexes over the SAME 40-doc corpus + queries —
    parametrized over BOTH live implementations (segment classes and the
    arena classes), which must be interchangeable behind the service."""
    rng = np.random.default_rng(11)
    dim, vocab = 12, np.arange(50)
    ids = [f"d{i}" for i in range(40)]
    sparse_docs = _sparse_docs(rng, ids, vocab)
    reps = dict(zip(ids, _int_reps(rng, 40, dim)))

    impact = ImpactIndex()
    impact.add_many(sorted(sparse_docs.items()))
    dense = DenseFlatIndex()
    dense.add(np.stack([reps[i] for i in ids]), ids)
    if request.param == "arena":
        from mllm_sparse_retrieval_tpu.index import (ArenaDenseIndex,
                                                     ArenaImpactIndex)
        live_s = ArenaImpactIndex(impact, doc_headroom=64, term_headroom=32)
        live_d = ArenaDenseIndex(dense, doc_headroom=64)
    else:
        live_s = LiveImpactIndex(impact)
        live_d = LiveDenseIndex(dense, bucket_min=8)

    terms = [{int(t): float(rng.integers(1, 8))
              for t in rng.choice(vocab, 4, replace=False)}
             for _ in range(5)]
    denses = list(_int_reps(rng, 5, dim))
    return live_d, live_s, sparse_docs, reps, terms, denses, dim, rng


def _oracle_sparse(docs, terms, depth):
    idx = ImpactIndex()
    idx.add_many(sorted(docs.items()))
    return idx.search(terms, depth, backend="matmul")


def _oracle_dense(reps, queries, depth):
    idx = DenseFlatIndex()
    ids = sorted(reps)
    idx.add(np.stack([reps[i] for i in ids]), ids)
    s, i = idx.search_ids(np.stack(queries), depth)
    return s.tolist(), i


# ---- RetrievalService over live indexes ---------------------------------------


def test_live_sparse_service_updates_visible(live_pair):
    _, live_s, docs, _, terms, _, _, rng = live_pair
    svc = RetrievalService(impact_index=live_s, depth_levels=(10,),
                           backend="matmul", max_batch=4, max_wait_ms=5.0)
    try:
        assert svc.live and svc.mode == "sparse"
        # before: parity with the fresh oracle
        got = [svc.search(terms=t, depth=10) for t in terms]
        ref_s, ref_i = _oracle_sparse(docs, terms, 10)
        for row, s, i in zip(got, ref_s, ref_i):
            assert _row_set(row) == _row_set(zip(i, s))
        # mutate while the service is up: add 6, delete 3, update 1
        new = _sparse_docs(rng, [f"n{i}" for i in range(6)], np.arange(50))
        assert svc.add_documents(
            [{"id": k, "terms": v} for k, v in new.items()]) == 6
        docs.update(new)
        assert svc.delete_documents(["d1", "d2", "n0", "ghost"]) == 3
        for dead in ("d1", "d2", "n0"):
            docs.pop(dead)
        svc.add_documents([{"id": "d3", "terms": {0: 99}}])
        docs["d3"] = {0: 99}
        got = [svc.search(terms=t, depth=10) for t in terms]
        ref_s, ref_i = _oracle_sparse(docs, terms, 10)
        for row, s, i in zip(got, ref_s, ref_i):
            assert _row_set(row) == _row_set(zip(i, s))
        s = svc.stats()
        assert s["live"] and s["sparse_docs"] == len(docs)
        assert svc.compact() == {"sparse_segments": 1}
    finally:
        svc.close()


def test_live_dense_service_updates_visible(live_pair):
    live_d, _, _, reps, _, denses, dim, rng = live_pair
    svc = RetrievalService(dense_index=live_d, depth_levels=(10,),
                           max_batch=4, max_wait_ms=5.0)
    try:
        new_reps = _int_reps(rng, 3, dim)
        svc.add_documents([{"id": f"x{i}", "dense": new_reps[i]}
                           for i in range(3)])
        reps.update({f"x{i}": new_reps[i] for i in range(3)})
        svc.delete_documents(["d0"])
        reps.pop("d0")
        got = [svc.search(dense=d, depth=10) for d in denses]
        ref_s, ref_i = _oracle_dense(reps, denses, 10)
        for row, s, i in zip(got, ref_s, ref_i):
            assert _row_set(row) == _row_set(zip(i, s))
    finally:
        svc.close()


def test_live_hybrid_matches_host_fuse_rule(live_pair):
    live_d, live_s, docs, reps, terms, denses, dim, rng = live_pair
    alpha = 0.3
    svc = RetrievalService(live_d, live_s, alpha=alpha, depth_levels=(10,),
                           default_depth=10, backend="matmul",
                           max_batch=4, max_wait_ms=5.0)
    try:
        assert svc.mode == "hybrid" and svc.live
        # mutate both engines through the service (sparse first, then dense)
        add_reps = _int_reps(rng, 2, dim)
        add_terms = _sparse_docs(rng, ["h0", "h1"], np.arange(50))
        svc.add_documents([
            {"id": f"h{i}", "dense": add_reps[i], "terms": add_terms[f"h{i}"]}
            for i in range(2)])
        svc.delete_documents(["d4"])
        docs.update(add_terms)
        docs.pop("d4")
        reps.update({f"h{i}": add_reps[i] for i in range(2)})
        reps.pop("d4")

        got = [svc.search(terms=t, dense=d)
               for t, d in zip(terms, denses)]
        # oracle: fresh engines at candidate depth -> search.fusion.fuse
        d_s, d_i = _oracle_dense(reps, denses, 10)
        s_s, s_i = _oracle_sparse(docs, terms, 10)
        runs = []
        for rows_s, rows_i in ((d_s, d_i), (s_s, s_i)):
            run = {}
            for q, (srow, irow) in enumerate(zip(rows_s, rows_i)):
                if irow:
                    run[str(q)] = {
                        "docs": dict(zip(irow, map(float, srow))),
                        "max_score": float(max(srow)),
                        "min_score": float(min(srow))}
            runs.append(run)
        fused = fuse(runs, [alpha, 1.0 - alpha])
        for q, row in enumerate(got):
            ref = sorted(fused[str(q)].items(), key=lambda kv: -kv[1])[:10]
            assert _row_set(row) == _row_set(ref), f"query {q}"
    finally:
        svc.close()


def test_live_static_mix_rejected(live_pair):
    live_d, live_s, *_ = live_pair
    static = ImpactIndex()
    static.add("a", {1: 2})
    static.finalize()
    with pytest.raises(ValueError, match="live"):
        RetrievalService(live_d, static, depth_levels=(10,))
    dense_static = DenseFlatIndex()
    dense_static.add(np.ones((1, 4), np.float32), ["a"])
    with pytest.raises(ValueError, match="live"):
        RetrievalService(dense_static, live_s, depth_levels=(10,))


def test_static_service_rejects_mutation():
    idx = ImpactIndex()
    idx.add("a", {1: 2})
    idx.finalize()
    svc = RetrievalService(impact_index=idx, depth_levels=(10,),
                           max_batch=2, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="live"):
            svc.add_documents([{"id": "b", "terms": {1: 1}}])
        with pytest.raises(ValueError, match="live"):
            svc.delete_documents(["a"])
        with pytest.raises(ValueError, match="live"):
            svc.compact()
    finally:
        svc.close()


def test_add_documents_validation(live_pair):
    live_d, live_s, _docs, _reps, _terms, _denses, dim, _rng = live_pair
    svc = RetrievalService(live_d, live_s, depth_levels=(10,),
                           backend="matmul", max_batch=2, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="'id'"):
            svc.add_documents([{"terms": {1: 1}, "dense": [0.0] * dim}])
        with pytest.raises(ValueError, match="terms"):
            svc.add_documents([{"id": "z", "dense": [0.0] * dim}])
        with pytest.raises(ValueError, match="dense dim"):
            svc.add_documents([{"id": "z", "terms": {1: 1},
                                "dense": [0.0] * (dim + 1)}])
        assert svc.add_documents([]) == 0
    finally:
        svc.close()


# ---- HTTP mutation endpoints ---------------------------------------------------


def _post(base, payload, path):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_http_live_mutation_roundtrip(live_pair):
    live_d, live_s, docs, reps, terms, denses, dim, _ = live_pair
    svc = RetrievalService(live_d, live_s, alpha=0.5, depth_levels=(10,),
                           default_depth=10, backend="matmul",
                           max_batch=8, max_wait_ms=5.0)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        # add (JSON string term keys coerce to token ids — int_keyed index)
        status, out = _post(base, {"documents": [
            {"id": "web0", "dense": [3.0] * dim, "terms": {"7": 9.0}}]},
            "/documents")
        assert (status, out) == (200, {"added": 1})
        # the new doc is served
        status, out = _post(base, {"queries": [
            {"terms": {"7": 2.0}, "dense": [1.0] * dim}]}, "/search")
        assert status == 200
        assert "web0" in [d for d, _ in out["results"][0]]
        # delete
        status, out = _post(base, {"ids": ["web0", "nope"]},
                            "/documents/delete")
        assert (status, out) == (200, {"deleted": 1})
        status, out = _post(base, {"queries": [
            {"terms": {"7": 2.0}, "dense": [1.0] * dim}]}, "/search")
        assert "web0" not in [d for d, _ in out["results"][0]]
        # compact
        status, out = _post(base, {}, "/compact")
        assert status == 200 and out["ok"]
        assert out["sparse_segments"] == 1 and out["dense_segments"] == 1
        # stats carries live counters
        with urllib.request.urlopen(base + "/stats", timeout=30) as resp:
            s = json.loads(resp.read())
        assert s["live"] and s["sparse_docs"] == s["dense_docs"] == len(docs)
        # malformed bodies -> 400
        for path, payload in (("/documents", {"documents": "nope"}),
                              ("/documents", {}),
                              ("/documents/delete", {"ids": "nope"}),
                              ("/documents/delete", {})):
            with pytest.raises(urllib.error.HTTPError) as err:
                _post(base, payload, path)
            assert err.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def test_cli_serve_live_empty_bootstrap():
    """cli.serve --live-empty: boots with no artifacts, corpus arrives
    over POST /documents, serves hybrid, deletes and compacts."""
    import socket
    import time

    from mllm_sparse_retrieval_tpu.cli import serve as serve_cli

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    boot_error = []

    def run():
        try:
            serve_cli.main(["--live-empty", "hybrid", "--port", str(port),
                            "--depths", "10", "--impact-backend", "matmul",
                            "--max-wait-ms", "2"])
        except BaseException as e:                     # pragma: no cover
            boot_error.append(e)

    threading.Thread(target=run, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    # generous wait: under a fully loaded host (parallel suite) imports
    # alone can take tens of seconds
    for _ in range(300):
        if boot_error:
            pytest.fail(f"serve CLI died at boot: {boot_error[0]!r}")
        try:
            urllib.request.urlopen(base + "/healthz", timeout=5)
            break
        except Exception:
            time.sleep(0.2)
    else:
        pytest.fail("serve CLI never came up")
    _, out = _post(base, {"documents": [
        {"id": "a", "dense": [1.0, 0.0], "terms": {"3": 5.0}},
        {"id": "b", "dense": [0.0, 1.0], "terms": {"4": 9.0}}]},
        "/documents")
    assert out == {"added": 2}
    _, out = _post(base, {"queries": [
        {"terms": {"3": 2.0}, "dense": [1.0, 0.0], "depth": 10}]},
        "/search")
    assert [d for d, _ in out["results"][0]] == ["a", "b"]
    _, out = _post(base, {"ids": ["a"]}, "/documents/delete")
    assert out == {"deleted": 1}
    _, out = _post(base, {}, "/compact")
    assert out["sparse_segments"] == out["dense_segments"] == 1
    # daemon thread; the server dies with the test process


def test_rejected_hybrid_add_leaves_engines_consistent():
    """A batch that fails dense validation must not have mutated the
    sparse engine (review finding: permanent doc-set divergence)."""
    from mllm_sparse_retrieval_tpu.index import LiveDenseIndex, LiveImpactIndex

    svc = RetrievalService(LiveDenseIndex(None, bucket_min=4),
                           LiveImpactIndex(None), depth_levels=(10,),
                           backend="matmul", max_batch=2, max_wait_ms=1.0)
    try:
        # ragged dense dims on an EMPTY index (dim unknown) -> reject whole
        # batch BEFORE either engine mutates
        with pytest.raises(ValueError, match="inconsistent dense dims"):
            svc.add_documents([
                {"id": "a", "dense": [1.0, 0.0], "terms": {1: 2}},
                {"id": "b", "dense": [1.0, 0.0, 0.0], "terms": {2: 3}}])
        assert svc.impact_index.num_docs == 0
        assert svc.dense_index.num_docs == 0
        # reserved pad id: same rule
        with pytest.raises(ValueError, match="reserved"):
            svc.add_documents([
                {"id": "\x00__pad__", "dense": [1.0, 0.0], "terms": {1: 2}}])
        assert svc.impact_index.num_docs == 0
        # a corrected retry works
        assert svc.add_documents([
            {"id": "a", "dense": [1.0, 0.0], "terms": {1: 2}},
            {"id": "b", "dense": [0.0, 1.0], "terms": {2: 3}}]) == 2
        assert svc.impact_index.num_docs == svc.dense_index.num_docs == 2
    finally:
        svc.close()


def test_string_keyed_live_corpus_bootstraps_over_http():
    """--live-term-keys str: an EMPTY sparse live service accepts string
    term keys on the first POST /documents (review finding: int coercion
    made string corpora impossible to bootstrap)."""
    from mllm_sparse_retrieval_tpu.index import LiveImpactIndex

    svc = RetrievalService(
        impact_index=LiveImpactIndex(None, term_keys="str"),
        depth_levels=(10,), backend="matmul", max_batch=2, max_wait_ms=1.0)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        status, out = _post(base, {"documents": [
            {"id": "d1", "terms": {"apple": 3.0}}]}, "/documents")
        assert (status, out) == (200, {"added": 1})
        status, out = _post(base, {"queries": [{"terms": {"apple": 2.0}}]},
                            "/search")
        assert out["results"][0] == [["d1", 6.0]]
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def test_save_live_and_restart_resume(tmp_path, live_pair):
    """Full restart story: mutate -> POST /save -> new service from
    load_live_state serves the identical corpus."""
    from mllm_sparse_retrieval_tpu.serving.service import load_live_state

    live_d, live_s, docs, reps, terms, denses, dim, rng = live_pair
    state = str(tmp_path / "state")
    svc = RetrievalService(live_d, live_s, alpha=0.5, depth_levels=(10,),
                           default_depth=10, backend="matmul",
                           max_batch=8, max_wait_ms=5.0, live_state_dir=state)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        svc.add_documents([{"id": "p0", "dense": [2.0] * dim,
                            "terms": {5: 4.0}}])
        svc.delete_documents(["d6"])
        status, out = _post(base, {}, "/save")
        assert status == 200 and out["directory"] == state
        before = [svc.search(terms=t, dense=d)
                  for t, d in zip(terms, denses)]
    finally:
        server.shutdown()
        server.server_close()
        svc.close()

    d2, s2 = load_live_state(state)
    svc2 = RetrievalService(d2, s2, alpha=0.5, depth_levels=(10,),
                            default_depth=10, backend="matmul",
                            max_batch=8, max_wait_ms=5.0)
    try:
        st = svc2.stats()
        assert st["dense_docs"] == st["sparse_docs"] == len(docs) + 1 - 1
        after = [svc2.search(terms=t, dense=d)
                 for t, d in zip(terms, denses)]
        for row_a, row_b in zip(before, after):
            assert _row_set(row_a) == _row_set(row_b)
    finally:
        svc2.close()

    with pytest.raises(FileNotFoundError):
        load_live_state(str(tmp_path / "nope"))


def test_save_live_requires_configured_dir(live_pair):
    live_d, live_s, *_ = live_pair
    svc = RetrievalService(live_d, live_s, depth_levels=(10,),
                           backend="matmul", max_batch=2, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="live_state_dir"):
            svc.save_live()
    finally:
        svc.close()
    static = ImpactIndex()
    static.add("a", {1: 2})
    static.finalize()
    with pytest.raises(ValueError, match="live"):
        RetrievalService(impact_index=static, depth_levels=(10,),
                         live_state_dir="/tmp/x")


def test_http_mutation_on_static_service_is_400():
    idx = ImpactIndex()
    idx.add("a", {1: 2})
    idx.finalize()
    svc = RetrievalService(impact_index=idx, depth_levels=(10,),
                           max_batch=2, max_wait_ms=1.0)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        for path, payload in (("/documents",
                               {"documents": [{"id": "b", "terms": {"1": 1}}]}),
                              ("/documents/delete", {"ids": ["a"]}),
                              ("/compact", {})):
            with pytest.raises(urllib.error.HTTPError) as err:
                _post(base, payload, path)
            assert err.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        svc.close()

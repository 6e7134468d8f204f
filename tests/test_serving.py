"""Online serving layer: micro-batcher, retrieval service, HTTP front end.

The reference has no online surface (its /root/reference/src/search.py is an
offline batch script); serving/ is deployment surface over reference-parity
engines, so the contract tested here is (a) batching mechanics — coalescing,
per-future result routing, failure isolation — and (b) bit-parity of served
results with the offline engine calls the rest of the suite already trusts.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.serving import MicroBatcher, RetrievalService
from mllm_sparse_retrieval_tpu.serving.http import make_server


# ---- MicroBatcher ------------------------------------------------------------


def test_batcher_coalesces_and_routes_results():
    seen_batches = []

    def run(items):
        seen_batches.append(list(items))
        return [x * 10 for x in items]

    b = MicroBatcher(run, max_batch=8, max_wait_ms=50.0)
    try:
        futs = [b.submit(i) for i in range(8)]
        assert [f.result(5) for f in futs] == [i * 10 for i in range(8)]
        # a full batch dispatches without waiting out the window
        assert len(seen_batches) == 1 and sorted(seen_batches[0]) == list(range(8))
    finally:
        b.close()


def test_batcher_partial_batch_after_wait():
    b = MicroBatcher(lambda xs: [x + 1 for x in xs], max_batch=64,
                     max_wait_ms=10.0)
    try:
        assert b.submit(41).result(5) == 42          # lone item still served
        s = b.stats()
        assert s["batches"] == 1 and s["items"] == 1
    finally:
        b.close()


def test_batcher_exception_fails_batch_but_keeps_serving():
    def run(items):
        if any(x < 0 for x in items):
            raise ValueError("bad item")
        return items

    b = MicroBatcher(run, max_batch=4, max_wait_ms=5.0)
    try:
        bad = b.submit(-1)
        with pytest.raises(ValueError, match="bad item"):
            bad.result(5)
        assert b.submit(7).result(5) == 7            # dispatcher survived
    finally:
        b.close()


def test_batcher_wrong_result_count_is_an_error():
    b = MicroBatcher(lambda xs: xs[:-1] if len(xs) > 1 else [], max_batch=4,
                     max_wait_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="returned"):
            b.submit(1).result(5)
    finally:
        b.close()


def test_batcher_close_rejects_new_work():
    b = MicroBatcher(lambda xs: xs, max_batch=4)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)


def test_batcher_concurrent_submitters_coalesce():
    sizes = []

    def run(items):
        sizes.append(len(items))
        time.sleep(0.01)      # hold the dispatcher so submitters pile up
        return items

    b = MicroBatcher(run, max_batch=32, max_wait_ms=20.0)
    try:
        results = {}

        def worker(i):
            results[i] = b.submit(i).result(10)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: i for i in range(24)}
        assert max(sizes) > 1    # at least some coalescing happened
    finally:
        b.close()


# ---- fixtures ----------------------------------------------------------------


@pytest.fixture(scope="module")
def indexes():
    rng = np.random.default_rng(7)
    n_docs, dim, n_terms = 64, 8, 40
    doc_ids = [f"d{i}" for i in range(n_docs)]

    impact = ImpactIndex()
    for d in doc_ids:
        terms = rng.choice(n_terms, size=int(rng.integers(3, 9)),
                           replace=False)
        impact.add(d, {f"t{t}": int(rng.integers(1, 30)) for t in terms})
    impact.finalize()

    dense = DenseFlatIndex()
    order = rng.permutation(n_docs)
    reps = rng.normal(size=(n_docs, dim)).astype(np.float32)
    dense.add(reps[order], [doc_ids[i] for i in order])
    return impact, dense, dim, n_terms


def _queries(n_terms, dim, n=6, seed=3):
    rng = np.random.default_rng(seed)
    terms, denses = [], []
    for _ in range(n):
        picked = rng.choice(n_terms, size=4, replace=False)
        terms.append({f"t{t}": float(rng.integers(1, 9)) for t in picked})
        denses.append(rng.normal(size=dim).astype(np.float32))
    return terms, denses


def _rows_equal(served, scores_row, ids_row, depth):
    """Served rows must equal the offline engine's (score, id) prefix —
    compared as sets per score tie-group (top-k tie order is not part of
    the contract, see CLAUDE.md)."""
    assert len(served) == min(depth, len(ids_row))
    ref = list(zip(ids_row[:depth], scores_row[:depth]))
    assert {(d, round(float(s), 4)) for d, s in served} == \
           {(d, round(float(s), 4)) for d, s in ref}


# ---- RetrievalService --------------------------------------------------------


def test_service_sparse_parity(indexes):
    impact, _, dim, n_terms = indexes
    terms, _ = _queries(n_terms, dim)
    svc = RetrievalService(impact_index=impact, depth_levels=(5, 10),
                           default_depth=5, max_batch=8, max_wait_ms=20.0)
    try:
        assert svc.mode == "sparse"
        futs = [svc.search_async(terms=t, depth=5) for t in terms]
        got = [f.result(30) for f in futs]
        ref_s, ref_i = impact.search(terms, 5)
        for row, s, i in zip(got, ref_s, ref_i):
            _rows_equal(row, s, i, 5)
        assert svc.stats()["items"] == len(terms)
    finally:
        svc.close()


def test_service_dense_parity(indexes):
    _, dense, dim, n_terms = indexes
    _, denses = _queries(n_terms, dim)
    svc = RetrievalService(dense_index=dense, depth_levels=(10,),
                           max_batch=8, max_wait_ms=20.0)
    try:
        assert svc.mode == "dense"
        got = [svc.search(dense=d, depth=10) for d in denses]
        ref_s, ref_i = dense.search_ids(np.stack(denses), 10)
        for row, s, i in zip(got, ref_s, ref_i):
            _rows_equal(row, s, i, 10)
    finally:
        svc.close()


def test_service_hybrid_parity(indexes):
    impact, dense, dim, n_terms = indexes
    terms, denses = _queries(n_terms, dim)
    svc = RetrievalService(dense, impact, alpha=0.3, depth_levels=(10,),
                           default_depth=10, max_batch=8, max_wait_ms=20.0)
    try:
        assert svc.mode == "hybrid"
        futs = [svc.search_async(terms=t, dense=d)
                for t, d in zip(terms, denses)]
        got = [f.result(30) for f in futs]
        ref_s, ref_i = svc._fused.search_encoded(
            np.stack(denses), *impact.encode_queries(terms), 10)
        for row, s, i in zip(got, ref_s, ref_i):
            _rows_equal(row, s, i, 10)
    finally:
        svc.close()


def test_service_mesh_parity(indexes):
    """Mesh serving (the `cli.serve --mesh` path): rows served over the
    virtual 8-device data-axis mesh equal the single-chip service's in
    every mode (tie-aware set comparison, the repo-wide rule)."""
    from mllm_sparse_retrieval_tpu.parallel import make_mesh
    impact, dense, dim, n_terms = indexes
    mesh = make_mesh()
    terms, denses = _queries(n_terms, dim)
    modes = (dict(impact_index=impact),
             dict(dense_index=dense),
             dict(dense_index=dense, impact_index=impact))
    for kw in modes:
        svc_m = RetrievalService(depth_levels=(10,), max_batch=8,
                                 max_wait_ms=10.0, backend="matmul",
                                 mesh=mesh, **kw)
        svc_1 = RetrievalService(depth_levels=(10,), max_batch=8,
                                 max_wait_ms=10.0, backend="matmul", **kw)
        try:
            for t, d in zip(terms, denses):
                q = {}
                if "impact_index" in kw:
                    q["terms"] = t
                if "dense_index" in kw:
                    q["dense"] = d
                got = svc_m.search(depth=10, **q)
                ref = svc_1.search(depth=10, **q)
                # sharded reductions reassociate f32 adds: compare ids as
                # sets and scores with a tolerance (sorted descending on
                # both sides already)
                assert {i for i, _ in got} == {i for i, _ in ref}, \
                    f"mesh/single id divergence in mode {svc_m.mode}"
                np.testing.assert_allclose(
                    sorted(float(s) for _, s in got),
                    sorted(float(s) for _, s in ref),
                    rtol=1e-5, atol=1e-4)
        finally:
            svc_m.close()
            svc_1.close()


def test_cli_serve_mesh_boot(tmp_path):
    """`cli.serve --mesh` boots over static artifacts on the virtual
    8-device mesh, warms, and serves a hybrid query."""
    import socket
    import urllib.request

    from mllm_sparse_retrieval_tpu.cli import serve as serve_cli

    impact = ImpactIndex()
    impact.add("a", {"w1": 5, "w2": 2})
    impact.add("b", {"w2": 9})
    impact.finalize()
    impact.save(str(tmp_path / "sparse"))
    dense = DenseFlatIndex()
    dense.add(np.eye(4, dtype=np.float32)[:2], ["a", "b"])
    (tmp_path / "dense").mkdir()
    dense.save_shard(str(tmp_path / "dense" / "corpus_0.pkl"))

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    boot_error = []

    def run():
        try:
            serve_cli.main(["--sparse-index", str(tmp_path / "sparse"),
                            "--passage-reps", str(tmp_path / "dense"),
                            "--mesh", "--port", str(port),
                            "--depths", "10", "--impact-backend", "matmul",
                            "--max-wait-ms", "2"])
        except BaseException as e:                     # pragma: no cover
            boot_error.append(e)

    threading.Thread(target=run, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
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
    body = json.dumps({"queries": [
        {"terms": {"w2": 2.0}, "dense": [0.0, 1.0, 0.0, 0.0],
         "depth": 10}]}).encode()
    req = urllib.request.Request(base + "/search", data=body,
                                 headers={"Content-Type":
                                          "application/json"})
    out = json.loads(urllib.request.urlopen(req, timeout=30).read())
    assert [d for d, _ in out["results"][0]] == ["b", "a"]
    # daemon thread; the server dies with the test process


def test_service_depth_quantization_cuts_back(indexes):
    impact, _, dim, n_terms = indexes
    terms, _ = _queries(n_terms, dim, n=2)
    svc = RetrievalService(impact_index=impact, depth_levels=(10, 50),
                           max_batch=4, max_wait_ms=20.0)
    try:
        # depth=3 is served from the 10-level program but cut back to 3
        row3 = svc.search(terms=terms[0], depth=3)
        row10 = svc.search(terms=terms[0], depth=10)
        assert len(row3) == 3 and len(row10) == 10
        assert {d for d, _ in row3} <= {d for d, _ in row10}
        # mixed-depth batch: each request gets at most its depth (sparse
        # rows stop at the matched-doc count, as in the offline engine)
        futs = [svc.search_async(terms=terms[0], depth=2),
                svc.search_async(terms=terms[1], depth=50)]
        n_matched = len(impact.search([terms[1]], 50)[1][0])
        assert len(futs[0].result(30)) == 2
        assert len(futs[1].result(30)) == min(50, n_matched)
    finally:
        svc.close()


def test_service_validation_errors(indexes):
    impact, dense, dim, _ = indexes
    with pytest.raises(ValueError, match="at least one"):
        RetrievalService()
    svc = RetrievalService(dense, impact, depth_levels=(10,),
                           max_batch=2, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="requires terms"):
            svc.search(dense=np.zeros(dim, np.float32))
        with pytest.raises(ValueError, match="requires dense"):
            svc.search(terms={"t0": 1.0})
        with pytest.raises(ValueError, match="dense dim"):
            svc.search(terms={"t0": 1.0}, dense=np.zeros(dim + 1))
        with pytest.raises(ValueError, match="depth"):
            svc.search(terms={"t0": 1.0}, dense=np.zeros(dim), depth=99)
        with pytest.raises(ValueError, match="depth"):
            svc.search(terms={"t0": 1.0}, dense=np.zeros(dim), depth=0)
    finally:
        svc.close()
    with pytest.raises(ValueError, match="default_depth"):
        RetrievalService(impact_index=impact, depth_levels=(10,),
                         default_depth=100)


def test_service_nonpositive_weights_drop_and_merge(indexes):
    impact, _, dim, n_terms = indexes
    svc = RetrievalService(impact_index=impact, depth_levels=(10,),
                           max_batch=2, max_wait_ms=1.0)
    try:
        # pairs form, duplicate key accumulation, non-positive drop
        got = svc.search(terms=[("t1", 1.0), ("t1", 2.0), ("t2", -5.0)],
                         depth=10)
        ref_s, ref_i = impact.search([{"t1": 3.0}], 10)
        _rows_equal(got, ref_s[0], ref_i[0], 10)
    finally:
        svc.close()


# ---- HTTP front end ------------------------------------------------------------


@pytest.fixture()
def http_service(indexes):
    impact, dense, dim, n_terms = indexes
    svc = RetrievalService(dense, impact, alpha=0.3, depth_levels=(10,),
                           default_depth=10, max_batch=8, max_wait_ms=20.0)
    server = make_server(svc, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    yield base, svc, dim, n_terms
    server.shutdown()
    server.server_close()
    svc.close()


def _post(base, payload, path="/search"):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_http_search_healthz_stats(http_service, indexes):
    base, svc, dim, n_terms = http_service
    impact, dense, _, _ = indexes
    terms, denses = _queries(n_terms, dim, n=3)
    payload = {"queries": [
        {"terms": t, "dense": d.tolist(), "depth": 10}
        for t, d in zip(terms, denses)]}
    status, body = _post(base, payload)
    assert status == 200
    ref_s, ref_i = svc._fused.search_encoded(
        np.stack(denses), *impact.encode_queries(terms), 10)
    for row, s, i in zip(body["results"], ref_s, ref_i):
        _rows_equal([(d, sc) for d, sc in row], s, i, 10)

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health == {"ok": True, "mode": "hybrid"}
    with urllib.request.urlopen(base + "/stats", timeout=30) as resp:
        stats = json.loads(resp.read())
    assert stats["items"] >= 3 and stats["mode"] == "hybrid"


def test_http_single_query_object_and_int_keys(indexes):
    """Int-keyed impact index: JSON string term keys coerce back to ids."""
    impact_s, dense, dim, n_terms = indexes
    impact = ImpactIndex()
    for i, d in enumerate(f"d{i}" for i in range(16)):
        impact.add(d, {i % 5: 10 + i, (i + 1) % 5: 3})
    impact.finalize()
    assert impact.int_keyed
    svc = RetrievalService(impact_index=impact, depth_levels=(10,),
                           max_batch=4, max_wait_ms=10.0)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        status, body = _post(base, {"terms": {"2": 4.0}, "depth": 10})
        assert status == 200
        ref_s, ref_i = impact.search([{2: 4.0}], 10)
        _rows_equal([(d, s) for d, s in body["results"][0]],
                    ref_s[0], ref_i[0], 10)
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def test_http_errors(http_service):
    base, _, dim, _ = http_service
    # bad depth -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {"terms": {"t0": 1}, "dense": [0.0] * dim, "depth": 999})
    assert e.value.code == 400
    # malformed JSON -> 400
    req = urllib.request.Request(base + "/search", data=b"{not json",
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, {}, path="/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert e.value.code == 404

"""Named doc filters through the serving layer: per-request tenant scoping
with sub-batching by filter, oracle-checked against fresh sub-indexes."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index import DenseFlatIndex, LiveImpactIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.search.fusion import fuse
from mllm_sparse_retrieval_tpu.serving import RetrievalService
from mllm_sparse_retrieval_tpu.serving.http import make_server


def _int_reps(rng, n, d):
    return rng.integers(-9, 10, size=(n, d)).astype(np.float32)


@pytest.fixture(scope="module")
def stack():
    rng = np.random.default_rng(3)
    ids = [f"d{i}" for i in range(40)]
    sparse = {i: {int(t): int(rng.integers(1, 25))
                  for t in rng.choice(30, 5, replace=False)} for i in ids}
    reps = dict(zip(ids, _int_reps(rng, 40, 8)))
    impact = ImpactIndex()
    impact.add_many(sorted(sparse.items()))
    impact.finalize()
    dense = DenseFlatIndex()
    dense.add(np.stack([reps[i] for i in ids]), ids)
    tenants = {"even": [f"d{i}" for i in range(0, 40, 2)],
               "low": [f"d{i}" for i in range(10)]}
    return ids, sparse, reps, impact, dense, tenants, rng


def _row_set(row):
    return {(d, round(float(s), 4)) for d, s in row}


def _sub_sparse(sparse, allowed):
    idx = ImpactIndex()
    idx.add_many(sorted((i, sparse[i]) for i in allowed))
    idx.finalize()
    return idx


def test_service_sparse_filtered_matches_subindex(stack):
    ids, sparse, _, impact, _, tenants, rng = stack
    svc = RetrievalService(impact_index=impact, depth_levels=(10,),
                           backend="matmul", max_batch=8, max_wait_ms=5.0,
                           filters=tenants)
    try:
        assert svc.filter_names == ["even", "low"]
        terms = [{int(t): 2.0 for t in rng.choice(30, 4, replace=False)}
                 for _ in range(6)]
        # a mixed batch: unfiltered + both tenants interleaved
        futs = [svc.search_async(terms=t,
                                 filter=[None, "even", "low"][i % 3],
                                 depth=10)
                for i, t in enumerate(terms)]
        got = [f.result(60) for f in futs]
        full_s, full_i = impact.search(terms, 10, backend="matmul")
        subs = {name: _sub_sparse(sparse, allow)
                for name, allow in tenants.items()}
        for i, t in enumerate(terms):
            name = [None, "even", "low"][i % 3]
            oracle = (impact if name is None else subs[name]).search(
                [t], 10, backend="matmul")
            assert _row_set(got[i]) == _row_set(
                zip(oracle[1][0], oracle[0][0])), (i, name)
        # sanity: the filtered rows differ from unfiltered for some query
        assert any(_row_set(got[i]) != _row_set(
            zip(full_i[i], full_s[i])) for i in range(6) if i % 3)
        with pytest.raises(ValueError, match="unknown filter"):
            svc.search(terms=terms[0], filter="ghost")
    finally:
        svc.close()


def test_service_hybrid_filtered_matches_host_fuse(stack):
    ids, sparse, reps, impact, dense, tenants, rng = stack
    alpha = 0.4
    svc = RetrievalService(dense, impact, alpha=alpha, depth_levels=(10,),
                           backend="matmul", max_batch=4, max_wait_ms=5.0,
                           filters={"even": tenants["even"]})
    try:
        terms = [{int(t): 2.0 for t in rng.choice(30, 4, replace=False)}
                 for _ in range(4)]
        denses = _int_reps(rng, 4, 8)
        got = [svc.search(terms=t, dense=d, filter="even")
               for t, d in zip(terms, denses)]
        # oracle: fresh sub-indexes at depth 10 -> fuse
        allow = tenants["even"]
        sub_s = _sub_sparse(sparse, allow)
        sub_d = DenseFlatIndex()
        sub_d.add(np.stack([reps[i] for i in allow]), list(allow))
        d_s, d_i = sub_d.search_ids(denses, 10)
        s_s, s_i = sub_s.search([dict(t) for t in terms], 10,
                                backend="matmul")
        runs = []
        for rows_s, rows_i in ((np.asarray(d_s).tolist(), d_i), (s_s, s_i)):
            run = {}
            for q in range(4):
                if len(rows_i[q]):
                    run[str(q)] = {
                        "docs": dict(zip(rows_i[q], map(float, rows_s[q]))),
                        "max_score": float(max(rows_s[q])),
                        "min_score": float(min(rows_s[q]))}
            runs.append(run)
        fused = fuse(runs, [alpha, 1 - alpha])
        for q, row in enumerate(got):
            ref = sorted(fused[str(q)].items(), key=lambda kv: -kv[1])[:10]
            assert _row_set(row) == _row_set(ref), q
            assert all(d in set(allow) for d, _ in row)
        # unfiltered requests still take the device-fused path and work
        row = svc.search(terms=terms[0], dense=denses[0])
        assert len(row) == 10
    finally:
        svc.close()


def test_service_rrf_hybrid_matches_fuse_rrf(stack):
    """fusion_rule='rrf': static hybrid routes through the host-fused path
    and matches fuse_rrf over the engines' candidate runs exactly."""
    from mllm_sparse_retrieval_tpu.search.fusion import fuse_rrf

    ids, sparse, reps, impact, dense, _, rng = stack
    alpha = 0.5
    svc = RetrievalService(dense, impact, alpha=alpha, depth_levels=(10,),
                           backend="matmul", max_batch=4, max_wait_ms=5.0,
                           fusion_rule="rrf")
    try:
        assert not hasattr(svc, "_fused")   # device searcher never built
        terms = [{int(t): 2.0 for t in rng.choice(30, 4, replace=False)}
                 for _ in range(3)]
        denses = _int_reps(rng, 3, 8)
        got = [svc.search(terms=t, dense=d)
               for t, d in zip(terms, denses)]
        d_s, d_i = dense.search_ids(denses, 10)
        s_s, s_i = impact.search(terms, 10, backend="matmul")
        runs = []
        for rows_s, rows_i in ((np.asarray(d_s).tolist(), d_i),
                               (s_s, s_i)):
            run = {}
            for q in range(3):
                if len(rows_i[q]):
                    run[str(q)] = {
                        "docs": dict(zip(rows_i[q], map(float, rows_s[q]))),
                        "max_score": float(max(rows_s[q])),
                        "min_score": float(min(rows_s[q]))}
            runs.append(run)
        fused = fuse_rrf(runs, [alpha, 1 - alpha])
        for q, row in enumerate(got):
            ref = sorted(fused[str(q)].items(), key=lambda kv: -kv[1])[:10]
            assert _row_set(row) == _row_set(ref), q
    finally:
        svc.close()
    with pytest.raises(ValueError, match="fusion_rule"):
        RetrievalService(dense, impact, depth_levels=(10,),
                         fusion_rule="bogus")


def test_filters_rejected_on_live_service():
    live = LiveImpactIndex(None)
    live.add_documents([("a", {1: 2})])
    with pytest.raises(ValueError, match="static"):
        RetrievalService(impact_index=live, depth_levels=(10,),
                         backend="matmul", filters={"t": ["a"]})
    svc = RetrievalService(impact_index=live, depth_levels=(10,),
                           backend="matmul", max_batch=2, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="static"):
            svc.register_filter("t", ["a"])
    finally:
        svc.close()


def test_http_prometheus_metrics(stack):
    """GET /metrics: Prometheus text format with correct counters and a
    monotone cumulative latency histogram."""
    _, _, _, impact, _, _, rng = stack
    svc = RetrievalService(impact_index=impact, depth_levels=(10,),
                           backend="matmul", max_batch=8, max_wait_ms=5.0)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]
    try:
        for _ in range(3):
            svc.search(terms={1: 2.0}, depth=10)
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        metrics = {}
        for line in text.splitlines():
            if line.startswith("#") or not line:
                continue
            name, value = line.rsplit(" ", 1)
            metrics[name] = float(value)
        assert metrics["retrieval_requests_total"] == 3
        assert metrics["retrieval_batch_errors_total"] == 0
        assert metrics["retrieval_batches_total"] >= 1
        assert metrics['retrieval_info{mode="sparse",live="0"}'] == 1
        assert metrics["retrieval_batch_latency_seconds_count"] == \
            metrics["retrieval_batches_total"]
        buckets = [(k, v) for k, v in metrics.items()
                   if k.startswith("retrieval_batch_latency_seconds_bucket")]
        counts = [v for _, v in buckets]
        assert counts == sorted(counts)                 # cumulative
        assert counts[-1] == metrics["retrieval_batches_total"]
        assert metrics["retrieval_batch_latency_seconds_sum"] > 0
    finally:
        server.shutdown()
        server.server_close()
        svc.close()


def test_http_filters_roundtrip(stack):
    ids, sparse, _, impact, _, tenants, rng = stack
    svc = RetrievalService(impact_index=impact, depth_levels=(10,),
                           backend="matmul", max_batch=8, max_wait_ms=5.0)
    server = make_server(svc, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = "http://127.0.0.1:%d" % server.server_address[1]

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())

    try:
        status, out = post("/filters", {"name": "low",
                                        "ids": tenants["low"]})
        assert (status, out) == (200, {"name": "low", "allowed": 10})
        with urllib.request.urlopen(base + "/filters", timeout=30) as r:
            assert json.loads(r.read()) == {"filters": ["low"]}
        q = {int(t): 2.0 for t in rng.choice(30, 4, replace=False)}
        status, out = post("/search", {"queries": [
            {"terms": {str(k): w for k, w in q.items()},
             "filter": "low", "depth": 10}]})
        assert status == 200
        served = {d for d, _ in out["results"][0]}
        assert served and served <= set(tenants["low"])
        oracle = _sub_sparse(sparse, tenants["low"]).search(
            [q], 10, backend="matmul")
        assert served == set(oracle[1][0])
        # unknown filter name in a query -> 400
        with pytest.raises(urllib.error.HTTPError) as err:
            post("/search", {"queries": [{"terms": {"1": 1.0},
                                          "filter": "nope"}]})
        assert err.value.code == 400
        # malformed registration -> 400
        for payload in ({}, {"name": "x"}, {"name": "x", "ids": ["a"],
                                            "mode": "bogus"}):
            with pytest.raises(urllib.error.HTTPError) as err:
                post("/filters", payload)
            assert err.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        svc.close()

"""Asyncio HTTP front end (serving/aio.py): protocol correctness + parity.

The aio server shares its endpoint routing with the threaded server
(serving/router.py), so endpoint semantics are covered once by the existing
HTTP suites; what is NEW here is the transport — hand-rolled HTTP/1.1
framing on one event loop — so these tests drive raw sockets: keep-alive
reuse, pipelined requests answered in order, oversized/malformed heads,
connection-close handling, and result parity with the in-proc service. The
blocking-endpoint executor path (mutations through aio while searches fly)
is exercised against a live index.
"""

import http.client
import json
import socket
import threading

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.serving import RetrievalService
from mllm_sparse_retrieval_tpu.serving.aio import make_server


@pytest.fixture(scope="module")
def indexes():
    rng = np.random.default_rng(11)
    n_docs, dim, n_terms = 48, 8, 30
    doc_ids = [f"d{i}" for i in range(n_docs)]
    impact = ImpactIndex()
    for d in doc_ids:
        picked = rng.choice(n_terms, size=int(rng.integers(3, 9)),
                            replace=False)
        impact.add(d, {f"t{t}": int(rng.integers(1, 30)) for t in picked})
    impact.finalize()
    dense = DenseFlatIndex()
    dense.add(rng.normal(size=(n_docs, dim)).astype(np.float32), doc_ids)
    return impact, dense, dim, n_terms


@pytest.fixture()
def server(indexes):
    impact, dense, dim, n_terms = indexes
    svc = RetrievalService(dense, impact, alpha=0.3, depth_levels=(10,),
                           default_depth=10, max_batch=8, max_wait_ms=20.0)
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, svc, dim, n_terms
    srv.shutdown()
    srv.server_close()
    svc.close()


def _queries(n_terms, dim, n=4, seed=5):
    rng = np.random.default_rng(seed)
    terms, denses = [], []
    for _ in range(n):
        picked = rng.choice(n_terms, size=4, replace=False)
        terms.append({f"t{t}": float(rng.integers(1, 9)) for t in picked})
        denses.append(rng.normal(size=dim).astype(np.float32))
    return terms, denses


def _rows_equal(served, scores_row, ids_row, depth):
    assert len(served) == min(depth, len(ids_row))
    ref = {(d, round(float(s), 4))
           for d, s in zip(ids_row[:depth], scores_row[:depth])}
    assert {(d, round(float(s), 4)) for d, s in served} == ref


def _post(conn, payload, path="/search"):
    conn.request("POST", path, body=json.dumps(payload).encode(),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_aio_search_parity_and_keepalive(server, indexes):
    srv, svc, dim, n_terms = server
    impact, dense, _, _ = indexes
    terms, denses = _queries(n_terms, dim)
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1],
                                      timeout=60)
    try:
        # several requests down ONE connection — keep-alive reuse
        for t, d in zip(terms, denses):
            status, body = _post(conn, {"terms": t, "dense": d.tolist(),
                                        "depth": 10})
            assert status == 200
            ref_s, ref_i = svc._fused.search_encoded(
                d[None, :], *impact.encode_queries([t]), 10)
            _rows_equal([(doc, s) for doc, s in body["results"][0]],
                        ref_s[0], ref_i[0], 10)
        # GET endpoints on the same connection
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read()) == {
            "ok": True, "mode": "hybrid"}
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["items"] >= len(terms)
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.getheader("Content-Type").startswith("text/plain")
        assert b"retrieval_requests_total" in resp.read()
    finally:
        conn.close()


def test_aio_pipelined_requests_answered_in_order(server, indexes):
    """Two POSTs written back-to-back before reading either response —
    HTTP/1.1 pipelining. Responses must come back in request order; the
    depth fields differ so the bodies are distinguishable."""
    srv, svc, dim, n_terms = server
    terms, denses = _queries(n_terms, dim, n=2)
    reqs = b""
    for depth, (t, d) in zip((3, 7), zip(terms, denses)):
        payload = json.dumps({"terms": t, "dense": d.tolist(),
                              "depth": depth}).encode()
        reqs += (b"POST /search HTTP/1.1\r\nHost: x\r\n"
                 b"Content-Type: application/json\r\n"
                 b"Content-Length: " + str(len(payload)).encode()
                 + b"\r\n\r\n" + payload)
    with socket.create_connection(
            ("127.0.0.1", srv.server_address[1]), timeout=60) as sock:
        sock.sendall(reqs)
        sock.settimeout(60)
        buf = b""
        bodies = []
        while len(bodies) < 2:
            head_end = buf.find(b"\r\n\r\n")
            if head_end < 0:
                buf += sock.recv(65536)
                continue
            head = buf[:head_end].decode("latin-1").split("\r\n")
            assert head[0] == "HTTP/1.1 200 OK"
            clen = next(int(h.split(":")[1]) for h in head
                        if h.lower().startswith("content-length"))
            while len(buf) < head_end + 4 + clen:
                buf += sock.recv(65536)
            bodies.append(json.loads(buf[head_end + 4:head_end + 4 + clen]))
            buf = buf[head_end + 4 + clen:]
    assert len(bodies[0]["results"][0]) == 3       # first request: depth 3
    assert len(bodies[1]["results"][0]) == 7


def test_aio_errors_and_unknown_paths(server):
    srv, svc, dim, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1],
                                      timeout=60)
    try:
        status, body = _post(conn, {"terms": {"t0": 1},
                                    "dense": [0.0] * dim, "depth": 999})
        assert status == 400 and "depth" in body["error"]
        conn.request("POST", "/search", body=b"{not json",
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        status, _ = _post(conn, {}, path="/nope")
        assert status == 404
        conn.request("GET", "/nope")
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        # the connection survived every error (keep-alive after 4xx)
        status, _ = _post(conn, {"terms": {"t0": 1.0},
                                 "dense": [0.0] * dim, "depth": 5})
        assert status == 200
    finally:
        conn.close()


def test_aio_malformed_request_line_rejected():
    """Garbage on the wire -> one 400 and a closed connection, server
    keeps serving other connections."""
    rng = np.random.default_rng(0)
    impact = ImpactIndex()
    impact.add("d0", {"a": 5})
    impact.finalize()
    svc = RetrievalService(impact_index=impact, depth_levels=(10,),
                           max_batch=4, max_wait_ms=5.0)
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with socket.create_connection(
                ("127.0.0.1", srv.server_address[1]), timeout=30) as sock:
            sock.sendall(b"NOT A REQUEST\r\n\r\n")
            sock.settimeout(30)
            data = sock.recv(65536)
            assert data.startswith(b"HTTP/1.1 400")
            assert b"Connection: close" in data
        # fresh connection still served
        conn = http.client.HTTPConnection("127.0.0.1",
                                          srv.server_address[1], timeout=30)
        try:
            status, body = _post(conn, {"terms": {"a": 1.0}, "depth": 10})
            assert status == 200 and body["results"][0][0][0] == "d0"
        finally:
            conn.close()
    finally:
        srv.shutdown()
        srv.server_close()
        svc.close()


def test_aio_connection_close_honored(server, indexes):
    srv, svc, dim, n_terms = server
    terms, denses = _queries(n_terms, dim, n=1)
    payload = json.dumps({"terms": terms[0], "dense": denses[0].tolist(),
                          "depth": 5}).encode()
    req = (b"POST /search HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
           b"Content-Length: " + str(len(payload)).encode()
           + b"\r\n\r\n" + payload)
    with socket.create_connection(
            ("127.0.0.1", srv.server_address[1]), timeout=60) as sock:
        sock.sendall(req)
        sock.settimeout(60)
        chunks = []
        while True:
            c = sock.recv(65536)
            if not c:
                break                 # server closed, as requested
            chunks.append(c)
    data = b"".join(chunks)
    assert data.startswith(b"HTTP/1.1 200") and b"Connection: close" in data


def test_aio_concurrent_clients_coalesce(server, indexes):
    """Concurrent single-query requests from many connections share
    micro-batches (the whole point of the serving design)."""
    srv, svc, dim, n_terms = server
    terms, denses = _queries(n_terms, dim, n=8, seed=9)
    before = svc.stats()["batches"]
    results = [None] * 8

    def client(i):
        conn = http.client.HTTPConnection(
            "127.0.0.1", srv.server_address[1], timeout=60)
        try:
            results[i] = _post(conn, {"terms": terms[i],
                                      "dense": denses[i].tolist()})
        finally:
            conn.close()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r[0] == 200 for r in results)
    batches = svc.stats()["batches"] - before
    assert batches < 8                 # at least some coalescing


def test_aio_live_mutations_through_executor():
    """Mutation endpoints run on the worker pool: add/delete/compact over
    aio while searches run inline — results reflect the mutations."""
    from mllm_sparse_retrieval_tpu.index.arena import ArenaImpactIndex
    impact = ImpactIndex()
    impact.add("base0", {0: 10})
    impact.finalize()
    assert impact.int_keyed
    svc = RetrievalService(impact_index=ArenaImpactIndex(impact),
                           depth_levels=(10,), max_batch=4, max_wait_ms=5.0)
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1],
                                      timeout=60)
    try:
        status, body = _post(conn, {"documents": [
            {"id": "live1", "terms": {"0": 99}}]}, path="/documents")
        assert (status, body["added"]) == (200, 1)
        status, body = _post(conn, {"terms": {"0": 1.0}, "depth": 10})
        assert status == 200
        got = {doc for doc, _ in body["results"][0]}
        assert got == {"base0", "live1"}
        status, body = _post(conn, {"ids": ["live1"]},
                             path="/documents/delete")
        assert (status, body["deleted"]) == (200, 1)
        status, body = _post(conn, {"terms": {"0": 1.0}, "depth": 10})
        assert {doc for doc, _ in body["results"][0]} == {"base0"}
        status, body = _post(conn, {}, path="/compact")
        assert status == 200 and body["ok"]
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["sparse_docs"] == 1
    finally:
        conn.close()
        srv.shutdown()
        srv.server_close()
        svc.close()


def test_aio_shutdown_is_clean(indexes):
    """shutdown() blocks until the loop exits; server_close() releases the
    port (a second bind to it succeeds)."""
    impact, dense, dim, n_terms = indexes
    svc = RetrievalService(dense, impact, depth_levels=(10,), max_batch=4,
                           max_wait_ms=5.0)
    srv = make_server(svc, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    terms, denses = _queries(n_terms, dim, n=1)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        status, _ = _post(conn, {"terms": terms[0],
                                 "dense": denses[0].tolist()})
        assert status == 200
    finally:
        conn.close()
    srv.shutdown()
    t.join(10)
    assert not t.is_alive()
    srv.server_close()
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", port))    # port released
    svc.close()

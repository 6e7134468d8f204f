"""POST /reload: zero-downtime hot swap of static artifacts while serving
(filters rebuilt, fused-hybrid permutation rebuilt, mode preserved)."""

import json
import os
import socket
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.index import DenseFlatIndex, LiveImpactIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.serving import RetrievalService
from mllm_sparse_retrieval_tpu.serving.http import make_server


def _corpus(tag, n, rng, dim=8):
    ids = [f"{tag}{i}" for i in range(n)]
    sparse = {i: {int(t): int(rng.integers(1, 20))
                  for t in rng.choice(20, 4, replace=False)} for i in ids}
    impact = ImpactIndex()
    impact.add_many(sorted(sparse.items()))
    impact.finalize()
    dense = DenseFlatIndex()
    dense.add(rng.integers(-5, 6, (n, dim)).astype(np.float32), ids)
    return impact, dense, ids


def test_service_reload_swaps_corpus_and_filters():
    rng = np.random.default_rng(0)
    impact1, dense1, ids1 = _corpus("v1_", 20, rng)
    impact2, dense2, ids2 = _corpus("v2_", 30, rng)
    svc = RetrievalService(dense1, impact1, depth_levels=(10,),
                          backend="matmul", max_batch=4, max_wait_ms=2.0,
                          filters={"head": ids1[:5]})
    try:
        q = dict(terms={1: 2.0, 2: 1.0}, dense=np.ones(8, np.float32))
        before = svc.search(**q)
        assert all(d.startswith("v1_") for d, _ in before)
        svc.reload_indexes(dense2, impact2)
        after = svc.search(**q)
        assert after and all(d.startswith("v2_") for d, _ in after)
        # filters rebuilt from stored ids: v1 ids match nothing in v2
        assert svc.search(**q, filter="head") == []
        svc.register_filter("head2", ids2[:5])
        scoped = svc.search(**q, filter="head2")
        assert all(d in set(ids2[:5]) for d, _ in scoped)
        # guards
        with pytest.raises(ValueError, match="presence"):
            svc.reload_indexes(dense2, None)
        live = LiveImpactIndex(None)
        live.add_documents([("a", {1: 1})])
        with pytest.raises(ValueError, match="static"):
            svc.reload_indexes(dense2, live)
    finally:
        svc.close()


def test_reload_rejected_on_live_service():
    live = LiveImpactIndex(None)
    live.add_documents([("a", {1: 2})])
    svc = RetrievalService(impact_index=live, depth_levels=(10,),
                           backend="matmul", max_batch=2, max_wait_ms=1.0)
    try:
        fresh = ImpactIndex()
        fresh.add("b", {1: 1})
        fresh.finalize()
        with pytest.raises(ValueError, match="static"):
            svc.reload_indexes(None, fresh)
    finally:
        svc.close()


def test_cli_reload_over_http(tmp_path):
    """Boot cli.serve on v1 artifacts, POST /reload to v2, search reflects
    the new corpus; a live server 400s /reload."""
    from mllm_sparse_retrieval_tpu.cli import serve as serve_cli

    rng = np.random.default_rng(1)
    dirs = {}
    for tag, n in (("v1", 15), ("v2", 25)):
        impact, dense, _ = _corpus(tag + "_", n, rng)
        d = tmp_path / tag
        os.makedirs(d)
        dense.save_shard(str(d / "corpus_0.pkl"))
        impact.save(str(d / "sparse"))
        dirs[tag] = d

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    threading.Thread(target=serve_cli.main, args=(
        ["--passage-reps", str(dirs["v1"]), "--sparse-index",
         str(dirs["v1"] / "sparse"), "--port", str(port), "--depths", "10",
         "--impact-backend", "matmul", "--max-wait-ms", "2"],),
        daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(300):
        try:
            urllib.request.urlopen(base + "/healthz", timeout=5)
            break
        except Exception:
            time.sleep(0.2)
    else:
        pytest.fail("serve CLI never came up")

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read())

    query = {"queries": [{"terms": {"1": 2.0, "2": 1.0},
                          "dense": [1.0] * 8, "depth": 10}]}
    out = post("/search", query)
    assert all(d.startswith("v1_") for d, _ in out["results"][0])
    out = post("/reload", {"passage_reps": str(dirs["v2"]),
                           "sparse_index": str(dirs["v2"] / "sparse")})
    assert out["ok"] and out["dense_docs"] == out["sparse_docs"] == 25
    out = post("/search", query)
    assert out["results"][0] and \
        all(d.startswith("v2_") for d, _ in out["results"][0])
    # mode-changing reload -> 400
    with pytest.raises(urllib.error.HTTPError) as err:
        post("/reload", {"passage_reps": str(dirs["v2"]),
                         "sparse_index": None})
    assert err.value.code == 400

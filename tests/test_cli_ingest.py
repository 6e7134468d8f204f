"""cli.ingest: encode a corpus with the model and stream it into a RUNNING
live server, then retrieve through the same server — the full online
ingest → serve loop."""

import json
import os
import socket
import threading
import time
import urllib.request

import pytest

DATA_ROOT = "/root/reference/data"
needs_data = pytest.mark.skipif(
    not os.path.isdir(os.path.join(DATA_ROOT, "flickr")),
    reason="reference data CSVs not present")


@needs_data
def test_ingest_into_live_server_and_self_retrieve():
    from mllm_sparse_retrieval_tpu.cli import ingest as ingest_cli
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
        except BaseException as e:                    # pragma: no cover
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

    # ingest 16 Flickr images with the tiny family; --query-smoke
    # re-encodes doc 0 as a query and exits nonzero unless it
    # self-retrieves through the server
    rc = ingest_cli.main([
        "--server", base, "--dataset", "flickr", "--family", "tiny_debug",
        "--encode-type", "image", "--limit", "16", "--batch-size", "8",
        "--post-batch", "8", "--compact-after", "--query-smoke"])
    assert rc == 0

    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        st = json.loads(r.read())
    assert st["dense_docs"] == st["sparse_docs"] == 16
    assert st["dense_segments"] == st["sparse_segments"] == 1  # compacted

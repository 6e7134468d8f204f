"""HTTP front end for :class:`RetrievalService` — stdlib only.

One POST /search call may carry many queries; each query is submitted to
the service's micro-batcher INDIVIDUALLY, so queries from concurrent HTTP
connections coalesce into the same device batch (the threading server gives
each connection its own thread; the batcher's single dispatcher thread owns
the device). Endpoints:

- ``POST /search``  body ``{"queries": [{"terms": {"17": 2.0} | [[17, 2.0],
  ...], "dense": [...], "depth": 10}, ...]}`` (or one query object) ->
  ``{"results": [[[doc_id, score], ...], ...]}`` score-descending. A query
  may instead carry ``"text": "a dog on a beach"`` or ``"image_b64":
  "<base64 PNG/JPEG bytes>"`` when the service has a query encoder (live
  model encode on device).
- ``GET /healthz``  -> ``{"ok": true, "mode": ...}``
- ``GET /stats``    -> micro-batcher counters (batches, items, mean size;
  plus live doc/segment counts when serving live indexes).
- ``GET /metrics``  -> the same counters plus a per-batch latency
  histogram in Prometheus text exposition format (scrape-ready).

When the service wraps LIVE indexes (index/live.py) the corpus is mutable
while serving:

- ``POST /documents`` body ``{"documents": [{"id": "d1", "dense": [...],
  "terms": {...}}, ...]}`` (what the mode needs) -> ``{"added": n}``;
  re-adding an id replaces it (latest wins).
- ``POST /documents/delete`` body ``{"ids": ["d1", ...]}`` ->
  ``{"deleted": n}`` (n = ids that were live).
- ``POST /compact`` -> per-engine segment counts after merging.
- ``POST /save`` body ``{}`` or ``{"directory": ...}`` -> persist the live
  state (segments + tombstones) to the given directory or the server's
  configured ``--live-state`` dir; a restart resumes from it.

- ``POST /reload`` body ``{}`` or ``{"passage_reps": path,
  "sparse_index": path}`` (static serving only) -> zero-downtime hot swap
  to freshly built artifacts: loaded with the server's boot-time
  dtype/ANN flags, registered filters rebuilt against the new doc orders,
  in-flight batches finish on the old engines.

Doc filters (tenant scoping, static indexes only — index/filter.py):

- ``POST /filters`` body ``{"name": "tenant-a", "ids": [...],
  "mode": "allow"|"deny"}`` registers (or replaces) a named filter;
  ``GET /filters`` lists names. A query object may then carry
  ``"filter": "tenant-a"`` to search only its allowed docs.

JSON object keys are always strings; for int-keyed impact indexes term keys
are coerced back to token ids here.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from mllm_sparse_retrieval_tpu.serving.service import RetrievalService


def _decode_image(b64: Optional[str]):
    """base64 image file bytes -> raw [H, W, 3] float32 in [0, 1] at the
    original resolution (the encoder owns family-specific resize/tiling)."""
    if b64 is None:
        return None
    import base64
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def _normalize_terms(raw, int_keyed: bool):
    if raw is None:
        return None
    if isinstance(raw, dict):
        pairs = raw.items()
    else:
        pairs = ((k, w) for k, w in raw)
    if int_keyed:
        return {int(k): float(w) for k, w in pairs}
    return {str(k): float(w) for k, w in pairs}


def _prometheus_metrics(svc: RetrievalService) -> str:
    """Prometheus text exposition (0.0.4) of the service counters: request
    / batch / error totals, coalescing ratio, per-batch latency histogram,
    and (live services) per-engine doc/segment gauges."""
    s = svc.stats()
    lines = [
        "# TYPE retrieval_requests_total counter",
        f"retrieval_requests_total {int(s['items'])}",
        "# TYPE retrieval_batches_total counter",
        f"retrieval_batches_total {int(s['batches'])}",
        "# TYPE retrieval_batch_errors_total counter",
        f"retrieval_batch_errors_total {int(s['errors'])}",
        "# TYPE retrieval_mean_batch_size gauge",
        f"retrieval_mean_batch_size {s['mean_batch_size']:.6g}",
        f'retrieval_info{{mode="{svc.mode}",live="{int(svc.live)}"}} 1',
    ]
    for engine in ("dense", "sparse"):
        if f"{engine}_docs" in s:
            lines += [
                f'retrieval_live_docs{{engine="{engine}"}} '
                f'{int(s[engine + "_docs"])}',
                f'retrieval_live_segments{{engine="{engine}"}} '
                f'{int(s[engine + "_segments"])}',
            ]
    bounds, cum, lat_sum, count = svc._batcher.latency_histogram()
    lines.append("# TYPE retrieval_batch_latency_seconds histogram")
    for bound, c in zip(bounds, cum[:-1]):
        lines.append(
            f'retrieval_batch_latency_seconds_bucket{{le="{bound:g}"}} {c}')
    lines.append(
        f'retrieval_batch_latency_seconds_bucket{{le="+Inf"}} {cum[-1]}')
    lines.append(f"retrieval_batch_latency_seconds_sum {lat_sum:.6f}")
    lines.append(f"retrieval_batch_latency_seconds_count {count}")
    return "\n".join(lines) + "\n"


class _Handler(BaseHTTPRequestHandler):
    # the server instance carries .service (see make_server)
    protocol_version = "HTTP/1.1"

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # noqa: D102 — quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def do_GET(self):  # noqa: N802 (stdlib casing)
        svc: RetrievalService = self.server.service
        if self.path == "/healthz":
            self._reply(200, {"ok": True, "mode": svc.mode})
        elif self.path == "/stats":
            self._reply(200, svc.stats())
        elif self.path == "/filters":
            self._reply(200, {"filters": svc.filter_names})
        elif self.path == "/metrics":
            body = _prometheus_metrics(svc).encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path in ("/documents", "/documents/delete", "/compact",
                         "/save"):
            self._mutate()
            return
        if self.path == "/reload":
            svc: RetrievalService = self.server.service
            reload_fn = getattr(self.server, "reload_fn", None)
            try:
                if reload_fn is None:
                    raise ValueError(
                        "no reload loader configured (cli.serve wires one "
                        "for static artifact serving)")
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                dense, impact = reload_fn(body)
                svc.reload_indexes(dense, impact)
                self._reply(200, {
                    "ok": True,
                    "dense_docs": None if dense is None else dense.size,
                    "sparse_docs": None if impact is None
                    else impact.num_docs,
                    "filters_rebuilt": svc.filter_names})
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — corrupt artifacts,
                # loader/engine faults: a structured 500 beats a dropped
                # connection (same policy as /search)
                self._reply(500, {"error": str(e)})
            return
        if self.path == "/filters":
            svc: RetrievalService = self.server.service
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(body.get("ids"), (list, tuple)):
                    # a bare string would iterate character-by-character —
                    # a silently wrong tenant scope, not an error
                    raise ValueError("'ids' must be a list")
                n = svc.register_filter(body["name"],
                                        [str(i) for i in body["ids"]],
                                        body.get("mode", "allow"))
                self._reply(200, {"name": str(body["name"]),
                                  "allowed": n})
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
            return
        if self.path != "/search":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        svc: RetrievalService = self.server.service
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            queries = body["queries"] if "queries" in body else [body]
            int_keyed = (svc.impact_index is not None
                         and svc.impact_index.int_keyed)
            futures = [
                svc.search_async(
                    terms=_normalize_terms(q.get("terms"), int_keyed),
                    dense=q.get("dense"),
                    depth=q.get("depth"),
                    text=q.get("text"),
                    image=_decode_image(q.get("image_b64")),
                    filter=q.get("filter"))
                for q in queries
            ]
        except (ValueError, KeyError, TypeError, OSError,
                json.JSONDecodeError) as e:
            # OSError: PIL's UnidentifiedImageError for undecodable
            # image_b64 payloads — a client error, not a server fault
            self._reply(400, {"error": str(e)})
            return
        try:
            results = [[[doc, float(score)] for doc, score in f.result(120)]
                       for f in futures]
        except Exception as e:  # noqa: BLE001 — surface engine errors as 500
            self._reply(500, {"error": str(e)})
            return
        self._reply(200, {"results": results})

    def _mutate(self) -> None:
        """Live-index update endpoints. Term keys arrive as JSON strings;
        they are coerced to token ids iff the sparse engine is int-keyed
        (same rule as /search)."""
        svc: RetrievalService = self.server.service
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            if self.path == "/compact":
                self._reply(200, {"ok": True, **svc.compact()})
                return
            if self.path == "/save":
                # body may carry {"directory": ...}; default live_state_dir
                self._reply(200, {"ok": True,
                                  "directory": svc.save_live(
                                      body.get("directory"))})
                return
            if self.path == "/documents/delete":
                ids = body["ids"]
                if not isinstance(ids, list):
                    raise ValueError("'ids' must be a list")
                self._reply(200, {"deleted": svc.delete_documents(
                    [str(i) for i in ids])})
                return
            docs = body["documents"]
            if not isinstance(docs, list):
                raise ValueError("'documents' must be a list")
            int_keyed = (svc.impact_index is not None
                         and svc.impact_index.int_keyed)
            prepared = [
                {**d, "terms": _normalize_terms(d.get("terms"), int_keyed)}
                for d in docs]
            self._reply(200, {"added": svc.add_documents(prepared)})
        except (ValueError, KeyError, TypeError,
                json.JSONDecodeError) as e:
            self._reply(400, {"error": str(e)})


def make_server(service: RetrievalService, host: str = "127.0.0.1",
                port: int = 0, verbose: bool = False,
                reload_fn=None) -> ThreadingHTTPServer:
    """Bind (but do not start) the threading HTTP server; ``port=0`` picks
    a free port (``server.server_address[1]``). Call ``serve_forever()`` on
    the result, or run it from a daemon thread in tests.

    ``reload_fn(body) -> (dense_index, impact_index)`` enables
    ``POST /reload`` (zero-downtime hot swap of static artifacts):
    cli.serve wires one that re-applies its own dtype/ANN flags."""
    server = ThreadingHTTPServer((host, port), _Handler)
    server.daemon_threads = True
    server.service = service
    server.verbose = verbose
    server.reload_fn = reload_fn
    return server

"""Ingest a corpus into a RUNNING live retrieval server.

The online counterpart of the offline ``cli.encode`` -> ``cli.index`` ->
restart-the-searcher loop (the reference's only way to change a corpus,
``/root/reference/src/encode.py`` + ``scripts/sparse_index.sh``): encode
documents with the model on THIS process's device and POST them to a
``cli.serve --live``/``--live-empty`` server, which keeps serving while
the corpus grows.

    # terminal 1: an empty live hybrid server
    python -m mllm_sparse_retrieval_tpu.cli.serve --live-empty hybrid

    # terminal 2: stream the Flickr image corpus into it
    python -m mllm_sparse_retrieval_tpu.cli.ingest \
        --dataset flickr --family tiny_debug \
        --server http://127.0.0.1:8080 --encode-type image

Sparse terms ship in the raw token-id key space (the live server's
default): search queries encoded by the same family (the server's
``--encode-queries`` path, or this module's ``--query-smoke``) live in the
same space, so scores match the offline engines exactly. Dense vectors
ship as f32 JSON.
"""

from __future__ import annotations

import argparse
import json
import urllib.request

from mllm_sparse_retrieval_tpu.cli.common import get_logger


def _doc_payload(result, start: int, count: int, send_dense: bool,
                 send_terms: bool):
    """EncodeResult rows -> (/documents JSON entries, skipped ids). Term
    ids merge by sum over duplicate slots (``ImpactIndex.add``'s dict
    semantics). Docs whose every sparse weight quantized to zero are
    SKIPPED when the server needs terms — one degenerate doc must not 400
    (and abort) the whole ingest batch."""
    docs = []
    skipped = []
    for j in range(start, start + count):
        doc = {"id": result.ids[j]}
        if send_dense:
            doc["dense"] = [float(x) for x in result.dense[j]]
        if send_terms:
            st = result.selected_terms[j]
            terms = {}
            for t, w in zip(st.token_ids.tolist(), st.weights.tolist()):
                if w > 0:
                    terms[str(int(t))] = terms.get(str(int(t)), 0.0) \
                        + float(w)
            if not terms:
                skipped.append(result.ids[j])
                continue
            doc["terms"] = terms
        docs.append(doc)
    return docs, skipped


def _post(server: str, path: str, payload: dict, timeout: float = 300.0):
    req = urllib.request.Request(
        server.rstrip("/") + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--server", required=True,
                        help="live server base URL (cli.serve --live[-empty])")
    parser.add_argument("--encode-type", default="image",
                        choices=["image", "text"],
                        help="corpus side to encode (the reference corpus "
                             "is images for t2i retrieval)")
    parser.add_argument("--limit", type=int, default=0,
                        help="ingest only the first N docs (0 = all)")
    parser.add_argument("--post-batch", type=int, default=256,
                        help="documents per POST /documents call")
    parser.add_argument("--compact-after", action="store_true",
                        help="POST /compact when done (fold deltas into "
                             "one segment)")
    parser.add_argument("--save-after", action="store_true",
                        help="POST /save when done (server --live-state)")
    parser.add_argument("--query-smoke", action="store_true",
                        help="after ingest, re-encode the first doc as a "
                             "query and verify it retrieves itself")
    from mllm_sparse_retrieval_tpu.cli.common import add_common_args
    add_common_args(parser)
    args = parser.parse_args(argv)

    logger = get_logger("ingest")
    from mllm_sparse_retrieval_tpu.cli.common import (
        build_everything, enable_compilation_cache, sparse_config_from_args)
    enable_compilation_cache()

    # which engines does the server run?
    health = json.loads(urllib.request.urlopen(
        args.server.rstrip("/") + "/healthz", timeout=60).read())
    mode = health["mode"]
    send_dense = mode in ("dense", "hybrid")
    send_terms = mode in ("sparse", "hybrid")
    logger.info("server mode=%s -> sending %s", mode,
                "+".join(n for n, s in (("dense", send_dense),
                                        ("terms", send_terms)) if s))

    corpus, params, arch, tok, template, mesh, lora = build_everything(args)
    examples = corpus.examples_single()
    if args.limit:
        examples = examples[: args.limit]
    sparse_cfg = sparse_config_from_args(args)

    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples

    total = 0
    n_skipped = 0
    # encode in model-batch multiples, POST in --post-batch slices; the
    # server ingests while it serves (live layer, index/live.py)
    chunk = max(args.post_batch, args.batch_size)
    for start in range(0, len(examples), chunk):
        part = examples[start:start + chunk]
        result = encode_examples(
            part, params, arch, tok, template,
            encode_type=args.encode_type, sparse_cfg=sparse_cfg,
            batch_size=args.batch_size, is_query=False, mesh=mesh,
            lora=lora)
        for off in range(0, len(result.ids), args.post_batch):
            n = min(args.post_batch, len(result.ids) - off)
            docs, skipped = _doc_payload(result, off, n, send_dense,
                                         send_terms)
            if skipped:
                n_skipped += len(skipped)
                logger.warning("skipping %d all-zero-sparse docs "
                               "(first: %s)", len(skipped), skipped[0])
            if docs:
                out = _post(args.server, "/documents", {"documents": docs})
                total += out["added"]
        logger.info("ingested %d/%d", min(start + chunk, len(examples)),
                    len(examples))
    logger.info("done: %d documents added%s", total,
                f", {n_skipped} skipped (empty sparse)" if n_skipped else "")

    if args.compact_after:
        logger.info("compact: %s", _post(args.server, "/compact", {}))
    if args.save_after:
        logger.info("save: %s", _post(args.server, "/save", {}))

    if args.query_smoke and examples:
        q = encode_examples(
            examples[:1], params, arch, tok, template,
            encode_type=args.encode_type, sparse_cfg=sparse_cfg,
            batch_size=1, is_query=True, mesh=mesh, lora=lora)
        query = {"depth": 10}
        if send_dense:
            query["dense"] = [float(x) for x in q.dense[0]]
        if send_terms:
            st = q.selected_terms[0]
            query["terms"] = {
                str(int(t)): float(w)
                for t, w in zip(st.token_ids.tolist(), st.weights.tolist())
                if w > 0}
        rows = _post(args.server, "/search",
                     {"queries": [query]})["results"][0]
        top = rows[0][0] if rows else None
        logger.info("query smoke: doc %r -> top hit %r %s",
                    q.ids[0], top,
                    "OK" if top == q.ids[0] else "(MISMATCH)")
        if top != q.ids[0]:
            raise SystemExit(1)
    return 0


if __name__ == "__main__":
    main()

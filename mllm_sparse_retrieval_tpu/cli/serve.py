"""Serve prebuilt indexes over HTTP with micro-batched device calls.

The online counterpart of ``cli/search.py`` (which runs an offline dataset
through the indexes and exits — /root/reference/src/search.py's shape):
load the same artifacts, then take queries over HTTP and coalesce them
into device-sized batches (serving/). A warm-up batch per configured depth
level compiles every program before the first request.

    python -m mllm_sparse_retrieval_tpu.cli.serve \
        --sparse-index indexes/sparse --passage-reps indexes/dense \
        --port 8080 --depths 10,100,1000
"""

from __future__ import annotations

import argparse
import os

from mllm_sparse_retrieval_tpu.cli.common import get_logger


def _warm(service, logger) -> None:
    """One query per depth level: compiles (and persistently caches) every
    program the server can hit, so first real requests are fast."""
    import numpy as np

    if service.live:
        counts = service.stats()
        if counts.get("sparse_docs", 0) + counts.get("dense_docs", 0) == 0:
            logger.info("live empty service: nothing to warm yet")
            return
    for depth in service.depth_levels:
        terms = None
        dense = None
        if service.impact_index is not None:
            idx = service.impact_index
            key_src = getattr(idx, "term_to_idx", None)
            if key_src is None:       # live: key space of the first segment
                for seg in idx._snapshot():
                    if seg.index.num_docs:
                        key_src = seg.index.term_to_idx
                        break
            terms = {next(iter(key_src)): 1.0} if key_src else {}
        if service.dense_index is not None:
            dense = np.zeros(service.dense_index.dim, np.float32)
            dense[0] = 1.0
        service.search(terms=terms, dense=dense,
                       depth=min(depth, service.depth_levels[-1]),
                       timeout=None)
        logger.info("warmed depth=%d", depth)
    if service.query_encoder is not None:
        # one text query compiles the fixed-shape encode program
        service.search(text="warm up", depth=service.depth_levels[0],
                       timeout=None)
        logger.info("warmed text-encode program")


def _load_static_artifacts(args, reps_path, sparse_path):
    """Load static index artifacts with ``args``' dtype/ANN flags — the
    ONE loader used at boot and by POST /reload, so the two can never
    diverge."""
    dense = impact = None
    if reps_path:
        import jax.numpy as jnp

        from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
        dense = DenseFlatIndex.load(
            reps_path,
            dtype={"bfloat16": jnp.bfloat16, "int8": jnp.int8}.get(
                args.dense_dtype, jnp.float32))
        if args.ann_rank:
            from mllm_sparse_retrieval_tpu.index.ann import DenseANNIndex
            dense = DenseANNIndex.from_flat(dense, rank=args.ann_rank,
                                            candidates=args.ann_candidates)
    if sparse_path:
        from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
        impact = ImpactIndex.load(sparse_path)
    return dense, impact


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--passage-reps", default=None,
                        help="dense corpus dir (corpus_*.pkl)")
    parser.add_argument("--sparse-index", default=None,
                        help="impact index dir")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--fusion-rule", default="minmax",
                        choices=["minmax", "rrf"],
                        help="hybrid fusion formula: minmax = reference-"
                             "parity weighted min-max (device-fused fast "
                             "path); rrf = Reciprocal Rank Fusion (scale-"
                             "free; host-fused)")
    parser.add_argument("--depths", default="10,100,1000",
                        help="comma-separated servable depth levels (one "
                             "compiled program each)")
    parser.add_argument("--default-depth", type=int, default=10)
    parser.add_argument("--max-batch", type=int, default=256)
    parser.add_argument("--max-wait-ms", type=float, default=4.0)
    parser.add_argument("--impact-backend", default="auto",
                        choices=["auto", "taat", "matmul"])
    parser.add_argument("--impact-wire", default="i32",
                        choices=["i32", "compact48"])
    parser.add_argument("--dense-dtype", default="float32",
                        choices=["float32", "bfloat16", "int8"])
    parser.add_argument("--ann-rank", type=int, default=0,
                        help="enable the ANN dense tier (index/ann.py): "
                             "low-rank prefilter dimensionality; 0 = exact. "
                             "Static artifacts only (a live corpus would "
                             "retrain the basis on every add)")
    parser.add_argument("--ann-candidates", type=int, default=1024,
                        help="rescored candidate pool per query when "
                             "--ann-rank is set")
    parser.add_argument("--live", action="store_true",
                        help="serve mutable indexes: wraps the loaded "
                             "artifacts in the live (segments + tombstones) "
                             "layer and enables POST /documents, "
                             "/documents/delete, /compact")
    parser.add_argument("--live-empty", default=None,
                        choices=["dense", "sparse", "hybrid"],
                        help="start a LIVE service with an empty corpus of "
                             "this mode (no artifacts needed); documents "
                             "arrive via POST /documents")
    parser.add_argument("--live-state", default=None,
                        help="live-state directory: resume from it when it "
                             "holds a save (artifact args are then ignored), "
                             "save to it on shutdown and on POST /save")
    parser.add_argument("--live-impl", default="arena",
                        choices=["arena", "segments"],
                        help="live-index implementation: 'arena' (default; "
                             "in-place device scatter + tombstone mask — "
                             "near-static read cost, index/arena.py) or "
                             "'segments' (Lucene-style delta segments + "
                             "host merge, index/live.py). Resume from "
                             "--live-state keeps the saved impl")
    parser.add_argument("--live-term-keys", default=None,
                        choices=["int", "str"],
                        help="sparse term key space for an EMPTY live "
                             "corpus (int = token ids, the default; str = "
                             "Lucene-interchange strings — without this a "
                             "string-keyed corpus can never bootstrap over "
                             "POST /documents). Ignored once docs exist: "
                             "their keys are the truth")
    parser.add_argument("--filters", default=None,
                        help="JSON file of named doc filters to register at "
                             "boot: {\"tenant-a\": [doc ids...], ...} "
                             "(static indexes; more via POST /filters)")
    parser.add_argument("--http-impl", default="aio",
                        choices=["aio", "threaded"],
                        help="HTTP front end: 'aio' (default; one event-"
                             "loop thread, keep-alive + pipelining — "
                             "serving/aio.py) or 'threaded' (stdlib "
                             "thread-per-connection fallback)")
    parser.add_argument("--no-warm", action="store_true",
                        help="skip the per-depth warm-up batch")
    parser.add_argument("--verbose", action="store_true",
                        help="log every HTTP request")
    parser.add_argument("--encode-queries", action="store_true",
                        help="load the model (family/checkpoint args below) "
                             "and accept {'text': ...} queries — live "
                             "encode on device")
    parser.add_argument("--max-text-len", type=int, default=64,
                        help="token budget of the compiled text-encode "
                             "program (longer queries truncate)")
    from mllm_sparse_retrieval_tpu.cli.common import add_common_args
    add_common_args(parser)
    args = parser.parse_args(argv)

    if args.passage_reps is None and args.sparse_index is None \
            and args.live_empty is None and args.live_state is None:
        parser.error("need --passage-reps and/or --sparse-index "
                     "(or --live-empty MODE / --live-state DIR)")
    if args.live_empty and (args.passage_reps or args.sparse_index):
        parser.error("--live-empty starts with no corpus; drop the "
                     "artifact args or use --live to wrap them")
    if args.ann_rank and (args.live or args.live_empty or args.live_state):
        parser.error("--ann-rank serves static artifacts only (a live "
                     "corpus would retrain the projection on every add)")
    if args.ann_rank and args.dense_dtype == "int8":
        parser.error("--ann-rank is incompatible with --dense-dtype int8 "
                     "(pick ONE approximation; bf16 composes with ANN)")
    if args.mesh and args.impact_wire == "compact48":
        parser.error("--impact-wire compact48 is single-chip only (the "
                     "packed 48-bit lane cannot carry mesh-global doc "
                     "positions); drop --mesh or use the i32 wire")

    logger = get_logger("serve")
    from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()

    # --mesh (the shared CLI flag): serve over every local device — the
    # impact matrix column-shards and the dense corpus row-shards across
    # the data axis (ICI collectives merge per-shard top-k), lifting the
    # single-chip HBM ceiling device_count-fold
    mesh = None
    if args.mesh:
        from mllm_sparse_retrieval_tpu.parallel import make_mesh
        mesh = make_mesh(model_parallel=args.model_parallel)
        logger.info("serving over a %s-device mesh", mesh.devices.size)

    dense_index = None
    impact_index = None
    live_resumed = False
    # resume check FIRST: when a save exists the artifact args are ignored,
    # so loading multi-GB pickles only to discard them is pure waste
    have_state = args.live_state and any(
        os.path.exists(os.path.join(args.live_state, sub, "live.json"))
        for sub in ("dense", "sparse"))
    if have_state:
        import jax.numpy as jnp

        from mllm_sparse_retrieval_tpu.serving.service import load_live_state
        if args.passage_reps or args.sparse_index:
            logger.info("live state found at %s: artifact args ignored",
                        args.live_state)
        dense_index, impact_index = load_live_state(
            args.live_state,
            dense_dtype={"bfloat16": jnp.bfloat16,
                         "int8": "int8"}.get(args.dense_dtype),
            background_compaction=True)
        live_resumed = True
        logger.info(
            "resumed live state: dense=%s sparse=%s",
            "-" if dense_index is None
            else f"{dense_index.num_docs}d/{dense_index.num_segments}s",
            "-" if impact_index is None
            else f"{impact_index.num_docs}d/{impact_index.num_segments}s")
    elif args.live_state and args.passage_reps is None \
            and args.sparse_index is None and args.live_empty is None:
        parser.error(f"--live-state {args.live_state} holds no save yet; "
                     "give artifacts or --live-empty MODE for the first boot")
    if not live_resumed and (args.passage_reps or args.sparse_index):
        dense_index, impact_index = _load_static_artifacts(
            args, args.passage_reps, args.sparse_index)
        if dense_index is not None:
            if args.ann_rank:
                logger.info("ANN tier: rank=%d candidates=%d",
                            args.ann_rank, args.ann_candidates)
            logger.info("dense index: %d vectors", dense_index.size)
        if impact_index is not None:
            logger.info("impact index: %d docs / %d terms",
                        impact_index.num_docs, impact_index.num_terms)
    if (args.live or args.live_empty or args.live_state) and not live_resumed:
        if args.live_impl == "arena":
            from mllm_sparse_retrieval_tpu.index.arena import (
                ArenaDenseIndex as DenseLive, ArenaImpactIndex as ImpactLive)
        else:
            from mllm_sparse_retrieval_tpu.index.live import (
                LiveDenseIndex as DenseLive, LiveImpactIndex as ImpactLive)
        want = args.live_empty or (
            "hybrid" if dense_index is not None and impact_index is not None
            else "dense" if dense_index is not None else "sparse")
        # background_compaction: merges run off the request threads (one
        # unlucky POST /documents must not pay an O(corpus) merge inline;
        # arena compaction is inline but bounded by the capacity policy)
        if want in ("dense", "hybrid"):
            dense_index = DenseLive(dense_index,
                                    background_compaction=True)
        if want in ("sparse", "hybrid"):
            impact_index = ImpactLive(impact_index,
                                      term_keys=args.live_term_keys,
                                      background_compaction=True)
    if args.live or args.live_empty or args.live_state:
        logger.info("live mode: corpus is mutable while serving "
                    "(POST /documents, /documents/delete, /compact, /save)")

    from mllm_sparse_retrieval_tpu.serving import RetrievalService
    if args.http_impl == "aio":
        from mllm_sparse_retrieval_tpu.serving.aio import make_server
    else:
        from mllm_sparse_retrieval_tpu.serving.http import make_server

    encoder = None
    if args.encode_queries:
        from mllm_sparse_retrieval_tpu.configs import RepsLoc
        from mllm_sparse_retrieval_tpu.cli.common import (
            build_everything, sparse_config_from_args)
        from mllm_sparse_retrieval_tpu.serving import OnlineQueryEncoder
        _, params, arch, tok, template, _, lora = build_everything(args)
        encoder = OnlineQueryEncoder(
            params, arch, tok, template, sparse_config_from_args(args),
            reps_loc=RepsLoc(args.reps_loc), lora=lora,
            max_text_len=args.max_text_len)
        logger.info("query encoder: family=%s max_text_len=%d",
                    args.family, encoder.max_text_len)

    filters = None
    if args.filters:
        import json
        with open(args.filters) as f:
            filters = json.load(f)
        logger.info("registering %d doc filters from %s", len(filters),
                    args.filters)
    service = RetrievalService(
        dense_index, impact_index, alpha=args.alpha,
        depth_levels=[int(d) for d in args.depths.split(",")],
        default_depth=args.default_depth, backend=args.impact_backend,
        wire=args.impact_wire, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, query_encoder=encoder,
        live_state_dir=args.live_state, filters=filters,
        fusion_rule=args.fusion_rule, mesh=mesh)
    if not args.no_warm:
        _warm(service, logger)

    reload_fn = None
    if not service.live:
        def reload_fn(body):
            """POST /reload loader: fresh artifacts with THIS server's
            dtype/ANN flags (the SAME loader as boot — no divergence);
            paths default to the boot-time ones."""
            reps_path = body.get("passage_reps", args.passage_reps)
            sparse_path = body.get("sparse_index", args.sparse_index)
            if (reps_path is None) != (args.passage_reps is None) or \
                    (sparse_path is None) != (args.sparse_index is None):
                raise ValueError("reload must keep the serving mode: give "
                                 "the same artifact kinds as at boot")
            d, s = _load_static_artifacts(args, reps_path, sparse_path)
            logger.info("reload: dense=%s sparse=%s",
                        "-" if d is None else d.size,
                        "-" if s is None else s.num_docs)
            return d, s

    server = make_server(service, args.host, args.port,
                         verbose=args.verbose, reload_fn=reload_fn)
    logger.info("serving mode=%s on http://%s:%d", service.mode,
                *server.server_address[:2])
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
    finally:
        if args.live_state and service.live:
            logger.info("saving live state to %s",
                        service.save_live(args.live_state))
        server.server_close()
        service.close()


if __name__ == "__main__":
    main()

"""Fused hybrid serving path: dense + sparse search + fusion in one fetch.

``FusedHybridSearcher`` drives both index engines chunk-by-chunk through the
shared dispatch-ahead pipeline (ops/stream.py): per chunk it enqueues the
impact program, the dense MIPS program, and the pure-XLA fusion program
(ops/hybrid_fusion.py) — three device programs, zero intermediate host
syncs — and the host fetches ONE packed [B, 2*out_depth] fused result.

Contrast with the host path (search/engine.run_search): two [B, 2*depth]
run fetches + Python dict fusion per batch. At the reference pipeline's
default depth 1000 (/root/reference/src/arguments.py:60) the host path
ships 16 KB/query and fuses ~2000 dicts/query; this path ships
``16 * out_depth / depth`` KB/query (out_depth defaults to depth but the
recall consumer only needs its max k, e.g. 200) and fuses nothing on host.

The fused scores match ``search.fusion.fuse`` to float32 rounding — the
parity contract is tested in tests/test_device_fusion.py; the host path
remains the Lucene-artifact/TREC interchange route.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
from mllm_sparse_retrieval_tpu.ops.hybrid_fusion import (fused_topk_packed,
                                                         fused_topk_parts)
from mllm_sparse_retrieval_tpu.ops.packing import unpack_topk
from mllm_sparse_retrieval_tpu.search.runs import Run


class FusedHybridSearcher:
    """Hybrid dense+sparse retrieval with on-device run fusion.

    Both indexes must cover the SAME doc-id set (the hybrid contract —
    the reference fuses runs over one corpus, src/search.py:429-447);
    a doc present in only one index raises at construction.
    """

    def __init__(
        self,
        dense_index: DenseFlatIndex,
        impact_index: ImpactIndex,
        alpha: float = 0.5,
        mesh=None,
        backend: str = "auto",
    ):
        self.dense = dense_index
        self.impact = impact_index
        self.alpha = float(alpha)
        self.mesh = mesh
        self.backend = backend
        # impact-local doc order -> dense-local doc order, once per pair.
        dense_pos = {d: i for i, d in enumerate(dense_index.lookup)}
        self._dense_pos = dense_pos
        perm = np.full(max(len(impact_index.doc_ids), 1), -1, np.int32)
        missing = []
        for i, d in enumerate(impact_index.doc_ids):
            p = dense_pos.get(d)
            if p is None:
                missing.append(d)
            else:
                perm[i] = p
        if missing:
            raise ValueError(
                f"{len(missing)} impact docs absent from the dense index "
                f"(first: {missing[:3]}); hybrid fusion requires one corpus")
        self._perm_host = perm
        self._perm_dev = None
        self._lookup_arr = np.asarray(dense_index.lookup)
        self._w_dense = np.float32(self.alpha)
        self._w_sparse = np.float32(1.0 - self.alpha)
        # the perm/lookup caches above are built once per (dense, impact)
        # pair; growing either index afterwards would silently resolve new
        # docs through stale arrays — snapshot membership and refuse later
        self._n_dense = len(dense_index.lookup)
        self._n_impact = len(impact_index.doc_ids)

    def _check_fresh(self) -> None:
        if (len(self.dense.lookup) != self._n_dense
                or len(self.impact.doc_ids) != self._n_impact):
            raise RuntimeError(
                "index membership changed after FusedHybridSearcher "
                "construction (dense "
                f"{self._n_dense}->{len(self.dense.lookup)}, impact "
                f"{self._n_impact}->{len(self.impact.doc_ids)}); build a "
                "fresh searcher — the doc permutation is cached at init")

    # ---- internals -----------------------------------------------------------
    def _self_indices(self, qids: Optional[Sequence[str]], n: int
                      ) -> np.ndarray:
        if qids is None:
            return np.full(n, -1, np.int32)
        return np.fromiter(
            (self._dense_pos.get(str(q), -1) for q in qids),
            np.int32, count=n)

    def _dispatch_fused(self, plan, chunk_i, chunk_w, dense_chunk,
                        self_chunk, out_k: int):
        """Enqueue impact + dense + fusion programs for one chunk; returns
        the fused packed device array with no host sync."""
        sparse_packed = self.impact._dispatch_encoded(plan, chunk_i, chunk_w)
        dense_out = self.dense._dispatch_chunk(dense_chunk,
                                               plan["k"], self.mesh)
        if self._perm_dev is None:
            self._perm_dev = jax.device_put(self._perm_host)
        self_dev = jax.device_put(self_chunk)
        if isinstance(dense_out, tuple):        # mesh dense path
            return fused_topk_parts(
                sparse_packed, dense_out[0], dense_out[1], self._perm_dev,
                self_dev, self._w_dense, self._w_sparse, out_k)
        return fused_topk_packed(
            sparse_packed, dense_out, self._perm_dev, self_dev,
            self._w_dense, self._w_sparse, out_k)

    def _resolve_fused(self, packed, take: int
                       ) -> Tuple[List[List[float]], List[List[str]]]:
        scores, idx = unpack_topk(np.asarray(packed)[:take])
        ids_rows = self._lookup_arr[np.clip(idx, 0, len(self._lookup_arr) - 1)]
        out_scores = scores.tolist()
        out_ids = ids_rows.tolist()
        # -inf marks rows whose union had fewer than out_k docs.
        if scores.size and not np.isfinite(scores.min()):
            for row in np.nonzero((~np.isfinite(scores)).any(axis=1))[0]:
                keep = np.isfinite(scores[row])
                out_scores[row] = scores[row][keep].tolist()
                out_ids[row] = ids_rows[row][keep].tolist()
        return out_scores, out_ids

    def _prep(self, depth: int, out_depth: Optional[int]):
        self.dense._materialize(self.mesh)
        plan = self.impact._search_plan(self.mesh, self.backend, depth)
        k_dense = min(depth, self.dense._n_valid)
        out_k = min(out_depth if out_depth is not None else depth,
                    plan["k"] + k_dense)
        return plan, out_k

    def _batch_chunks(self, plan, q_reps, q_idx, q_w, self_all):
        """Yield (chunk_i, chunk_w, dense_chunk, self_chunk, take) at the
        impact plan's HBM chunk width, tail zero-padded to one compiled
        shape."""
        b = q_reps.shape[0]
        max_b = plan["max_b"]
        for start in range(0, b, max_b):
            end = min(start + max_b, b)
            chunk_i = q_idx[start:end]
            chunk_w = q_w[start:end]
            dense_chunk = np.ascontiguousarray(
                q_reps[start:end], dtype=np.float32)
            if end - start < max_b and b > max_b:
                pad = max_b - (end - start)
                chunk_i = np.concatenate(
                    [chunk_i, np.zeros((pad, chunk_i.shape[1]),
                                       chunk_i.dtype)])
                chunk_w = np.concatenate(
                    [chunk_w, np.zeros((pad, chunk_w.shape[1]),
                                       chunk_w.dtype)])
                dense_chunk = np.concatenate(
                    [dense_chunk,
                     np.zeros((pad, dense_chunk.shape[1]), np.float32)])
            self_chunk = np.full(chunk_i.shape[0], -1, np.int32)
            self_chunk[:end - start] = self_all[start:end]
            yield chunk_i, chunk_w, dense_chunk, self_chunk, end - start

    # ---- public API ----------------------------------------------------------
    def search_encoded_stream(
        self,
        batches,            # iterable of (q_reps, q_idx, q_w[, qids]) tuples
        depth: int,
        out_depth: Optional[int] = None,
        lookahead: int = 3,
    ):
        """Pipelined fused serving loop: yields one ``(scores, ids)`` pair
        per input batch, keeping up to ``lookahead`` fused programs in
        flight — batch r's packed-result fetch overlaps batch r+1's three
        device programs (the production serving pattern; the fused
        counterpart of ``ImpactIndex.search_encoded_stream``). A 4th tuple
        element supplies per-batch qids for self-hit removal."""
        from mllm_sparse_retrieval_tpu.ops import stream as stream_mod

        self._check_fresh()
        plan, out_k = self._prep(depth, out_depth)

        def submit():
            seq = 0
            for item in batches:
                q_reps, q_idx, q_w = item[:3]
                qids = item[3] if len(item) > 3 else None
                if q_idx.shape[0] != q_reps.shape[0]:
                    raise ValueError("dense/sparse query batch mismatch")
                self_all = self._self_indices(qids, q_reps.shape[0])
                chunks = list(self._batch_chunks(plan, q_reps, q_idx, q_w,
                                                 self_all))
                for ci, ch in enumerate(chunks):
                    yield ch + (ci == len(chunks) - 1, seq)
                    seq += 1

        out_s: List[List[float]] = []
        out_i: List[List[str]] = []
        expect_seq = 0

        def dispatch(item):
            chunk_i, chunk_w, dense_chunk, self_chunk, take, last, seq = item
            return (self._dispatch_fused(plan, chunk_i, chunk_w, dense_chunk,
                                         self_chunk, out_k), take, last, seq)

        def resolve(handle):
            nonlocal out_s, out_i, expect_seq
            packed, take, last, seq = handle
            # batch-boundary accumulation requires submit-order resolution
            # (same invariant + guard as ImpactIndex.search_encoded_stream)
            assert seq == expect_seq, (
                f"fused stream resolved chunk {seq} out of order "
                f"(expected {expect_seq})")
            expect_seq += 1
            s_c, i_c = self._resolve_fused(packed, take)
            out_s.extend(s_c)
            out_i.extend(i_c)
            if last:
                done_s, done_i = out_s, out_i
                out_s, out_i = [], []
                return done_s, done_i
            return None

        yield from stream_mod.pipeline_dispatch(submit(), dispatch, resolve,
                                                lookahead)

    def search_encoded(
        self,
        q_reps: np.ndarray,                    # [B, d] dense query reps
        q_idx: np.ndarray, q_w: np.ndarray,    # impact-encoded queries
        depth: int,
        qids: Optional[Sequence[str]] = None,  # enables self-hit removal
        out_depth: Optional[int] = None,
        lookahead: int = 3,
    ) -> Tuple[List[List[float]], List[List[str]]]:
        """Fused hybrid top-``out_depth`` for one query batch. Returns
        (scores, doc-id rows), fused-score-descending, one packed fetch per
        chunk. ``qids`` activates the engine's ``remove_query`` semantics
        (self doc dropped AFTER each run's min/max is recorded)."""
        for out in self.search_encoded_stream(
                [(q_reps, q_idx, q_w, qids)], depth, out_depth, lookahead):
            return out
        return [], []

    def eval_ranks(
        self,
        q_reps: np.ndarray,
        q_idx: np.ndarray, q_w: np.ndarray,
        tgt: np.ndarray,                       # [B, T] DENSE doc positions
        depth: int,
        qids: Optional[Sequence[str]] = None,  # enables self-hit removal
        out_depth: Optional[int] = None,
        lookahead: int = 3,
    ) -> np.ndarray:
        """Target hit ranks from the fused top-k, never fetching the run —
        the device evaluation consumer (eval/device_eval.py): chains
        ``ops.eval_ranks.ranks_from_packed`` onto each chunk's fused packed
        result (rule ``'finite'`` — the -inf union-shortfall fill the host
        resolve drops; self-hit removal already happened INSIDE the fusion
        program, so no self position is passed) and fetches one [B, 1+T]
        int32 array per chunk instead of the [B, 2*out_k] run. Target
        positions are dense-lookup order (``dense_doc_pos``)."""
        import jax

        from mllm_sparse_retrieval_tpu.eval.device_eval import (
            _pad_rows, _ranks_pipeline)
        from mllm_sparse_retrieval_tpu.ops.eval_ranks import ranks_from_packed

        self._check_fresh()
        plan, out_k = self._prep(depth, out_depth)
        self_all = self._self_indices(qids, q_reps.shape[0])

        def chunk_iter():
            pos = 0
            for ch in self._batch_chunks(plan, q_reps, q_idx, q_w, self_all):
                yield ch + (pos,)
                pos += ch[-1]

        def dispatch(item):
            chunk_i, chunk_w, dense_chunk, self_chunk, take, pos = item
            packed = self._dispatch_fused(plan, chunk_i, chunk_w,
                                          dense_chunk, self_chunk, out_k)
            bp = packed.shape[0]
            tgt_c = jax.device_put(_pad_rows(tgt[pos:pos + take], bp, -1))
            no_self = jax.device_put(
                np.full(bp, -1, np.int32))
            return ranks_from_packed(packed, tgt_c, no_self,
                                     rule="finite"), take

        return _ranks_pipeline(chunk_iter(), dispatch, lookahead)

    def search_run(
        self,
        q_reps: np.ndarray,
        q_idx: np.ndarray, q_w: np.ndarray,
        qids: Sequence[str],
        depth: int,
        remove_query: bool = False,
        out_depth: Optional[int] = None,
    ) -> Run:
        """Fused hybrid run dict (qid -> {docid: fused_score}) — the
        device-path counterpart of ``fuse([dense_run, sparse_run], ...)``
        restricted to the top ``out_depth`` fused docs per query."""
        scores, ids = self.search_encoded(
            q_reps, q_idx, q_w, depth,
            qids=qids if remove_query else None, out_depth=out_depth)
        run: Dict[str, Dict[str, float]] = {}
        for qid, s_row, d_row in zip(qids, scores, ids):
            run[str(qid)] = dict(zip(d_row, s_row))
        return run

"""Dense flat MIPS index: the TPU-native FAISS-flat equivalent.

Replaces ``FaissFlatSearcher`` + GPU cloning
(/root/reference/src/search.py:227-270) with an HBM-resident corpus matrix —
replicated on one chip or row-sharded across the mesh's data axis — scored by
an MXU matmul with per-shard + global ``top_k`` (ops/mips.py).

Artifact format is pickle-compatible with the reference's encode output:
``corpus_{shard}.pkl`` holds ``(np.ndarray [N, d] float32, lookup_ids list)``
(/root/reference/src/encode.py:409-410), so either framework's artifacts are
loadable by the other.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mllm_sparse_retrieval_tpu.ops.mips import (
    mips_topk_packed, mips_topk_packed_filtered, mips_topk_packed_q8,
    mips_topk_packed_q8_filtered, sharded_mips_topk,
    sharded_mips_topk_filtered, sharded_mips_topk_q8,
    sharded_mips_topk_q8_filtered)
from mllm_sparse_retrieval_tpu.ops.packing import unpack_topk
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS


class DenseFlatIndex:
    """Exact inner-product search over a corpus embedding matrix.

    ``dtype=jnp.bfloat16`` stores the device corpus (and ships queries) in
    bf16 — half the HBM footprint and host->device bytes, and the scoring
    matmul runs as ONE MXU pass instead of f32-HIGHEST's multi-pass
    decomposition, with f32 accumulation (``preferred_element_type``).
    Scores are bf16-rounded inputs accumulated in f32, so near-tie ranks
    can differ from the f32 index (rank-overlap tested in
    tests/test_dense_index.py); persisted artifacts stay float32
    (reference-compatible pickles) regardless of the device dtype.

    ``dtype=jnp.int8`` (or the string ``"int8"``) selects scalar
    quantization — the FAISS-SQ8-class trade the reference's flat-f32
    index doesn't offer: symmetric per-ROW int8 corpus quantization +
    per-QUERY int8 query quantization, an s8 x s8 -> s32 MXU matmul (2x
    the bf16 rate on v5e), and f32 dequant by the scale outer product
    before top-k. 1/4 the HBM footprint and host->device bytes of f32.
    Per-query scaling cannot change a query's ranking; per-row scales are
    dequantized back into the scores, so the only error is int8 rounding
    of the inputs (rank-overlap + exactness-by-construction tested in
    tests/test_dense_index.py).
    """

    def __init__(self, dim: Optional[int] = None, dtype=jnp.float32):
        self.dim = dim
        self.q8 = dtype == "int8" or (dtype is not None and
                                      jnp.dtype(dtype) == jnp.int8)
        self.dtype = jnp.int8 if self.q8 else dtype
        self._row_scale_dev: Optional[jax.Array] = None
        self._chunks: List[np.ndarray] = []
        self.lookup: List[str] = []
        # Device state, built lazily on first search:
        self._corpus_dev: Optional[jax.Array] = None
        self._mesh = None
        self._n_valid = 0

    # ---- construction ------------------------------------------------------
    def add(self, reps: np.ndarray, ids: Sequence) -> None:
        reps = np.asarray(reps, dtype=np.float32)
        if reps.ndim != 2:
            raise ValueError(f"reps must be [N, d], got {reps.shape}")
        if self.dim is None:
            self.dim = reps.shape[1]
        if reps.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: {reps.shape[1]} != {self.dim}")
        if len(ids) != reps.shape[0]:
            raise ValueError("ids/reps length mismatch")
        self._chunks.append(reps)
        self.lookup.extend(str(i) for i in ids)
        self._corpus_dev = None  # invalidate device copy
        self._row_scale_dev = None
        self._lookup_arr_src = None  # invalidate cached id array

    @property
    def size(self) -> int:
        return len(self.lookup)

    # ---- device placement ---------------------------------------------------
    @staticmethod
    def _quantize_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Symmetric per-row int8 quantization: returns (int8 values,
        f32 scales) with ``values * scale[:, None] ~= x``. All-zero rows
        get scale 1 (their quantized row is zero either way)."""
        scale = np.abs(x).max(axis=1) / 127.0 if x.size else \
            np.zeros(x.shape[0], np.float32)
        scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
        q = np.clip(np.rint(x / scale[:, None]), -127, 127).astype(np.int8)
        return q, scale

    def _materialize(self, mesh=None) -> None:
        if self._corpus_dev is not None and self._mesh is mesh:
            return
        corpus = np.concatenate(self._chunks) if len(self._chunks) != 1 \
            else self._chunks[0]
        self._n_valid = corpus.shape[0]
        self._mesh = mesh
        row_scale = None
        if self.q8:
            corpus, row_scale = self._quantize_rows(corpus)
        if mesh is None:
            self._corpus_dev = jnp.asarray(corpus, dtype=self.dtype)
            self._row_scale_dev = None if row_scale is None else \
                jnp.asarray(row_scale)
        else:
            n_shards = mesh.shape[DATA_AXIS]
            pad = (-corpus.shape[0]) % n_shards
            if pad:
                corpus = np.concatenate(
                    [corpus, np.zeros((pad, corpus.shape[1]), corpus.dtype)])
                if row_scale is not None:
                    row_scale = np.concatenate(
                        [row_scale, np.ones(pad, np.float32)])
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(mesh, P(DATA_AXIS, None))
            self._corpus_dev = jax.device_put(
                jnp.asarray(corpus, dtype=self.dtype), sharding)
            self._row_scale_dev = None if row_scale is None else \
                jax.device_put(jnp.asarray(row_scale),
                               NamedSharding(mesh, P(DATA_AXIS)))

    # ---- search --------------------------------------------------------------
    def _dispatch_chunk(self, chunk_f32: np.ndarray, depth: int, mesh,
                        mask=None):
        """Enqueue one chunk's program; no host sync (the pipelining point).
        Single-chip results come back as ONE packed array — one fetch, one
        link round trip (see ops/packing.py). ``mask`` (a device bool [N]
        from ``DocFilter.device_mask``) routes to the filtered program
        variants: excluded rows score -inf and are dropped at resolve."""
        if self.q8:
            # SQ8: quantize the queries per-row on HOST (1/4 the f32 link
            # bytes; per-query positive scaling cannot change that query's
            # ranking) and dequantize inside the program.
            q8, q_scale = self._quantize_rows(
                np.asarray(chunk_f32, dtype=np.float32))
            if mesh is None:
                q8 = jax.device_put(np.ascontiguousarray(q8))
                q_scale = jax.device_put(q_scale)
                if mask is not None:
                    return mips_topk_packed_q8_filtered(
                        q8, q_scale, self._corpus_dev, self._row_scale_dev,
                        mask, min(depth, self._n_valid))
                return mips_topk_packed_q8(q8, q_scale, self._corpus_dev,
                                           self._row_scale_dev,
                                           min(depth, self._n_valid))
            if mask is not None:
                return sharded_mips_topk_q8_filtered(
                    mesh, jnp.asarray(q8), jnp.asarray(q_scale),
                    self._corpus_dev, self._row_scale_dev, mask,
                    self._n_valid, depth)
            return sharded_mips_topk_q8(
                mesh, jnp.asarray(q8), jnp.asarray(q_scale),
                self._corpus_dev, self._row_scale_dev, self._n_valid, depth)
        if mesh is None:
            # async upload: device_put returns immediately and the transfer
            # overlaps the previous chunk's compute; jnp.asarray (and jit
            # numpy args) transfer SYNCHRONOUSLY through thin-link relays,
            # serializing upload with compute (serving rule, CLAUDE.md).
            # Non-f32 index dtypes (bf16) cast on HOST first: ml_dtypes
            # registers bfloat16 as a numpy dtype, and the cast halves the
            # bytes shipped over the host->device link.
            q = jax.device_put(
                np.ascontiguousarray(np.asarray(chunk_f32, dtype=self.dtype)))
        else:
            q = jnp.asarray(chunk_f32, dtype=self.dtype)
        if mesh is None:
            if mask is not None:
                return mips_topk_packed_filtered(q, self._corpus_dev, mask,
                                                 min(depth, self._n_valid))
            return mips_topk_packed(q, self._corpus_dev,
                                    min(depth, self._n_valid))
        if mask is not None:
            return sharded_mips_topk_filtered(mesh, q, self._corpus_dev,
                                              mask, self._n_valid, depth)
        return sharded_mips_topk(mesh, q, self._corpus_dev,
                                 self._n_valid, depth)

    @staticmethod
    def _resolve_chunk(out) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(out, tuple):          # mesh path: (scores, idx)
            return np.asarray(out[0]), np.asarray(out[1])
        return unpack_topk(np.asarray(out))

    def search(
        self, q_reps: np.ndarray, depth: int, mesh=None, doc_filter=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-``depth`` MIPS. Returns (scores [B,k], indices [B,k]).

        ``doc_filter`` (an ``index.filter.DocFilter``) restricts scoring to
        allowed rows; excluded rows come back as score ``-inf`` (use
        ``search_ids``, which drops them, for the ragged-row contract)."""
        self._materialize(mesh)
        q = np.asarray(q_reps, dtype=np.float32)
        mask = None if doc_filter is None else doc_filter.device_mask(
            self._corpus_dev.shape[0], mesh)
        return self._resolve_chunk(self._dispatch_chunk(q, depth, mesh,
                                                        mask=mask))

    def batch_search(
        self, q_reps: np.ndarray, depth: int, batch_size: int = 128,
        mesh=None, lookahead: int = 3, doc_filter=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Chunked search with a fixed device batch (stable compiled shapes).

        Mirrors ``FaissFlatSearcher.batch_search`` usage
        (/root/reference/src/search.py:55-59). The final partial batch is
        padded to ``batch_size`` so only one program is ever compiled.
        Up to ``lookahead`` chunks stay in flight ahead of the consumer, so
        chunk r+1's query upload overlaps chunk r's compute — the same
        serving pipeline as ``ImpactIndex.search_encoded_stream``.
        """
        import collections

        from mllm_sparse_retrieval_tpu.ops.stream import pipeline_dispatch

        self._materialize(mesh)
        q_reps = np.asarray(q_reps, dtype=np.float32)
        n = q_reps.shape[0]
        all_scores, all_idx = [], []
        mask = None if doc_filter is None else doc_filter.device_mask(
            self._corpus_dev.shape[0], mesh)

        def chunks():
            for start in range(0, n, batch_size):
                chunk = q_reps[start:start + batch_size]
                valid = chunk.shape[0]
                if valid < batch_size:
                    chunk = np.concatenate(
                        [chunk, np.zeros((batch_size - valid, chunk.shape[1]),
                                         chunk.dtype)])
                yield chunk, valid

        def dispatch(item):
            chunk, valid = item
            return self._dispatch_chunk(chunk, depth, mesh, mask=mask), valid

        def resolve(handle):
            out, valid = handle
            scores, idx = self._resolve_chunk(out)
            all_scores.append(scores[:valid])
            all_idx.append(idx[:valid])

        collections.deque(
            pipeline_dispatch(chunks(), dispatch, resolve, lookahead),
            maxlen=0)
        return np.concatenate(all_scores), np.concatenate(all_idx)

    def search_ids(
        self, q_reps: np.ndarray, depth: int, batch_size: int = 128,
        mesh=None, doc_filter=None
    ) -> Tuple[np.ndarray, List[List[str]]]:
        """Search and map row indices to lookup ids (reference search_queries,
        /root/reference/src/search.py:55-63).

        With ``doc_filter``, rows become RAGGED lists when fewer than
        ``depth`` allowed docs exist (-inf sentinel rows are dropped) —
        the same contract as the sparse engine's zero-score rule."""
        scores, idx = self.batch_search(q_reps, depth, batch_size, mesh=mesh,
                                        doc_filter=doc_filter)
        # cache keyed on the list OBJECT (invalidated explicitly in add()):
        # a same-length replacement of the public ``lookup`` must not serve
        # stale ids. ``lookup`` is immutable after the first search — mutate
        # membership only through add()/load() (ADVICE r3).
        if getattr(self, "_lookup_arr_src", None) is not self.lookup or \
                len(self._lookup_arr) != len(self.lookup):
            self._lookup_arr = np.asarray(self.lookup)
            self._lookup_arr_src = self.lookup
        # -inf fill rows (filter allowing < depth docs) carry ARBITRARY
        # indices on TPU (equal-score tie order) which can be mesh padding
        # rows >= n_valid — clamp before the fancy index; the keep-mask
        # below drops those entries
        idx = np.minimum(idx, len(self._lookup_arr) - 1)
        ids = self._lookup_arr[idx].tolist()
        if doc_filter is not None:
            keep = scores > -np.inf
            scores = [s[k].tolist() for s, k in zip(scores, keep)]
            ids = [[d for d, kk in zip(row, k) if kk]
                   for row, k in zip(ids, keep)]
        return scores, ids

    # ---- persistence -----------------------------------------------------------
    def save_shard(self, path: str) -> None:
        """Write reference-compatible ``(embeddings, lookup_ids)`` pickle."""
        corpus = np.concatenate(self._chunks) if self._chunks else \
            np.zeros((0, self.dim or 0), np.float32)
        with open(path, "wb") as f:
            pickle.dump((corpus, list(self.lookup)), f)

    @classmethod
    def load(cls, path_or_dir: str, dtype=jnp.float32) -> "DenseFlatIndex":
        """Load from a ``corpus*.pkl`` file, a directory of them, or ``query.pkl``."""
        if os.path.isdir(path_or_dir):
            files = sorted(glob.glob(os.path.join(path_or_dir, "corpus*.pkl")))
            if not files:
                files = sorted(glob.glob(os.path.join(path_or_dir, "*.pkl")))
            if not files:
                raise FileNotFoundError(f"no *.pkl shards under {path_or_dir}")
        else:
            files = [path_or_dir]
        index = cls(dtype=dtype)
        for fp in files:
            with open(fp, "rb") as f:
                reps, lookup = pickle.load(f)
            index.add(np.asarray(reps), lookup)
        return index

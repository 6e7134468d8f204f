"""Approximate dense index: low-rank prefilter + exact rescore (ops/ann.py).

``DenseANNIndex`` is a drop-in for :class:`DenseFlatIndex` (same ``add`` /
``search_ids`` / ``batch_search`` / pickle artifacts — it IS one, with the
device placement and per-chunk program swapped), trading exact candidate
generation for a ``rank/d``-cost stage-1 pass when the corpus is large
enough that the exact [B, N] x [N, d] matmul dominates. Final scores come
from a full-precision rescore (matching the exact index to f32 rounding),
so quality is purely candidate recall (tests/test_ann_index.py,
tools/ann_ab.py).

The reference has no ANN tier at all (FAISS *flat* only,
/root/reference/src/search.py:227-270); this is capability beyond it,
built TPU-first — see ops/ann.py for why cell-probe/HNSW designs were NOT
ported.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.ops.ann import (ann_topk_packed,
                                               ann_topk_packed_filtered,
                                               ip_projection,
                                               sharded_ann_topk,
                                               sharded_ann_topk_filtered)
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS


class DenseANNIndex(DenseFlatIndex):
    """Approximate-candidate, exact-score MIPS index.

    Args beyond DenseFlatIndex:
      rank: stage-1 projection dimensionality (the cost knob — stage 1
        costs ``rank/d`` of the exact matmul).
      candidates: rescored pool per query (per SHARD on a mesh). Clamped
        up to the requested depth at search time.
      recall_target: ``lax.approx_max_k`` quality knob (stage-1 selection).
      train_sample: max rows used for the projection eigenbasis.

    ``dtype`` may be f32 or bf16 (stage-2 gathers full-precision rows of
    that dtype); SQ8 is the exact index's trade — combining both
    approximations is not supported.
    """

    def __init__(self, dim: Optional[int] = None, dtype=jnp.float32, *,
                 rank: int = 64, candidates: int = 1024,
                 recall_target: float = 0.95, train_sample: int = 65536,
                 seed: int = 0):
        super().__init__(dim, dtype)
        if self.q8:
            raise ValueError("DenseANNIndex does not support int8 corpora; "
                             "use DenseFlatIndex(dtype=int8) for the SQ8 "
                             "trade or bf16 here")
        self.rank = int(rank)
        self.candidates = int(candidates)
        self.recall_target = float(recall_target)
        self.train_sample = int(train_sample)
        self.seed = int(seed)
        self._proj: Optional[np.ndarray] = None        # [d, r] host
        self._proj_dev: Optional[jax.Array] = None
        self._corpus_r_dev: Optional[jax.Array] = None

    # ---- device placement ------------------------------------------------------
    def _materialize(self, mesh=None) -> None:
        fresh = self._corpus_dev is None or self._mesh is not mesh
        super()._materialize(mesh)
        if not fresh and self._corpus_r_dev is not None:
            return
        corpus = np.concatenate(self._chunks) if len(self._chunks) != 1 \
            else self._chunks[0]
        if self._proj is None or self._proj.shape[0] != corpus.shape[1]:
            self._proj = ip_projection(corpus, self.rank, self.train_sample,
                                       self.seed)
        corpus_r = corpus @ self._proj                  # [N, r] f32
        pad = self._corpus_dev.shape[0] - corpus_r.shape[0]
        if pad:                                         # mesh shard padding
            corpus_r = np.concatenate(
                [corpus_r, np.zeros((pad, corpus_r.shape[1]), np.float32)])
        if mesh is None:
            self._corpus_r_dev = jnp.asarray(corpus_r)
            self._proj_dev = jnp.asarray(self._proj)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._corpus_r_dev = jax.device_put(
                jnp.asarray(corpus_r), NamedSharding(mesh, P(DATA_AXIS, None)))
            self._proj_dev = jax.device_put(
                jnp.asarray(self._proj), NamedSharding(mesh, P(None, None)))

    def add(self, reps: np.ndarray, ids) -> None:
        super().add(reps, ids)
        # membership changed: retrain the basis and re-project on next search
        self._proj = None
        self._corpus_r_dev = None

    # ---- per-chunk program -------------------------------------------------------
    def _dispatch_chunk(self, chunk_f32: np.ndarray, depth: int, mesh,
                        mask=None):
        k = min(depth, self._n_valid)
        q = jax.device_put(
            np.ascontiguousarray(np.asarray(chunk_f32, dtype=self.dtype))) \
            if mesh is None else jnp.asarray(chunk_f32, dtype=self.dtype)
        if mesh is None:
            c = max(min(self.candidates, self._n_valid), k)
            if mask is not None:
                # stage-1 masking: the candidate pool is drawn from allowed
                # rows only, so selectivity never starves the rescore
                return ann_topk_packed_filtered(
                    q, self._corpus_dev, self._corpus_r_dev, self._proj_dev,
                    mask, k, c, recall_target=self.recall_target)
            return ann_topk_packed(q, self._corpus_dev, self._corpus_r_dev,
                                   self._proj_dev, k, c,
                                   recall_target=self.recall_target)
        if mask is not None:
            return sharded_ann_topk_filtered(
                mesh, q, self._corpus_dev, self._corpus_r_dev,
                self._proj_dev, mask, self._n_valid, depth, self.candidates,
                recall_target=self.recall_target)
        return sharded_ann_topk(mesh, q, self._corpus_dev,
                                self._corpus_r_dev, self._proj_dev,
                                self._n_valid, depth, self.candidates,
                                recall_target=self.recall_target)

    # ---- persistence ------------------------------------------------------------
    # Artifacts are plain DenseFlatIndex pickle shards (rows + lookup) —
    # the projection retrains deterministically at load-time placement, so
    # either index class can load the other's save.

    @classmethod
    def from_flat(cls, flat: DenseFlatIndex, **kwargs) -> "DenseANNIndex":
        """Re-tier an exact index's rows into an ANN index (host arrays are
        shared, not copied; the flat index's device state is untouched)."""
        out = cls(dim=flat.dim, dtype=flat.dtype, **kwargs)
        out._chunks = list(flat._chunks)
        out.lookup = list(flat.lookup)
        return out

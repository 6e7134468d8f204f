"""Impact inverted index: the TPU-native Lucene-impact-search replacement.

Replaces the reference's Pyserini/Lucene stack — JVM index build
(``scripts/sparse_index.sh:13-19``), ``LuceneImpactSearcher`` + whitespace
analyzer and weight-many token-repetition query serialization
(/root/reference/src/search.py:272-275,363-366) — with an HBM-resident index
scored on the TPU.

Scoring semantics are exactly Lucene's for this setup: the impact score of a
doc for a query is ``sum_t q_weight(t) * d_weight(t)`` over shared terms
(SURVEY.md §7.4). Term keys are strings by default (bit-parity with the
reference's lowercase/filter collisions); integer token-id keys work
identically.

Two complementary layouts are stored:

- **packed doc-major arrays** ``[N, K]`` (term idx + weight, zero-padded) —
  the compact build/interchange layout;
- **impact-ordered CSR postings** (terms → (doc, weight) sorted by
  descending weight) — the classical layout, used by term-at-a-time scoring
  and early-termination kernels, and the on-disk interchange format.

Device scoring keeps the corpus as a dense ``[T'+1, N]`` impact matrix in
HBM (T' = distinct corpus terms — ~20k at COCO scale), scattered once at
index load, and offers two backends (bit-identical scores, ``backend='auto'``
picks per platform):

- **'taat'** (TPU default): the Pallas term-at-a-time kernel
  (ops/impact_kernel.py) DMAs only the query's own posting rows — int16
  storage + a deep DMA ring; the bandwidth-optimal regime since a query
  touches Q ≤ 128 of T' terms;
- **'matmul'**: the query batch becomes a dense ``[B, T'+1]`` weight table
  and scoring is one MXU matmul + ``lax.top_k`` (f32, precision=HIGHEST for
  integer exactness) — the portable path, and the fastest formulation pure
  XLA allows (TPUs have no hardware gather, so an XLA inverted-list walk
  lowers to serialized scalar work, measured ~50× slower).

For corpora too large for one chip's matrix budget (``hbm_budget_bytes``),
the matrix shards column-wise (docs) over the mesh's data axis — 8×16 GB
HBM holds ~3M docs — with the same per-shard top-k + ICI merge as dense
MIPS, for both backends.

Index build is pure host work (optionally accelerated by the C++ builder in
``index/native``); queries never round-trip through strings on the device.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mllm_sparse_retrieval_tpu import hostops as _hostops
from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS, replicated

TermKey = Union[str, int]
SparseVector = Mapping[TermKey, int]

_DOC_TILE = 2048       # docs scored per device tile (static shape)
_PLACE_BLOCK_BYTES = 256e6  # _place_chunked host-scatter block size
_QUERY_WIDTH_PAD = 64  # query term-count padding granularity (one compile)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flatten_term_rows(terms_list):
    """Concatenate SelectedTerms rows into flat (token_ids, weights, row)
    arrays — the bulk form every id-keyed path starts from.

    Native dtypes are preserved: per-row ``astype(int64)`` copies cost more
    than the concatenation itself at serving batch sizes (7.6 ms vs 1.5 ms
    for 4096 rows), and every consumer is dtype-polymorphic. One bulk cast
    happens only if the ids aren't already an integer kind."""
    b = len(terms_list)
    ids = [np.asarray(t.token_ids) for t in terms_list]
    lens = np.fromiter((a.size for a in ids), np.int64, b)
    if b and int(lens.sum()):
        flat_t = np.concatenate(ids)
        flat_w = np.concatenate([np.asarray(t.weights) for t in terms_list])
        if flat_t.dtype.kind not in "iu":
            flat_t = flat_t.astype(np.int64)
    else:
        flat_t = np.empty(0, np.int64)
        flat_w = np.empty(0, np.int64)
    row = np.repeat(np.arange(b, dtype=np.int64), lens)
    return flat_t, flat_w, row


def _apply_canonical(flat_t, canonical_map):
    """Fold token ids through the canonical (lowercase/filter collision)
    map; out-of-range ids become -1 (dropped downstream). ONE definition so
    the query and doc paths can never diverge."""
    in_rng = (flat_t >= 0) & (flat_t < canonical_map.size)
    return np.where(
        in_rng,
        canonical_map[np.clip(flat_t, 0, canonical_map.size - 1)],
        -1)


class ImpactIndex:
    """Impact-ordered inverted index with TPU batch scoring."""

    # Default HBM guard for the dense scoring matrix (VERDICT r1 weak #5):
    # the [T'+1, N_pad] form grows with distinct-terms x docs; past this
    # budget _materialize refuses with sizing guidance (column-shard over a
    # mesh) instead of OOMing the chip mid-pipeline. ~12 GB leaves headroom
    # for batch tables/top-k on a 16 GB v5e. Copied onto each INSTANCE at
    # construction, so ``index.hbm_budget_bytes = ...`` tunes one index
    # without affecting every other index in the process.
    DEFAULT_HBM_BUDGET_BYTES: int = 12 * 10 ** 9

    def __init__(self):
        self.hbm_budget_bytes: int = self.DEFAULT_HBM_BUDGET_BYTES
        self.term_to_idx: Dict[TermKey, int] = {}
        self.doc_ids: List[str] = []
        self._doc_vectors: List[SparseVector] = []
        # Packed arrays, built by finalize():
        self.doc_terms: Optional[np.ndarray] = None    # int32 [N, K]
        self.doc_weights: Optional[np.ndarray] = None  # float32 [N, K]
        self.csr_offsets: Optional[np.ndarray] = None  # int64 [T+1]
        self.csr_docs: Optional[np.ndarray] = None     # int32 [NNZ]
        self.csr_weights: Optional[np.ndarray] = None  # float32 [NNZ]
        self._dev = None     # per-dtype device matrices (see _materialize)
        self._mesh = None
        self._n_valid = 0
        self._i16_ok = None  # cached _int16_exact() result
        # Arena (mutable) capacity reservation — index/arena.py: when set,
        # device matrices are padded to >= doc_capacity columns and
        # term_capacity (+1) rows, and _n_valid covers the whole padded
        # width, so in-place appends (scatter_append_triples) never change
        # a compiled program's shape. Reserved columns/rows are all-zero:
        # zero impact scores are dropped at resolve, exactly like docs
        # sharing no query term, so reserved capacity is invisible until
        # something is scattered into it.
        self.doc_capacity: Optional[int] = None
        self.term_capacity: Optional[int] = None
        # True iff this index's term ids were canonicalized at build
        # (from_selected_terms with a canonical_map): queries must then be
        # folded through the SAME map, and must NOT be otherwise — the
        # engine consults this instead of guessing (review r6 finding)
        self.query_canonical: bool = False

    # ---- build ---------------------------------------------------------------
    def add(self, doc_id: str, vector: SparseVector) -> None:
        """Add one document's sparse vector. Non-positive weights are dropped
        (they contribute nothing to any impact score; Lucene's analyzer never
        sees them because ``token * weight`` repetitions vanish for w <= 0)."""
        if self._doc_vectors and self._doc_vectors[0] is None:
            raise RuntimeError(
                "cannot add() to an index restored from disk/packed form — "
                "raw doc vectors were not retained; rebuild from jsonl")
        self.doc_ids.append(str(doc_id))
        self._doc_vectors.append(
            {k: int(v) for k, v in vector.items() if int(v) > 0})
        self.doc_terms = None  # invalidate
        self._doc_ids_arr_src = None  # invalidate cached id array

    def add_many(self, docs: Iterable[Tuple[str, SparseVector]]) -> None:
        for doc_id, vec in docs:
            self.add(doc_id, vec)

    @property
    def num_docs(self) -> int:
        return len(self.doc_ids)

    @property
    def num_terms(self) -> int:
        self._ensure_finalized()
        return len(self.term_to_idx)

    def _ensure_finalized(self) -> None:
        if self.doc_terms is None:
            self.finalize()

    def finalize(self) -> None:
        """Assign compact term ids and build packed + CSR layouts."""
        term_to_idx: Dict[TermKey, int] = {}
        for vec in self._doc_vectors:
            for key in vec:
                if key not in term_to_idx:
                    term_to_idx[key] = len(term_to_idx)
        self.term_to_idx = term_to_idx

        n = len(self._doc_vectors)
        k_max = max((len(v) for v in self._doc_vectors), default=1)
        k_max = max(k_max, 1)
        doc_terms = np.zeros((n, k_max), dtype=np.int32)
        doc_weights = np.zeros((n, k_max), dtype=np.float32)
        for i, vec in enumerate(self._doc_vectors):
            for j, (key, w) in enumerate(vec.items()):
                doc_terms[i, j] = term_to_idx[key]
                doc_weights[i, j] = w
        self.doc_terms = doc_terms
        self.doc_weights = doc_weights
        self._build_csr()
        self._reorder_terms_by_df()

    def _reorder_terms_by_df(self) -> None:
        """Relabel term ids hot-first (document frequency descending; the
        previous id breaks ties, so the C++ and Python builders — both
        first-seen before this pass — agree exactly).

        Pure internal relabeling: scores and returned doc ids are unchanged.
        The payoff is the TAAT kernel's hot-term cache
        (ops/impact_kernel.MAX_HOT_ROWS): it keeps the LEADING rows of the
        impact matrix resident in VMEM, and under natural Zipf text
        statistics the highest-DF terms are also the most-queried, so
        hot-first ids let the cache absorb the largest share of per-step
        row DMAs.
        """
        t = len(self.term_to_idx)
        if t == 0:
            return
        df = np.diff(self.csr_offsets)
        order = np.argsort(-df, kind="stable")          # new id -> old id
        if np.array_equal(order, np.arange(t)):
            return
        perm = np.empty(t, np.int64)
        perm[order] = np.arange(t)                      # old id -> new id
        keys = list(self.term_to_idx.keys())            # insertion = id order
        self.term_to_idx = {keys[int(o)]: r for r, o in enumerate(order)}
        # packed layout: padding entries (weight 0) may change term value —
        # every consumer filters on weight > 0
        self.doc_terms = perm[self.doc_terms].astype(np.int32)
        # CSR: permute per-term segments without a re-sort
        lens = df[order]
        new_offsets = np.zeros(t + 1, dtype=np.int64)
        np.cumsum(lens, out=new_offsets[1:])
        within = np.arange(len(self.csr_docs), dtype=np.int64) - \
            np.repeat(new_offsets[:-1], lens)
        gather = np.repeat(self.csr_offsets[order], lens) + within
        self.csr_docs = self.csr_docs[gather]
        self.csr_weights = self.csr_weights[gather]
        self.csr_offsets = new_offsets
        self._dev = None

    def _build_csr(self) -> None:
        """CSR postings from the packed layout, impact-ordered per term."""
        n, k_max = self.doc_terms.shape
        t = len(self.term_to_idx)
        flat_t = self.doc_terms.reshape(-1)
        flat_w = self.doc_weights.reshape(-1)
        flat_d = np.repeat(np.arange(n, dtype=np.int32), k_max)
        valid = flat_w > 0
        flat_t, flat_w, flat_d = flat_t[valid], flat_w[valid], flat_d[valid]
        # sort by (term asc, weight desc)
        order = np.lexsort((-flat_w, flat_t))
        flat_t, flat_w, flat_d = flat_t[order], flat_w[order], flat_d[order]
        counts = np.bincount(flat_t, minlength=t)
        self.csr_offsets = np.zeros(t + 1, dtype=np.int64)
        np.cumsum(counts, out=self.csr_offsets[1:])
        self.csr_docs = flat_d
        self.csr_weights = flat_w
        self._dev = None
        self._i16_ok = None

    @classmethod
    def from_packed_arrays(
        cls,
        doc_terms: np.ndarray,
        doc_weights: np.ndarray,
        doc_ids: Optional[Sequence[str]] = None,
        term_keys: Optional[Sequence[TermKey]] = None,
    ) -> "ImpactIndex":
        """Build directly from packed ``[N, K]`` (term idx, weight) arrays.

        ``term_keys`` defaults to the identity mapping over the observed term
        id range. This is the fast bulk-construction path (no Python dict
        loop) used by benchmarks and array-producing encode pipelines.
        """
        index = cls()
        n = doc_terms.shape[0]
        index.doc_ids = ([str(i) for i in range(n)] if doc_ids is None
                         else [str(d) for d in doc_ids])
        if term_keys is None:
            t = int(doc_terms.max()) + 1 if doc_terms.size else 0
            term_keys = range(t)
        index.term_to_idx = {k: i for i, k in enumerate(term_keys)}
        index.doc_terms = np.asarray(doc_terms, np.int32)
        index.doc_weights = np.asarray(doc_weights, np.float32)
        index._doc_vectors = [None] * n  # type: ignore
        index._build_csr()
        return index

    # ---- device placement ------------------------------------------------------
    def _int16_exact(self) -> bool:
        """True when every impact weight is an integer < 2^15 — always the
        case for the reference quantization round(log1p(relu)·100) — so the
        int16 matrix scores bit-identically to f32 at half the HBM traffic."""
        if self._i16_ok is None:
            w = self.csr_weights
            self._i16_ok = bool(
                w is None or w.size == 0 or
                (w.max() < 32767.5 and np.all(w == np.rint(w))))
        return self._i16_ok

    def _materialize(self, mesh=None, dtype: str = "f32",
                     kernel_layout: bool = False):
        """Scatter the CSR corpus into the dense [T'+1, N_pad] impact matrix
        and place it in HBM (column-sharded over the data axis when a mesh is
        given). Row 0 is the query-padding slot (always zero); term t lives
        at row t+1.

        ``dtype='f32'`` feeds the MXU matmul path; ``'i16'`` is the compact
        storage for the TAAT kernel (only valid when ``_int16_exact()``).
        ``kernel_layout=True`` (TAAT consumers) uploads the matrix pre-shaped
        to the kernel's ``[T'+1, s, N_pad/s]`` form — free on host (a
        row-major view) whereas an in-jit reshape of a device matrix is a
        full tiled-relayout copy in HBM — and pads doc columns so the
        kernel's column blocks stay DMA-wide at any corpus size
        (ops/impact_kernel.padded_doc_columns). With a mesh the TAAT form is
        ``[D, T'+1, s, shard_cols/s]`` — shard d's leading-axis slice IS its
        contiguous doc-column block pre-shaped, so the in-shard_map kernel
        gets its native layout with no per-search relayout copy and doc ids
        stay ``shard_index * shard_cols + local`` (VERDICT r2 weak #6). Each
        form is built on demand and cached per mesh.
        """
        self._ensure_finalized()
        if self._mesh is not mesh or self._dev is None:
            self._dev = {}
            self._mesh = mesh
        key = dtype + ("/kernel" if kernel_layout else "")
        if key in self._dev:
            return self._dev[key]
        n = self.doc_terms.shape[0]
        t = len(self.term_to_idx)
        # capacity mode (arena): pad the matrix to the reservation and mask
        # NOTHING by position — reserved all-zero columns score 0 and are
        # dropped at resolve; tombstones ride a DocFilter mask instead
        n_eff = max(n, self.doc_capacity or 0)
        t_eff = max(t, self.term_capacity or 0)
        self._n_valid = n
        n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        if kernel_layout:
            from mllm_sparse_retrieval_tpu.ops.impact_kernel import (
                padded_doc_columns)
            np_dtype = np.int16 if dtype == "i16" else np.float32
            shard_cols = padded_doc_columns(
                -(-max(n_eff, 1) // n_shards), np_dtype, tile=_DOC_TILE)
            n_pad = shard_cols * n_shards
        else:
            n_pad = _round_up(max(n_eff, 1), _DOC_TILE * n_shards)
        if self.doc_capacity is not None:
            self._n_valid = n_pad

        itemsize = 2 if dtype == "i16" else 4
        per_device = (t_eff + 1) * n_pad * itemsize
        if mesh is not None:
            per_device //= mesh.shape[DATA_AXIS]
        # already-cached forms (mixed-backend use keeps both the i16 and f32
        # matrices resident) count against the same budget
        cached = sum(d.nbytes for d in self._dev.values())
        if mesh is not None:
            cached //= mesh.shape[DATA_AXIS]
        if per_device + cached > self.hbm_budget_bytes:
            shards = -(-((t_eff + 1) * n_pad * itemsize)
                       // self.hbm_budget_bytes)
            raise MemoryError(
                f"impact matrix needs {per_device / 1e9:.1f} GB per device "
                f"(terms={t}, docs_pad={n_pad}, {dtype}; "
                f"{cached / 1e9:.1f} GB already cached for other backends — "
                f"drop_device_cache() frees them) — over the "
                f"{self.hbm_budget_bytes / 1e9:.1f} GB budget. Column-shard "
                f"over a mesh with >= {shards} data-axis devices "
                f"(search(..., mesh=...)), or raise "
                f"this index's hbm_budget_bytes if the chip has headroom.")

        np_dtype = np.int16 if dtype == "i16" else np.float32
        if mesh is None:
            dev = self._place_chunked(t_eff, n_pad, np_dtype, kernel_layout)
            self._dev[key] = dev
            return dev

        matrix = np.zeros((t_eff + 1, n_pad), np.float32)
        # CSR rows are contiguous per term: expand offsets to row indices.
        counts = np.diff(self.csr_offsets).astype(np.int64)
        term_rows = np.repeat(np.arange(t, dtype=np.int64), counts) + 1
        matrix[term_rows, self.csr_docs.astype(np.int64)] = self.csr_weights
        if dtype == "i16":
            matrix = matrix.astype(np.int16)
        if kernel_layout:
            from mllm_sparse_retrieval_tpu.ops.impact_kernel import _sublanes
            s_lanes = _sublanes(matrix.dtype)
            # [T+1, D*shard] -> [D, T+1, s, shard/s]: shard-major so each
            # device's slice is its contiguous doc block, pre-shaped
            matrix = np.ascontiguousarray(
                matrix.reshape(t_eff + 1, n_shards, shard_cols)
                .transpose(1, 0, 2)
            ).reshape(n_shards, t_eff + 1, s_lanes, shard_cols // s_lanes)

        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P(DATA_AXIS, None, None, None) if kernel_layout \
            else P(None, DATA_AXIS)
        dev = jax.device_put(matrix, NamedSharding(mesh, spec))
        self._dev[key] = dev
        return dev

    def _place_chunked(self, t, n_pad, np_dtype, kernel_layout):
        """Single-chip HBM placement by DEVICE-SIDE scatter from CSR
        triples (VERDICT r3 #7).

        The scoring matrix is ~99% zeros (128 selected terms per doc out of
        ~20k vocabulary), so shipping it dense wastes the link: at 200k
        docs the int16 matrix is 8.0 GB but the CSR payload is 25.6M
        (row, col, weight) triples ≈ 260 MB — 30x fewer bytes. The host
        uploads the triples in fixed-size blocks (async ``device_put``,
        next block's prep overlaps the transfer) and a donated-buffer
        scatter writes them in place; the v5e scatters ~40M updates/s, so
        device time is <1 s where the dense upload was ~162-210 s on this
        relay. Padding entries write weight 0 to row 0 (the query-padding
        slot, zero by construction), keeping ONE compiled program per
        matrix shape. The mesh path still uploads dense per-shard blocks
        (multi-chip links are not relay-bound; revisit if they ever are).
        """
        s_lanes = 1
        if kernel_layout:
            from mllm_sparse_retrieval_tpu.ops.impact_kernel import _sublanes
            s_lanes = _sublanes(np.dtype(np_dtype))
        shape = (t + 1, s_lanes, n_pad // s_lanes) if kernel_layout \
            else (t + 1, n_pad)
        dev = jnp.zeros(shape, np_dtype)
        nnz = int(self.csr_docs.shape[0])
        if nnz == 0:
            return dev

        bytes_per = 8 + np.dtype(np_dtype).itemsize
        ent_per = max(1, int(_PLACE_BLOCK_BYTES // bytes_per))
        # XLA pads each scatter-index ROW to a full (8,128) lane tile on
        # TPU (~512 B/entry of HLO temp, 2 copies live) — cap the block so
        # those temps stay ~2 GB next to the matrix itself
        ent_per = min(ent_per, 2_000_000, _round_up(nnz, 65536))
        counts = np.diff(self.csr_offsets)
        # matrix row r holds term r-1 (row 0 is the query-padding slot);
        # counts has the REAL term count — t may include arena row capacity
        rows_all = (np.repeat(np.arange(counts.size, dtype=np.int64),
                              counts) + 1).astype(np.int32)
        cols_all = self.csr_docs.astype(np.int32, copy=False)
        w_all = self.csr_weights.astype(np_dtype)
        lane_w = max(n_pad // s_lanes, 1)
        for i in range(0, nnz, ent_per):
            j = min(i + ent_per, nnz)
            if j - i == ent_per:
                r, c, v = rows_all[i:j], cols_all[i:j], w_all[i:j]
            else:  # pad the tail block: zero-weight writes to row 0
                r = np.zeros(ent_per, np.int32)
                c = np.zeros(ent_per, np.int32)
                v = np.zeros(ent_per, np_dtype)
                r[: j - i] = rows_all[i:j]
                c[: j - i] = cols_all[i:j]
                v[: j - i] = w_all[i:j]
            # async uploads: device_put returns immediately; the next
            # block's host prep overlaps the transfer in flight
            dev = _scatter_block(dev, jax.device_put(r), jax.device_put(c),
                                 jax.device_put(v), lane_w, kernel_layout)
            if (i // ent_per) % 8 == 7:  # bound in-flight host pins
                jax.block_until_ready(dev)
        return dev

    def drop_device_cache(self) -> None:
        """Release all HBM-resident scoring matrices (they rebuild lazily on
        the next search)."""
        self._dev = None
        self._mesh = None

    def scatter_append_triples(self, term_idx, doc_pos, weights) -> None:
        """Scatter (term idx, doc column, weight) triples into every CACHED
        device matrix IN PLACE (donated updates — compiled program shapes
        unchanged, so warm searches keep their executables). The arena
        live path's append primitive (index/arena.py); requires
        `doc_capacity`/`term_capacity` headroom — callers must grow/compact
        before positions or term ids exceed the reservation. Mesh-sharded
        forms scatter incrementally too (round 10, VERDICT r4 #7): doc
        columns map to shards statically, so the host routes each triple
        to its shard's block and `_sharded_scatter_fn` writes them
        device-local under shard_map — O(triples) per mutation, never an
        O(corpus) re-placement. No-op when nothing is materialized yet."""
        if not self._dev:
            return
        rows = (np.asarray(term_idx, np.int64) + 1).astype(np.int32)
        cols = np.asarray(doc_pos, np.int32)
        vals = np.asarray(weights)
        if self._mesh is not None:
            self._scatter_triples_mesh(rows, cols, vals)
            return
        # pad the triple count to a power of two (>= 1024) so repeated
        # appends of varying sizes share a handful of compiled scatters;
        # padding entries write weight 0 to row 0, absorbed by its zero
        # invariant (same trick as _place_chunked's tail block)
        n_tr = max(1024, 1 << int(np.ceil(np.log2(max(rows.size, 1)))))
        if n_tr > rows.size:
            pad = n_tr - rows.size
            rows = np.concatenate([rows, np.zeros(pad, np.int32)])
            cols = np.concatenate([cols, np.zeros(pad, np.int32)])
            vals = np.concatenate([vals, np.zeros(pad, vals.dtype)])
        for key in list(self._dev):
            dev = self._dev[key]
            kernel_layout = dev.ndim == 3
            np_dtype = np.int16 if key.startswith("i16") else np.float32
            self._dev[key] = _scatter_block(
                dev, jax.device_put(rows), jax.device_put(cols),
                jax.device_put(vals.astype(np_dtype)),
                dev.shape[-1], kernel_layout)

    def _scatter_triples_mesh(self, rows, cols, vals) -> None:
        """Route (row, col, val) triples to their owning shards and scatter
        each cached mesh form in place. Per-shard blocks are padded to one
        shared power-of-two width (zero-weight writes to local (0, 0)), so
        appends of varying sizes and skews share a handful of compiled
        sharded scatters per form."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self._mesh
        n_shards = mesh.shape[DATA_AXIS]
        for key in list(self._dev):
            dev = self._dev[key]
            kernel_layout = dev.ndim == 4
            shard_cols = dev.shape[2] * dev.shape[3] if kernel_layout \
                else dev.shape[1] // n_shards
            shard_of = cols // shard_cols
            local_col = cols - shard_of * shard_cols
            counts = np.bincount(shard_of, minlength=n_shards)
            n_tr = max(1024, 1 << int(np.ceil(np.log2(max(
                int(counts.max()) if counts.size else 1, 1)))))
            np_dtype = np.int16 if key.startswith("i16") else np.float32
            r_blk = np.zeros((n_shards, n_tr), np.int32)
            c_blk = np.zeros((n_shards, n_tr), np.int32)
            v_blk = np.zeros((n_shards, n_tr), np_dtype)
            for s in range(n_shards):
                sel = shard_of == s
                m = int(counts[s])
                r_blk[s, :m] = rows[sel]
                c_blk[s, :m] = local_col[sel]
                v_blk[s, :m] = vals[sel].astype(np_dtype)
            spec = NamedSharding(mesh, P(DATA_AXIS, None))
            fn = _sharded_scatter_fn(mesh, kernel_layout)
            self._dev[key] = fn(dev,
                                jax.device_put(r_blk, spec),
                                jax.device_put(c_blk, spec),
                                jax.device_put(v_blk, spec))

    # ---- query encoding -----------------------------------------------------------
    def encode_queries(
        self, query_vectors: Sequence[SparseVector], q_max: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Map query dicts to padded (term_idx [B, Qm], weight [B, Qm]) arrays.

        Out-of-vocabulary terms are dropped (they match no postings, exactly
        as in Lucene). Non-positive weights are dropped (see ``add``). The
        query width is padded up to a multiple of ``_QUERY_WIDTH_PAD`` so one
        compiled program serves batches of varying widths (per-batch-longest
        sizing would recompile for every distinct width).

        Bulk-vectorized: one dict-lookup pass over all terms (C-level
        ``map``), then pure numpy packing — the per-query tuple-building loop
        this replaced cost ~70 ms per 4096-query batch, serialized with the
        serving pipeline (VERDICT r3 #1). For id-keyed indexes prefer
        ``encode_query_terms`` (no dict work at all).
        """
        import itertools

        self._ensure_finalized()
        b = len(query_vectors)
        lens = np.fromiter((len(v) for v in query_vectors), np.int64, b)
        total = int(lens.sum())
        if total:
            flat_w = np.fromiter(
                (w for vec in query_vectors for w in vec.values()),
                np.float64, total)
            flat_w = np.trunc(flat_w).astype(np.int64)  # int(w) semantics
            get = self.term_to_idx.get
            idx = np.fromiter(
                map(get, (k for vec in query_vectors for k in vec),
                    itertools.repeat(-1, total)), np.int64, total)
        else:
            flat_w = np.empty(0, np.int64)
            idx = np.empty(0, np.int64)
        row = np.repeat(np.arange(b, dtype=np.int64), lens)
        return self._pack_query_rows(b, row, idx, flat_w.astype(np.float64),
                                     q_max)

    def _pack_query_rows(self, b, row, idx, w, q_max):
        """Pack flat (row, term_idx, weight) triples into the padded
        [B, Qm] arrays, dropping idx < 0 / w <= 0 entries and compacting
        each row left (same layout the per-query loop produced)."""
        valid = (idx >= 0) & (w > 0)
        vrow, vidx, vw = row[valid], idx[valid], w[valid]
        vlens = np.bincount(vrow, minlength=b) if b else np.zeros(0, np.int64)
        q_m = max(q_max, int(vlens.max()) if b else 1, 1)
        q_m = _round_up(q_m, _QUERY_WIDTH_PAD)
        # flat order is row-grouped, so valid entries stay row-grouped:
        # column = rank within the row
        starts = np.cumsum(vlens) - vlens
        vcol = np.arange(vrow.size, dtype=np.int64) - \
            np.repeat(starts, vlens)
        out_idx = np.zeros((b, q_m), dtype=np.int32)
        out_w = np.zeros((b, q_m), dtype=np.float32)
        out_idx[vrow, vcol] = vidx
        out_w[vrow, vcol] = vw
        return out_idx, out_w

    # ---- id-keyed fast path ---------------------------------------------------
    #
    # The product stack's own term space is token ids (sparse/SelectedTerms);
    # the string key space exists only for Lucene-artifact interchange
    # (/root/reference/src/search.py:363-366 serializes queries as token
    # strings repeated weight-many times). Routing our own ids through
    # strings and back (query_string_weights -> encode_queries) cost ~0.5M
    # dict operations per 4096-query batch, serialized with the serving
    # pipeline (VERDICT r3 #1). When the index is built id-keyed
    # (from_selected_terms), queries go straight from SelectedTerms arrays
    # to the device with pure numpy mapping. String-collision semantics
    # (lowercase/filter merges) are preserved exactly via canonical_id_map.

    @property
    def int_keyed(self) -> bool:
        """True when every term key is an integer token id — the condition
        for the SelectedTerms fast path (``search_terms``)."""
        self._ensure_finalized()
        if getattr(self, "_int_keyed_src", None) is not self.term_to_idx:
            self._int_keyed = all(
                isinstance(k, (int, np.integer)) and not isinstance(k, bool)
                for k in self.term_to_idx)
            self._int_keyed_src = self.term_to_idx
        return self._int_keyed

    def _term_lut(self) -> np.ndarray:
        """Cached int32 [max_key+1] token-id → compact-term-idx table
        (-1 = not indexed). Rebuilt whenever term_to_idx is replaced
        (finalize / df reorder / load)."""
        if getattr(self, "_term_lut_src", None) is not self.term_to_idx:
            if not self.int_keyed:
                raise TypeError(
                    "id-keyed queries need an int-keyed index (build with "
                    "from_selected_terms or integer term keys); this index "
                    "has string term keys — use search()/encode_queries")
            t = len(self.term_to_idx)
            keys = np.fromiter(self.term_to_idx.keys(), np.int64, t)
            if t and keys.min() < 0:
                raise ValueError("negative term key in int-keyed index")
            lut = np.full(int(keys.max()) + 1 if t else 1, -1, np.int32)
            lut[keys] = np.fromiter(self.term_to_idx.values(), np.int64, t)
            self._term_lut_arr = lut
            self._term_lut_src = self.term_to_idx
        return self._term_lut_arr

    def encode_query_terms(
        self,
        terms_list: Sequence,                 # of sparse.SelectedTerms
        canonical_map: Optional[np.ndarray] = None,
        q_max: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Map SelectedTerms rows (token-id + quantized-weight arrays) to the
        padded (term_idx, weight) query arrays — the dict-free counterpart of
        ``encode_queries`` for int-keyed indexes.

        ``canonical_map`` (sparse.canonical_id_map) folds string-colliding
        token ids together first, reproducing the artifact path's merge
        arithmetic bit-exactly; duplicate ids within a row are summed on
        device (both scoring backends accumulate per entry). Out-of-map and
        out-of-index ids are dropped, exactly like OOV strings.

        Equal-width batches (the device-select serving shape) take a fully
        2-D path: dropped entries become (term 0, weight 0) slots, which
        both backends already score as padding (weight 0 routes to the dead
        matrix row) — identical scores, no per-row compaction pass.
        """
        self._ensure_finalized()
        lut = self._term_lut()
        b = len(terms_list)
        first_w = np.asarray(terms_list[0].token_ids).shape[0] if b else 0
        equal = b > 0 and first_w > 0 and all(
            np.asarray(t.token_ids).shape == (first_w,) for t in terms_list)
        if equal:
            flat_t = flat_w = None
            native = _hostops.get()
            if native is not None and canonical_map is None:
                # Fully fused C encode: stack + lut gather + OOV/weight
                # masking + pad-fill in ONE pass over the row buffers
                # (hostops.c encode_terms) — the whole equal-width encode
                # below collapses to this call. False = some row isn't a
                # contiguous int32 buffer; fall through to the numpy path.
                q_m = _round_up(max(int(q_max), first_w, 1),
                                _QUERY_WIDTH_PAD)
                out_idx = np.empty((b, q_m), np.int32)
                out_w = np.empty((b, q_m), np.float32)
                if native.encode_terms(terms_list, "token_ids", "weights",
                                       lut, first_w, out_idx, out_w):
                    return out_idx, out_w
            if native is not None:
                # C fill of the [B, W] arrays straight from the row
                # buffers — the np.stack listcomp below was ~5 ms per
                # 4096-query batch of pure interpreter overhead,
                # serialized with the serving pipeline. False = some row
                # isn't a contiguous int32 buffer; fall through (the
                # arrays are overwritten whole there).
                ti = np.empty((b, first_w), np.int32)
                tw = np.empty((b, first_w), np.int32)
                if native.stack_rows(terms_list, "token_ids", "weights",
                                     ti, tw):
                    flat_t, flat_w = ti, tw
            if flat_t is None:
                flat_t = np.stack([np.asarray(t.token_ids)
                                   for t in terms_list])
                flat_w = np.stack([np.asarray(t.weights)
                                   for t in terms_list])
                if flat_t.dtype.kind not in "iu":
                    flat_t = flat_t.astype(np.int64)
            row = None
        else:
            flat_t, flat_w, row = _flatten_term_rows(terms_list)
        if canonical_map is not None:
            flat_t = _apply_canonical(flat_t, canonical_map)
        in_lut = (flat_t >= 0) & (flat_t < lut.size)
        idx = np.where(in_lut, lut[np.clip(flat_t, 0, lut.size - 1)], -1)
        if equal:
            valid = (idx >= 0) & (flat_w > 0)
            q_m = _round_up(max(int(q_max), first_w, 1), _QUERY_WIDTH_PAD)
            out_idx = np.zeros((b, q_m), np.int32)
            out_w = np.zeros((b, q_m), np.float32)
            out_idx[:, :first_w] = np.where(valid, idx, 0)
            out_w[:, :first_w] = np.where(valid, flat_w, 0)
            return out_idx, out_w
        return self._pack_query_rows(b, row, idx, flat_w, q_max)

    def search_terms(
        self,
        terms_list: Sequence,                 # of sparse.SelectedTerms
        depth: int,
        canonical_map: Optional[np.ndarray] = None,
        mesh=None,
        backend: str = "auto",
        wire: str = "i32",
    ) -> Tuple[List[List[float]], List[List[str]]]:
        """Batch impact search straight from SelectedTerms (id-keyed fast
        path; same result contract as ``search``). Scores are bit-identical
        to the string path on an index built by ``from_selected_terms`` with
        the same ``canonical_map``."""
        q_idx, q_w = self.encode_query_terms(terms_list, canonical_map)
        return self.search_encoded(q_idx, q_w, depth, mesh=mesh,
                                   backend=backend, wire=wire)

    def search_terms_stream(
        self,
        term_batches,          # iterable of SelectedTerms sequences
        depth: int,
        canonical_map: Optional[np.ndarray] = None,
        mesh=None,
        backend: str = "auto",
        lookahead: int = 3,
        wire: str = "i32",
    ):
        """Pipelined serving loop over SelectedTerms batches: yields one
        ``(scores, ids)`` pair per input batch, with the numpy query
        encoding of batch r+1 overlapping batch r's device compute (the
        SelectedTerms counterpart of ``search_encoded_stream``).

        The encode stage is deliberately NOT on a prefetch thread: its cost
        is Python-loop/GIL-bound (per-row array handling), so a worker
        thread steals the GIL from the dispatch path and measured WORSE
        (130-238 ms/batch vs 115 inline on v5e). The fix that worked is
        making the encode itself cheap (no-cast flatten, see
        ``_flatten_term_rows``)."""
        encoded = (self.encode_query_terms(batch, canonical_map)
                   for batch in term_batches)
        yield from self.search_encoded_stream(encoded, depth, mesh=mesh,
                                              backend=backend,
                                              lookahead=lookahead, wire=wire)

    @classmethod
    def from_selected_terms(
        cls,
        doc_ids: Sequence[str],
        terms_list: Sequence,                 # of sparse.SelectedTerms
        canonical_map: Optional[np.ndarray] = None,
    ) -> "ImpactIndex":
        """Build an int-keyed index straight from per-doc SelectedTerms —
        the dict-free counterpart of add_many(doc_string_vector(...)) with
        identical scoring semantics when ``canonical_map`` is supplied:
        string-colliding ids merge last-write-wins (the reference's doc dict
        assembly, /root/reference/src/encode.py:351-352), then non-positive
        weights drop. Fully vectorized (no per-term Python)."""
        if len(doc_ids) != len(terms_list):
            raise ValueError("doc_ids/terms_list length mismatch")
        n = len(terms_list)
        flat_t, flat_w, row = _flatten_term_rows(terms_list)
        if canonical_map is not None:
            flat_t = _apply_canonical(flat_t, canonical_map)
        keep = flat_t >= 0
        flat_t, flat_w, row = flat_t[keep], flat_w[keep], row[keep]
        # last-write-wins per (doc, term): stable-sort by key with original
        # position as tiebreak, keep the final element of each key run —
        # THEN drop non-positive weights (a trailing w<=0 erases the term,
        # exactly as dict overwrite + add()'s filter would)
        if flat_t.size:
            span = int(flat_t.max()) + 1
            key = row * span + flat_t
            order = np.argsort(key, kind="stable")  # stable = position order
            key_s = key[order]
            last = np.empty(key_s.size, bool)
            last[-1] = True
            last[:-1] = key_s[1:] != key_s[:-1]
            sel = order[last]
            sel = sel[flat_w[sel] > 0]
            flat_t, flat_w, row = flat_t[sel], flat_w[sel], row[sel]
        else:
            flat_w = flat_w[:0]
            row = row[:0]
        uniq, compact = np.unique(flat_t, return_inverse=True)
        lens = np.bincount(row, minlength=n) if n else np.zeros(0, np.int64)
        k_max = max(int(lens.max()) if n else 1, 1)
        # row-grouped order survives the selection, so column = in-row rank
        srt = np.argsort(row, kind="stable")
        row, compact, flat_w = row[srt], compact[srt], flat_w[srt]
        starts = np.cumsum(lens) - lens
        col = np.arange(row.size, dtype=np.int64) - np.repeat(starts, lens)
        doc_terms = np.zeros((n, k_max), np.int32)
        doc_weights = np.zeros((n, k_max), np.float32)
        doc_terms[row, col] = compact
        doc_weights[row, col] = flat_w
        index = cls.from_packed_arrays(
            doc_terms, doc_weights, doc_ids=doc_ids,
            term_keys=[int(u) for u in uniq])
        index._reorder_terms_by_df()  # hot-first ids for the TAAT cache
        index.query_canonical = canonical_map is not None
        return index

    # ---- search -----------------------------------------------------------------
    def search(
        self,
        query_vectors: Sequence[SparseVector],
        depth: int,
        mesh=None,
        backend: str = "auto",
        wire: str = "i32",
        doc_filter=None,
    ) -> Tuple[List[List[float]], List[List[str]]]:
        """Batch impact search. Returns (score lists, ranked doc-id lists),
        one (possibly short) ragged row per query.

        Docs with zero score are never returned (Lucene returns only matching
        docs); rows may therefore be shorter than ``depth``.

        ``backend``:
          - ``'taat'`` — Pallas term-at-a-time kernel (ops/impact_kernel.py),
            ~1.7× the matmul path on a real chip at COCO scale, bit-identical
            scores. Works single-chip and column-sharded over a mesh.
          - ``'matmul'`` — dense query-table × impact-matrix MXU matmul.
          - ``'auto'`` (default) — TAAT on a real TPU backend, matmul
            elsewhere (the kernel only runs interpreted off-TPU, which is
            test-grade, not production speed).
        """
        q_idx, q_w = self.encode_queries(query_vectors)
        return self.search_encoded(q_idx, q_w, depth, mesh=mesh,
                                   backend=backend, wire=wire,
                                   doc_filter=doc_filter)

    def explain(self, terms: SparseVector, doc_id: str) -> Dict:
        """Score breakdown for one (query, doc) pair — the Lucene
        ``explain`` diagnostic the reference stack exposes only through
        Pyserini's Java API. Host-side arithmetic replicating ``search``'s
        exact rules: ``int(w)``-truncated query weights, non-positive
        weights dropped, out-of-vocabulary terms dropped, contributions
        summed as ``query_weight * doc_weight``.

        Returns ``{"doc_id", "score", "terms": [{"term", "query_weight",
        "doc_weight", "contribution"}, ... contribution-descending],
        "dropped": [terms contributing nothing]}``; ``score`` equals the
        engine's for this doc (asserted in tests/test_explain.py).
        """
        self._ensure_finalized()
        if getattr(self, "_doc_pos_src", None) is not self.doc_ids:
            self._doc_pos = {d: i for i, d in enumerate(self.doc_ids)}
            self._doc_pos_src = self.doc_ids
        pos = self._doc_pos.get(str(doc_id))
        if pos is None:
            raise KeyError(f"unknown doc id {doc_id!r}")
        doc_w: Dict[int, float] = {}
        for t, w in zip(self.doc_terms[pos].tolist(),
                        self.doc_weights[pos].tolist()):
            if w > 0:
                doc_w[int(t)] = doc_w.get(int(t), 0.0) + float(w)
        rows = []
        dropped = []
        total = 0.0
        for k, qw in terms.items():
            qw = float(int(qw))                    # int(w) truncation rule
            idx = self.term_to_idx.get(k)
            if qw <= 0 or idx is None or idx not in doc_w:
                dropped.append(k)
                continue
            contribution = qw * doc_w[idx]
            total += contribution
            rows.append({"term": k, "query_weight": qw,
                         "doc_weight": doc_w[idx],
                         "contribution": contribution})
        rows.sort(key=lambda r: -r["contribution"])
        return {"doc_id": str(doc_id), "score": total, "terms": rows,
                "dropped": dropped}

    def search_encoded(
        self,
        q_idx: np.ndarray,
        q_w: np.ndarray,
        depth: int,
        mesh=None,
        backend: str = "auto",
        wire: str = "i32",
        doc_filter=None,
    ) -> Tuple[List[List[float]], List[List[str]]]:
        """Search pre-encoded padded query arrays (see ``encode_queries``).

        The low-level entry used by the engine and the benchmark; term ids
        are this index's compact ids (column of ``doc_terms``), padding
        entries have weight 0.

        ``wire='compact48'`` opts into the 6-byte/result device->host
        format (``ops.packing.pack_topk48``): 25% fewer fetch bytes, the
        dominant cost of deep-depth searches on thin links. Requires
        integer doc AND query weights (scores stay in the same < 2^24
        envelope f32 exactness already needs); single-chip only.
        """
        from mllm_sparse_retrieval_tpu.ops.stream import pipeline_dispatch

        plan = self._search_plan(mesh, backend, depth, wire,
                                 doc_filter=doc_filter)
        self._check_wire(plan, q_w)
        out_s: List[List[float]] = []
        out_i: List[List[str]] = []

        def dispatch(item):
            chunk_i, chunk_w, take = item
            return self._dispatch_encoded(plan, chunk_i, chunk_w), take

        def resolve(handle):
            packed, take = handle
            s_c, i_c = self._resolve_encoded(packed, take, plan["wire"])
            out_s.extend(s_c)
            out_i.extend(i_c)

        import collections
        collections.deque(
            pipeline_dispatch(self._chunk_queries(plan, q_idx, q_w),
                              dispatch, resolve, lookahead=3),
            maxlen=0)
        return out_s, out_i

    def search_encoded_stream(
        self,
        batches,            # iterable of (q_idx, q_w) array pairs
        depth: int,
        mesh=None,
        backend: str = "auto",
        lookahead: int = 3,
        wire: str = "i32",
    ):
        """Pipelined batch search: yields one ``(scores, ids)`` pair per
        input batch (same semantics as ``search_encoded``, including the
        opt-in ``wire='compact48'`` fetch format), keeping up to
        ``lookahead`` device programs in flight ahead of the consumer.

        JAX dispatch is asynchronous, so while the device scores batch r the
        host is already encoding/uploading batch r+1 — on hosts with thin
        transfer links (or real serving loops where the host prepares the
        next batch) this overlaps the query transfer with device compute,
        which is the throughput-optimal serving pattern. Batches wider than
        the HBM chunk budget are sub-chunked through the same pipeline.
        """
        from mllm_sparse_retrieval_tpu.ops.stream import pipeline_dispatch

        plan = self._search_plan(mesh, backend, depth, wire)

        def submit():
            seq = 0
            for q_idx, q_w in batches:
                self._check_wire(plan, q_w)
                chunks = list(self._chunk_queries(plan, q_idx, q_w))
                for ci, (chunk_i, chunk_w, take) in enumerate(chunks):
                    yield (chunk_i, chunk_w, take, ci == len(chunks) - 1,
                           seq)
                    seq += 1

        out_s: List[List[float]] = []
        out_i: List[List[str]] = []
        expect_seq = 0

        def dispatch(item):
            chunk_i, chunk_w, take, last, seq = item
            return (self._dispatch_encoded(plan, chunk_i, chunk_w), take,
                    last, seq)

        def resolve(handle):
            nonlocal out_s, out_i, expect_seq
            packed, take, last, seq = handle
            # batch-boundary accumulation REQUIRES submit-order resolution:
            # the rows appended between two 'last' flags are one input
            # batch's only because pipeline_dispatch resolves FIFO. Guard
            # against a future reorder (per-sub-chunk lookahead, work
            # stealing) silently corrupting batch boundaries (VERDICT r3
            # weak #6).
            assert seq == expect_seq, (
                f"stream resolved chunk {seq} out of order "
                f"(expected {expect_seq})")
            expect_seq += 1
            s_c, i_c = self._resolve_encoded(packed, take, plan["wire"])
            out_s.extend(s_c)
            out_i.extend(i_c)
            if last:
                done_s, done_i = out_s, out_i
                out_s, out_i = [], []
                return done_s, done_i
            return None

        yield from pipeline_dispatch(submit(), dispatch, resolve, lookahead)

    # ---- search internals (plan / dispatch / resolve) ------------------------
    def _search_plan(self, mesh, backend: str, depth: int,
                     wire: str = "i32", doc_filter=None) -> dict:
        """Resolve backend + device matrix + chunk budget once per search."""
        # doc_filter composes with BOTH wires (round 10, VERDICT r4 #8):
        # on compact48 the mask's -inf clamps to score 0 in the 48-bit
        # pack and the resolve's score<=0 drop removes it — identical
        # semantics for this engine's non-negative integer scores.
        if backend == "auto":
            backend = "taat" if jax.default_backend() == "tpu" else "matmul"
        if backend not in ("taat", "matmul"):
            raise ValueError(
                f"unknown impact backend {backend!r}: expected 'auto', "
                f"'taat', or 'matmul'")
        if wire not in ("i32", "compact48"):
            raise ValueError(f"unknown wire {wire!r}: 'i32' or 'compact48'")
        if wire == "compact48":
            if mesh is not None:
                raise ValueError("wire='compact48' is single-chip only "
                                 "(the sharded programs keep the i32 wire)")
            if not self._int16_exact():
                raise ValueError(
                    "wire='compact48' needs integer doc weights < 2^15 "
                    "(scores must be integers for the 24-bit lane)")
        # Two TAAT variants were built, measured, and DELETED: a shared-row
        # kernel (round 4 — one DMA per DISTINCT tile term; 206-258 ms/batch
        # vs plain taat's 86-92 even on its best-case high-duplication
        # workload) and a head/tail split (round 5 — hottest df-ordered rows
        # via MXU matmul, compacted tail via the kernel; 0.86-0.93x plain
        # taat at the headline shape). Numbers in BASELINE.md.
        use_taat = backend == "taat"
        dtype = "i16" if use_taat and self._int16_exact() else "f32"
        dev = self._materialize(mesh, dtype, kernel_layout=use_taat)
        # dev: 2-D [T+1, N] (matmul), 3-D [T+1, s, sub] (single-chip TAAT),
        # or 4-D [D, T+1, s, shard/s] (mesh TAAT)
        n_pad = dev.shape[0] * dev.shape[2] * dev.shape[3] if dev.ndim == 4 \
            else int(np.prod(dev.shape[1:]))
        if wire == "compact48" and n_pad >= 2 ** 23:
            # the wire's doc-position lane is 23 bits; a low-term-count
            # corpus can exceed that under the HBM budget
            raise ValueError(
                f"wire='compact48' supports < 2^23 doc columns "
                f"(padded corpus has {n_pad}); use the i32 wire")

        # The [B, N_pad] f32 score tensor (plus ~2x top_k scratch) must fit
        # beside the matrix; wide corpora chunk the query batch.
        shards = mesh.shape[DATA_AXIS] if mesh is not None else 1
        resident = sum(d.nbytes for d in self._dev.values())  # ALL cached forms
        score_budget = self.hbm_budget_bytes - resident // shards
        # measured on v5e: XLA's top_k lowering holds ~5x the score tensor
        # (sort operands + iota + masked copies); 6x leaves headroom
        per_query = (n_pad // shards) * 4 * 6
        max_b = max(8, int(score_budget // max(per_query, 1)) // 8 * 8)
        mask_dev = None
        if doc_filter is not None:
            mask_dev = doc_filter.device_mask(n_pad, mesh)
        return dict(backend=backend, dev=dev, mesh=mesh, max_b=max_b,
                    k=min(depth, self._n_valid), wire=wire, mask=mask_dev)

    def _check_wire(self, plan, q_w) -> None:
        """compact48 wire preconditions on the query side: integer weights
        (integer x integer scores land on the 24-bit score lane exactly),
        and a proof that no score can reach 2^24 — the pack would otherwise
        clamp, silently collapsing the top of the ranking to tie order.
        The bound is (max doc weight) x (max per-query weight sum):
        conservative (attained only if one doc held every query term at the
        corpus-max weight) but exact and O(batch)."""
        if plan["wire"] != "compact48" or q_w.size == 0:
            return
        if not np.all(q_w == np.rint(q_w)):
            raise ValueError("wire='compact48' needs integer query weights "
                             "(got fractional values)")
        if getattr(self, "_max_doc_w_src", None) is not self.doc_weights:
            self._max_doc_w = float(self.doc_weights.max()) \
                if self.doc_weights.size else 0.0
            self._max_doc_w_src = self.doc_weights
        bound = float(np.maximum(q_w, 0).sum(axis=1).max()) * self._max_doc_w
        if bound >= 2 ** 24:
            raise ValueError(
                f"wire='compact48' cannot prove scores < 2^24 for this "
                f"batch (worst-case bound {bound:.4g}); use the i32 wire — "
                f"scores that large are also outside the f32 integer-"
                f"exactness envelope")

    def _chunk_queries(self, plan, q_idx, q_w):
        """Split a batch into dispatchable chunks: (chunk_i, chunk_w, take)
        with a single compiled shape (the tail chunk is zero-padded)."""
        b = q_idx.shape[0]
        max_b = plan["max_b"]
        if b <= max_b:
            yield q_idx, q_w, b
            return
        for start in range(0, b, max_b):
            chunk_i = q_idx[start:start + max_b]
            chunk_w = q_w[start:start + max_b]
            if chunk_i.shape[0] < max_b:  # keep one compiled shape
                pad_n = max_b - chunk_i.shape[0]
                chunk_i = np.concatenate(
                    [chunk_i, np.zeros((pad_n, chunk_i.shape[1]),
                                       chunk_i.dtype)])
                chunk_w = np.concatenate(
                    [chunk_w, np.zeros((pad_n, chunk_w.shape[1]),
                                       chunk_w.dtype)])
            yield chunk_i, chunk_w, min(max_b, b - start)

    def _compact_queries(self, q_idx, q_w):
        """int16 (idx, weight) upload form when exactly representable —
        halves the host->device query bytes, the dominant per-batch cost on
        thin host links; the jitted scorer upcasts on device. ``None`` when
        the batch doesn't fit int16 (stays on the int32/f32 path)."""
        if len(self.term_to_idx) >= 32767 or q_idx.size == 0:
            return None
        if np.abs(q_w).max() >= 32767 or not np.all(q_w == np.rint(q_w)):
            return None
        return q_idx.astype(np.int16), q_w.astype(np.int16)

    def _dispatch_encoded(self, plan, q_idx, q_w):
        """Enqueue the device program for one chunk (b <= max_b); returns
        the packed [B, 2k] result array WITHOUT a host sync (the pipelining
        point). Single-chip query arrays go through an explicit async
        ``device_put`` first — calling the jit with numpy args transfers
        synchronously through thin-link relays, which would serialize the
        upload with the previous chunk's compute."""
        backend, dev, mesh, k = (plan["backend"], plan["dev"], plan["mesh"],
                                 plan["k"])
        mask = plan.get("mask")
        if backend == "taat":
            from mllm_sparse_retrieval_tpu.ops.impact_kernel import QUERY_TILE
            b = q_idx.shape[0]
            pad = (-b) % QUERY_TILE
            if pad:
                q_idx = np.concatenate(
                    [q_idx, np.zeros((pad, q_idx.shape[1]), q_idx.dtype)])
                q_w = np.concatenate(
                    [q_w, np.zeros((pad, q_w.shape[1]), q_w.dtype)])
            if mesh is None:
                compact = self._compact_queries(q_idx, q_w)
                if compact is not None:
                    q_idx, q_w = compact
                q_idx = jax.device_put(q_idx)
                q_w = jax.device_put(q_w)
                if mask is not None:
                    fn = _taat_topk48_filtered \
                        if plan["wire"] == "compact48" else \
                        _taat_topk_filtered
                    return fn(dev, q_idx, q_w, mask, self._n_valid, k)
                fn = _taat_topk48 if plan["wire"] == "compact48" \
                    else _taat_topk
                return fn(dev, q_idx, q_w, self._n_valid, k)
            q_idx, q_w = (replicated(mesh, q_idx), replicated(mesh, q_w))
            if mask is not None:
                return _sharded_taat_topk_filtered(mesh, dev, q_idx, q_w,
                                                   mask, self._n_valid, k)
            return _sharded_taat_topk(mesh, dev, q_idx, q_w,
                                      self._n_valid, k)
        if mesh is None:
            compact = self._compact_queries(q_idx, q_w)
            if compact is not None:
                q_idx, q_w = compact
            q_idx = jax.device_put(q_idx)
            q_w = jax.device_put(q_w)
            if mask is not None:
                fn = _impact_topk48_filtered \
                    if plan["wire"] == "compact48" else _impact_topk_filtered
                return fn(dev, q_idx, q_w, mask, self._n_valid, k)
            fn = _impact_topk48 if plan["wire"] == "compact48" \
                else _impact_topk
            return fn(dev, q_idx, q_w, self._n_valid, k)
        q_idx, q_w = (replicated(mesh, q_idx), replicated(mesh, q_w))
        if mask is not None:
            return _sharded_impact_topk_filtered(mesh, dev, q_idx, q_w, mask,
                                                 self._n_valid, k)
        return _sharded_impact_topk(mesh, dev, q_idx, q_w, self._n_valid, k)

    def _resolve_encoded(self, packed_dev, b, wire: str = "i32"
                         ) -> Tuple[List[List[float]], List[List[str]]]:
        """Host sync + ragged conversion (zero-score docs dropped).

        Vectorized: this runs once per in-flight chunk in the serving
        pipeline, so per-row Python loops here would serialize with device
        compute (measured ~70 ms/4096-query batch as list comprehensions —
        more than the kernel itself). Fancy-indexing a cached doc-id array
        and trimming only rows that actually contain zero scores keeps it
        ~5 ms."""
        unpack = _unpack_results48 if wire == "compact48" else _unpack_results
        scores, idx = unpack(np.asarray(packed_dev)[:b])
        # cache keyed on the list OBJECT (invalidated explicitly in add()):
        # a same-length replacement of the public ``doc_ids`` must not serve
        # stale ids. ``doc_ids`` is immutable after the first search —
        # mutate membership only through add()/load() (ADVICE r3).
        if getattr(self, "_doc_ids_arr_src", None) is not self.doc_ids or \
                len(self._doc_ids_arr) != len(self.doc_ids):
            self._doc_ids_arr = np.asarray(self.doc_ids)
            self._doc_ids_arr_src = self.doc_ids
        # -inf fill rows (doc_filter allowing < k docs) carry ARBITRARY
        # column indices on TPU (equal-score tie order, CLAUDE.md), which
        # can land in the padding columns >= n_valid — clamp before the
        # fancy index; the score<=0 drop below removes those rows anyway
        idx = np.minimum(idx, len(self._doc_ids_arr) - 1)
        ids_rows = self._doc_ids_arr[idx]       # [b, k] str array
        out_scores = scores.tolist()
        out_ids = ids_rows.tolist()
        if scores.size and scores.min() <= 0.0:
            for row in np.nonzero((scores <= 0.0).any(axis=1))[0]:
                pos = scores[row] > 0.0
                out_scores[row] = scores[row][pos].tolist()
                out_ids[row] = ids_rows[row][pos].tolist()
        return out_scores, out_ids

    # ---- persistence ---------------------------------------------------------------
    def save(self, directory: str) -> None:
        self._ensure_finalized()
        os.makedirs(directory, exist_ok=True)
        keys = list(self.term_to_idx.keys())
        with open(os.path.join(directory, "terms.json"), "w") as f:
            json.dump({"keys": keys, "doc_ids": self.doc_ids,
                       "query_canonical": self.query_canonical}, f)
        np.savez(
            os.path.join(directory, "index.npz"),
            doc_terms=self.doc_terms,
            doc_weights=self.doc_weights,
            csr_offsets=self.csr_offsets,
            csr_docs=self.csr_docs,
            csr_weights=self.csr_weights,
        )

    @classmethod
    def load(cls, directory: str) -> "ImpactIndex":
        index = cls()
        with open(os.path.join(directory, "terms.json")) as f:
            meta = json.load(f)
        index.term_to_idx = {k: i for i, k in enumerate(meta["keys"])}
        index.doc_ids = [str(d) for d in meta["doc_ids"]]
        index.query_canonical = bool(meta.get("query_canonical", False))
        data = np.load(os.path.join(directory, "index.npz"))
        index.doc_terms = data["doc_terms"]
        index.doc_weights = data["doc_weights"]
        index.csr_offsets = data["csr_offsets"]
        index.csr_docs = data["csr_docs"]
        index.csr_weights = data["csr_weights"]
        # reconstruct doc vectors lazily only if add() is called again
        index._doc_vectors = [None] * len(index.doc_ids)  # type: ignore
        return index

    # ---- interchange with reference artifact formats ---------------------------------
    @classmethod
    def from_jsonl(cls, paths: Sequence[str], use_native: bool = True
                   ) -> "ImpactIndex":
        """Build from reference ``corpus_*.jsonl`` files
        (``{"id", "content", "vector": {token: weight}}`` documents,
        /root/reference/src/encode.py:353-359).

        Uses the C++ builder (index/native) when available — it parses,
        interns, packs, and impact-sorts in one pass — falling back to the
        pure-Python path otherwise. Both produce identical layouts.
        """
        if use_native:
            from mllm_sparse_retrieval_tpu.index import native
            if native.available():
                builder = native.NativeImpactBuilder()
                for path in paths:
                    builder.add_jsonl_file(path)
                return cls._from_packed(builder.finalize())
        index = cls()
        for path in paths:
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    doc = json.loads(line)
                    index.add(doc["id"], doc["vector"])
        index.finalize()
        return index

    @classmethod
    def _from_packed(cls, packed: dict) -> "ImpactIndex":
        index = cls()
        index.term_to_idx = {k: i for i, k in enumerate(packed["term_keys"])}
        index.doc_ids = list(packed["doc_ids"])
        index.doc_terms = packed["doc_terms"]
        index.doc_weights = packed["doc_weights"]
        index.csr_offsets = packed["csr_offsets"]
        index.csr_docs = packed["csr_docs"]
        index.csr_weights = packed["csr_weights"]
        index._doc_vectors = [None] * len(index.doc_ids)  # type: ignore
        index._reorder_terms_by_df()  # same hot-first pass as finalize()
        return index

# Jitted device programs live in ops/score_programs (a stable leaf module:
# line shifts HERE must not re-key the minutes-long Pallas compiles there).
from mllm_sparse_retrieval_tpu.ops.score_programs import (  # noqa: E402
    _impact_topk, _impact_topk48, _impact_topk48_filtered,
    _impact_topk_filtered, _masked_topk, _sharded_scatter_fn,
    _taat_topk48_filtered,
    _pack_results, _query_table, _scatter_block, _scores_from_matrix,
    _sharded_impact_topk, _sharded_impact_topk_filtered,
    _sharded_merge_topk, _sharded_taat_topk, _sharded_taat_topk_filtered,
    _sharded_topk_fn, _taat_scores, _taat_topk, _taat_topk48,
    _taat_topk_filtered, _unpack_results)
from mllm_sparse_retrieval_tpu.ops.packing import (  # noqa: E402
    unpack_topk48 as _unpack_results48)

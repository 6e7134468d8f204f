"""Arena live indexes: mutate-while-serving at static-search cost.

The segment design (index/live.py) is Lucene's answer to a CPU constraint:
packed posting lists are immutable, so updates become new segments and
every search pays base + N delta round trips plus a host merge. On this
relay-attached TPU that costs +62% (base only) to +690% (4 deltas) over a
static index (tools/live_ab.py, BASELINE.md) — each delta segment is
another ~30 ms dispatch + fetch, serialized with the host merge.

The TPU device matrix has neither constraint: it is a dense HBM buffer
that supports in-place scatter. The arena design exploits that:

- **Reserved capacity.** The device matrix is allocated with headroom
  (spare doc columns; for the impact matrix also spare TERM rows),
  all-zero. Reserved slots are invisible: zero impact scores are dropped
  at resolve (the Lucene "only matching docs" rule), and dense searches
  always carry the live-mask filter.
- **add = donated scatter.** New documents scatter their weights (impact:
  CSR triples via `ImpactIndex.scatter_append_triples`; dense: a
  `dynamic_update_slice` row block) into the reserved region of every
  cached device matrix IN PLACE. Compiled program shapes never change, so
  the warm executables — including the minutes-to-compile Pallas TAAT
  kernel — keep serving.
- **delete = tombstone bit (+ zeroed columns for impact).** Deletes clear
  a host-side live-mask bit. The IMPACT arena additionally scatters zeros
  over the dead doc's populated (term row, doc column) cells in every
  cached device matrix: impact scores are non-negative and zero-score
  docs are dropped at resolve, so single-chip searches serve the
  UNFILTERED static program — tombstones or not — at bit-identical static
  cost with no compact48 wire downgrade. The DENSE arena (zero inner
  products can outrank negative true scores) and MESH searches (mutations
  drop sharded forms) pass the mask as a
  :class:`~..index.filter.DocFilter` (already-compiled filtered program
  variants). `add_documents` has Lucene ``updateDocument`` semantics:
  re-adding an id tombstones the old copy.
- **compact = rebuild.** When capacity (docs or terms) runs out, the arena
  repacks live documents into a fresh inner index with doubled-as-needed
  headroom (the only O(corpus) event; device re-placement is the round-4
  CSR scatter, seconds at 200k docs).

Concurrency: a fair reader-writer lock — searches are READERS (they hold
device buffer references across a pipelined dispatch loop), mutations are
WRITERS (their scatters DONATE those buffers, which would invalidate a
concurrent reader's reference mid-pipeline). Writers wait for in-flight
searches to drain and block new ones (bounded: one batch pipeline), so
the donated update is always safe; readers run concurrently with each
other. Search results are near-real-time in the Lucene sense: whatever
state the search snapshot saw when it acquired the read lock.

Mesh note (round 10, VERDICT r4 #7): mutations are incremental under a
mesh too. Doc columns (impact) and corpus rows (dense) map to shards
STATICALLY, so adds route their triples/rows to the owning shard and a
shard_map scatter (impact: `ops.score_programs._sharded_scatter_fn`;
dense: a masked row-window update that preserves the row sharding) writes
them device-local into the donated sharded buffers — O(mutation) work,
no O(corpus) re-placement, warm sharded executables keep serving. Impact
deletes zero dead columns through the same sharded scatter, so mesh
searches serve the UNFILTERED static program exactly like single-chip.

Same serving surface as the segment classes (`add_documents`,
`delete_documents`, `search_rows`, `compact`, `num_docs`,
`num_segments` (== 1), `save`/`load`, `close`, `wait_compacted`), so
`serving.service` accepts either via the ``live_capable`` protocol flag.
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import threading
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
from mllm_sparse_retrieval_tpu.index.filter import DocFilter
from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex


def _pow2_at_least(n: int, minimum: int) -> int:
    b = max(int(minimum), 1)
    while b < n:
        b *= 2
    return b


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _RWLock:
    """No-starvation reader-writer lock (turnstile pattern): readers
    share; a WAITING writer holds the turnstile so new readers queue
    behind it (bounded writer wait = one in-flight batch pipeline), and a
    releasing writer must re-queue through the turnstile behind any
    waiting readers (a continuous writer cannot starve searches — the
    condition-variable version of this lock did exactly that under the
    concurrent-mutation test). Not reentrant in either direction."""

    def __init__(self):
        self._turnstile = threading.Lock()
        self._readers_mu = threading.Lock()
        self._readers = 0
        self._wlock = threading.Lock()

    @contextlib.contextmanager
    def read(self):
        with self._turnstile:        # queue behind any waiting writer
            pass
        with self._readers_mu:
            self._readers += 1
            if self._readers == 1:
                self._wlock.acquire()
        try:
            yield
        finally:
            with self._readers_mu:
                self._readers -= 1
                if self._readers == 0:
                    self._wlock.release()

    @contextlib.contextmanager
    def write(self):
        with self._turnstile:        # blocks new readers while we wait
            self._wlock.acquire()
        try:
            yield
        finally:
            self._wlock.release()


# ---- tiny device programs for the dense arena --------------------------------
# Plain-XLA, seconds to compile; `start` rides as a traced scalar so every
# append offset shares ONE executable per (corpus shape, block shape).

@functools.partial(jax.jit, donate_argnums=(0,))
def _rows_update(corpus, rows, start):
    return lax.dynamic_update_slice(corpus, rows, (start, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _vec_update(vec, vals, start):
    return lax.dynamic_update_slice(vec, vals, (start,))


# Mesh variants (round 10, VERDICT r4 #7): a masked row-window update
# instead of dynamic_update_slice — each device reads the (replicated)
# small row block and rewrites only its own shard of the row-sharded
# corpus, so GSPMD keeps the output sharding equal to the donated input's
# with no gather/halo traffic. O(capacity x d) device bandwidth per append
# (~1 ms at 200k x 512 f32 on v5e HBM), O(block) host->device bytes.

@functools.partial(jax.jit, donate_argnums=(0,))
def _rows_update_masked(corpus, rows, start):
    n, m = corpus.shape[0], rows.shape[0]
    i = lax.broadcasted_iota(jnp.int32, (n,), 0)
    sel = jnp.clip(i - start, 0, m - 1)
    mask = (i >= start) & (i < start + m)
    return jnp.where(mask[:, None], rows[sel], corpus)


@functools.partial(jax.jit, donate_argnums=(0,))
def _vec_update_masked(vec, vals, start):
    n, m = vec.shape[0], vals.shape[0]
    i = lax.broadcasted_iota(jnp.int32, (n,), 0)
    sel = jnp.clip(i - start, 0, m - 1)
    mask = (i >= start) & (i < start + m)
    return jnp.where(mask, vals[sel], vec)


class _ArenaBase:
    """Shared lock/tombstone/position bookkeeping."""

    live_capable = True           # serving.service protocol flag

    def __init__(self):
        self._rw = _RWLock()
        self._live = np.zeros(0, np.bool_)   # per-position liveness
        self._pos: Dict[str, int] = {}       # id -> its ONE live position
        self._tomb_count = 0
        self._filter: Optional[DocFilter] = None

    @property
    def num_docs(self) -> int:
        return len(self._pos)

    @property
    def num_segments(self) -> int:
        return 1

    def delete_documents(self, ids: Sequence[str]) -> int:
        with self._rw.write():
            dead: List[int] = []
            for i in ids:
                pos = self._pos.pop(str(i), None)
                if pos is not None:
                    self._live[pos] = False
                    dead.append(pos)
            if dead:
                self._tomb_count += len(dead)
                self._filter = None
                self._on_tombstoned(dead)
            return len(dead)

    def _tombstone_for_update(self, new_ids) -> None:
        """updateDocument semantics (caller holds the write lock)."""
        dead: List[int] = []
        for i in new_ids:
            pos = self._pos.pop(i, None)
            if pos is not None:
                self._live[pos] = False
                dead.append(pos)
        if dead:
            self._tomb_count += len(dead)
            self._filter = None
            self._on_tombstoned(dead)

    def _on_tombstoned(self, positions: List[int]) -> None:
        """Subclass hook, called under the write lock with the positions
        that just went dead. Default: nothing (the live-mask DocFilter
        handles exclusion)."""
        return None

    def _live_filter(self) -> DocFilter:
        """Cached allow-mask over current positions (called under the read
        lock; the build is an idempotent snapshot)."""
        f = self._filter
        if f is None:
            f = self._filter = DocFilter(self._live.copy())
        return f

    # segment-API compatibility: arena compaction is inline and bounded
    def wait_compacted(self, timeout: float = 30.0) -> None:
        return None

    def close(self) -> None:
        return None


class ArenaImpactIndex(_ArenaBase):
    """Mutable impact index over one capacity-reserved ``ImpactIndex``.

    ``doc_headroom`` / ``term_headroom``: reserved space beyond the current
    corpus; exceeding either triggers an inline compact-and-grow. The
    inner index's device cache is dropped on adoption (its matrices were
    sized without headroom) and rebuilt with capacity on the next search.
    """

    _KIND = "impact-arena"

    def __init__(self, base: Optional[ImpactIndex] = None, *,
                 doc_headroom: int = 8192,
                 term_headroom: Optional[int] = None,
                 query_canonical: Optional[bool] = None,
                 term_keys: Optional[str] = None,
                 background_compaction: bool = False):  # accepted, inline
        super().__init__()
        inner = base if base is not None else ImpactIndex()
        inner._ensure_finalized()
        if query_canonical is None:
            query_canonical = bool(getattr(inner, "query_canonical", False))
        self.query_canonical = bool(query_canonical)
        inner.query_canonical = self.query_canonical
        if term_keys not in (None, "int", "str"):
            raise ValueError(f"term_keys must be 'int' or 'str', "
                             f"got {term_keys!r}")
        self._term_keys_default = term_keys or "int"
        self.doc_headroom = int(doc_headroom)
        # reserved term ROWS are free for the TAAT kernel (it walks only
        # the query's rows) but the matmul backend's table x matrix cost
        # scales with the row capacity — default the headroom adaptive so
        # small-vocab corpora don't pay a large fixed multiple
        self.term_headroom = None if term_headroom is None \
            else int(term_headroom)
        self._adopt(inner)

    def _term_headroom(self, t: int) -> int:
        return self.term_headroom if self.term_headroom is not None \
            else max(1024, t // 8)

    def _adopt(self, inner: ImpactIndex) -> None:
        """Install ``inner`` as the arena store (fresh capacities, fresh
        bookkeeping). Caller holds the write lock (or is the ctor)."""
        inner.drop_device_cache()
        n = inner.num_docs
        t = len(inner.term_to_idx)
        inner.doc_capacity = n + self.doc_headroom
        inner.term_capacity = t + self._term_headroom(t)
        self._inner = inner
        self._pend_count = 0           # docs appended since the CSR build
        self._live = np.ones(n, np.bool_)
        self._pos = {d: i for i, d in enumerate(inner.doc_ids)}
        self._tomb_count = 0
        self._filter = None

    # -- protocol mirrors ------------------------------------------------------
    @property
    def int_keyed(self) -> bool:
        if not self._inner.term_to_idx and not self._inner.num_docs:
            return self._term_keys_default == "int"
        return self._inner.int_keyed

    @property
    def term_to_idx(self):
        """The live term-key space (the serving warm-up and key-coercion
        consumers read this; grows with appended documents)."""
        return self._inner.term_to_idx

    # -- updates ---------------------------------------------------------------
    def add_documents(self, docs: Sequence[Tuple[str, Dict]]) -> None:
        """Add (or replace — latest wins) ``(doc_id, sparse term dict)``
        documents. Weights follow ``ImpactIndex.add`` semantics (``int``
        truncation, non-positive dropped)."""
        if not docs:
            return
        last: Dict[str, Dict] = {}
        for doc_id, vec in docs:                              # last wins
            last[str(doc_id)] = {k: int(v) for k, v in vec.items()
                                 if int(v) > 0}
        with self._rw.write():
            inner = self._inner
            t2i = inner.term_to_idx
            new_keys: List = []
            seen: Set = set()
            for vec in last.values():
                for k in vec:
                    if k not in t2i and k not in seen:
                        seen.add(k)
                        new_keys.append(k)
            m = len(last)
            if (len(inner.doc_ids) + m > inner.doc_capacity or
                    len(t2i) + len(new_keys) > inner.term_capacity):
                self._grow(extra_docs=m, extra_terms=len(new_keys))
                inner = self._inner
                t2i = inner.term_to_idx
            for k in new_keys:
                t2i[k] = len(t2i)

            ids = list(last)
            self._tombstone_for_update(ids)
            start = len(inner.doc_ids)
            k_have = inner.doc_terms.shape[1]
            k_need = max((len(v) for v in last.values()), default=1)
            if k_need > k_have:
                pad = ((0, 0), (0, k_need - k_have))
                inner.doc_terms = np.pad(inner.doc_terms, pad)
                inner.doc_weights = np.pad(inner.doc_weights, pad)
                k_have = k_need
            dt = np.zeros((m, k_have), np.int32)
            dw = np.zeros((m, k_have), np.float32)
            for r, vec in enumerate(last.values()):
                for c, (k, w) in enumerate(vec.items()):
                    dt[r, c] = t2i[k]
                    dw[r, c] = w
            inner.doc_terms = np.concatenate([inner.doc_terms, dt])
            inner.doc_weights = np.concatenate([inner.doc_weights, dw])
            inner.doc_ids.extend(ids)
            inner._doc_ids_arr_src = None
            self._live = np.concatenate([self._live, np.ones(m, np.bool_)])
            for r, i in enumerate(ids):
                self._pos[i] = start + r
            self._filter = None
            self._pend_count += m

            # flat triples for the in-place device scatter
            rows = np.nonzero(dw > 0)
            tr_terms = dt[rows]
            tr_cols = (rows[0] + start).astype(np.int32)
            tr_vals = dw[rows]
            # int16-exactness can only DEGRADE with appends: if these
            # weights overflow int16, the cached i16 kernel matrices can no
            # longer represent the corpus — drop them (the next TAAT search
            # folds + rebuilds as f32)
            if tr_vals.size and tr_vals.max() >= 32767.5:
                inner._i16_ok = False
                for key in list(inner._dev or {}):
                    if key.startswith("i16"):
                        del inner._dev[key]
            inner.scatter_append_triples(tr_terms, tr_cols, tr_vals)

    def _grow(self, extra_docs: int = 0, extra_terms: int = 0) -> None:
        """Compact live docs into a fresh inner index with new headroom
        (caller holds the write lock). The only O(corpus) mutation."""
        inner = self._inner
        live = self._live
        merged = ImpactIndex.from_packed_arrays(
            inner.doc_terms[live], inner.doc_weights[live],
            doc_ids=np.asarray(inner.doc_ids)[live].tolist(),
            term_keys=list(inner.term_to_idx))
        merged._reorder_terms_by_df()      # hot-first ids for the TAAT cache
        merged.query_canonical = self.query_canonical
        merged.hbm_budget_bytes = inner.hbm_budget_bytes
        self.doc_headroom = max(self.doc_headroom, extra_docs)
        if extra_terms > self._term_headroom(len(merged.term_to_idx)):
            self.term_headroom = extra_terms
        self._adopt(merged)

    def compact(self) -> None:
        with self._rw.write():
            if self._tomb_count:
                self._grow()
            elif self._pend_count:
                self._fold_pending()

    # -- tombstones = zeroed doc columns ----------------------------------------
    # Impact scores are non-negative and zero-score docs are dropped at
    # resolve (the Lucene "only matching docs" rule, ImpactIndex line
    # ~139/_resolve_encoded) — so scattering ZEROS over a tombstoned doc's
    # (term row, doc column) cells removes it from every cached device
    # matrix outright. Searches then serve the UNFILTERED static program
    # even with tombstones: no filtered program variant, no compact48 ->
    # i32 wire downgrade, bit-identical static cost. Since round 10 this
    # covers MESH forms too — the per-shard sharded scatter routes the
    # zero-writes to the owning shard (VERDICT r4 #7).

    def _on_tombstoned(self, positions: List[int]) -> None:
        inner = self._inner
        if not inner._dev:
            return
        self._scatter_zeros(positions)

    def _scatter_zeros(self, positions: Sequence[int]) -> None:
        """Write zeros over the given doc positions' populated cells in
        every cached single-chip device matrix (caller holds the write
        lock). Idempotent."""
        inner = self._inner
        pos = np.asarray(list(positions), np.int64)
        if pos.size == 0:
            return
        rows_t = inner.doc_terms[pos]          # [m, k] term idx (pad = 0)
        rows_w = inner.doc_weights[pos]        # [m, k] weights (pad = 0)
        ri, ci = np.nonzero(rows_w > 0)
        if ri.size == 0:
            return
        inner.scatter_append_triples(
            rows_t[ri, ci], pos[ri].astype(np.int32),
            np.zeros(ri.size, np.float32))

    def _dead_positions(self) -> np.ndarray:
        return np.nonzero(~self._live)[0]

    def _fold_pending(self) -> None:
        """Rebuild the inner CSR from the (already-appended) packed rows so
        a FRESH device materialization sees every doc; cached device forms
        already hold the appended triples (the scatter invariant) and are
        preserved across the rebuild. Caller holds the write lock."""
        inner = self._inner
        dev, mesh = inner._dev, inner._mesh
        inner._build_csr()                 # resets _dev/_i16_ok
        inner._dev, inner._mesh = dev, mesh
        self._pend_count = 0

    # -- search ------------------------------------------------------------------
    def search_rows(self, terms_list: Sequence[Dict], depth: int,
                    mesh=None, backend: str = "auto", wire: str = "i32"
                    ) -> Tuple[List[List[float]], List[List[str]]]:
        """Batch impact search over live documents (the ragged-row
        ``ImpactIndex.search`` contract). This IS the static search
        program, tombstones or not, on single chip AND under a mesh —
        deletes zeroed the dead doc columns in place in every cached form
        (see `_on_tombstoned`; mesh forms via the per-shard sharded
        scatter), so no filtered variant and no wire downgrade."""
        for _ in range(4):
            if self._needs_fold(mesh, backend):
                # a fresh device form would be built from the (stale) CSR:
                # fold the appended rows in and materialize the form NOW,
                # under the write lock — so add-scatters racing later
                # searches always see (and cover) every cached form. A fresh
                # SINGLE-CHIP form is rebuilt from a CSR that still contains
                # tombstoned docs: re-zero the dead columns (idempotent over
                # already-zeroed cached forms) so deletes never resurrect.
                with self._rw.write():
                    self._fold_and_materialize(mesh, backend)
            with self._rw.read():
                inner = self._inner
                if not inner.num_docs:
                    return ([[] for _ in terms_list],
                            [[] for _ in terms_list])
                if self._form_stale(mesh, backend):
                    # a write between the unlocked _needs_fold check and
                    # this read lock invalidated the form this search plan
                    # resolves to (e.g. an add with weight >= 32768 dropped
                    # the cached i16 forms): materializing it HERE would
                    # rebuild from the CSR under only the read lock — no
                    # re-zero of tombstoned columns, deletes resurrect
                    # (ADVICE r4). Loop back to the write-side path.
                    continue
                return self._search_locked(terms_list, depth, mesh,
                                           backend, wire)
        # pathological writer churn: run the search exclusively — no racing
        # invalidation is possible under the write lock.
        with self._rw.write():
            self._fold_and_materialize(mesh, backend)
            if not self._inner.num_docs:
                return [[] for _ in terms_list], [[] for _ in terms_list]
            return self._search_locked(terms_list, depth, mesh, backend,
                                       wire)

    def _fold_and_materialize(self, mesh, backend: str) -> None:
        """Write-side form preparation: fold appended rows into the CSR,
        materialize the form this search plan resolves to, and re-zero
        tombstoned columns on a fresh form (single-chip AND mesh — the
        sharded scatter routes zeros per shard, round 10). Caller holds
        the write lock."""
        if self._pend_count:
            self._fold_pending()
        dtype, kernel = self._resolve_form(backend)
        if self._inner.num_docs:
            self._inner._materialize(mesh, dtype, kernel)
            if self._tomb_count:
                self._scatter_zeros(self._dead_positions())

    def _search_locked(self, terms_list, depth, mesh, backend: str,
                       wire: str):
        """The search body; caller holds the read or write lock and has
        verified the device form is current. Serves the UNFILTERED static
        program on single chip AND mesh alike: deletes zeroed the dead doc
        columns in place in every cached form (mesh forms via the
        per-shard sharded scatter, round 10), so no filtered variant and
        no wire downgrade anywhere."""
        inner = self._inner
        q_idx, q_w = inner.encode_queries(terms_list)
        return inner.search_encoded(q_idx, q_w, depth, mesh=mesh,
                                    backend=backend, wire=wire)

    def _resolve_form(self, backend: str) -> Tuple[str, bool]:
        """(dtype, kernel_layout) the search plan will materialize —
        mirrors ``ImpactIndex._search_plan``'s backend resolution."""
        if backend == "auto":
            backend = "taat" if jax.default_backend() == "tpu" else "matmul"
        use_taat = backend == "taat"
        dtype = "i16" if use_taat and self._inner._int16_exact() else "f32"
        return dtype, use_taat

    def _form_stale(self, mesh, backend: str) -> bool:
        """Precise under-lock staleness check: True when `search_encoded`
        would MATERIALIZE a device form (rather than hit the cache) — i.e.
        the scatter invariant does not cover this search. Unlike
        `_needs_fold` this is exact for mesh searches too (no conservative
        always-True), so it can gate a retry loop. Appended-but-unfolded
        rows (`_pend_count`) do NOT make cached forms stale: add-scatters
        already wrote them into every cached device matrix."""
        inner = self._inner
        if inner._dev is None or inner._mesh is not mesh:
            return True
        dtype, use_taat = self._resolve_form(backend)
        return (dtype + ("/kernel" if use_taat else "")) not in inner._dev

    def _needs_fold(self, mesh, backend: str) -> bool:
        """True when this search would materialize a device form the
        append scatters have not covered (fresh form or mesh switch).
        Cached MESH forms are covered too since round 10 — appends and
        delete-zeroes scatter into them per shard in place."""
        inner = self._inner
        if inner._dev is None or inner._mesh is not mesh:
            return True
        dtype, use_taat = self._resolve_form(backend)
        key = dtype + ("/kernel" if use_taat else "")
        return key not in inner._dev

    # -- persistence ------------------------------------------------------------
    def save(self, directory: str) -> None:
        """Persist ONE compacted snapshot (live docs only). The arena's
        on-disk form is a plain ``ImpactIndex`` artifact + manifest —
        loading starts a fresh arena with full headroom."""
        with self._rw.write():
            os.makedirs(directory, exist_ok=True)
            inner = self._inner
            live = self._live
            snap = ImpactIndex.from_packed_arrays(
                inner.doc_terms[live], inner.doc_weights[live],
                doc_ids=np.asarray(inner.doc_ids)[live].tolist(),
                term_keys=list(inner.term_to_idx))
            snap.query_canonical = self.query_canonical
            snap.save(os.path.join(directory, "seg0"))
            with open(os.path.join(directory, "live.json"), "w") as f:
                json.dump({"kind": self._KIND,
                           "query_canonical": self.query_canonical,
                           "term_keys": self._term_keys_default,
                           "doc_headroom": self.doc_headroom,
                           "term_headroom": self.term_headroom}, f)

    @classmethod
    def load(cls, directory: str, **kwargs) -> "ArenaImpactIndex":
        with open(os.path.join(directory, "live.json")) as f:
            manifest = json.load(f)
        if manifest["kind"] != cls._KIND:
            raise ValueError(f"{directory} holds a {manifest['kind']!r} "
                             f"live index, expected {cls._KIND!r}")
        inner = ImpactIndex.load(os.path.join(directory, "seg0"))
        kw = {"query_canonical": manifest["query_canonical"],
              "term_keys": manifest.get("term_keys", "int"),
              "doc_headroom": manifest["doc_headroom"],
              "term_headroom": manifest["term_headroom"], **kwargs}
        return cls(inner, **kw)


class ArenaDenseIndex(_ArenaBase):
    """Mutable exact-MIPS index over one capacity-reserved
    ``DenseFlatIndex``. Reserved rows are zero vectors; every search
    carries the live-mask filter (zero inner products can outrank negative
    real scores, so — unlike the impact arena — the mask is always on)."""

    _KIND = "dense-arena"

    def __init__(self, base: Optional[DenseFlatIndex] = None, *,
                 dtype=np.float32, doc_headroom: int = 8192,
                 background_compaction: bool = False):  # accepted, inline
        super().__init__()
        inner = base if base is not None else DenseFlatIndex(dtype=dtype)
        self.dtype = "int8" if inner.q8 else inner.dtype
        self.doc_headroom = int(doc_headroom)
        self._adopt(inner)

    def _adopt(self, inner: DenseFlatIndex) -> None:
        inner._corpus_dev = None
        inner._row_scale_dev = None
        self._inner = inner
        self.dim = inner.dim
        # linear rounding, not power-of-two: the MIPS matmul's FLOPs scale
        # with the row capacity, and pow2 rounding can double them
        self._capacity = _round_up(inner.size + self.doc_headroom, 1024)
        self._live = np.ones(inner.size, np.bool_)
        self._pos = {d: i for i, d in enumerate(inner.lookup)}
        self._tomb_count = 0
        self._filter = None

    # -- device placement --------------------------------------------------------
    def _ensure_dev(self, mesh) -> None:
        """Build the capacity-padded corpus placement if absent (caller
        holds the WRITE lock — the build swaps inner device state)."""
        inner = self._inner
        if inner._corpus_dev is not None and inner._mesh is mesh:
            return
        d = self.dim
        corpus = (np.concatenate(inner._chunks) if inner._chunks
                  else np.zeros((0, d), np.float32))
        cap = self._capacity
        if mesh is not None:
            from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS
            n_shards = mesh.shape[DATA_AXIS]
            cap = -(-cap // n_shards) * n_shards
        if cap > corpus.shape[0]:
            corpus = np.concatenate(
                [corpus, np.zeros((cap - corpus.shape[0], d), np.float32)])
        row_scale = None
        if inner.q8:
            corpus, row_scale = DenseFlatIndex._quantize_rows(corpus)
        import jax.numpy as jnp
        if mesh is None:
            inner._corpus_dev = jnp.asarray(corpus, dtype=inner.dtype)
            inner._row_scale_dev = None if row_scale is None else \
                jnp.asarray(row_scale)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mllm_sparse_retrieval_tpu.parallel.mesh import DATA_AXIS
            inner._corpus_dev = jax.device_put(
                jnp.asarray(corpus, dtype=inner.dtype),
                NamedSharding(mesh, P(DATA_AXIS, None)))
            inner._row_scale_dev = None if row_scale is None else \
                jax.device_put(jnp.asarray(row_scale),
                               NamedSharding(mesh, P(DATA_AXIS)))
        inner._n_valid = cap
        inner._mesh = mesh

    # -- updates ---------------------------------------------------------------
    def add_documents(self, reps: np.ndarray, ids: Sequence[str]) -> None:
        """Add (or replace — latest wins) documents; duplicate ids within
        one call keep the LAST row (dict semantics, as in the segment
        class)."""
        reps = np.asarray(reps, np.float32)
        if reps.ndim != 2 or reps.shape[0] != len(ids):
            raise ValueError(f"reps must be [len(ids), d], got {reps.shape} "
                             f"for {len(ids)} ids")
        ids = [str(i) for i in ids]
        if len(set(ids)) != len(ids):
            keep = {i: j for j, i in enumerate(ids)}          # last wins
            sel = sorted(keep.values())
            reps, ids = reps[sel], [ids[j] for j in sel]
        with self._rw.write():
            inner = self._inner
            if self.dim is None:
                self.dim = inner.dim = reps.shape[1]
            elif reps.shape[1] != self.dim:
                raise ValueError(
                    f"dim mismatch: {reps.shape[1]} != {self.dim}")
            m = len(ids)
            if inner.size + m > self._capacity:
                self._grow(extra=m)
                inner = self._inner
            self._tombstone_for_update(ids)
            start = inner.size
            inner._chunks.append(reps)
            inner.lookup.extend(ids)
            inner._lookup_arr_src = None
            self._live = np.concatenate([self._live, np.ones(m, np.bool_)])
            for r, i in enumerate(ids):
                self._pos[i] = start + r
            self._filter = None
            self._device_append(reps, start)

    def _device_append(self, reps: np.ndarray, start: int) -> None:
        """Write appended rows into the placed corpus in place — single
        chip via dynamic_update_slice, mesh placements via the masked
        row-window update (`_rows_update_masked`, round 10: the block is
        replicated and each device rewrites only its own row shard, so
        the sharded placement and its warm executables survive every
        add). Caller holds the write lock. The row block is zero-padded
        to a power of two so appends of varying sizes share a handful of
        compiled updates; pad rows land on free capacity slots (the
        frontier is append-only)."""
        inner = self._inner
        if inner._corpus_dev is None:
            return
        mesh = inner._mesh
        cap = inner._corpus_dev.shape[0]
        m = reps.shape[0]
        block = min(_pow2_at_least(m, 64), cap - start)
        if block > m:
            reps = np.concatenate(
                [reps, np.zeros((block - m, reps.shape[1]), np.float32)])
        off = np.asarray(start, np.int32)
        row_fn, vec_fn = (_rows_update, _vec_update) if mesh is None \
            else (_rows_update_masked, _vec_update_masked)
        if mesh is None:
            stage = jax.device_put          # async single-chip upload
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(mesh, P())  # replicate the small block
            stage = lambda x: jax.device_put(x, rep)
        if inner.q8:
            q, scale = DenseFlatIndex._quantize_rows(reps)
            inner._corpus_dev = row_fn(
                inner._corpus_dev, stage(q), off)
            inner._row_scale_dev = vec_fn(
                inner._row_scale_dev, stage(scale), off)
            return
        rows = np.ascontiguousarray(np.asarray(reps, dtype=inner.dtype))
        inner._corpus_dev = row_fn(
            inner._corpus_dev, stage(rows), off)

    def _grow(self, extra: int = 0) -> None:
        """Caller holds the write lock."""
        inner = self._inner
        live = self._live
        corpus = (np.concatenate(inner._chunks) if inner._chunks
                  else np.zeros((0, self.dim or 0), np.float32))
        merged = DenseFlatIndex(dim=self.dim, dtype=self.dtype)
        if live.any():
            merged.add(corpus[live], np.asarray(inner.lookup)[live].tolist())
        self.doc_headroom = max(self.doc_headroom, extra)
        self._adopt(merged)

    def compact(self) -> None:
        with self._rw.write():
            if self._tomb_count:
                self._grow()

    # -- search ------------------------------------------------------------------
    def search_rows(self, q_reps: np.ndarray, depth: int,
                    batch_size: int = 128, mesh=None
                    ) -> Tuple[List[List[float]], List[List[str]]]:
        inner = self._inner
        if inner._corpus_dev is None or inner._mesh is not mesh:
            with self._rw.write():
                if self._pos:
                    self._ensure_dev(mesh)
        with self._rw.read():
            inner = self._inner
            if not self._pos:
                b = np.asarray(q_reps).shape[0]
                return [[] for _ in range(b)], [[] for _ in range(b)]
            self._ensure_dev(mesh)   # no-op unless a racing add dropped it
            doc_filter = self._live_filter()
            return inner.search_ids(q_reps, depth, batch_size=batch_size,
                                    mesh=mesh, doc_filter=doc_filter)

    # -- persistence ------------------------------------------------------------
    def save(self, directory: str) -> None:
        """One compacted snapshot: live rows as a reference-compatible
        ``seg0.pkl`` + manifest."""
        with self._rw.write():
            os.makedirs(directory, exist_ok=True)
            inner = self._inner
            live = self._live
            corpus = (np.concatenate(inner._chunks) if inner._chunks
                      else np.zeros((0, self.dim or 0), np.float32))
            snap = DenseFlatIndex(dim=self.dim, dtype=self.dtype)
            if live.any():
                snap.add(corpus[live],
                         np.asarray(inner.lookup)[live].tolist())
            snap.save_shard(os.path.join(directory, "seg0.pkl"))
            if self.dtype == "int8":
                name = "int8"
            else:
                import jax.numpy as jnp
                name = jnp.dtype(self.dtype).name
            with open(os.path.join(directory, "live.json"), "w") as f:
                json.dump({"kind": self._KIND, "dtype": name,
                           "doc_headroom": self.doc_headroom}, f)

    @classmethod
    def load(cls, directory: str, **kwargs) -> "ArenaDenseIndex":
        with open(os.path.join(directory, "live.json")) as f:
            manifest = json.load(f)
        if manifest["kind"] != cls._KIND:
            raise ValueError(f"{directory} holds a {manifest['kind']!r} "
                             f"live index, expected {cls._KIND!r}")
        dtype = kwargs.pop("dtype", None) or manifest["dtype"]
        if dtype != "int8":
            import jax.numpy as jnp
            dtype = jnp.dtype(dtype)
        inner = DenseFlatIndex.load(os.path.join(directory, "seg0.pkl"),
                                    dtype=dtype)
        return cls(inner, dtype=dtype,
                   doc_headroom=manifest["doc_headroom"], **kwargs)

"""On-hardware validation suite (TPU-only paths pytest can't reach).

The test suite runs on a virtual CPU mesh (tests/conftest.py), where the
Pallas kernels run interpreted and flash attention is gated off. This script
drives the TPU-native fast paths on the real chip and cross-checks them
against the portable paths:

    python tools/tpu_checks.py

Checks:
  1. impact backends bit-parity ON CHIP (taat / matmul),
     including the int16 storage path;
  2. flash attention vs masked XLA attention (layer level, vs a
     HIGHEST-precision reference — both must sit at bf16-pass noise);
  3. decoder-level flash engagement at anyres-scale sequence lengths;
  4. graft entry forward on the anyres flagship.

Exits non-zero on any failure; prints one OK line per check.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax

from mllm_sparse_retrieval_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def check_packing_roundtrip():
    """Packed top-k results must round-trip bit-exactly ON THE CHIP — the
    f32-packed form passed every CPU test while zeroing all ids < 2^23 on
    the v5e (denormal flush in some copy lowerings). tests/test_packing.py
    pins the int32 invariant; this is the hardware canary."""
    from mllm_sparse_retrieval_tpu.ops.packing import pack_topk, unpack_topk

    rng = np.random.default_rng(0)
    scores = (rng.normal(size=(64, 10)) * 1e3).astype(np.float32)
    scores[0, 0] = 0.0
    idx = rng.integers(0, 2 ** 23, size=(64, 10)).astype(np.int32)
    idx[1, :5] = [0, 1, 2, 3, 4]          # the denormal-critical small ids
    packed = jax.jit(pack_topk)(jnp.asarray(scores), jnp.asarray(idx))
    s2, i2 = unpack_topk(np.asarray(packed))
    assert np.array_equal(s2, scores), "packed scores corrupted on chip"
    assert np.array_equal(i2, idx), (
        "packed indices corrupted on chip (denormal flush?)")
    print("OK packed top-k round trip bit-exact on chip (incl. ids < 2^23)",
          flush=True)


def check_impact_backends():
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex

    rng = np.random.default_rng(0)
    n_docs, vocab, k = 3000, 500, 16
    doc_terms = np.stack([rng.choice(vocab, k, replace=False)
                          for _ in range(n_docs)]).astype(np.int32)
    doc_weights = rng.integers(1, 400, size=(n_docs, k)).astype(np.float32)
    index = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                           term_keys=range(vocab))
    assert index._int16_exact()
    q = [dict(zip(rng.choice(vocab, 12, replace=False).tolist(),
                  rng.integers(1, 300, 12).tolist())) for _ in range(24)]
    results = {b: index.search(q, depth=20, backend=b)
               for b in ("matmul", "taat")}
    ref_scores = results["matmul"][0]
    for b in ("taat",):
        assert results[b][0] == ref_scores, f"{b} scores != matmul on chip"
    print("OK impact backends bit-identical on chip "
          f"(taat dtype=i16, {n_docs} docs)")
    # compact48 wire: identical (score, id) multisets vs the i32 wire ON
    # CHIP for both backends (the uint16 lanes ride a different copy path
    # than int32 — same class of hazard as the f32 denormal flush above)
    for b in ("matmul", "taat"):
        s48, i48 = index.search(q, depth=20, backend=b, wire="compact48")
        ref_s, ref_i = results[b]
        assert s48 == ref_s, f"{b} compact48 scores != i32 on chip"
        for sa, ra, rb in zip(ref_s, ref_i, i48):
            assert sorted(zip(sa, ra)) == sorted(zip(sa, rb)), \
                f"{b} compact48 ids != i32 on chip"
    print("OK compact48 wire == i32 wire on chip (both backends)")


def check_device_fusion():
    """On-device hybrid fusion vs the host ``fuse`` path ON CHIP — the
    fused program leans on sort/searchsorted/bitcast lowerings the CPU
    tests can't vouch for (cf. the f32-packing denormal flush this suite
    caught; ops/packing.py)."""
    from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
    from mllm_sparse_retrieval_tpu.search.device_fusion import (
        FusedHybridSearcher)
    from mllm_sparse_retrieval_tpu.search.fusion import fuse
    from mllm_sparse_retrieval_tpu.search.runs import make_run

    rng = np.random.default_rng(2)
    n_docs, vocab, dim, depth = 400, 300, 64, 40
    ids = [f"d{i}" for i in range(n_docs)]
    impact = ImpactIndex()
    for d in ids:
        t = rng.choice(vocab, size=8, replace=False)
        impact.add(d, {f"t{x}": int(rng.integers(1, 50)) for x in t})
    impact.finalize()
    dense = DenseFlatIndex()
    order = rng.permutation(n_docs)     # shuffled doc order between engines
    reps = rng.normal(size=(n_docs, dim)).astype(np.float32)
    dense.add(reps[order], [ids[i] for i in order])

    n_q = 16
    q_reps = rng.normal(size=(n_q, dim)).astype(np.float32)
    q_dicts = [{f"t{x}": int(rng.integers(1, 10))
                for x in rng.choice(vocab, size=5, replace=False)}
               for _ in range(n_q)]
    qids = [f"d{3 * i}" for i in range(n_q)]

    d_s, d_i = dense.search_ids(q_reps, depth)
    dense_run = make_run(qids, d_s.tolist(), d_i, remove_query=True,
                         scores_sorted=True)
    s_s, s_i = impact.search(q_dicts, depth)
    sparse_run = make_run(qids, s_s, s_i, remove_query=True,
                          scores_sorted=True)
    host = fuse([dense_run, sparse_run], [0.3, 0.7])

    searcher = FusedHybridSearcher(dense, impact, alpha=0.3)
    q_idx, q_w = impact.encode_queries(q_dicts)
    dev = searcher.search_run(q_reps, q_idx, q_w, qids, depth,
                              remove_query=True, out_depth=2 * depth)
    assert set(dev) == set(host)
    worst = 0.0
    for qid in host:
        assert set(dev[qid]) == set(host[qid]), f"doc set differs for {qid}"
        for doc, s in host[qid].items():
            worst = max(worst, abs(dev[qid][doc] - s))
    assert worst < 1e-5, f"fused scores diverge on chip: {worst}"
    print(f"OK on-device hybrid fusion matches host fuse on chip "
          f"(worst |delta| {worst:.2e}, {sum(len(v) for v in host.values())} "
          f"entries)", flush=True)


def check_q8_dense():
    """int8 (SQ8) dense scoring ON CHIP: the s8 x s8 -> s32 MXU dot and the
    f32 dequant must reproduce the f32 index on losslessly-quantizable reps
    (per-row absmax 127, integer entries -> scale 1.0). Guards the int8
    dot lowering + scale broadcast the CPU tests can't vouch for."""
    import jax.numpy as jnp

    from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex

    rng = np.random.default_rng(5)
    n_docs, dim, depth = 512, 128, 10
    reps = rng.integers(-127, 128, size=(n_docs, dim)).astype(np.float32)
    reps[:, 0] = 127.0 * np.sign(reps[:, 0] + 0.5)
    q = rng.integers(-127, 128, size=(32, dim)).astype(np.float32)
    q[:, 0] = 127.0 * np.sign(q[:, 0] + 0.5)
    ids = [str(i) for i in range(n_docs)]

    f32 = DenseFlatIndex()
    f32.add(reps, ids)
    q8 = DenseFlatIndex(dtype=jnp.int8)
    q8.add(reps, ids)
    s32, _ = f32.search(q, depth=depth)
    s8, _ = q8.search(q, depth=depth)
    np.testing.assert_array_equal(np.sort(np.asarray(s32), axis=1),
                                  np.sort(np.asarray(s8), axis=1))
    assert q8._corpus_dev.dtype == jnp.int8
    print("OK int8 (SQ8) dense scoring bit-matches f32 on chip "
          f"({n_docs}x{dim}, depth {depth})", flush=True)


def check_flash_layer():
    from mllm_sparse_retrieval_tpu.models import layers as L

    B, T, HQ, HKV, DH = 2, 1024, 8, 2, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, HQ, DH)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(B, T, HKV, DH)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(B, T, HKV, DH)).astype(np.float32)) * 0.1
    mask_h = np.ones((B, T), np.int32)
    mask_h[1, 700:] = 0
    am = jnp.asarray(mask_h)
    assert L.flash_attention_eligible(T, DH)

    def ref_hi(q, k, v, am):
        mask = L.causal_padding_mask(am)
        kk = jnp.repeat(k, HQ // HKV, axis=2)
        vv = jnp.repeat(v, HQ // HKV, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q, kk,
                       precision=lax.Precision.HIGHEST) / np.sqrt(DH)
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bshd->bthd", p, vv,
                          precision=lax.Precision.HIGHEST)

    ref = np.asarray(jax.jit(ref_hi)(q, k, v, am))
    flash = np.asarray(jax.jit(L.flash_causal_attention)(q, k, v, am))
    xla = np.asarray(jax.jit(
        lambda q, k, v, am: L.attention(q, k, v, L.causal_padding_mask(am))
    )(q, k, v, am))
    for b in range(B):
        n = int(mask_h[b].sum())
        d_flash = np.abs(flash[b, :n] - ref[b, :n]).max()
        d_xla = np.abs(xla[b, :n] - ref[b, :n]).max()
        # flash must sit at the same bf16-pass noise level as the XLA path
        assert d_flash <= max(4 * d_xla, 1e-5), (d_flash, d_xla)
    print(f"OK flash attention at XLA noise level "
          f"(flash {d_flash:.1e} vs xla {d_xla:.1e} from exact)")


def check_flash_shard_map():
    """The shard_map-wrapped flash path (layers._sharded_flash) with the
    REAL kernel, on a 1×1 mesh over the single chip — proves the wrap
    compiles and scores identically to the direct kernel on hardware (the
    8-way spec plumbing is covered on the CPU mesh by
    tests/test_flash_mesh.py with a reference inner op; the TPU interpreter
    deadlocks under shard_map on CPU, so this is the kernel-in-wrap check)."""
    import functools

    from mllm_sparse_retrieval_tpu.models import layers as L
    from mllm_sparse_retrieval_tpu.parallel import make_mesh

    mesh = make_mesh()  # 1×1 on the single chip
    B, T, HQ, HKV, DH = 2, 1024, 4, 2, 128
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, T, HQ, DH)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(B, T, HKV, DH)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(B, T, HKV, DH)).astype(np.float32)) * 0.1
    mask_h = np.ones((B, T), np.int32)
    mask_h[1, 800:] = 0
    am = jnp.asarray(mask_h)
    direct = np.asarray(jax.jit(L.flash_causal_attention)(q, k, v, am))
    wrapped = np.asarray(jax.jit(functools.partial(
        L.flash_causal_attention, mesh=mesh))(q, k, v, am))
    for b in range(B):
        n = int(mask_h[b].sum())
        assert np.array_equal(wrapped[b, :n], direct[b, :n]), \
            "shard_map'd flash != direct kernel on chip"
    print("OK shard_map'd flash bit-identical to direct kernel on chip")


def check_decoder_flash():
    from mllm_sparse_retrieval_tpu.models import layers as L, llama
    from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig

    cfg = LlamaConfig(vocab_size=512, hidden_size=256, num_layers=2,
                      num_heads=2, num_kv_heads=1, intermediate_size=512,
                      rope_theta=10000.0)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    T = 1024
    x = jnp.asarray(rng.normal(size=(2, T, 256)).astype(np.float32)) * 0.05
    am_h = np.ones((2, T), np.int32)
    am_h[1, 900:] = 0
    am = jnp.asarray(am_h)
    out_flash = np.asarray(jax.jit(
        lambda x, am: llama.apply(params, x, am, cfg))(x, am))
    orig = L.FLASH_MIN_SEQ
    try:
        L.FLASH_MIN_SEQ = 10 ** 9  # force the masked path
        out_ref = np.asarray(jax.jit(
            lambda x, am: llama.apply(params, x, am, cfg))(x, am))
    finally:
        L.FLASH_MIN_SEQ = orig
    for b in range(2):
        n = int(am_h[b].sum())
        rel = (np.abs(out_flash[b, :n] - out_ref[b, :n]).max()
               / (np.abs(out_ref[b, :n]).max() + 1e-9))
        assert rel < 0.05, f"decoder flash rel diff {rel}"
    print(f"OK decoder flash path engaged at T={T} (rel diff {rel:.1e})")


def check_doc_filters():
    """Filtered search on REAL TPU tie behavior: a filter allowing fewer
    docs than the requested depth forces -inf fill entries whose indices
    are arbitrary on chip (equal-score tie order) — the resolve paths must
    clamp before fancy-indexing (round-7 fix) and serve ONLY allowed docs."""
    from mllm_sparse_retrieval_tpu.index import DenseFlatIndex, DocFilter
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex

    rng = np.random.default_rng(5)
    n_docs, vocab, k = 3000, 500, 16
    doc_terms = np.stack([rng.choice(vocab, k, replace=False)
                          for _ in range(n_docs)]).astype(np.int32)
    doc_weights = rng.integers(1, 400, size=(n_docs, k)).astype(np.float32)
    impact = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                            term_keys=range(vocab))
    q = [dict(zip(rng.choice(vocab, 12, replace=False).tolist(),
                  rng.integers(1, 300, 12).tolist())) for _ in range(16)]
    allow = [impact.doc_ids[i] for i in range(0, 40)]     # 40 << depth 100
    filt = DocFilter.from_ids(impact.doc_ids, allow)
    for b in ("matmul", "taat"):
        s, ids = impact.search(q, depth=100, backend=b, doc_filter=filt)
        for row_s, row_i in zip(s, ids):
            assert set(row_i) <= set(allow), f"{b}: filtered leak on chip"
            assert all(x > 0 for x in row_s)
    # sub-index oracle parity (matmul)
    sub = ImpactIndex.from_packed_arrays(doc_terms[:40], doc_weights[:40],
                                         term_keys=range(vocab),
                                         doc_ids=allow)
    ref_s, ref_i = sub.search(q, depth=100, backend="matmul")
    got_s, got_i = impact.search(q, depth=100, backend="matmul",
                                 doc_filter=filt)
    for a, b_, ra, rb in zip(got_s, got_i, ref_s, ref_i):
        assert sorted(zip(a, b_)) == sorted(zip(ra, rb)), \
            "filtered != sub-index on chip"
    print("OK impact doc filters on chip (taat+matmul, depth >> allowed)")

    dense = DenseFlatIndex()
    reps = rng.normal(size=(n_docs, 64)).astype(np.float32)
    dense.add(reps, impact.doc_ids)
    dfilt = DocFilter.from_ids(dense.lookup, allow)
    ds, di = dense.search_ids(reps[:8], 100, doc_filter=dfilt)
    for row_s, row_i in zip(ds, di):
        assert len(row_i) == len(allow) == len(row_s)
        assert set(row_i) == set(allow)
        assert all(np.isfinite(x) for x in row_s)
    print("OK dense doc filters on chip (ragged rows, -inf clamp)")


def check_ann_tier():
    """ANN prefilter on chip: approx_max_k runs the REAL TPU partial
    reduction here (CPU falls back to exact sort) — full-rank + saturated
    candidates must still match the exact index; low-rank recall on a
    spectral corpus must clear a floor."""
    from mllm_sparse_retrieval_tpu.index import DenseANNIndex, DenseFlatIndex

    rng = np.random.default_rng(6)
    n, d = 20000, 128
    reps = rng.normal(size=(n, d)).astype(np.float32)
    reps *= (np.arange(1, d + 1, dtype=np.float32) ** -0.75)[None, :]
    reps /= np.linalg.norm(reps, axis=1, keepdims=True)
    ids = [str(i) for i in range(n)]
    q = reps[rng.choice(n, 64, replace=False)]

    exact = DenseFlatIndex()
    exact.add(reps, ids)
    _, ei = exact.search_ids(q, 10, batch_size=64)

    full = DenseANNIndex(rank=d, candidates=256)
    full.add(reps, ids)
    _, fi = full.search_ids(q, 10, batch_size=64)
    full_rec = sum(len(set(a) & set(b)) for a, b in zip(fi, ei)) / (10 * 64)
    assert full_rec >= 0.99, f"full-rank ANN recall {full_rec} on chip"

    ann = DenseANNIndex(rank=32, candidates=256)
    ann.add(reps, ids)
    _, ai = ann.search_ids(q, 10, batch_size=64)
    rec = sum(len(set(a) & set(b)) for a, b in zip(ai, ei)) / (10 * 64)
    assert rec >= 0.9, f"rank-32 ANN recall {rec} on chip (spectral corpus)"
    print(f"OK ANN tier on chip: full-rank recall {full_rec:.3f}, "
          f"rank-32 recall {rec:.3f} @10 over {n} docs")


def check_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    shapes = [tuple(o.shape) for o in out]
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
    print(f"OK graft entry (anyres flagship) forward: {shapes}")


def main():
    assert jax.default_backend() == "tpu", (
        f"this script validates TPU paths; backend is "
        f"{jax.default_backend()} (run without JAX_PLATFORMS=cpu)")
    t0 = time.time()
    check_packing_roundtrip()
    check_impact_backends()
    check_device_fusion()
    check_q8_dense()
    check_flash_layer()
    check_flash_shard_map()
    check_decoder_flash()
    check_doc_filters()
    check_ann_tier()
    check_graft_entry()
    print(f"ALL TPU CHECKS PASSED in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()

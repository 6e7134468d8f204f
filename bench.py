"""Benchmark harness: TPU sparse (impact) retrieval throughput at COCO scale.

Headline metric, per BASELINE.md's north star ("sparse query throughput >10x
the CPU reference"): queries/second for impact search over a COCO-caption-
scale corpus (25,010 docs x 128 quantized terms, ~20k distinct terms),
retrieval depth 10 (the reference's sparse-only script configuration,
scripts/search_sparse.sh), measured end to end from padded query arrays to
ranked (ids, scores) on host, through the production
``ImpactIndex.search_encoded`` path (both TAAT-kernel and matmul backends are
timed; the faster — TAAT on real TPU — is the headline).

The impact matrix is passed to the jitted scorer as an ARGUMENT (the library
has always done this; round 1's bench wrapped its own jit that closed over
the 2.13 GB device matrix, which XLA embeds as a compile-time constant and
the remote-compile relay rejects with HTTP 413).

Note on this environment: the TPU is reached through a relay with ~30 ms
fixed dispatch overhead and ~30 MB/s device->host bandwidth, so the batch
size is large and the persistent compilation cache is enabled (first run
pays a long remote compile; later runs hit the cache).

``vs_baseline`` = TPU QPS / CPU QPS, where the CPU baseline is a strong
in-process equivalent of the Lucene impact scorer: scipy CSR sparse matmul
(query x doc-term matrix) + argpartition top-k — typically faster than
Lucene itself at this corpus size, so the ratio is conservative.

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


N_DOCS = 25_010          # COCO Karpathy test caption count
N_TERMS = 20_000         # distinct quantized terms at corpus scale
DOC_K = 128              # sparse top-k per doc (reference default)
QUERY_TERMS = 64         # caption in-text candidates are typically < 128
BATCH = 4096
DEPTH = 10               # reference sparse/dense-only script depth
                         # (scripts/search_sparse.sh, search_dense.sh)
ROUNDS = 6

if __import__("os").environ.get("BENCH_SMOKE"):
    # CI contract check only (tests/test_cli_and_tools.py): tiny shapes so
    # the driver-facing invariants — exactly ONE JSON line on stdout, rc=0
    # even with the TPU unreachable — are testable in seconds on CPU.
    # Never set for real measurements.
    N_DOCS, N_TERMS, DOC_K, QUERY_TERMS, BATCH, ROUNDS = \
        512, 256, 16, 8, 64, 2


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_corpus(rng):
    """Zipf-ish term distribution + quantized impact weights like real data."""
    zipf_p = 1.0 / np.arange(1, N_TERMS + 1)
    zipf_p /= zipf_p.sum()
    doc_terms = np.empty((N_DOCS, DOC_K), np.int32)
    for i in range(0, N_DOCS, 4096):
        n = min(4096, N_DOCS - i)
        block = rng.choice(N_TERMS, size=(n, DOC_K), p=zipf_p)
        doc_terms[i:i + n] = block
    doc_weights = rng.integers(1, 350, size=(N_DOCS, DOC_K)).astype(np.float32)
    return doc_terms, doc_weights


def build_queries(rng):
    """Query terms drawn from the SAME Zipf distribution as the corpus:
    sparse queries are caption terms (in-text candidates,
    /root/reference/src/encode.py:96-103), which follow natural word
    frequencies — not uniform draws. Both the TPU path and the CPU baseline
    score identical queries, so the comparison is unchanged in kind."""
    zipf_p = 1.0 / np.arange(1, N_TERMS + 1)
    zipf_p /= zipf_p.sum()
    q_idx = rng.choice(N_TERMS, size=(BATCH, QUERY_TERMS), p=zipf_p
                       ).astype(np.int32)
    q_w = rng.integers(1, 300, size=(BATCH, QUERY_TERMS)).astype(np.float32)
    return q_idx, q_w


def bench_tpu(doc_terms, doc_weights, q_idx, q_w):
    import jax
    from mllm_sparse_retrieval_tpu.cli.common import (
        enable_compilation_cache)
    enable_compilation_cache()
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex

    t0 = time.time()
    index = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                           term_keys=range(N_TERMS))
    build_s = time.time() - t0
    t0 = time.time()
    dtype = "i16" if index._int16_exact() else "f32"
    dev = index._materialize(None, dtype, kernel_layout=True)  # TAAT form
    log(f"index build: {build_s:.2f}s CSR + {time.time() - t0:.2f}s "
        f"HBM placement ({dev.shape} {dev.dtype}, "
        f"{dev.nbytes / 1e9:.2f} GB)")

    on_tpu = jax.default_backend() == "tpu"
    backends = ["taat", "matmul"] if on_tpu else ["matmul"]
    qps = {}
    for backend in backends:
        def run(qi, qwts):
            return index.search_encoded(qi, qwts, DEPTH, backend=backend)

        log(f"compiling {backend} impact search ...")
        t0 = time.time()
        run(q_idx, q_w)
        log(f"  compile+first run: {time.time() - t0:.1f}s")
        times = []
        for r in range(ROUNDS):
            qi = np.roll(q_idx, r, axis=0)
            qwts = np.roll(q_w, r, axis=0)
            t0 = time.time()
            run(qi, qwts)
            times.append(time.time() - t0)
        best = min(times)
        serial_qps = BATCH / best
        log(f"  {backend}: serial best {best * 1e3:.1f} ms/batch -> "
            f"{serial_qps:.0f} QPS")

        # pipelined serving throughput (search_encoded_stream): while the
        # device scores batch r the host prepares/uploads batch r+1 — the
        # production serving pattern; results are fully resolved to host
        batches = [(np.roll(q_idx, r, axis=0), np.roll(q_w, r, axis=0))
                   for r in range(ROUNDS)]
        for _ in index.search_encoded_stream(batches[:2], DEPTH,
                                             backend=backend):
            pass  # warm the pipeline
        t0 = time.time()
        for _ in index.search_encoded_stream(batches, DEPTH,
                                             backend=backend):
            pass
        pipe = time.time() - t0
        pipe_qps = ROUNDS * BATCH / pipe
        log(f"  {backend}: pipelined {pipe / ROUNDS * 1e3:.1f} ms/batch "
            f"effective -> {pipe_qps:.0f} QPS over {ROUNDS} batches")
        # headline = pipelined only (the declared production serving
        # pattern); serial stays a stderr line. max() of the two mixed
        # methodologies against a serial-only CPU baseline (ADVICE r3).
        qps[backend] = pipe_qps
    # product-path (run_search) evidence rides the same index while it is
    # hot (stderr only; fail-soft)
    if "taat" in qps:
        try:
            bench_engine_leg(index, q_idx, q_w)
        except Exception as e:
            log(f"engine leg failed (non-fatal): {e}")
    index.drop_device_cache()  # free HBM for the later legs
    # the metric names its backend: report the TAAT kernel when it ran,
    # otherwise the matmul number under a matmul-named metric
    if "taat" in qps:
        return "taat", qps["taat"]
    return "matmul", qps["matmul"]


def bench_engine_leg(index, q_idx, q_w):
    """Side metric (stderr only): the PRODUCT search path — SelectedTerms →
    ImpactIndex.search_terms_stream (id-keyed fast path, the route
    search/engine.run_search takes) → make_run — at the same corpus/batch as
    the headline. VERDICT r3 #1's done criterion: within ~10-15% of the raw
    search_encoded QPS."""
    from mllm_sparse_retrieval_tpu.search.runs import make_run
    from mllm_sparse_retrieval_tpu.sparse import SelectedTerms

    assert index.int_keyed  # bench corpus term keys are raw ints
    qw_i = q_w.astype(np.int32)
    term_batches = []
    for r in range(ROUNDS):
        ri, rw = np.roll(q_idx, r, axis=0), np.roll(qw_i, r, axis=0)
        term_batches.append(
            [SelectedTerms(ri[i], rw[i]) for i in range(BATCH)])
    qids = [str(i) for i in range(BATCH)]

    def consume(batches):
        runs = []
        for scores, ids in index.search_terms_stream(batches, DEPTH,
                                                     backend="taat"):
            runs.append(make_run(qids, scores, ids))
        return runs

    consume(term_batches[:2])  # warm
    t0 = time.time()
    runs = consume(term_batches)
    dt = time.time() - t0
    assert len(runs) == ROUNDS and all(len(r) == BATCH for r in runs)
    qps = ROUNDS * BATCH / dt
    log(f"engine leg (SelectedTerms -> search_terms_stream -> make_run): "
        f"{dt / ROUNDS * 1e3:.1f} ms/batch -> {qps:.0f} QPS "
        f"(the run_search product path, id-keyed fast path)")

    # single-call form (one run_search invocation, serial): search_terms +
    # make_run on one batch
    t0 = time.time()
    s, i = index.search_terms(term_batches[0], DEPTH, backend="taat")
    make_run(qids, s, i)
    dt1 = time.time() - t0
    log(f"engine leg single-call: {dt1 * 1e3:.1f} ms/batch -> "
        f"{BATCH / dt1:.0f} QPS")


def bench_encode_pipeline():
    """Side metric (stderr only): offline encode throughput (captions/s)
    through pipelines.encode — tiny family, real Flickr captions, synthetic
    pixels; the same configuration tools/corpus_e2e.py runs (VERDICT r3 #4:
    driver-visible witness for the encode hot loop,
    /root/reference/src/encode.py:274-377)."""
    from mllm_sparse_retrieval_tpu.configs import (ModelConfig, ModelFamily,
                                                   SparseConfig)
    from mllm_sparse_retrieval_tpu.data import CrossModalCorpus
    from mllm_sparse_retrieval_tpu.models.registry import build_model
    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples

    corpus = CrossModalCorpus("flickr", "test", "/root/reference/data")
    captions = corpus.examples("full")[:2048]
    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_vocab_size=2048, tiny_hidden_size=128)
    params, arch, tok, tmpl = build_model(
        cfg, captions=[e.text for e in captions])
    sp = SparseConfig()
    # warm the compile on a short prefix, then time the full run
    encode_examples(captions[:64], params, arch, tok, tmpl,
                    encode_type="text", sparse_cfg=sp, batch_size=32)
    t0 = time.time()
    enc = encode_examples(captions, params, arch, tok, tmpl,
                          encode_type="text", sparse_cfg=sp, batch_size=32)
    dt = time.time() - t0
    assert len(enc.ids) == len(captions)
    log(f"encode pipeline: {len(captions)} captions in {dt:.1f}s -> "
        f"{len(captions) / dt:.0f} captions/s (tiny family, warm cache)")


def bench_scale_leg():
    """Side metric (stderr only): the 200k-doc sparse leg (8× corpus scale,
    8.0 GB int16 matrix; BASELINE.md large-corpus row) — same shapes/seed as
    the round-3 self-run so the compile cache hits (VERDICT r3 #4)."""
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex

    n_docs = 200_000
    rng = np.random.default_rng(0)
    zipf_p = 1.0 / np.arange(1, N_TERMS + 1)
    zipf_p /= zipf_p.sum()
    doc_terms = np.empty((n_docs, DOC_K), np.int32)
    for i in range(0, n_docs, 4096):
        n = min(4096, n_docs - i)
        doc_terms[i:i + n] = rng.choice(N_TERMS, size=(n, DOC_K), p=zipf_p)
    doc_weights = rng.integers(1, 350, size=(n_docs, DOC_K)
                               ).astype(np.float32)
    q_idx = rng.choice(N_TERMS, size=(BATCH, QUERY_TERMS), p=zipf_p
                       ).astype(np.int32)
    q_w = rng.integers(1, 300, size=(BATCH, QUERY_TERMS)).astype(np.float32)

    t0 = time.time()
    index = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                           term_keys=range(N_TERMS))
    csr_s = time.time() - t0
    t0 = time.time()
    dev = index._materialize(None, "i16", kernel_layout=True)
    dev.block_until_ready()
    log(f"scale leg 200k docs: index build {csr_s:.1f}s CSR + "
        f"{time.time() - t0:.1f}s HBM placement ({dev.nbytes / 1e9:.2f} GB)")
    t0 = time.time()
    index.search_encoded(q_idx, q_w, DEPTH, backend="taat")
    log(f"  compile+first run: {time.time() - t0:.1f}s")
    batches = [(np.roll(q_idx, r, axis=0), np.roll(q_w, r, axis=0))
               for r in range(ROUNDS)]
    for _ in index.search_encoded_stream(batches[:2], DEPTH, backend="taat"):
        pass
    t0 = time.time()
    for _ in index.search_encoded_stream(batches, DEPTH, backend="taat"):
        pass
    pipe = (time.time() - t0) / ROUNDS
    log(f"  200k-doc taat: pipelined {pipe * 1e3:.1f} ms/batch -> "
        f"{BATCH / pipe:.0f} QPS")
    index.drop_device_cache()


def bench_hybrid_leg(doc_terms, doc_weights, q_idx, q_w):
    """Side metric (stderr only): hybrid fusion at the reference pipeline's
    DEFAULT depth 1000 (/root/reference/src/arguments.py:60) — the host
    run-fusion path (fusion_mode='host') vs the on-device fused path
    (fusion_mode='device', streamed). Same shapes as tools/hybrid_ab.py so
    the compile cache hits; batch 1024 (the depth-1000 result tensors are
    16 MB/batch at 4096)."""
    from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex
    from mllm_sparse_retrieval_tpu.search.device_fusion import (
        FusedHybridSearcher)
    from mllm_sparse_retrieval_tpu.search.fusion import fuse
    from mllm_sparse_retrieval_tpu.search.runs import make_run

    batch, depth, out_k, dim, rounds = 1024, 1000, 200, 1024, 4
    rng = np.random.default_rng(7)
    impact = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                            term_keys=range(N_TERMS))
    dense = DenseFlatIndex()
    dense.add(rng.normal(size=(N_DOCS, dim)).astype(np.float32),
              impact.doc_ids)
    impact._materialize(None, "i16", kernel_layout=True).block_until_ready()
    dense._materialize(None)
    dense._corpus_dev.block_until_ready()

    qi, qw = q_idx[:batch], q_w[:batch]
    q_reps = rng.normal(size=(batch, dim)).astype(np.float32)
    batches = [(np.roll(q_reps, r, axis=0), np.roll(qi, r, axis=0),
                np.roll(qw, r, axis=0)) for r in range(rounds)]
    qids = [str(-1 - i) for i in range(batch)]

    def run_host():
        for reps_b, bi, bw in batches[:2]:
            d_s, d_i = dense.search_ids(reps_b, depth, batch_size=batch)
            d_run = make_run(qids, d_s.tolist(), d_i, scores_sorted=True)
            s_s, s_i = impact.search_encoded(bi, bw, depth, backend="taat")
            s_run = make_run(qids, s_s, s_i, scores_sorted=True)
            fuse([d_run, s_run], [0.5, 0.5])

    fused = FusedHybridSearcher(dense, impact, alpha=0.5, backend="taat")

    def run_stream(ok):
        for _ in fused.search_encoded_stream(batches, depth, out_depth=ok):
            pass

    run_host()                       # warm (also times below: 2 rounds)
    run_stream(depth)
    run_stream(out_k)
    t0 = time.time()
    run_host()
    host_ms = (time.time() - t0) / 2 * 1e3
    t0 = time.time()
    run_stream(depth)
    full_ms = (time.time() - t0) / rounds * 1e3
    t0 = time.time()
    run_stream(out_k)
    trunc_ms = (time.time() - t0) / rounds * 1e3
    log(f"hybrid leg (depth {depth}, {N_DOCS} docs, dim {dim}, batch "
        f"{batch}): host-fused {host_ms:.0f} ms/batch "
        f"({batch / host_ms * 1e3:.0f} QPS); device-fused stream "
        f"{full_ms:.0f} ms/batch ({batch / full_ms * 1e3:.0f} QPS, "
        f"x{host_ms / full_ms:.1f}); out_depth {out_k}: {trunc_ms:.0f} "
        f"ms/batch ({batch / trunc_ms * 1e3:.0f} QPS, "
        f"x{host_ms / trunc_ms:.1f})")

    # sparse-only deep-depth wire A/B: at depth 1000 the packed [B, 2k]
    # i32 result is 8 MB/batch — the fetch, not compute, bounds this leg
    # on thin links; the opt-in compact48 wire ships 6 MB (ops/packing.py)
    sparse_batches = [(np.roll(qi, r, axis=0), np.roll(qw, r, axis=0))
                      for r in range(rounds)]

    def run_sparse(wire):
        for _ in impact.search_encoded_stream(sparse_batches, depth,
                                              backend="taat", wire=wire):
            pass

    for wire in ("i32", "compact48"):
        run_sparse(wire)                         # warm / compile
        t0 = time.time()
        run_sparse(wire)
        ms = (time.time() - t0) / rounds * 1e3
        log(f"  sparse depth-{depth} wire={wire}: {ms:.0f} ms/batch "
            f"({batch / ms * 1e3:.0f} QPS)")
    impact.drop_device_cache()


def bench_dense_side(rng):
    """Side metric (stderr only): dense MIPS QPS at COCO scale — 25k docs x
    4096-d (LLaVA-NeXT hidden size), depth 10, through DenseFlatIndex."""
    from mllm_sparse_retrieval_tpu.index.dense import DenseFlatIndex

    dim = 4096
    corpus = rng.normal(size=(N_DOCS, dim)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(BATCH, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    index = DenseFlatIndex()
    index.add(corpus, [str(i) for i in range(N_DOCS)])

    def run():
        return index.batch_search(queries, DEPTH, batch_size=BATCH)

    run()
    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times)
    log(f"dense MIPS side metric (e2e): {N_DOCS} x {dim}d, best "
        f"{best * 1e3:.1f} ms/batch -> {BATCH / best:.0f} QPS "
        f"(relay-transfer bound in this environment: the 33 MB query upload "
        f"at ~30 MB/s dominates)")

    # Device-compute throughput: queries pre-staged in HBM, k back-to-back
    # dispatches with ONE host read of the last result — elapsed/k is the
    # per-batch compute (timing single calls pays a full ~30 ms relay
    # dispatch round trip per sample and undercounted by ~40%; see
    # tools/dense_ab.py). The FAISS-replacement number (VERDICT r2 #7),
    # f32-HIGHEST parity mode and the bf16 single-MXU-pass mode
    # (DenseFlatIndex dtype=bfloat16).
    import jax
    import jax.numpy as jnp
    from mllm_sparse_retrieval_tpu.ops.mips import mips_topk

    fn = jax.jit(lambda q, c: mips_topk(q, c, DEPTH))
    k_pipe = 8
    for name, dtype in (("f32-HIGHEST", jnp.float32), ("bf16", jnp.bfloat16)):
        idx = index if dtype == jnp.float32 else DenseFlatIndex(dtype=dtype)
        if idx is not index:
            idx.add(corpus, index.lookup)
        idx._materialize(None)
        q_dev = jax.device_put(
            np.ascontiguousarray(np.asarray(queries, dtype=dtype)))
        np.asarray(fn(q_dev, idx._corpus_dev)[0])       # compile + warm
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(k_pipe):
                out = fn(q_dev, idx._corpus_dev)[0]
            np.asarray(out)
            times.append((time.time() - t0) / k_pipe)
        best = min(times)
        log(f"dense MIPS side metric (device compute, {name}): best "
            f"{best * 1e3:.2f} ms/batch -> {BATCH / best:.0f} QPS "
            f"({2 * N_DOCS * BATCH * dim / best / 1e12:.1f} TFLOP/s "
            f"effective)")


def bench_cpu(doc_terms, doc_weights, q_idx, q_w):
    from scipy.sparse import csr_matrix

    rows = np.repeat(np.arange(N_DOCS), DOC_K)
    docs = csr_matrix(
        (doc_weights.ravel(), (rows, doc_terms.ravel())),
        shape=(N_DOCS, N_TERMS)).T.tocsr()      # [terms, docs]

    qrows = np.repeat(np.arange(BATCH), QUERY_TERMS)
    queries = csr_matrix(
        (q_w.ravel(), (qrows, q_idx.ravel())),
        shape=(BATCH, N_TERMS)).tocsr()

    # chunked scoring keeps the dense [chunk, N] score block cache-resident —
    # the CPU's best configuration (a whole-batch toarray() thrashes memory
    # at large batches, which would flatter the TPU ratio)
    chunk = 512

    def run():
        out = []
        for s in range(0, BATCH, chunk):
            scores = (queries[s:s + chunk] @ docs).toarray()
            top = np.argpartition(-scores, DEPTH, axis=1)[:, :DEPTH]
            top_scores = np.take_along_axis(scores, top, axis=1)
            order = np.argsort(-top_scores, axis=1)
            out.append(np.take_along_axis(top, order, axis=1))
        return np.concatenate(out)

    run()  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = min(times)
    qps = BATCH / best
    log(f"CPU (scipy CSR): best {best * 1e3:.1f} ms/batch -> {qps:.0f} QPS")
    return qps


def wait_for_tpu(budget_s=1500, probe_timeout=180, retry_wait=60):
    """Probe TPU reachability in a SUBPROCESS, retrying until budget expires.

    The relay chip is occasionally unreachable for minutes (observed: a
    ~20-minute in-process init hang ending in UNAVAILABLE, which also
    poisons the parent's backend cache — hence the subprocess probe). The
    driver runs this script unattended at round end; a transient relay
    outage must degrade, not crash. Returns True when a probe sees the TPU.
    """
    import os
    import subprocess
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        log("JAX_PLATFORMS=cpu set explicitly; skipping TPU probe")
        return False
    deadline = time.time() + budget_s
    code = "import jax; assert jax.default_backend() == 'tpu'"
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                if attempt > 1:
                    log(f"TPU probe succeeded on attempt {attempt}")
                return True
            detail = (r.stderr or b"").decode(errors="replace").strip()
            detail = detail.splitlines()[-1] if detail else "rc != 0"
        except subprocess.TimeoutExpired:
            detail = f"probe hung > {probe_timeout}s"
        if time.time() >= deadline:
            log(f"TPU unreachable after {attempt} probes ({detail})")
            return False
        log(f"TPU probe {attempt} failed ({detail}); "
            f"retrying in {retry_wait}s ...")
        time.sleep(max(0.0, min(retry_wait,
                                deadline - time.time(),
                                retry_wait - (time.time() - t0))))


def main():
    rng = np.random.default_rng(0)
    log(f"corpus: {N_DOCS} docs x {DOC_K} terms, {N_TERMS} vocab, "
        f"batch {BATCH}, depth {DEPTH}")
    doc_terms, doc_weights = build_corpus(rng)
    q_idx, q_w = build_queries(rng)

    # CPU baseline FIRST, on a quiet host (the TPU leg and the dense side
    # metric allocate hundreds of MB that perturb CPU cache/memory timing).
    try:
        cpu_qps = bench_cpu(doc_terms, doc_weights, q_idx, q_w)
    except Exception as e:  # scipy absent or OOM — fall back to a numpy dense baseline
        log(f"scipy baseline failed ({e}); using numpy dense baseline")
        dense = np.zeros((N_DOCS, N_TERMS), np.float32)
        np.put_along_axis(dense, doc_terms, doc_weights, axis=1)
        qd = np.zeros((BATCH, N_TERMS), np.float32)
        np.put_along_axis(qd, q_idx, q_w, axis=1)
        t0 = time.time()
        scores = qd @ dense.T
        np.argpartition(-scores, DEPTH, axis=1)
        cpu_qps = BATCH / (time.time() - t0)

    # Degrade, never crash: the driver needs the one JSON line even when
    # the relay chip is flaky. A CPU run of the 25k-doc matmul leg would
    # take ~an hour, so the unreachable-TPU fallback reports the already-
    # measured CPU baseline under an explicit degraded-metric name.
    tpu_up = wait_for_tpu()
    try:
        if not tpu_up:
            raise RuntimeError("TPU unreachable (see probe log)")
        tpu_backend, tpu_qps = bench_tpu(doc_terms, doc_weights, q_idx, q_w)
    except Exception as e:
        log(f"TPU leg unavailable ({e}); reporting CPU baseline as a "
            f"degraded run")
        print(json.dumps({
            "metric": "sparse_impact_DEGRADED_cpu_scipy_qps_coco25k_depth10",
            "value": round(cpu_qps, 1),
            "unit": "queries/s",
            "vs_baseline": 1.0,
        }))
        return
    try:
        bench_dense_side(rng)
    except Exception as e:
        log(f"dense side metric failed (non-fatal): {e}")
    # driver-visible witnesses for the encode hot loop and the corpus-scale
    # sparse leg (VERDICT r3 #4); stderr only, fail-soft, TPU only (these
    # reuse cached compiles — off-TPU they would pay interpret-mode cost)
    import jax
    if jax.default_backend() == "tpu":
        try:
            bench_encode_pipeline()
        except Exception as e:
            log(f"encode pipeline leg failed (non-fatal): {e}")
        try:
            bench_hybrid_leg(doc_terms, doc_weights, q_idx, q_w)
        except Exception as e:
            log(f"hybrid leg failed (non-fatal): {e}")
        try:
            bench_scale_leg()
        except Exception as e:
            log(f"scale leg failed (non-fatal): {e}")

    print(json.dumps({
        "metric": f"sparse_impact_{tpu_backend}_qps_coco25k_depth10",
        "value": round(tpu_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
    }))


if __name__ == "__main__":
    main()

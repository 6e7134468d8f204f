"""Persistent-compile-cache portability probe (VERDICT r4 #3).

Reports, for THIS session's backend, every component that feeds the XLA
persistent-cache key (jax._src.cache_key.get): jaxlib version, the raw and
canonicalized platform_version (the axon relay embeds a rolling
``Built on ... cl/NNN`` build stamp — the diagnosed cause of cross-VM
re-keys; ``cli.common.stabilize_cache_key`` strips it), the serialized
device-topology hash, and the XLA-flags environment. Then it compiles the
HEADLINE taat program at bench.py's exact shape and reports cache
HIT/MISS (no new cache file + sub-threshold first-call latency = hit).

Appends one fingerprint JSON line to ``tools/cache_fingerprints.jsonl``
(committed) so the next session on a fresh VM can diff which component
moved if a re-key happens anyway.

Usage:  python tools/cache_probe.py [--skip-compile]
"""

import argparse
import glob
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from mllm_sparse_retrieval_tpu.cli.common import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()

CACHE_DIR = "/root/repo/.jax_cache"
FINGERPRINTS = os.path.join(os.path.dirname(__file__),
                            "cache_fingerprints.jsonl")


def fingerprint() -> dict:
    from jax._src import cache_key as ck
    from jax._src import xla_bridge
    from jax._src.lib import version_str

    backend = xla_bridge.get_backend()
    raw = backend.platform_version
    # reproduce the canonicalization stabilize_cache_key installs
    import re
    canon = "\n".join(line for line in raw.splitlines()
                      if not re.match(r"\s*Built on ", line))
    canon = re.sub(r"\bcl/\d+\b", "", canon)
    info = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "jax": jax.__version__,
        "jaxlib": version_str,
        "platform": backend.platform,
        "platform_version_raw": raw,
        "platform_version_canonical": canon,
        "stabilized": bool(getattr(ck, "_mllm_stabilized", False)),
        "device_kind": jax.devices()[0].device_kind,
        "n_devices": len(jax.devices()),
        "xla_flags_env": os.environ.get("XLA_FLAGS", ""),
        "libtpu_env": os.environ.get("TPU_LIBRARY_PATH", ""),
    }
    try:
        from jax._src.lib import xla_client
        topo = xla_client.get_topology_for_devices(jax.devices()).serialize()
        info["topology_sha"] = hashlib.sha256(topo).hexdigest()[:16]
        info["topology_bytes"] = len(topo)
    except Exception as e:     # backends without serializable topology
        info["topology_sha"] = f"unavailable: {e}"
    return info


def headline_program_probe() -> dict:
    """Compile bench.py's taat program shape; report hit/miss."""
    from bench import N_TERMS, build_corpus, build_queries
    from mllm_sparse_retrieval_tpu.index.impact import ImpactIndex

    rng = np.random.default_rng(0)
    doc_terms, doc_weights = build_corpus(rng)
    q_idx, q_w = build_queries(rng)
    index = ImpactIndex.from_packed_arrays(doc_terms, doc_weights,
                                           term_keys=range(N_TERMS))
    before = set(glob.glob(os.path.join(CACHE_DIR, "*taat*")))
    t0 = time.time()
    # the FULL bench batch: the program key includes the query batch dim,
    # so probing a slice compiles (and reports a miss for) a DIFFERENT
    # program than the headline's — the round-10 first run of this probe
    # did exactly that and paid a spurious 380 s compile at batch 64
    s, i = index.search_encoded(q_idx, q_w, 10, backend="taat")
    first = time.time() - t0
    after = set(glob.glob(os.path.join(CACHE_DIR, "*taat*")))
    new = sorted(os.path.basename(p) for p in after - before)
    return {"first_call_s": round(first, 1), "new_cache_entries": new,
            "cache_hit": not new}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-compile", action="store_true",
                    help="fingerprint only (no device program)")
    args = ap.parse_args()
    info = fingerprint()
    if not args.skip_compile:
        info["headline_probe"] = headline_program_probe()
    print(json.dumps(info, indent=2))
    with open(FINGERPRINTS, "a") as f:
        f.write(json.dumps(info) + "\n")
    print(f"fingerprint appended to {FINGERPRINTS}", file=sys.stderr)


if __name__ == "__main__":
    main()

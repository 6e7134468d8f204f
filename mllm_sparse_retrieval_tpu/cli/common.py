"""Shared CLI plumbing: argument parsing into the typed config tree,
model/corpus construction, mesh setup, structured logging."""

from __future__ import annotations

import argparse
import logging
import sys
import time
from typing import Optional, Tuple

from mllm_sparse_retrieval_tpu.configs import (
    DataConfig, ModelConfig, ModelFamily, RepsLoc, SearchConfig, SparseConfig,
    TrainConfig)
from mllm_sparse_retrieval_tpu.data.karpathy import CrossModalCorpus


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class StepTimer:
    """Per-phase wall-clock accounting, logged at close (SURVEY.md §5:
    the reference has no tracing at all — tqdm bars only)."""

    def __init__(self, logger: logging.Logger):
        self.logger = logger
        self.marks = []
        self._t0 = time.time()
        self._label = None

    def phase(self, label: str) -> None:
        now = time.time()
        if self._label is not None:
            self.marks.append((self._label, now - self._t0))
            self.logger.info("phase %-24s %.2fs", self._label, now - self._t0)
        self._label = label
        self._t0 = now

    def close(self) -> None:
        self.phase("__end__")
        self._label = None


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", default="flickr", choices=["coco", "flickr"])
    p.add_argument("--data-root", default="/root/reference/data")
    p.add_argument("--split", default="test")
    p.add_argument("--family", default="tiny_debug",
                   choices=[f.value for f in ModelFamily])
    p.add_argument("--checkpoint-path", default=None)
    p.add_argument("--lora-path", default=None)
    p.add_argument("--reps-loc", default="before_pad",
                   choices=["before_pad", "after_pad"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--mesh", action="store_true",
                   help="shard work over all local devices")
    p.add_argument("--model-parallel", type=int, default=1)
    # sparse knobs (reference PromptRepsLLMDataArguments)
    p.add_argument("--sparse-length", type=int, default=128)
    p.add_argument("--sparse-manual", action="store_true")
    p.add_argument("--no-filter", action="store_true",
                   help="disable leading-char token filtering")
    p.add_argument("--num-expanded-tokens", type=int, default=0)
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace here")


def sparse_config_from_args(args) -> SparseConfig:
    return SparseConfig(
        sparse_length=args.sparse_length,
        sparse_manual=args.sparse_manual,
        is_filtered=not args.no_filter,
        num_expanded_tokens=args.num_expanded_tokens,
    )


def model_config_from_args(args) -> ModelConfig:
    return ModelConfig(
        family=ModelFamily(args.family),
        checkpoint_path=args.checkpoint_path,
        lora_path=args.lora_path,
        reps_loc=RepsLoc(args.reps_loc),
        dtype=args.dtype,
    )


def enable_compilation_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Persistent XLA compilation cache — first compile through a remote
    compile service can take minutes; the cache makes reruns instant.

    ``jax_traceback_in_locations_limit = 0`` drops Python caller frames
    from MLIR locations. Without it the Mosaic (Pallas) kernel payload
    embeds the whole call stack — caller file paths and line numbers —
    into the serialized module the cache key hashes, so the SAME kernel
    recompiles (minutes, remotely) whenever it is reached from a different
    script or any calling line shifts. Verified here: canonicalized IR for
    one program lowered from two script paths differed byte-for-byte until
    the limit was 0, after which it was identical (and 2.6 KB smaller)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:
        pass
    stabilize_cache_key()


def stabilize_cache_key() -> None:
    """Strip the relay BUILD STAMP from the persistent-cache key.

    ``cache_key.get`` hashes ``backend.platform_version`` verbatim; through
    the axon relay that string is e.g.::

        PJRT C API
        axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49
        TFRT TPU v5 lite
        Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709

    The final line is a rolling build stamp: every relay redeploy (i.e.
    every fresh VM) re-keys the ENTIRE committed cache even when the
    executable format is unchanged — the cause of the cross-VM re-keys
    VERDICT r4 #3 tracks (BENCH_r04's 49.9 s taat recompile; round 9's
    ~10 min one). The semantically meaningful compatibility markers —
    ``SerializedExecutable v9``, ``compile-cache v14``, ``compat c49``,
    the TPU generation — are on the OTHER lines and stay in the key, so a
    real format bump still re-keys correctly; only ``Built on ...`` /
    ``cl/NNN`` stamps are dropped. No effect off-TPU or if the private
    module moves (best-effort try/except); tools/cache_probe.py records
    the raw/canonical strings per session for cross-VM diffing.
    """
    import re

    try:
        from jax._src import cache_key as ck
        if getattr(ck, "_mllm_stabilized", False):
            return
        orig = ck._hash_platform

        def _hash_platform(hash_obj, backend):
            version = backend.platform_version
            canon = "\n".join(
                line for line in version.splitlines()
                if not re.match(r"\s*Built on ", line))
            canon = re.sub(r"\bcl/\d+\b", "", canon)
            ck._hash_string(hash_obj, backend.platform)
            ck._hash_string(hash_obj, canon)

        _hash_platform._mllm_orig = orig
        ck._hash_platform = _hash_platform
        ck._mllm_stabilized = True
    except Exception:
        pass


def build_everything(args, mode_for_captions: str = "full"):
    """(corpus, params, arch, tokenizer, template, mesh, lora)."""
    from mllm_sparse_retrieval_tpu.models import build_model
    from mllm_sparse_retrieval_tpu.models import lora as lora_lib
    from mllm_sparse_retrieval_tpu.parallel import make_mesh

    enable_compilation_cache()

    corpus = CrossModalCorpus(args.dataset, args.split, args.data_root)
    captions = list(corpus.text_dict.values())
    params, arch, tok, template = build_model(
        model_config_from_args(args), captions=captions)

    lora = None
    if args.lora_path:
        lora = lora_lib.load_lora(args.lora_path)

    mesh = None
    if args.mesh:
        mesh = make_mesh(model_parallel=args.model_parallel)
    return corpus, params, arch, tok, template, mesh, lora


class Profiler:
    """Optional jax.profiler trace around the hot loop."""

    def __init__(self, trace_dir: Optional[str]):
        self.trace_dir = trace_dir

    def __enter__(self):
        if self.trace_dir:
            import jax
            jax.profiler.start_trace(self.trace_dir)
        return self

    def __exit__(self, *exc):
        if self.trace_dir:
            import jax
            jax.profiler.stop_trace()
        return False

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

"""Diagnostics: term-weight distributions and fusion-provenance rank analysis.

Library re-design of the reference's two analysis CLIs:

- ``term_weight_statistics`` ≈ src/sparse_statistic.py:40-283 — for each test
  image, compare the sparse-weight distribution of vocabulary tokens that DO
  appear in its ground-truth captions against those that don't (and the same
  for captions themselves); the separation of these distributions is what
  makes caption-restricted sparse retrieval work.
- ``fusion_provenance_statistics`` ≈ src/score_statistic.py:399-436 — run
  hybrid retrieval with provenance-tagged fusion and collect the final rank
  positions of dense-only / sparse-only / both-retrieved documents.

Both return plain numpy arrays; ``plot_*`` helpers render the reference's
histogram PNGs when matplotlib is present.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from mllm_sparse_retrieval_tpu.data.karpathy import CrossModalCorpus, Example
from mllm_sparse_retrieval_tpu.search.fusion import fuse_statistic
from mllm_sparse_retrieval_tpu.search.runs import Run
from mllm_sparse_retrieval_tpu.sparse.term_selection import text_candidate_ids


@dataclass
class TermWeightStats:
    image_in_text: np.ndarray       # image sparse weights on in-caption tokens
    image_out_text: np.ndarray      # ... on out-of-caption tokens
    text_in_text: np.ndarray        # caption weights on its own tokens
    text_out_text: np.ndarray

    def summary(self) -> str:
        def s(x):
            return f"n={x.size} mean={x.mean():.3f}" if x.size else "n=0"
        return (f"image in-text {s(self.image_in_text)} | "
                f"image out-text {s(self.image_out_text)} | "
                f"text in-text {s(self.text_in_text)} | "
                f"text out-text {s(self.text_out_text)}")


def term_weight_statistics(
    corpus: CrossModalCorpus,
    params, arch, tokenizer, template,
    *,
    sparse_cfg,
    num_images: int = 100,
    batch_size: int = 8,
    mesh=None,
    lora=None,
    pixel_loader=None,
) -> TermWeightStats:
    """Collect in-caption vs out-of-caption sparse weight populations."""
    encode_word = lambda w: tokenizer.encode(w, add_special_tokens=False)
    vocab_size = tokenizer.vocab_size

    images = corpus.examples_single()[:num_images]

    # raw sparse weights (pre top-k) for images and their captions
    img_logits = _raw_sparse(images, params, arch, tokenizer, template,
                             "image", sparse_cfg, batch_size, mesh, lora,
                             pixel_loader)

    cap_examples: List[Example] = []
    cap_owner: List[int] = []
    for i, ex in enumerate(images):
        for tid in corpus.img2text[ex.img_id]:
            cap_examples.append(Example(corpus.text_dict[tid], ex.image_path,
                                        tid, ex.img_id))
            cap_owner.append(i)
    cap_logits = _raw_sparse(cap_examples, params, arch, tokenizer, template,
                             "text", sparse_cfg, batch_size, mesh, lora,
                             pixel_loader)

    # per image: union of candidate token ids over its ground-truth captions
    img_in, img_out, txt_in, txt_out = [], [], [], []
    caps_of: Dict[int, List[int]] = {}
    for ci, oi in enumerate(cap_owner):
        caps_of.setdefault(oi, []).append(ci)
    for i, ex in enumerate(images):
        ids = set()
        for ci in caps_of.get(i, []):
            ids.update(text_candidate_ids(cap_examples[ci].text,
                                          encode_word).tolist())
        mask = np.zeros(vocab_size, bool)
        mask[list(ids)] = True
        row = img_logits[i][:vocab_size]
        img_in.append(row[mask])
        img_out.append(row[~mask])
        for ci in caps_of.get(i, []):
            own = np.zeros(vocab_size, bool)
            own[text_candidate_ids(cap_examples[ci].text, encode_word)] = True
            crow = cap_logits[ci][:vocab_size]
            txt_in.append(crow[own])
            txt_out.append(crow[~own])

    cat = lambda xs: np.concatenate(xs) if xs else np.zeros(0, np.float32)
    return TermWeightStats(cat(img_in), cat(img_out), cat(txt_in), cat(txt_out))


def _raw_sparse(examples, params, arch, tokenizer, template, encode_type,
                sparse_cfg, batch_size, mesh, lora, pixel_loader):
    """Full-vocab sparse weights per example (before top-k selection)."""
    import jax
    from mllm_sparse_retrieval_tpu.configs import RepsLoc
    from mllm_sparse_retrieval_tpu.models.api import (
        encode_any, image_input_spec, mrope_ids_for_batch)
    from mllm_sparse_retrieval_tpu.pipelines.encode import (
        default_pixel_loader, _pad_batch_examples)

    spec = image_input_spec(arch)
    if encode_type == "image" and pixel_loader is None:
        raw_loader = default_pixel_loader(spec.image_size)
        pixel_loader = lambda e: spec.preprocess(raw_loader(e))

    @jax.jit
    def enc_text(p, l, ids, mask):
        s, _ = encode_any(p, arch, ids, mask, None, RepsLoc.BEFORE_PAD, l)
        return s

    @jax.jit
    def enc_img(p, l, ids, mask, pix, pos):
        s, _ = encode_any(p, arch, ids, mask, pix, RepsLoc.BEFORE_PAD, l,
                          position_ids=pos)
        return s

    fixed_pos = None
    if encode_type == "image":
        prompt = template.image_prompt().replace(
            "<image>", " ".join(["<image>"] * spec.num_image_tokens))
        fixed_ids, fixed_mask = tokenizer.pad_batch(
            [tokenizer.encode(prompt)] * batch_size, pad_to_multiple=16)
        if spec.needs_mrope:
            fixed_pos = mrope_ids_for_batch(arch, fixed_ids, fixed_mask)

    out = []
    for start in range(0, len(examples), batch_size):
        batch = _pad_batch_examples(examples[start:start + batch_size],
                                    batch_size)
        valid = min(batch_size, len(examples) - start)
        if encode_type == "text":
            prompts = [template.fill_text(template.text_prompt(), e.text)
                       for e in batch]
            ids, mask = tokenizer.pad_batch(
                [tokenizer.encode(p) for p in prompts], pad_to_multiple=16)
            s = enc_text(params, lora, ids, mask)
        else:
            pixels = np.stack([pixel_loader(e) for e in batch])
            s = enc_img(params, lora, fixed_ids, fixed_mask, pixels,
                        fixed_pos)
        out.append(np.asarray(s, np.float32)[:valid])
    return np.concatenate(out) if out else np.zeros((0, tokenizer.vocab_size))


@dataclass
class ProvenanceStats:
    dense_ranks: np.ndarray     # final fused rank of dense-only docs
    sparse_ranks: np.ndarray
    fused_ranks: np.ndarray

    def summary(self) -> str:
        def s(x):
            return f"n={x.size} median={np.median(x):.0f}" if x.size else "n=0"
        return (f"dense-only {s(self.dense_ranks)} | "
                f"sparse-only {s(self.sparse_ranks)} | "
                f"fused {s(self.fused_ranks)}")


def fusion_provenance_statistics(
    dense_run: Run,
    sparse_run: Run,
    alpha: float = 0.5,
    top_n: int = 200,
) -> ProvenanceStats:
    """Ranks (1-based, within top_n) at which dense-only / sparse-only /
    both-sourced docs land after fusion (reference score_statistic.py:406-417)."""
    tagged = fuse_statistic([dense_run, sparse_run], [alpha, 1.0 - alpha])
    dense_ranks, sparse_ranks, fused_ranks = [], [], []
    for qid, docs in tagged.items():
        ordered = sorted(docs.items(), key=lambda kv: kv[1].score,
                         reverse=True)[:top_n]
        for rank, (doc, rec) in enumerate(ordered, start=1):
            if rec.type == "dense":
                dense_ranks.append(rank)
            elif rec.type == "sparse":
                sparse_ranks.append(rank)
            else:
                fused_ranks.append(rank)
    return ProvenanceStats(np.asarray(dense_ranks), np.asarray(sparse_ranks),
                           np.asarray(fused_ranks))


# ---------------------------------------------------------------------------
# Plotting (matplotlib optional)
# ---------------------------------------------------------------------------

def plot_term_weight_stats(stats: TermWeightStats, out_dir: str) -> List[str]:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    panels = [
        ("image_weights", [("in caption", stats.image_in_text),
                           ("out of caption", stats.image_out_text)]),
        ("text_weights", [("in caption", stats.text_in_text),
                          ("out of caption", stats.text_out_text)]),
        ("in_text_compare", [("image", stats.image_in_text),
                             ("text", stats.text_in_text)]),
    ]
    for name, series in panels:
        fig, ax = plt.subplots(figsize=(7, 4))
        for label, data in series:
            if data.size:
                ax.hist(data, bins=60, alpha=0.55, label=label, density=True)
        ax.set_title(name.replace("_", " "))
        ax.set_xlabel("sparse weight")
        ax.legend()
        path = os.path.join(out_dir, f"{name}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def plot_provenance_stats(stats: ProvenanceStats, out_dir: str) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(7, 4))
    for label, data in (("dense-only", stats.dense_ranks),
                        ("sparse-only", stats.sparse_ranks),
                        ("fused", stats.fused_ranks)):
        if data.size:
            ax.hist(data, bins=50, alpha=0.55, label=label)
    ax.set_xlabel("fused rank")
    ax.set_ylabel("count")
    ax.set_title("fusion provenance rank distribution")
    ax.legend()
    path = os.path.join(out_dir, "provenance_ranks.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path

"""Offline corpus/query encoding pipeline.

The TPU re-design of /root/reference/src/encode.py:162-457:

- the reference runs one NCCL process per GPU, shards the dataset with a
  shuffled DistributedSampler, all-gathers every batch's tensors and Python
  ids to rank 0, and does sparse term selection + all file IO there. Here one
  process drives all chips: batches are padded to a fixed device batch,
  sharded over the mesh's data axis inside ``jit`` (XLA partitions the
  forward), and come back as replicated outputs — ids never leave the host,
  so there is nothing to all-gather;
- dense embeddings are L2-normalized on device;
- sparse term selection runs on host against the golden implementation in
  sparse/term_selection.py (string-keyed Lucene-parity vectors).

Artifacts (format-compatible with the reference so either stack can consume
them, /root/reference/src/encode.py:397-457):
- dense:  ``corpus_{shard}.pkl`` / ``query.pkl``  = pickled (float32 [N, d], ids)
- sparse: ``corpus_{shard}.jsonl`` (JsonVectorCollection docs) /
          ``query.tsv`` (id<TAB>token repeated weight-many times)
"""

from __future__ import annotations

import json
import os
import pickle
import zlib
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from mllm_sparse_retrieval_tpu.configs import RepsLoc
from mllm_sparse_retrieval_tpu.data.karpathy import Example
from mllm_sparse_retrieval_tpu.models.reps import normalize
from mllm_sparse_retrieval_tpu.sparse import (
    SelectedTerms,
    doc_string_vector,
    get_filtered_ids,
    query_string_weights,
    select_image_terms,
    select_text_terms,
)


@dataclass
class EncodeResult:
    """Encoded batch output.

    The primary sparse form is ``selected_terms`` (token-id arrays — the
    TPU-native key space, fed straight to ``ImpactIndex.search_terms`` /
    ``from_selected_terms`` with no string work). The Lucene-parity string
    views ``sparse_vectors`` / ``query_weights`` are materialized lazily on
    first access — building them eagerly per batch serialized ~70 ms of
    dict/string work with the encode pipeline (VERDICT r3 #1); artifact
    writers still read them and get identical dicts.
    """

    ids: List[str] = field(default_factory=list)
    dense: Optional[np.ndarray] = None                  # [N, d] normalized f32
    selected_terms: List[SelectedTerms] = field(default_factory=list)
    is_query: bool = False
    is_filtered: bool = False
    # id -> token string map for the lazy string views (set by the pipeline)
    id_to_token: Optional[Dict[int, str]] = None
    _sparse_vectors: Optional[List[Dict[str, int]]] = None
    _query_weights: Optional[List[Dict[str, int]]] = None

    @property
    def sparse_vectors(self) -> List[Dict[str, int]]:
        """Doc string vectors (corpus jsonl form); [] on query results."""
        if self.is_query:
            return []
        if self._sparse_vectors is None:
            self._sparse_vectors = [
                doc_string_vector(t, self.id_to_token, self.is_filtered)
                for t in self.selected_terms]
        return self._sparse_vectors

    @property
    def query_weights(self) -> List[Dict[str, int]]:
        """Query string-weight dicts (query.tsv form); [] on corpus results."""
        if not self.is_query:
            return []
        if self._query_weights is None:
            self._query_weights = [
                query_string_weights(t, self.id_to_token, self.is_filtered)
                for t in self.selected_terms]
        return self._query_weights


CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def default_pixel_loader(image_size: int) -> Callable[[Example], np.ndarray]:
    """Load+resize+CLIP-normalize an image; deterministic synthetic pixels
    when the file is absent (this environment ships no image data)."""
    mean, std = CLIP_MEAN, CLIP_STD

    def load(ex: Example) -> np.ndarray:
        if os.path.exists(ex.image_path):
            from PIL import Image
            img = Image.open(ex.image_path).convert("RGB")
            img = img.resize((image_size, image_size), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
        else:
            # crc32, NOT hash(): str hashes are salted per process, which
            # would give the same img_id different synthetic pixels on the
            # corpus and query sides of separate runs
            rng = np.random.default_rng(zlib.crc32(str(ex.img_id).encode()))
            arr = rng.uniform(size=(image_size, image_size, 3)).astype(np.float32)
        return (arr - mean) / std

    return load


def default_raw_image_loader(
    synthetic_size: tuple = (480, 640),
) -> Callable[[Example], np.ndarray]:
    """Load an image at its ORIGINAL resolution, un-normalized [H, W, 3] in
    [0,1] — the input form for variable-token families (anyres grid choice /
    dynamic tiling depend on the true aspect ratio). Deterministic synthetic
    non-square pixels when the file is absent."""

    def load(ex: Example) -> np.ndarray:
        if os.path.exists(ex.image_path):
            from PIL import Image
            img = Image.open(ex.image_path).convert("RGB")
            return np.asarray(img, np.float32) / 255.0
        rng = np.random.default_rng(zlib.crc32(str(ex.img_id).encode()))
        return rng.uniform(size=synthetic_size + (3,)).astype(np.float32)

    return load


def _pad_batch_examples(batch: Sequence[Example], size: int) -> List[Example]:
    out = list(batch)
    while len(out) < size:
        out.append(batch[-1])
    return out


def make_text_ds_encode(arch, reps_loc, k_text_full: int, exp_k: int,
                        allow_flash=True):
    """Build the text device-select encode program ONCE: returns
    ``(jit_fn, spec_fn)`` where ``jit_fn(params, lora, ids, mask, cand_ids,
    cand_mask, fmask)`` packs (full-vocab top-k, candidate top-k [+ expansion
    top-k], L2-normalized dense) into one device array and ``spec_fn(cand_w)``
    gives the matching ``unpack_blocks`` spec.

    Shared by the offline pipeline (``encode_examples``, which builds its
    jits per call — fine for one corpus pass) and the online serving encoder
    (``serving/encoder.py``, which must compile once and reuse per request
    batch). ``fmask`` is the filtered-vocab bool mask when
    ``exp_k > 0``, else None (the expansion block is compiled out).
    """
    from mllm_sparse_retrieval_tpu.models.api import encode_any
    from mllm_sparse_retrieval_tpu.ops.packing import pack_blocks

    hidden = arch.text.hidden_size

    @jax.jit
    def _fn(p, l, ids, mask, cand_ids, cand_mask, fmask):
        from mllm_sparse_retrieval_tpu.ops.select import (
            candidate_topk, filtered_topk, vocab_topk)
        sparse, dense = encode_any(p, arch, ids, mask, None, reps_loc, l,
                                   allow_flash=allow_flash)
        fv, fi = vocab_topk(sparse, k_text_full)
        cv, ci, cnt = candidate_topk(sparse, cand_ids, cand_mask, 128)
        blocks = [(fv, True), (fi, False), (cv, True), (ci, False),
                  (cnt, False)]
        if fmask is not None:
            # over-provision by the candidate width (the exclusion bound)
            ev, ei = filtered_topk(sparse, fmask, exp_k + cand_ids.shape[1])
            blocks += [(ev, True), (ei, False)]
        return pack_blocks(blocks + [(normalize(dense), True)])

    def _spec(cand_w):
        # widths mirror the k clamps inside ops/select (k = min(k, width))
        vocab = arch.text.vocab_size
        kt = min(k_text_full, vocab)
        cw = min(128, cand_w)
        spec = [(kt, True), (kt, False), (cw, True), (cw, False), (1, False)]
        if exp_k > 0:
            ew = min(exp_k + cand_w, vocab)
            spec += [(ew, True), (ew, False)]
        return spec + [(hidden, True)]

    return _fn, _spec


def make_image_ds_encode(arch, reps_loc, k_image: int, exp_k: int,
                         allow_flash=True):
    """Image counterpart of ``make_text_ds_encode``: ``jit_fn(params, lora,
    ids, mask, pixels, pos, fmask)`` packs (full-vocab top-k [+ expansion
    top-k], normalized dense); ``spec_fn()`` is shape-static (image
    selection has no candidate set — /root/reference/src/encode.py:126-153
    takes the top ``sparse_length`` vocab terms)."""
    from mllm_sparse_retrieval_tpu.models.api import encode_any
    from mllm_sparse_retrieval_tpu.ops.packing import pack_blocks

    hidden = arch.text.hidden_size

    @jax.jit
    def _fn(p, l, ids, mask, pixels, pos, fmask):
        from mllm_sparse_retrieval_tpu.ops.select import (
            filtered_topk, vocab_topk)
        sparse, dense = encode_any(p, arch, ids, mask, pixels, reps_loc, l,
                                   position_ids=pos, allow_flash=allow_flash)
        fv, fi = vocab_topk(sparse, k_image)
        blocks = [(fv, True), (fi, False)]
        if fmask is not None:
            ev, ei = filtered_topk(sparse, fmask, exp_k + k_image)
            blocks += [(ev, True), (ei, False)]
        return pack_blocks(blocks + [(normalize(dense), True)])

    def _spec():
        vocab = arch.text.vocab_size
        ki = min(k_image, vocab)
        spec = [(ki, True), (ki, False)]
        if exp_k > 0:
            ew = min(exp_k + k_image, vocab)
            spec += [(ew, True), (ew, False)]
        return spec + [(hidden, True)]

    return _fn, _spec


def resolve_image_ds_rows(parts, valid: int, sparse_cfg
                          ) -> List[SelectedTerms]:
    """SelectedTerms rows from the unpacked ``make_image_ds_encode`` output
    (``parts`` INCLUDING the trailing dense block): top-k vocab terms,
    optional expansion terms excluding the selected top-k ids."""
    from mllm_sparse_retrieval_tpu.sparse.term_selection import (
        quantize_weights)

    exp_k = sparse_cfg.num_expanded_tokens
    fv, fi = parts[0], parts[1]
    exp = (parts[2], parts[3]) if len(parts) == 5 else None
    out: List[SelectedTerms] = []
    for b in range(valid):
        t_ids, t_vals = fi[b], fv[b]
        if exp is not None:
            # image expansion excludes the selected top-k ids
            t_ids, t_vals = expand_terms(
                t_ids, t_vals, t_ids, (exp[0][b], exp[1][b]), exp_k)
        out.append(SelectedTerms(
            t_ids.astype(np.int32),
            quantize_weights(t_vals, sparse_cfg.quantization_scale)))
    return out


def expand_terms(t_ids, t_vals, excl_ids, exp_row, exp_k: int):
    """Append ``exp_k`` expansion terms: first exp_k ranked filtered ids not
    in ``excl_ids`` (golden: setdiff1d + topk — same order)."""
    ev, ei = exp_row
    excl = set(int(x) for x in excl_ids)
    neg_inf = np.finfo(np.float32).min
    add_ids, add_vals = [], []
    for v, i in zip(ev, ei):
        if len(add_ids) >= exp_k or v <= neg_inf / 2:
            break
        if int(i) in excl:
            continue
        add_ids.append(int(i))
        add_vals.append(float(v))
    if not add_ids:
        return t_ids, t_vals
    return (np.concatenate([t_ids, np.asarray(add_ids, np.int32)]),
            np.concatenate([t_vals, np.asarray(add_vals, np.float32)]))


def resolve_text_ds_rows(parts, valid: int, cand_ids, cand_mask,
                         sparse_cfg) -> List[SelectedTerms]:
    """SelectedTerms rows from the unpacked output of the
    ``make_text_ds_encode`` program (``parts`` INCLUDING the trailing dense
    block, which is ignored here) — the reference's per-caption selection
    rule (/root/reference/src/encode.py:96-153): candidate top-k when any
    in-text candidate scored, full-vocab fallback otherwise, manual-mode
    full-vocab top-``sparse_length``, optional expansion terms excluding
    the caption's own candidates."""
    from mllm_sparse_retrieval_tpu.sparse.term_selection import (
        quantize_weights)

    exp_k = sparse_cfg.num_expanded_tokens
    fv, fi, cv, ci, cnt = parts[0], parts[1], parts[2], parts[3], \
        parts[4][:, 0]
    exp = (parts[5], parts[6]) if len(parts) == 8 else None
    out: List[SelectedTerms] = []
    for b in range(valid):
        if cnt[b] == 0:
            take = sparse_cfg.fallback_top_k
            t_ids, t_vals = fi[b][:take], fv[b][:take]
        elif sparse_cfg.sparse_manual:
            take = sparse_cfg.sparse_length
            t_ids, t_vals = fi[b][:take], fv[b][:take]
        else:
            take = min(int(cnt[b]), 128)
            t_ids, t_vals = ci[b][:take], cv[b][:take]
        if exp is not None:
            # golden excludes the caption's candidate ids
            excl = cand_ids[b][cand_mask[b]]
            t_ids, t_vals = expand_terms(
                t_ids, t_vals, excl, (exp[0][b], exp[1][b]), exp_k)
        out.append(SelectedTerms(
            t_ids.astype(np.int32),
            quantize_weights(t_vals, sparse_cfg.quantization_scale)))
    return out


def encode_examples(
    examples: Sequence[Example],
    params,
    arch,
    tokenizer,
    template,
    *,
    encode_type: str,                  # 'text' | 'image'
    sparse_cfg,
    reps_loc: RepsLoc = RepsLoc.BEFORE_PAD,
    batch_size: int = 8,
    is_query: bool = False,
    mesh=None,
    lora=None,
    pixel_loader: Optional[Callable[[Example], np.ndarray]] = None,
    seq_pad_multiple: int = 16,
    device_select: bool = True,
) -> EncodeResult:
    """Encode examples into dense + sparse representations.

    ``is_query`` picks which sparse artifact form is built alongside the
    dense embeddings: ``True`` → ``query_weights`` (query.tsv / impact
    search input), ``False`` → ``sparse_vectors`` (corpus jsonl / index
    build input). The other list stays empty — building both doubled host
    string work at corpus scale for an artifact nothing consumed.

    ``device_select=True`` (default) runs the sparse top-k on device and
    transfers only ``[B, k]`` ids+values instead of the full ``[B, V]``
    logits (ops/select.py) — bit-identical to the host golden path,
    including expansion configs (``num_expanded_tokens > 0``, served by an
    over-provisioned ``filtered_topk`` + host-side exclusion).
    """
    vocab = tokenizer.get_vocab()
    id_to_token = {v: k for k, v in vocab.items()}
    filtered_ids = get_filtered_ids(vocab)
    encode_word = lambda w: tokenizer.encode(w, add_special_tokens=False)

    if mesh is not None:
        from mllm_sparse_retrieval_tpu.parallel.mesh import replicated
        n_data = mesh.shape["data"]
        if batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis {n_data}")
        params = jax.tree_util.tree_map(lambda x: replicated(mesh, x), params)
        if lora is not None:
            lora = jax.tree_util.tree_map(lambda x: replicated(mesh, x), lora)

    def _shard(*arrays):
        if mesh is None:
            # explicit async device_put: calling a jit with numpy args
            # transfers synchronously through thin-link relays, which would
            # serialize this batch's upload with the previous batch's
            # compute (the same fix as ImpactIndex._dispatch_encoded)
            return tuple(jax.tree_util.tree_map(jax.device_put, x)
                         for x in arrays)
        from mllm_sparse_retrieval_tpu.parallel.mesh import shard_batch
        # each arg may be an array or a pytree of arrays (anyres vision dict)
        return tuple(jax.tree_util.tree_map(lambda a: shard_batch(mesh, a), x)
                     for x in arrays)

    from mllm_sparse_retrieval_tpu.models.api import (
        encode_any, image_input_spec, mrope_ids_for_batch)

    spec = image_input_spec(arch)
    fixed_pos_ids = None
    img_fixed_len = None
    base_img_prompt = None
    if encode_type == "image":
        if spec.variable:
            # anyres / dynamic tiling: per-example token counts. Prompts are
            # padded to the family's max-token length so ONE compiled program
            # serves every image in the corpus.
            if pixel_loader is None:
                pixel_loader = default_raw_image_loader()
            base_img_prompt = template.image_prompt()
            img_fixed_len = len(tokenizer.encode(template.expand_image(
                base_img_prompt, spec.max_image_tokens)))
            # long prompts round to the flash-attention tile so the decoder
            # takes the fused O(T)-memory path (models/layers.py)
            from mllm_sparse_retrieval_tpu.models.layers import FLASH_MIN_SEQ
            if img_fixed_len >= FLASH_MIN_SEQ:
                img_fixed_len = -(-img_fixed_len // 512) * 512
        else:
            if pixel_loader is None:
                raw_loader = default_pixel_loader(spec.image_size)
                pixel_loader = lambda ex: spec.preprocess(raw_loader(ex))
            img_prompt = template.expand_image(template.image_prompt(),
                                               spec.num_image_tokens)
            fixed_rows = [tokenizer.encode(img_prompt)] * batch_size
            fixed_ids, fixed_mask = tokenizer.pad_batch(
                fixed_rows, pad_to_multiple=seq_pad_multiple)
            if spec.needs_mrope:
                fixed_pos_ids = mrope_ids_for_batch(arch, fixed_ids,
                                                    fixed_mask)

    use_device_select = device_select
    k_image = sparse_cfg.sparse_length if sparse_cfg.sparse_manual else 128
    # full-vocab top-k must cover BOTH consumers: manual-mode selection
    # (sparse_length) and the no-candidates fallback (fallback_top_k)
    k_text_full = max(sparse_cfg.sparse_length if sparse_cfg.sparse_manual
                      else 0, sparse_cfg.fallback_top_k)
    exp_k = sparse_cfg.num_expanded_tokens
    filtered_mask_dev = None
    if use_device_select and exp_k > 0:
        import jax.numpy as jnp
        fm = np.zeros(arch.text.vocab_size, bool)
        fm[filtered_ids] = True
        filtered_mask_dev = jnp.asarray(fm)
        if mesh is not None:
            from mllm_sparse_retrieval_tpu.parallel.mesh import replicated
            filtered_mask_dev = replicated(mesh, filtered_mask_dev)

    # flash attention: direct kernel on one chip; under a mesh the Mesh
    # rides through allow_flash and the kernel runs inside a data/model-axis
    # shard_map (layers._sharded_flash) — exactly the multi-chip ~3k-token
    # anyres/tiling encode that needs O(T) attention most (VERDICT r3 #3)
    allow_flash = True if mesh is None else mesh

    # Every jit returns its batch's whole output as ONE packed int32 array
    # (ops/packing.py): each device array the host fetches pays a full link
    # round trip, and the unpacked form was 6-8 fetches per batch. Specs
    # below mirror the pack layout for the host-side unpack.
    from mllm_sparse_retrieval_tpu.ops.packing import pack_blocks

    hidden = arch.text.hidden_size

    @jax.jit
    def _encode_text(p, l, ids, mask):
        sparse, dense = encode_any(p, arch, ids, mask, None, reps_loc, l,
                                   allow_flash=allow_flash)
        return pack_blocks([(sparse, True), (normalize(dense), True)])

    @jax.jit
    def _encode_image(p, l, ids, mask, pixels, pos):
        sparse, dense = encode_any(p, arch, ids, mask, pixels, reps_loc, l,
                                   position_ids=pos, allow_flash=allow_flash)
        return pack_blocks([(sparse, True), (normalize(dense), True)])

    def _plain_spec():
        return [(arch.text.vocab_size, True), (hidden, True)]

    _encode_text_ds, _text_ds_spec = make_text_ds_encode(
        arch, reps_loc, k_text_full, exp_k, allow_flash)

    _encode_image_ds, _image_ds_spec = make_image_ds_encode(
        arch, reps_loc, k_image, exp_k, allow_flash)

    from mllm_sparse_retrieval_tpu.sparse.term_selection import (
        text_candidate_ids)

    def _host_prep(batch):
        """Host-side work for one padded batch: tokenization, candidate
        building, image decode/tiling. Runs on the prefetch thread, one
        batch ahead of the device step."""
        if encode_type == "text":
            prompts = [template.fill_text(template.text_prompt(), ex.text)
                       for ex in batch]
            ids, mask = tokenizer.pad_batch(
                [tokenizer.encode(p) for p in prompts],
                pad_to_multiple=seq_pad_multiple)
            if use_device_select:
                from mllm_sparse_retrieval_tpu.ops.select import pad_candidates
                cand_rows = [text_candidate_ids(ex.text, encode_word)
                             for ex in batch]
                cand_ids, cand_mask = pad_candidates(cand_rows)
                return ids, mask, cand_ids, cand_mask
            return ids, mask, None, None
        if spec.variable:
            vitems = [spec.preprocess_example(pixel_loader(ex))
                      for ex in batch]
            rows = [tokenizer.encode(template.expand_image(
                base_img_prompt, n)) for _, n in vitems]
            b_ids, b_mask = tokenizer.pad_batch(
                rows, max_len=img_fixed_len,
                pad_to_multiple=seq_pad_multiple)
            pixels = spec.batch_vision([item for item, _ in vitems])
            pos = spec.mrope_from_batch(b_ids, b_mask, pixels) \
                if spec.mrope_from_batch else None
        else:
            pixels = np.stack([pixel_loader(ex) for ex in batch])
            b_ids, b_mask = fixed_ids, fixed_mask
            pos = fixed_pos_ids
        return b_ids, b_mask, pixels, pos

    def _prefetched():
        """(batch, valid, host_arrays) with host prep one step ahead of the
        consumer (overlaps PIL decode/tokenization with device compute;
        ops/stream.prefetch_thread handles the stop/error plumbing so an
        aborted consumer can't leave the worker blocked holding multi-GB
        prepared batches)."""
        from mllm_sparse_retrieval_tpu.ops.stream import prefetch_thread

        def produce():
            for start in range(0, len(examples), batch_size):
                raw = examples[start:start + batch_size]
                batch = _pad_batch_examples(raw, batch_size)
                yield batch, len(raw), _host_prep(batch)

        yield from prefetch_thread(produce(), depth=2)

    from mllm_sparse_retrieval_tpu.ops.packing import unpack_blocks

    result = EncodeResult(is_query=is_query,
                          is_filtered=sparse_cfg.is_filtered,
                          id_to_token=id_to_token)
    all_dense: List[np.ndarray] = []

    def _dispatch(batch, valid, host):
        """Enqueue one batch's device program; returns (packed_dev, spec)
        plus whatever the resolver needs. No host sync here — up to
        ``lookahead`` batches stay in flight so batch r+1's upload/compute
        overlaps batch r's result fetch and host-side term selection."""
        if encode_type == "text":
            ids, mask, cand_ids, cand_mask = host
            dids, dmask = _shard(ids, mask)
            if use_device_select:
                dcand_ids, dcand_mask = _shard(cand_ids, cand_mask)
                packed = _encode_text_ds(params, lora, dids, dmask,
                                         dcand_ids, dcand_mask,
                                         filtered_mask_dev)
                return packed, _text_ds_spec(cand_ids.shape[1])
            return _encode_text(params, lora, dids, dmask), _plain_spec()
        b_ids, b_mask, pixels, pos = host
        b_ids, b_mask, pixels = _shard(b_ids, b_mask, pixels)
        if pos is not None and mesh is None:
            # M-RoPE ids ride the async upload too — a numpy jit arg here
            # would re-serialize the pipeline for mrope families (mesh
            # placement keeps its own [3, B, T] layout handling)
            pos = jax.device_put(pos)
        if use_device_select:
            packed = _encode_image_ds(params, lora, b_ids, b_mask, pixels,
                                      pos, filtered_mask_dev)
            return packed, _image_ds_spec()
        return (_encode_image(params, lora, b_ids, b_mask, pixels, pos),
                _plain_spec())

    def _resolve(batch, valid, host, packed_dev, pk_spec):
        parts = unpack_blocks(np.asarray(packed_dev), pk_spec)
        dense = parts[-1]
        batch_terms: List[SelectedTerms] = []

        if encode_type == "text":
            host_cand_ids, host_cand_mask = host[2], host[3]
            if use_device_select:
                batch_terms = resolve_text_ds_rows(
                    parts, valid, host_cand_ids, host_cand_mask, sparse_cfg)
            else:
                sparse_logits = parts[0]
                for b in range(valid):
                    batch_terms.append(select_text_terms(
                        batch[b].text, encode_word, sparse_logits[b],
                        sparse_cfg, filtered_ids))
        else:
            if use_device_select:
                batch_terms = resolve_image_ds_rows(parts, valid, sparse_cfg)
            else:
                sparse_logits = parts[0]
                for b in range(valid):
                    batch_terms.append(select_image_terms(
                        sparse_logits[b], sparse_cfg, filtered_ids))

        all_dense.append(np.asarray(dense, np.float32)[:valid])
        for terms, ex in zip(batch_terms, batch[:valid]):
            result.ids.append(ex.text_id if encode_type == "text"
                              else ex.img_id)
            # the hot resolve path stores only the token-id form; the
            # Lucene-parity string views (query.tsv / corpus jsonl dicts)
            # materialize lazily on first access (EncodeResult properties) —
            # search consumers never pay for them (VERDICT r3 #1)
            result.selected_terms.append(terms)

    import collections

    from mllm_sparse_retrieval_tpu.ops.stream import pipeline_dispatch

    def _dispatch_item(item):
        batch, valid, host = item
        packed, pk_spec = _dispatch(batch, valid, host)
        return batch, valid, host, packed, pk_spec

    collections.deque(
        pipeline_dispatch(_prefetched(), _dispatch_item,
                          lambda h: _resolve(*h), lookahead=2),
        maxlen=0)

    result.dense = np.concatenate(all_dense) if all_dense else \
        np.zeros((0, arch.text.hidden_size), np.float32)
    return result


def artifact_dir(base: str, model_name: str, dataset: str, encode_type: str,
                 sparse_cfg, lora: bool = False) -> str:
    """Reference-shaped output tree (/root/reference/src/encode.py:397-434):
    base/model/dataset/type/{filter|no_filter}/{exp}_{manual}_{len}[_lora]."""
    filt = "filter" if sparse_cfg.is_filtered else "no_filter"
    manual = "manual" if sparse_cfg.sparse_manual else "no_manual"
    leaf = f"{sparse_cfg.num_expanded_tokens}_{manual}_{sparse_cfg.sparse_length}"
    if lora:
        leaf += "_lora"
    return os.path.join(base, model_name, dataset, encode_type, filt, leaf)


def write_artifacts(
    result: EncodeResult,
    dense_dir: str,
    sparse_dir: str,
    is_query: bool = False,
    shard_index: int = 0,
) -> None:
    """Write reference-compatible dense/sparse artifacts."""
    os.makedirs(dense_dir, exist_ok=True)
    os.makedirs(sparse_dir, exist_ok=True)

    dense_name = "query.pkl" if is_query else f"corpus_{shard_index}.pkl"
    with open(os.path.join(dense_dir, dense_name), "wb") as f:
        pickle.dump((result.dense, list(result.ids)), f)

    if is_query:
        # tsv: token repeated weight-many times (Lucene whitespace-count form,
        # /root/reference/src/encode.py:421-424); empty queries skipped.
        with open(os.path.join(sparse_dir, "query.tsv"), "w") as f:
            for qid, weights in zip(result.ids, result.query_weights):
                q = " ".join(" ".join([tok] * w) for tok, w in weights.items())
                if not q.strip():
                    continue
                f.write(f"{qid}\t{q}\n")
    else:
        with open(os.path.join(sparse_dir, f"corpus_{shard_index}.jsonl"),
                  "w") as f:
            for doc_id, vec in zip(result.ids, result.sparse_vectors):
                f.write(json.dumps(
                    {"id": doc_id, "content": "", "vector": vec}) + "\n")


def read_query_tsv(path: str) -> Dict[str, Dict[str, int]]:
    """Parse a query.tsv back into per-query term-count dicts."""
    out: Dict[str, Dict[str, int]] = {}
    with open(path) as f:
        for line in f:
            qid, _, text = line.rstrip("\n").partition("\t")
            counts: Dict[str, int] = {}
            for tok in text.split():
                counts[tok] = counts.get(tok, 0) + 1
            out[qid] = counts
    return out

"""Online query encoder: raw text -> (dense rep, SelectedTerms) on device.

The reference encodes queries inside its offline search script
(/root/reference/src/search.py:348-447: model forward -> sparse term
selection -> index search, batch by batch). This is the same encode math as
the offline pipeline — literally the same program factory and row-resolve
helper (``pipelines.encode.make_text_ds_encode`` /
``resolve_text_ds_rows``), so served terms/reps are bit-compatible with
encode artifacts — repackaged for serving:

- the program is compiled ONCE at construction for a FIXED
  (batch, text_len, candidate_width) shape (``encode_examples`` rebuilds
  its jits per call, which is fine for one corpus pass and fatal at one
  retrace per request batch);
- every request batch is padded to that shape, so the program cache holds
  exactly one entry per encoder.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from mllm_sparse_retrieval_tpu.configs import RepsLoc


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class OnlineQueryEncoder:
    """Text-query encoder with a single persistent compiled program.

    ``encode_texts`` is NOT thread-safe by itself; the serving layer calls
    it from the micro-batcher's single dispatcher thread.

    Texts longer than ``max_text_len`` tokens are truncated (the dense rep
    is read at the last non-pad token, so a cut prompt encodes the cut
    text — acceptable for serving caption-length queries, never for
    artifact generation; use the offline pipeline for that). Queries with
    more than ``max_candidates`` distinct in-text candidate tokens raise
    (they would need a wider compiled program).
    """

    def __init__(
        self,
        params,
        arch,
        tokenizer,
        template,
        sparse_cfg,
        *,
        reps_loc: RepsLoc = RepsLoc.BEFORE_PAD,
        lora=None,
        max_text_len: int = 64,
        max_candidates: int = 256,
    ):
        from mllm_sparse_retrieval_tpu.pipelines.encode import (
            make_text_ds_encode)
        from mllm_sparse_retrieval_tpu.sparse import get_filtered_ids

        self.params = params
        self.arch = arch
        self.tokenizer = tokenizer
        self.template = template
        self.sparse_cfg = sparse_cfg
        self.lora = lora
        self._reps_loc = reps_loc
        self.max_text_len = _round_up(max_text_len, 16)
        self.max_candidates = int(max_candidates)

        k_text_full = max(
            sparse_cfg.sparse_length if sparse_cfg.sparse_manual else 0,
            sparse_cfg.fallback_top_k)
        exp_k = sparse_cfg.num_expanded_tokens
        self._fn, spec_fn = make_text_ds_encode(
            arch, reps_loc, k_text_full, exp_k)
        self._spec = spec_fn(self.max_candidates)

        self._encode_word = lambda w: tokenizer.encode(
            w, add_special_tokens=False)
        self._fmask = None
        if exp_k > 0:
            import jax.numpy as jnp
            fm = np.zeros(arch.text.vocab_size, bool)
            fm[get_filtered_ids(tokenizer.get_vocab())] = True
            self._fmask = jnp.asarray(fm)
        self._img = None     # lazy image-program state (dict)

    def encode_texts(
        self, texts: Sequence[str], pad_to: Optional[int] = None
    ) -> Tuple[np.ndarray, List]:
        """Encode up to ``pad_to`` texts in one fixed-shape program call.

        Returns ``(dense [len(texts), d] float32 L2-normalized,
        selected_terms: List[SelectedTerms])`` — pad rows never resolve.
        """
        import jax

        from mllm_sparse_retrieval_tpu.ops.packing import unpack_blocks
        from mllm_sparse_retrieval_tpu.pipelines.encode import (
            resolve_text_ds_rows)
        from mllm_sparse_retrieval_tpu.sparse.term_selection import (
            text_candidate_ids)

        n = len(texts)
        b = int(pad_to or n)
        if n == 0 or n > b:
            raise ValueError(f"got {n} texts for a batch of {b}")
        padded = list(texts) + [""] * (b - n)

        prompt = self.template.text_prompt()
        rows = [self.tokenizer.encode(self.template.fill_text(prompt, t))
                for t in padded]
        ids, mask = self.tokenizer.pad_batch(
            rows, max_len=self.max_text_len, pad_to_multiple=16)

        c = self.max_candidates
        cand_ids = np.zeros((b, c), np.int32)
        cand_mask = np.zeros((b, c), bool)
        for i, t in enumerate(texts):
            r = text_candidate_ids(t, self._encode_word)
            if len(r) > c:
                raise ValueError(
                    f"query has {len(r)} candidate tokens; this encoder "
                    f"was compiled for <= {c} (max_candidates)")
            cand_ids[i, : len(r)] = r
            cand_mask[i, : len(r)] = True

        d_ids, d_mask, d_ci, d_cm = (jax.device_put(x) for x in
                                     (ids, mask, cand_ids, cand_mask))
        packed = self._fn(self.params, self.lora, d_ids, d_mask,
                          d_ci, d_cm, self._fmask)
        parts = unpack_blocks(np.asarray(packed), self._spec)
        terms = resolve_text_ds_rows(parts, n, cand_ids, cand_mask,
                                     self.sparse_cfg)
        dense = np.asarray(parts[-1], np.float32)[:n]
        return dense, terms

    # ---- image queries ---------------------------------------------------------

    def _image_state(self) -> dict:
        """Lazy per-encoder image-program state: the jitted program, its
        unpack spec, and the family's prompt/pixel plumbing (same shapes
        the offline pipeline compiles — fixed-spec families share one
        [B, ...] pixel layout; variable families pad prompts to the
        family max so one program serves every grid/tiling)."""
        if self._img is not None:
            return self._img
        from mllm_sparse_retrieval_tpu.models.api import image_input_spec
        from mllm_sparse_retrieval_tpu.pipelines.encode import (
            make_image_ds_encode)

        spec = image_input_spec(self.arch)
        k_image = (self.sparse_cfg.sparse_length
                   if self.sparse_cfg.sparse_manual else 128)
        fn, spec_fn = make_image_ds_encode(
            self.arch, self._reps_loc, k_image,
            self.sparse_cfg.num_expanded_tokens)
        st = {"spec": spec, "fn": fn, "unpack": spec_fn(), "pos_cache": {}}
        if spec.variable:
            base = self.template.image_prompt()
            fixed_len = len(self.tokenizer.encode(
                self.template.expand_image(base, spec.max_image_tokens)))
            from mllm_sparse_retrieval_tpu.models.layers import FLASH_MIN_SEQ
            if fixed_len >= FLASH_MIN_SEQ:
                fixed_len = _round_up(fixed_len, 512)
            st["base_prompt"] = base
            st["fixed_len"] = fixed_len
        else:
            prompt = self.template.expand_image(
                self.template.image_prompt(), spec.num_image_tokens)
            st["row"] = self.tokenizer.encode(prompt)
        self._img = st
        return st

    def _fixed_pixels(self, spec, raw: np.ndarray) -> np.ndarray:
        """Raw [H, W, 3] float in [0,1] -> the fixed family's model pixel
        layout: resize to the square input size (u8 PIL round trip when
        resizing — serving-grade, matches the file loader's BICUBIC),
        CLIP-normalize, spec.preprocess."""
        from mllm_sparse_retrieval_tpu.pipelines.encode import (
            CLIP_MEAN, CLIP_STD)

        s = spec.image_size
        raw = np.asarray(raw, np.float32)
        if raw.ndim != 3 or raw.shape[2] != 3:
            raise ValueError(f"image must be [H, W, 3], got {raw.shape}")
        if raw.shape[:2] != (s, s):
            from PIL import Image
            img = Image.fromarray(
                np.clip(raw * 255.0, 0, 255).astype(np.uint8))
            raw = np.asarray(img.resize((s, s), Image.BICUBIC),
                             np.float32) / 255.0
        return spec.preprocess((raw - CLIP_MEAN) / CLIP_STD)

    def encode_images(
        self, images: Sequence[np.ndarray], pad_to: Optional[int] = None
    ) -> Tuple[np.ndarray, List]:
        """Encode raw images ([H, W, 3] float in [0,1], any resolution) in
        one fixed-shape program call; same return contract as
        ``encode_texts``. The image program compiles lazily on first use."""
        import jax

        from mllm_sparse_retrieval_tpu.ops.packing import unpack_blocks
        from mllm_sparse_retrieval_tpu.pipelines.encode import (
            resolve_image_ds_rows)

        n = len(images)
        b = int(pad_to or n)
        if n == 0 or n > b:
            raise ValueError(f"got {n} images for a batch of {b}")
        st = self._image_state()
        spec = st["spec"]

        if spec.variable:
            vitems = [spec.preprocess_example(np.asarray(im, np.float32))
                      for im in images]
            vitems += [vitems[-1]] * (b - n)        # pad rows never resolve
            rows = [self.tokenizer.encode(self.template.expand_image(
                st["base_prompt"], nt)) for _, nt in vitems]
            ids, mask = self.tokenizer.pad_batch(
                rows, max_len=st["fixed_len"], pad_to_multiple=16)
            pixels = spec.batch_vision([item for item, _ in vitems])
            pos = (spec.mrope_from_batch(ids, mask, pixels)
                   if spec.mrope_from_batch else None)
        else:
            px = [self._fixed_pixels(spec, im) for im in images]
            px += [px[-1]] * (b - n)
            pixels = np.stack(px)
            if b not in st["pos_cache"]:
                ids, mask = self.tokenizer.pad_batch(
                    [st["row"]] * b, pad_to_multiple=16)
                pos = None
                if getattr(spec, "needs_mrope", False):
                    from mllm_sparse_retrieval_tpu.models.api import (
                        mrope_ids_for_batch)
                    pos = mrope_ids_for_batch(self.arch, ids, mask)
                st["pos_cache"][b] = (ids, mask, pos)
            ids, mask, pos = st["pos_cache"][b]

        d_ids, d_mask = jax.device_put(ids), jax.device_put(mask)
        d_px = jax.tree_util.tree_map(jax.device_put, pixels)
        d_pos = jax.device_put(pos) if pos is not None else None
        packed = st["fn"](self.params, self.lora, d_ids, d_mask, d_px,
                          d_pos, self._fmask)
        parts = unpack_blocks(np.asarray(packed), st["unpack"])
        terms = resolve_image_ds_rows(parts, n, self.sparse_cfg)
        dense = np.asarray(parts[-1], np.float32)[:n]
        return dense, terms

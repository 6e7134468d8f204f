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

"""Model layer tests: tokenizer, ViT/Llama shapes, splicing, reps, LoRA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mllm_sparse_retrieval_tpu.configs import ModelConfig, ModelFamily, RepsLoc
from mllm_sparse_retrieval_tpu.models import mllm, llama, vit, lora as lora_lib
from mllm_sparse_retrieval_tpu.models.registry import build_model, tiny_debug_arch
from mllm_sparse_retrieval_tpu.models.reps import extract_reps, normalize, \
    select_rep_positions
from mllm_sparse_retrieval_tpu.models.tokenizer import WordPieceLiteTokenizer

CAPTIONS = [
    "a man rides a small moped on a dirt road",
    "two dogs play in the grass near a fence",
    "a group of people stand around a market stall",
]


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(family=ModelFamily.TINY_DEBUG, dtype="float32",
                      tiny_vocab_size=512, tiny_hidden_size=64,
                      tiny_num_layers=2, tiny_num_heads=4,
                      tiny_image_size=32, tiny_patch_size=16)
    params, arch, tok, template = build_model(cfg, captions=CAPTIONS)
    return params, arch, tok, template


def test_tokenizer_roundtrip_and_specials():
    tok = WordPieceLiteTokenizer.from_corpus_captions(CAPTIONS, vocab_size=512)
    assert tok.vocab_size == 512
    ids = tok.encode("a man rides", add_special_tokens=False)
    assert all(0 <= i < tok.vocab_size for i in ids)
    # known word encodes to a single ▁word piece
    vocab = tok.get_vocab()
    assert vocab["▁man"] in ids
    # <image> maps to the image token
    ids2 = tok.encode("<image> hello", add_special_tokens=False)
    assert ids2[0] == tok.image_token_id
    # unknown words fall back to characters, never crash
    ids3 = tok.encode("zzzgibberishzzz", add_special_tokens=False)
    assert len(ids3) > 1


def test_pad_batch():
    tok = WordPieceLiteTokenizer.from_corpus_captions(CAPTIONS, vocab_size=512)
    rows = [tok.encode(c) for c in CAPTIONS]
    ids, mask = tok.pad_batch(rows)
    assert ids.shape == mask.shape
    assert ids.shape[1] % 8 == 0
    for r, m in zip(rows, mask):
        assert m.sum() == len(r)


def test_text_encode_shapes_and_jit(tiny):
    params, arch, tok, template = tiny
    prompts = [template.fill_text(template.text_prompt(), c) for c in CAPTIONS]
    ids, mask = tok.pad_batch([tok.encode(p) for p in prompts])

    encode = jax.jit(
        lambda p, i, m: mllm.encode(p, arch, i, m, None, RepsLoc.BEFORE_PAD))
    sparse, dense = encode(params, ids, mask)
    assert sparse.shape == (3, arch.text.vocab_size)
    assert dense.shape == (3, arch.text.hidden_size)
    assert bool(jnp.all(sparse >= 0))  # log1p(relu) is nonnegative
    assert bool(jnp.all(jnp.isfinite(dense)))


def test_image_encode_and_splice(tiny):
    params, arch, tok, template = tiny
    n_img = arch.num_image_tokens
    prompt = template.image_prompt()
    # expand <image> into n_img placeholders like an HF processor does
    expanded = prompt.replace("<image>", " ".join(["<image>"] * n_img))
    ids, mask = tok.pad_batch([tok.encode(expanded)] * 2)
    assert int((ids == arch.image_token_id).sum()) == 2 * n_img
    pixels = np.random.default_rng(0).normal(
        size=(2, arch.vision.image_size, arch.vision.image_size, 3)
    ).astype(np.float32)
    sparse, dense = mllm.encode(params, arch, ids, mask, pixels)
    assert sparse.shape == (2, arch.text.vocab_size)
    # different images must produce different reps
    pixels2 = pixels.copy()
    pixels2[1] += 1.0
    _, dense2 = mllm.encode(params, arch, ids, mask, pixels2)
    assert not np.allclose(np.asarray(dense)[1], np.asarray(dense2)[1])
    np.testing.assert_allclose(np.asarray(dense)[0], np.asarray(dense2)[0],
                               rtol=1e-5)


def test_splice_positions():
    # hand-built: T=5, image tokens at positions 1 and 3
    token_embeds = jnp.zeros((1, 5, 2))
    image_embeds = jnp.asarray([[[1.0, 1.0], [2.0, 2.0]]])  # P=2
    is_image = jnp.asarray([[False, True, False, True, False]])
    out = mllm.splice_image_embeddings(token_embeds, image_embeds, is_image)
    np.testing.assert_array_equal(np.asarray(out[0, 1]), [1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(out[0, 3]), [2.0, 2.0])
    np.testing.assert_array_equal(np.asarray(out[0, 0]), [0.0, 0.0])


def test_reps_loc_before_vs_after_pad():
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    pos_before = select_rep_positions(mask, RepsLoc.BEFORE_PAD)
    pos_after = select_rep_positions(mask, RepsLoc.AFTER_PAD)
    np.testing.assert_array_equal(np.asarray(pos_before), [2, 4])
    np.testing.assert_array_equal(np.asarray(pos_after), [4, 4])

    hidden = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    head = jnp.eye(3, 4)
    sparse, dense = extract_reps(hidden, mask, head, RepsLoc.BEFORE_PAD)
    np.testing.assert_array_equal(np.asarray(dense[0]),
                                  np.asarray(hidden[0, 2]))
    # sparse = log1p(relu(h @ head))
    np.testing.assert_allclose(
        np.asarray(sparse[0, :3]), np.log1p(np.asarray(hidden[0, 2])),
        rtol=1e-6)


def test_padding_invariance_before_pad(tiny):
    """Extra padding must not change before_pad representations."""
    params, arch, tok, template = tiny
    prompt = template.fill_text(template.text_prompt(), CAPTIONS[0])
    row = tok.encode(prompt)
    ids1, mask1 = tok.pad_batch([row], max_len=len(row))
    ids2, mask2 = tok.pad_batch([row], max_len=len(row) + 16)
    s1, d1 = mllm.encode(params, arch, ids1, mask1, None)
    s2, d2 = mllm.encode(params, arch, ids2, mask2, None)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=2e-4, atol=2e-5)


def test_normalize_matches_torch_semantics():
    x = np.array([[3.0, 4.0], [0.0, 0.0]], np.float32)
    out = np.asarray(normalize(jnp.asarray(x)))
    np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-6)
    np.testing.assert_array_equal(out[1], [0.0, 0.0])  # eps-guarded


def test_lora_init_is_identity_and_merge(tiny):
    params, arch, tok, template = tiny
    key = jax.random.PRNGKey(0)
    adapters = lora_lib.init_lora(key, params, arch, rank=4, alpha=8,
                                  train_vision=True, train_projector=True)
    prompt = template.fill_text(template.text_prompt(), CAPTIONS[1])
    ids, mask = tok.pad_batch([tok.encode(prompt)])

    s0, d0 = mllm.encode(params, arch, ids, mask, None)
    s1, d1 = mllm.encode(params, arch, ids, mask, None, lora=adapters)
    # B=0 at init -> adapters are a no-op
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)

    # perturb B, check factored path == merged path
    adapters = jax.tree_util.tree_map(lambda x: x, adapters)
    blk = adapters["text"]["blocks"][0]["q"]
    blk["b"] = blk["b"] + 0.05
    s2, d2 = mllm.encode(params, arch, ids, mask, None, lora=adapters)
    assert not np.allclose(np.asarray(d0), np.asarray(d2))
    merged = lora_lib.merge_lora(params, adapters)
    s3, d3 = mllm.encode(merged, arch, ids, mask, None)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d3),
                               rtol=1e-4, atol=1e-5)


def test_lora_save_load_roundtrip(tiny, tmp_path):
    params, arch, tok, _ = tiny
    adapters = lora_lib.init_lora(jax.random.PRNGKey(1), params, arch, rank=2,
                                  alpha=4)
    path = str(tmp_path / "lora.pkl")
    lora_lib.save_lora(adapters, path)
    back = lora_lib.load_lora(path)
    assert jax.tree_util.tree_structure(adapters) == \
        jax.tree_util.tree_structure(back)
    for a, b in zip(jax.tree_util.tree_leaves(adapters),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_attention_gating():
    """Flash path engages only on real TPU backends with aligned shapes —
    CPU test runs must always take the reference XLA attention."""
    from mllm_sparse_retrieval_tpu.models.layers import (
        FLASH_MIN_SEQ, flash_attention_eligible)

    assert not flash_attention_eligible(2048, 128)  # CPU backend in tests
    assert FLASH_MIN_SEQ >= 512

"""LLaVA-NeXT anyres parity vs HF (processor + model, random-init, offline).

Validates the full anyres chain (models/anyres.py host preprocessing,
models/mllm.py anyres_image_features device path, models/convert.py newline
param) against ``LlavaNextImageProcessor`` / ``LlavaNextForConditionalGeneration``:
tile pixels, spliced token counts, and final hidden states — the reference's
default model family (/root/reference/src/encode.py:221-224).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mllm_sparse_retrieval_tpu.models import anyres as A
from mllm_sparse_retrieval_tpu.models import mllm
from mllm_sparse_retrieval_tpu.models.convert import convert_llava_state_dict
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
from mllm_sparse_retrieval_tpu.models.vit import ViTConfig

HIDDEN = 32
VOCAB = 128
IMG_TOKEN = 100
TILE = 32          # vision image_size (tile side)
PATCH = 8          # vit patch -> pps = 4, ppt = 16
PINPOINTS = ((32, 64), (64, 32), (64, 64))


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (CLIPVisionConfig, LlamaConfig as HFLlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)

    vision_cfg = CLIPVisionConfig(
        hidden_size=HIDDEN, intermediate_size=HIDDEN * 4,
        num_hidden_layers=2, num_attention_heads=4,
        image_size=TILE, patch_size=PATCH, projection_dim=HIDDEN)
    text_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=HIDDEN * 4,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False)
    cfg = LlavaNextConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
        image_grid_pinpoints=[list(p) for p in PINPOINTS])
    torch.manual_seed(0)
    return LlavaNextForConditionalGeneration(cfg).eval().float()


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    params = convert_llava_state_dict(
        hf_model.state_dict(), num_vision_layers=2, num_text_layers=2,
        patch_size=PATCH)
    assert "image_newline" in params, "anyres newline param must convert"
    params = __import__("jax").tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params)
    arch = MLLMConfig(
        vision=ViTConfig(image_size=TILE, patch_size=PATCH,
                         hidden_size=HIDDEN, num_layers=2, num_heads=4,
                         feature_layer=-2, act="quick_gelu"),
        text=LlamaConfig(vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=2,
                         num_heads=4, num_kv_heads=2,
                         intermediate_size=HIDDEN * 4, rope_theta=10000.0),
        image_token_id=IMG_TOKEN,
        grid_pinpoints=PINPOINTS,
    )
    assert arch.anyres and arch.max_tiles == 5 and arch.max_image_tokens == 88
    return params, arch


def _hf_processor():
    from transformers.models.llava_next.image_processing_llava_next import (
        LlavaNextImageProcessor)

    return LlavaNextImageProcessor(
        size={"shortest_edge": TILE},
        crop_size={"height": TILE, "width": TILE},
        image_grid_pinpoints=[list(p) for p in PINPOINTS],
        do_pad=True)


def _images():
    rng = np.random.default_rng(3)
    img_a = rng.integers(0, 256, size=(48, 40, 3)).astype(np.uint8)  # 2x2 grid
    img_b = rng.integers(0, 256, size=(100, 30, 3)).astype(np.uint8)  # 2x1 grid
    return [img_a, img_b]


def test_tile_pixels_match_hf_processor():
    proc = _hf_processor()
    for img in _images():
        out = proc.preprocess([img], return_tensors="np")
        hf_tiles = out["pixel_values"][0]          # [n, 3, 32, 32]
        assert tuple(out["image_sizes"][0]) == img.shape[:2]
        ours = A.preprocess_anyres(img, PINPOINTS, TILE, TILE // PATCH,
                                   n_tiles_max=5, n_tokens_max=88)
        assert ours.n_tiles == hf_tiles.shape[0]
        np.testing.assert_allclose(
            ours.pixels[:ours.n_tiles].transpose(0, 3, 1, 2), hf_tiles,
            rtol=1e-5, atol=1e-5)
        # padding tiles are zero
        assert not ours.pixels[ours.n_tiles:].any()


def test_token_counts_and_grid_shapes():
    # 48x40 -> best (64, 64): 2x2 grid; unpad crops columns
    assert A.grid_shape((48, 40), PINPOINTS, TILE) == (2, 2)
    # 100x30 -> best (64, 32): 2x1 grid
    assert A.grid_shape((100, 30), PINPOINTS, TILE) == (2, 1)
    for size in ((48, 40), (100, 30), (32, 32), (500, 500)):
        n = A.num_image_tokens(size, PINPOINTS, TILE, TILE // PATCH)
        idx, n2 = A.feature_index(size, PINPOINTS, TILE, TILE // PATCH, 5, 88)
        assert n == n2 <= 88
        assert idx.shape == (88,)
        assert idx.max() <= 5 * 16 and idx.min() >= 0


def test_anyres_forward_parity(hf_model, jax_setup):
    params, arch = jax_setup
    proc = _hf_processor()
    images = _images()
    pps = TILE // PATCH

    ours = [A.preprocess_anyres(im, PINPOINTS, TILE, pps, 5, 88)
            for im in images]
    counts = [o.n_tokens for o in ours]

    # build right-padded batch: 3 prefix tokens, N image tokens, 4 suffix
    rng = np.random.default_rng(5)
    seq = 3 + max(counts) + 4
    ids = np.zeros((2, seq), np.int64)
    mask = np.zeros((2, seq), np.int64)
    for b, n in enumerate(counts):
        row = np.concatenate([
            rng.integers(1, 90, size=3),
            np.full(n, IMG_TOKEN),
            rng.integers(1, 90, size=4)])
        ids[b, :len(row)] = row
        mask[b, :len(row)] = 1

    hf_in = proc.preprocess(images, return_tensors="pt")
    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       pixel_values=hf_in["pixel_values"].float(),
                       image_sizes=hf_in["image_sizes"],
                       output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()

    vision_input = {
        "pixels": jnp.asarray(np.stack([o.pixels for o in ours])),
        "feature_index": jnp.asarray(np.stack([o.feature_index
                                               for o in ours])),
    }
    hidden = np.asarray(mllm.forward_hidden(
        params, arch, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), vision_input))

    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(hidden[b, :n], hf_hidden[b, :n],
                                   rtol=5e-4, atol=5e-5)


def test_anyres_1x1_grid_parity():
    """A pinpoint equal to the tile size yields a 1x1 grid; HF still runs
    the grid path (unpad + newline rows) — not a base+newline shortcut."""
    from transformers import (CLIPVisionConfig, LlamaConfig as HFLlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)

    pinpoints = ((32, 32), (32, 64), (64, 32), (64, 64))
    vision_cfg = CLIPVisionConfig(
        hidden_size=HIDDEN, intermediate_size=HIDDEN * 4,
        num_hidden_layers=2, num_attention_heads=4,
        image_size=TILE, patch_size=PATCH, projection_dim=HIDDEN)
    text_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=HIDDEN * 4,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False)
    cfg = LlavaNextConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
        image_grid_pinpoints=[list(p) for p in pinpoints])
    torch.manual_seed(1)
    model = LlavaNextForConditionalGeneration(cfg).eval().float()

    params = convert_llava_state_dict(model.state_dict(), 2, 2, PATCH)
    params = __import__("jax").tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params)
    arch = MLLMConfig(
        vision=ViTConfig(image_size=TILE, patch_size=PATCH,
                         hidden_size=HIDDEN, num_layers=2, num_heads=4,
                         feature_layer=-2, act="quick_gelu"),
        text=LlamaConfig(vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=2,
                         num_heads=4, num_kv_heads=2,
                         intermediate_size=HIDDEN * 4, rope_theta=10000.0),
        image_token_id=IMG_TOKEN, grid_pinpoints=pinpoints)

    assert A.grid_shape((20, 20), pinpoints, TILE) == (1, 1)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(20, 20, 3)).astype(np.uint8)
    ours = A.preprocess_anyres(img, pinpoints, TILE, TILE // PATCH,
                               arch.max_tiles, arch.max_image_tokens)
    # 1x1 grid, square image: no crop -> 16 base + 4 rows x (4 + newline)
    assert ours.n_tokens == 16 + 4 * 5

    from transformers.models.llava_next.image_processing_llava_next import (
        LlavaNextImageProcessor)
    proc = LlavaNextImageProcessor(
        size={"shortest_edge": TILE}, crop_size={"height": TILE, "width": TILE},
        image_grid_pinpoints=[list(p) for p in pinpoints], do_pad=True)
    hf_in = proc.preprocess([img], return_tensors="pt")

    rng2 = np.random.default_rng(10)
    row = np.concatenate([rng2.integers(1, 90, size=2),
                          np.full(ours.n_tokens, IMG_TOKEN),
                          rng2.integers(1, 90, size=3)])
    ids = row[None].astype(np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask),
                    pixel_values=hf_in["pixel_values"].float(),
                    image_sizes=hf_in["image_sizes"],
                    output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()

    vision_input = {
        "pixels": jnp.asarray(ours.pixels[None]),
        "feature_index": jnp.asarray(ours.feature_index[None]),
    }
    hidden = np.asarray(mllm.forward_hidden(
        params, arch, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), vision_input))
    np.testing.assert_allclose(hidden[0], hf_hidden[0], rtol=5e-4, atol=5e-5)


def test_anyres_layout_math_fuzz_vs_hf():
    """Fuzz grid choice + unpad arithmetic + token counts against HF's own
    utilities across random original sizes (no model forward needed)."""
    import torch as _torch
    from transformers.models.llava_next.modeling_llava_next import (
        get_anyres_image_grid_shape, unpad_image)

    pps = TILE // PATCH
    rng = np.random.default_rng(123)
    for _ in range(60):
        h = int(rng.integers(8, 400))
        w = int(rng.integers(8, 400))
        nph, npw = A.grid_shape((h, w), PINPOINTS, TILE)
        hf_nph, hf_npw = get_anyres_image_grid_shape(
            (h, w), [list(p) for p in PINPOINTS], TILE)
        assert (nph, npw) == (hf_nph, hf_npw), (h, w)

        # unpad dims vs HF unpad_image on a marker tensor
        cur_h, cur_w = nph * pps, npw * pps
        marker = _torch.arange(cur_h * cur_w, dtype=_torch.float32
                               ).reshape(1, cur_h, cur_w)
        cropped = unpad_image(marker, (h, w))
        h2, w2, pad_t, pad_l = A.unpad_dims((h, w), (cur_h, cur_w))
        assert cropped.shape[1:] == (h2, w2), (h, w)
        if h2 > 0 and w2 > 0:
            # crop offsets match: top-left element identity
            assert float(cropped[0, 0, 0]) == float(marker[0, pad_t, pad_l])

        n_tok = A.num_image_tokens((h, w), PINPOINTS, TILE, pps)
        assert n_tok == pps * pps + h2 * (w2 + 1)
        idx, n2 = A.feature_index((h, w), PINPOINTS, TILE, pps, 5, 88)
        assert n2 == n_tok <= 88
        assert idx.max() <= 5 * pps * pps

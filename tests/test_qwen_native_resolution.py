"""Qwen2.5-VL native dynamic resolution: HF parity on non-square grids.

The reference feeds images through the Qwen processor's aspect-preserving
smart resize (/root/reference/src/model.py:119 — processor defaults); these
tests pin our host preprocessing to the HF processor bit-for-bit and the
uniform-window batched vision tower to the HF model numerically, across
MIXED non-square grids in one batch (VERDICT r2 next #3).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mllm_sparse_retrieval_tpu.models import qwen_vl
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
from mllm_sparse_retrieval_tpu.models.qwen_vl import (
    QwenViTConfig, QwenVLConfig, batch_native, mrope_position_ids,
    native_item_from_patches, patchify, preprocess_native, smart_resize,
    vision_apply_native)

# tiny dims (mirror tests/test_qwen_parity.py)
V_HID, V_DEPTH, V_HEADS, V_INTER = 64, 4, 4, 128
T_HID, T_LAYERS, T_HEADS, T_KV = 64, 2, 4, 2
VOCAB = 160
IMG_TOKEN, VSTART = 140, 141
PATCH, MERGE, WINDOW = 14, 2, 56     # window = 2x2 merge units
OUT_HID = T_HID
FACTOR = PATCH * MERGE               # 28


def _cfg(max_units: int = 64) -> QwenVLConfig:
    return QwenVLConfig(
        vision=QwenViTConfig(
            hidden_size=V_HID, depth=V_DEPTH, num_heads=V_HEADS,
            intermediate_size=V_INTER, out_hidden_size=OUT_HID,
            patch_size=PATCH, spatial_merge_size=MERGE, window_size=WINDOW,
            fullatt_block_indexes=(2,)),
        text=LlamaConfig(
            vocab_size=VOCAB, hidden_size=T_HID, num_layers=T_LAYERS,
            num_heads=T_HEADS, num_kv_heads=T_KV,
            intermediate_size=T_HID * 4, rope_theta=10000.0, qkv_bias=True,
            mrope_section=(2, 3, 3)),
        image_token_id=IMG_TOKEN, vision_start_token_id=VSTART,
        native_resolution=True,
        min_pixels=4 * FACTOR * FACTOR,
        max_pixels=max_units * FACTOR * FACTOR,
    )


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig, Qwen2_5_VLVisionConfig, Qwen2_5_VLTextConfig)

    vision_cfg = Qwen2_5_VLVisionConfig(
        depth=V_DEPTH, hidden_size=V_HID, intermediate_size=V_INTER,
        num_heads=V_HEADS, patch_size=PATCH, temporal_patch_size=2,
        spatial_merge_size=MERGE, window_size=WINDOW,
        fullatt_block_indexes=[2], out_hidden_size=OUT_HID,
        tokens_per_second=2)
    text_cfg = Qwen2_5_VLTextConfig(
        vocab_size=VOCAB, hidden_size=T_HID, intermediate_size=T_HID * 4,
        num_hidden_layers=T_LAYERS, num_attention_heads=T_HEADS,
        num_key_value_heads=T_KV, rope_theta=10000.0,
        max_position_embeddings=512, tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]})
    cfg = Qwen2_5_VLConfig(
        vision_config=vision_cfg.to_dict(), text_config=text_cfg.to_dict(),
        image_token_id=IMG_TOKEN, vision_start_token_id=VSTART,
        video_token_id=142, vision_end_token_id=143)
    torch.manual_seed(0)
    return Qwen2_5_VLForConditionalGeneration(cfg).eval().float()


@pytest.fixture(scope="module")
def jax_params(hf_model):
    from mllm_sparse_retrieval_tpu.models.convert import (
        convert_qwen25vl_state_dict)

    params = convert_qwen25vl_state_dict(
        hf_model.state_dict(), num_vision_layers=V_DEPTH,
        num_text_layers=T_LAYERS)
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                  params)


def test_smart_resize_matches_hf_fuzz():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize)

    rng = np.random.default_rng(0)
    cases = [(480, 640), (640, 480), (1080, 1920), (28, 28), (17, 3000),
             (333, 517)]
    cases += [tuple(rng.integers(20, 4000, 2)) for _ in range(60)]
    for h, w in cases:
        h, w = int(h), int(w)
        if max(h, w) / min(h, w) > 200:
            continue
        for min_px, max_px in ((4 * 784, 768 * 784), (56 * 56, 1280 * 784)):
            assert smart_resize(h, w, FACTOR, min_px, max_px) == \
                hf_smart_resize(h, w, FACTOR, min_px, max_px), (h, w)


def test_preprocess_matches_hf_processor_three_sizes():
    """Pixel-level parity with Qwen2VLImageProcessor: same grid, same patch
    values, for three non-square sizes (VERDICT done-criterion)."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)

    cfg = _cfg(max_units=64)
    proc = Qwen2VLImageProcessor(
        min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels,
        patch_size=PATCH, merge_size=MERGE, temporal_patch_size=2)
    rng = np.random.default_rng(1)
    for h, w in ((480, 640), (640, 480), (300, 520)):
        img_u8 = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        out = proc(images=[img_u8], return_tensors="np")
        hf_patches = out["pixel_values"]              # [S, pd]
        t_, gh_hf, gw_hf = out["image_grid_thw"][0]

        item, n_tokens = preprocess_native(
            img_u8.astype(np.float32) / 255.0, cfg)
        gh, gw = item["grid_hw"]
        assert (gh, gw) == (gh_hf, gw_hf), (h, w)
        assert n_tokens == (gh // MERGE) * (gw // MERGE)
        s = gh * gw
        np.testing.assert_allclose(item["patches"][:s], hf_patches,
                                   rtol=1e-4, atol=1e-4)
        # pad rows stay zero (the dead patch the layout gathers route to)
        assert not item["patches"][s:].any()


def test_native_vision_tower_matches_hf_mixed_grids(hf_model, jax_params):
    """One batched jit program scores THREE different non-square grids;
    each example matches HF's per-image ragged forward."""
    cfg = _cfg(max_units=64)
    rng = np.random.default_rng(2)
    grids = [(4, 8), (8, 6), (6, 10)]      # patches, all <= 64 units total
    items, hf_outs = [], []
    for gh, gw in grids:
        image = rng.normal(size=(gh * PATCH, gw * PATCH, 3)) \
            .astype(np.float32)
        patches = patchify(image, cfg.vision)
        item, n = native_item_from_patches(patches, gh, gw, cfg)
        assert n == (gh // MERGE) * (gw // MERGE)
        items.append(item)
        with torch.no_grad():
            hf_outs.append(hf_model.model.visual(
                torch.tensor(patches),
                grid_thw=torch.tensor([[1, gh, gw]])).numpy())

    batch = jax.tree_util.tree_map(jnp.asarray, batch_native(items))
    ours = np.asarray(vision_apply_native(jax_params["vision"], batch,
                                          cfg.vision))
    for i, (gh, gw) in enumerate(grids):
        n = (gh // MERGE) * (gw // MERGE)
        np.testing.assert_allclose(ours[i, :n], hf_outs[i],
                                   rtol=2e-4, atol=2e-5, err_msg=str(grids[i]))


def test_native_encode_end_to_end_matches_hf(hf_model, jax_params):
    """Full multimodal encode at a non-square per-image grid: M-RoPE ids
    match HF get_rope_index, last-hidden matches HF."""
    cfg = _cfg(max_units=64)
    rng = np.random.default_rng(3)
    grids = [(6, 8), (4, 10)]
    items, id_rows = [], []
    for gh, gw in grids:
        image = rng.normal(size=(gh * PATCH, gw * PATCH, 3)) \
            .astype(np.float32)
        item, n = native_item_from_patches(patchify(image, cfg.vision),
                                           gh, gw, cfg)
        items.append(item)
        prefix = rng.integers(1, 120, size=3).tolist() + [VSTART]
        suffix = rng.integers(1, 120, size=4).tolist()
        id_rows.append(prefix + [IMG_TOKEN] * n + suffix)

    t_max = max(len(r) for r in id_rows)
    ids = np.zeros((2, t_max), np.int64)
    mask = np.zeros((2, t_max), np.int64)
    for i, r in enumerate(id_rows):
        ids[i, :len(r)] = r
        mask[i, :len(r)] = 1

    thw = np.array([[1, gh, gw] for gh, gw in grids], np.int64)
    pos = mrope_position_ids(ids, mask, IMG_TOKEN, thw, MERGE)
    hf_pos, _ = hf_model.model.get_rope_index(
        torch.tensor(ids), image_grid_thw=torch.tensor(thw),
        attention_mask=torch.tensor(mask))
    np.testing.assert_array_equal(pos, hf_pos.numpy())

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            pixel_values=torch.cat([
                torch.tensor(it["patches"][:gh * gw])
                for it, (gh, gw) in zip(items, grids)]),
            image_grid_thw=torch.tensor(thw), output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()

    vb = jax.tree_util.tree_map(jnp.asarray, batch_native(items))
    sparse, dense = qwen_vl.encode(
        jax_params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), patches=vb,
        position_ids=jnp.asarray(pos))
    for b in range(2):
        last = int(mask[b].sum()) - 1
        np.testing.assert_allclose(np.asarray(dense[b]), hf_hidden[b, last],
                                   rtol=5e-4, atol=5e-5)


def test_extreme_aspect_shrinks_into_budget():
    """Images whose window-padded grid would exceed the family budget are
    deterministically shrunk (halved pixel budget) until they fit."""
    cfg = _cfg(max_units=64)
    img = np.random.default_rng(4).uniform(
        size=(56, 56 * 40, 3)).astype(np.float32)   # aspect 40
    item, n = preprocess_native(img, cfg)
    gh, gw = item["grid_hw"]
    win = WINDOW // PATCH // MERGE
    lhp = -(-(gh // MERGE) // win) * win
    lwp = -(-(gw // MERGE) // win) * win
    assert lhp * lwp <= cfg.padded_window_units
    assert n >= 1


def test_native_pipeline_encode_runs_mixed_sizes():
    """encode_examples end to end on a native-resolution tiny family:
    different source sizes, one compiled program, sane artifacts."""
    from mllm_sparse_retrieval_tpu.configs import (
        ModelConfig, ModelFamily, SparseConfig)
    from mllm_sparse_retrieval_tpu.data.karpathy import Example
    from mllm_sparse_retrieval_tpu.models import build_model
    from mllm_sparse_retrieval_tpu.models.api import image_input_spec
    from mllm_sparse_retrieval_tpu.models import registry
    from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples

    mc = ModelConfig(family=ModelFamily.TINY_QWEN_DEBUG, dtype="float32",
                     tiny_vocab_size=512, tiny_hidden_size=64,
                     tiny_num_layers=2, tiny_num_heads=4)
    params, arch_fixed, tok, template = build_model(
        mc, captions=["a dog runs fast", "a very red car"])
    arch = dataclasses.replace(
        arch_fixed, native_resolution=True,
        min_pixels=4 * 28 * 28, max_pixels=32 * 28 * 28)
    spec = image_input_spec(arch)
    assert spec.variable and spec.needs_mrope

    # synthetic loader with per-example DIFFERENT original sizes
    sizes = {"i0": (200, 340), "i1": (340, 200), "i2": (150, 150),
             "i3": (90, 400)}

    def loader(ex):
        h, w = sizes[ex.img_id]
        rng = np.random.default_rng(abs(hash(ex.img_id)) % 2 ** 31)
        return rng.uniform(size=(h, w, 3)).astype(np.float32)

    examples = [Example(f"caption {k}", f"/none_{k}.jpg", f"t{k}", f"i{k}")
                for k in range(4)]
    res = encode_examples(examples, params, arch, tok, template,
                          encode_type="image", sparse_cfg=SparseConfig(),
                          batch_size=2, pixel_loader=loader)
    assert len(res.ids) == 4
    assert res.dense.shape == (4, 64)
    assert all(len(v) > 0 for v in res.sparse_vectors)
    # distinct aspect ratios produced distinct grids
    g0, _ = spec.preprocess_example(loader(examples[0]))
    g1, _ = spec.preprocess_example(loader(examples[1]))
    assert tuple(g0["grid_hw"]) == tuple(g1["grid_hw"][::-1])

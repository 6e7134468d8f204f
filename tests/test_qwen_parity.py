"""Qwen2.5-VL numerical parity vs a random-init HF model (offline).

Validates the windowed ViT (patch ordering, window permutation + masks, 2-D
rotary, spatial merger), the M-RoPE decoder, and the converter — like
tests/test_hf_parity.py does for the LLaVA family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mllm_sparse_retrieval_tpu.models import qwen_vl
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
from mllm_sparse_retrieval_tpu.models.qwen_vl import (
    QwenViTConfig, QwenVLConfig, mrope_position_ids, patchify, vision_apply)

# tiny dims
V_HID, V_DEPTH, V_HEADS, V_INTER = 64, 4, 4, 128
T_HID, T_LAYERS, T_HEADS, T_KV = 64, 2, 4, 2
VOCAB = 160
IMG_TOKEN, VSTART = 140, 141
PATCH, MERGE, WINDOW = 14, 2, 56     # window = 2x2 merge units
GRID = 8                              # 8x8 patches = 112x112 image
OUT_HID = T_HID


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
    # sub-configs must be dicts (instances are silently dropped by this
    # transformers version's __init__)
    cfg = Qwen2_5_VLConfig(
        vision_config=vision_cfg.to_dict(), text_config=text_cfg.to_dict(),
        image_token_id=IMG_TOKEN, vision_start_token_id=VSTART,
        video_token_id=142, vision_end_token_id=143)
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    from mllm_sparse_retrieval_tpu.models.convert import (
        convert_qwen25vl_state_dict)

    params = convert_qwen25vl_state_dict(
        hf_model.state_dict(), num_vision_layers=V_DEPTH,
        num_text_layers=T_LAYERS)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                    params)
    cfg = QwenVLConfig(
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
        grid_h=GRID, grid_w=GRID)
    return params, cfg


def test_vision_tower_parity(hf_model, jax_setup):
    params, cfg = jax_setup
    rng = np.random.default_rng(0)
    image = rng.normal(size=(GRID * PATCH, GRID * PATCH, 3)).astype(np.float32)
    patches = patchify(image, cfg.vision)              # [S, pd]

    with torch.no_grad():
        hf_out = hf_model.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, GRID, GRID]])).numpy()

    ours = np.asarray(vision_apply(params["vision"], patches[None],
                                   cfg.vision, GRID, GRID))[0]
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-5)


def test_text_only_decoder_parity(hf_model, jax_setup):
    params, cfg = jax_setup
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=(2, 11)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 8:] = 0

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()

    sparse, dense = qwen_vl.encode(
        params, cfg, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask))
    for b in range(2):
        pos = int(mask[b].sum()) - 1
        np.testing.assert_allclose(np.asarray(dense[b]), hf_hidden[b, pos],
                                   rtol=3e-4, atol=3e-5)
        expected = np.log1p(np.maximum(out.logits[b, pos].numpy(), 0))
        np.testing.assert_allclose(np.asarray(sparse[b]), expected,
                                   rtol=3e-4, atol=3e-5)


def test_multimodal_parity(hf_model, jax_setup):
    params, cfg = jax_setup
    rng = np.random.default_rng(2)
    n_img = cfg.num_image_tokens   # (8/2)^2 = 16
    image = rng.normal(size=(GRID * PATCH, GRID * PATCH, 3)).astype(np.float32)
    patches = patchify(image, cfg.vision)

    prefix = rng.integers(1, 120, size=3).tolist() + [VSTART]
    suffix = rng.integers(1, 120, size=4).tolist()
    ids = np.array([prefix + [IMG_TOKEN] * n_img + suffix], np.int64)
    mask = np.ones_like(ids)

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       pixel_values=torch.tensor(patches),
                       image_grid_thw=torch.tensor([[1, GRID, GRID]]),
                       output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()

    pos_ids = mrope_position_ids(ids, mask, IMG_TOKEN, (1, GRID, GRID),
                                 MERGE)
    # HF's get_rope_index must agree with ours
    hf_pos, _ = hf_model.model.get_rope_index(
        torch.tensor(ids), image_grid_thw=torch.tensor([[1, GRID, GRID]]),
        attention_mask=torch.tensor(mask))
    np.testing.assert_array_equal(pos_ids, hf_pos.numpy())

    sparse, dense = qwen_vl.encode(
        params, cfg, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask),
        patches=jnp.asarray(patches[None]),
        position_ids=jnp.asarray(pos_ids))
    pos = ids.shape[1] - 1
    np.testing.assert_allclose(np.asarray(dense[0]), hf_hidden[0, pos],
                               rtol=5e-4, atol=5e-5)

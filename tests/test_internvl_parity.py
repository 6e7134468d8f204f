"""InternVL numerical parity vs a random-init HF model (offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mllm_sparse_retrieval_tpu.models import internvl
from mllm_sparse_retrieval_tpu.models.convert import convert_internvl_state_dict
from mllm_sparse_retrieval_tpu.models.internvl import (
    InternViTConfig, InternVLConfig)
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig

V_HID, V_LAYERS, V_HEADS, V_INTER = 32, 2, 4, 64
T_HID, T_LAYERS, T_HEADS, T_KV = 32, 2, 4, 2
VOCAB = 128
IMG_TOKEN = 120
IMAGE_SIZE, PATCH = 56, 14   # 4x4 patches -> shuffle 0.5 -> 2x2 = 4 tokens


@pytest.fixture(scope="module")
def hf_model():
    from transformers import InternVLForConditionalGeneration
    from transformers.models.internvl.configuration_internvl import (
        InternVLConfig as HFInternVLConfig,
        InternVLVisionConfig)
    from transformers import Qwen2Config

    vision_cfg = InternVLVisionConfig(
        hidden_size=V_HID, num_hidden_layers=V_LAYERS,
        num_attention_heads=V_HEADS, intermediate_size=V_INTER,
        image_size=IMAGE_SIZE, patch_size=PATCH, norm_type="layer_norm",
        use_qk_norm=False, layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0, attention_dropout=0.0,
        projection_dropout=0.0, use_absolute_position_embeddings=True,
        use_mask_token=False)
    text_cfg = Qwen2Config(
        vocab_size=VOCAB, hidden_size=T_HID, intermediate_size=T_HID * 4,
        num_hidden_layers=T_LAYERS, num_attention_heads=T_HEADS,
        num_key_value_heads=T_KV, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False)
    cfg = HFInternVLConfig(
        vision_config=vision_cfg.to_dict(), text_config=text_cfg.to_dict(),
        image_token_id=IMG_TOKEN, downsample_ratio=0.5,
        vision_feature_layer=-1, vision_feature_select_strategy="default",
        projector_hidden_act="gelu")
    torch.manual_seed(0)
    return InternVLForConditionalGeneration(cfg).eval().float()


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    params = convert_internvl_state_dict(
        hf_model.state_dict(), num_vision_layers=V_LAYERS,
        num_text_layers=T_LAYERS)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                    params)
    cfg = InternVLConfig(
        vision=InternViTConfig(
            hidden_size=V_HID, num_layers=V_LAYERS, num_heads=V_HEADS,
            intermediate_size=V_INTER, image_size=IMAGE_SIZE,
            patch_size=PATCH, norm_type="layer_norm", use_qk_norm=False),
        text=LlamaConfig(
            vocab_size=VOCAB, hidden_size=T_HID, num_layers=T_LAYERS,
            num_heads=T_HEADS, num_kv_heads=T_KV,
            intermediate_size=T_HID * 4, rope_theta=10000.0, qkv_bias=True,
            rms_eps=1e-6),  # Qwen2 default differs from Llama's 1e-5
        image_token_id=IMG_TOKEN)
    return params, cfg


def test_image_features_parity(hf_model, jax_setup):
    params, cfg = jax_setup
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
    with torch.no_grad():
        hf_feats = hf_model.get_image_features(
            pixel_values=torch.tensor(pixels)).numpy()
    ours = np.asarray(internvl.image_features(
        params, jnp.asarray(pixels.transpose(0, 2, 3, 1)), cfg))
    assert ours.shape == hf_feats.shape == (2, cfg.num_image_tokens, T_HID)
    np.testing.assert_allclose(ours, hf_feats, rtol=3e-4, atol=3e-5)


def test_multimodal_forward_parity(hf_model, jax_setup):
    params, cfg = jax_setup
    rng = np.random.default_rng(1)
    n_img = cfg.num_image_tokens
    pixels = rng.normal(size=(1, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
    ids = np.concatenate([
        rng.integers(1, 100, size=(1, 3)),
        np.full((1, n_img), IMG_TOKEN),
        rng.integers(1, 100, size=(1, 4)),
    ], axis=1).astype(np.int64)
    mask = np.ones_like(ids)

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       pixel_values=torch.tensor(pixels),
                       output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()

    sparse, dense = internvl.encode(
        params, cfg, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask),
        jnp.asarray(pixels.transpose(0, 2, 3, 1)))
    pos = ids.shape[1] - 1
    np.testing.assert_allclose(np.asarray(dense[0]), hf_hidden[0, pos],
                               rtol=5e-4, atol=5e-5)
    expected = np.log1p(np.maximum(out.logits[0, pos].numpy(), 0))
    np.testing.assert_allclose(np.asarray(sparse[0]), expected,
                               rtol=5e-4, atol=5e-5)


def test_multitile_forward_parity(hf_model, jax_setup):
    """Dynamic-tiling batch form: [B, max_tiles, S, S, 3] + per-row valid
    tile counts vs HF's ragged concatenation (the reference's
    num_image_token x num_patches insertion, /root/reference/src/model.py:112-118)."""
    params, cfg = jax_setup
    rng = np.random.default_rng(7)
    n_img = cfg.num_image_tokens
    tiles_a = rng.normal(size=(3, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
    tiles_b = rng.normal(size=(2, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)

    # HF: ragged tiles concatenated; image tokens repeated per valid tile
    hf_pixels = np.concatenate([tiles_a, tiles_b])
    rows = []
    for n_tiles in (3, 2):
        rows.append(np.concatenate([
            rng.integers(1, 100, size=2),
            np.full(n_img * n_tiles, IMG_TOKEN),
            rng.integers(1, 100, size=3)]))
    seq = max(len(r) for r in rows)
    ids = np.zeros((2, seq), np.int64)
    mask = np.zeros((2, seq), np.int64)
    for b, r in enumerate(rows):
        ids[b, :len(r)] = r
        mask[b, :len(r)] = 1

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       pixel_values=torch.tensor(hf_pixels),
                       output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()
    hf_logits = out.logits.numpy()

    # ours: padded static tile stacks (valid tiles lead, zero tiles trail)
    max_tiles = 4
    pixels5d = np.zeros((2, max_tiles, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32)
    pixels5d[0, :3] = tiles_a.transpose(0, 2, 3, 1)
    pixels5d[1, :2] = tiles_b.transpose(0, 2, 3, 1)

    sparse, dense = internvl.encode(
        params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), jnp.asarray(pixels5d))
    for b in range(2):
        pos = int(mask[b].sum()) - 1
        np.testing.assert_allclose(np.asarray(dense[b]), hf_hidden[b, pos],
                                   rtol=5e-4, atol=5e-5)
        expected = np.log1p(np.maximum(hf_logits[b, pos], 0))
        np.testing.assert_allclose(np.asarray(sparse[b]), expected,
                                   rtol=5e-4, atol=5e-5)

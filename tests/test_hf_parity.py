"""Numerical parity of the JAX model vs an HF LlavaForConditionalGeneration.

Builds a tiny random-init HF Llava model entirely offline (from config), runs
its torch forward, converts its state dict with models/convert.py, and checks
our functional forward reproduces the hidden states and logits — validating
the ViT/Llama/projector/splicing implementations and the converter's layout
translation at once.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mllm_sparse_retrieval_tpu.configs import RepsLoc
from mllm_sparse_retrieval_tpu.models import mllm
from mllm_sparse_retrieval_tpu.models.convert import convert_llava_state_dict
from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
from mllm_sparse_retrieval_tpu.models.vit import ViTConfig


HIDDEN = 32
VOCAB = 128
IMG_TOKEN = 100
IMAGE_SIZE = 30
PATCH = 10


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (CLIPVisionConfig, LlamaConfig as HFLlamaConfig,
                              LlavaConfig, LlavaForConditionalGeneration)

    vision_cfg = CLIPVisionConfig(
        hidden_size=HIDDEN, intermediate_size=HIDDEN * 4,
        num_hidden_layers=2, num_attention_heads=4,
        image_size=IMAGE_SIZE, patch_size=PATCH, projection_dim=HIDDEN)
    text_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=HIDDEN * 4,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_bias=False,
        tie_word_embeddings=False)
    cfg = LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu")
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    params = convert_llava_state_dict(
        hf_model.state_dict(), num_vision_layers=2, num_text_layers=2,
        patch_size=PATCH)
    params = __import__("jax").tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params)
    arch = MLLMConfig(
        vision=ViTConfig(image_size=IMAGE_SIZE, patch_size=PATCH,
                         hidden_size=HIDDEN, num_layers=2, num_heads=4,
                         feature_layer=-2, act="quick_gelu"),
        text=LlamaConfig(vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=2,
                         num_heads=4, num_kv_heads=2,
                         intermediate_size=HIDDEN * 4, rope_theta=10000.0),
        image_token_id=IMG_TOKEN,
    )
    return params, arch


def test_text_forward_parity(hf_model, jax_setup):
    params, arch = jax_setup
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, size=(2, 9)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 6:] = 0
    ids[1, 6:] = 0

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                       attention_mask=torch.tensor(mask.astype(np.int64)),
                       output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()
    hf_logits = out.logits.numpy()

    hidden = mllm.forward_hidden(params, arch, jnp.asarray(ids),
                                 jnp.asarray(mask), None)
    ours = np.asarray(hidden)
    # compare at non-pad positions (pad positions see different attn garbage)
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(ours[b, :n], hf_hidden[b, :n],
                                   rtol=2e-4, atol=2e-5)

    # reps: sparse/dense at last non-pad position vs HF logits there
    sparse, dense = mllm.encode(params, arch, jnp.asarray(ids),
                                jnp.asarray(mask), None, RepsLoc.BEFORE_PAD)
    for b in range(2):
        pos = int(mask[b].sum()) - 1
        np.testing.assert_allclose(np.asarray(dense[b]), hf_hidden[b, pos],
                                   rtol=2e-4, atol=2e-5)
        expected_sparse = np.log1p(np.maximum(hf_logits[b, pos], 0))
        np.testing.assert_allclose(np.asarray(sparse[b]), expected_sparse,
                                   rtol=2e-4, atol=2e-5)


def test_image_forward_parity(hf_model, jax_setup):
    params, arch = jax_setup
    n_img = arch.num_image_tokens  # (30/10)^2 = 9
    rng = np.random.default_rng(1)
    prefix = rng.integers(1, 90, size=(1, 3))
    suffix = rng.integers(1, 90, size=(1, 4))
    ids = np.concatenate(
        [prefix, np.full((1, n_img), IMG_TOKEN), suffix], axis=1
    ).astype(np.int32)
    mask = np.ones_like(ids)
    pixels = rng.normal(size=(1, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)

    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                       attention_mask=torch.tensor(mask.astype(np.int64)),
                       pixel_values=torch.tensor(pixels),
                       output_hidden_states=True)
    hf_hidden = out.hidden_states[-1].numpy()

    pixels_jax = jnp.asarray(pixels.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    hidden = mllm.forward_hidden(params, arch, jnp.asarray(ids),
                                 jnp.asarray(mask), pixels_jax)
    np.testing.assert_allclose(np.asarray(hidden), hf_hidden,
                               rtol=5e-4, atol=5e-5)

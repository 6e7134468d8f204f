"""Config-driven architecture: HF config.json → our arch dataclasses, the
arch.json manifest round-trip, and checkpoint-directory loading that honors
the manifest over the registry default (VERDICT r2 next #4).

The reference never declares dims — ``from_pretrained`` reads them from the
checkpoint config (/root/reference/src/train.py:70-109, src/model.py:53);
these tests pin the same behavior for our converter."""

import json
import pickle

import jax
import numpy as np
import pytest

from mllm_sparse_retrieval_tpu.models.convert import (
    arch_from_hf_config, arch_from_manifest, arch_to_manifest)
from mllm_sparse_retrieval_tpu.models import registry


# Dims copied from the published HF config.json files (hub unreachable here;
# values mirror Qwen/Qwen2.5-VL-7B-Instruct and OpenGVLab/InternVL2_5-4B).
QWEN25_VL_7B_CONFIG = {
    "model_type": "qwen2_5_vl",
    "image_token_id": 151655,
    "vision_start_token_id": 151652,
    "text_config": {
        "model_type": "qwen2_5_vl_text",
        "vocab_size": 152064, "hidden_size": 3584,
        "num_hidden_layers": 28, "num_attention_heads": 28,
        "num_key_value_heads": 4, "intermediate_size": 18944,
        "rope_theta": 1000000.0, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 128000, "tie_word_embeddings": False,
        "rope_scaling": {"type": "mrope", "mrope_section": [16, 24, 24]},
    },
    "vision_config": {
        "depth": 32, "hidden_size": 1280, "num_heads": 16,
        "intermediate_size": 3420, "out_hidden_size": 3584,
        "patch_size": 14, "temporal_patch_size": 2, "spatial_merge_size": 2,
        "window_size": 112, "fullatt_block_indexes": [7, 15, 23, 31],
    },
}

INTERNVL25_4B_CONFIG = {
    "model_type": "internvl",
    "image_token_id": 151667,
    "downsample_ratio": 0.5,
    "text_config": {
        "model_type": "qwen2",
        "vocab_size": 151674, "hidden_size": 2048,
        "num_hidden_layers": 36, "num_attention_heads": 16,
        "num_key_value_heads": 2, "intermediate_size": 11008,
        "rope_theta": 1000000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": False,
    },
    "vision_config": {
        "hidden_size": 1024, "num_hidden_layers": 24,
        "num_attention_heads": 16, "intermediate_size": 4096,
        "image_size": [448, 448], "patch_size": [14, 14],
        "norm_type": "layer_norm", "use_qk_norm": False,
    },
}

LLAVA_NEXT_8B_CONFIG = {
    "model_type": "llava_next",
    "image_token_index": 128255,
    "vision_feature_layer": -2,
    "image_grid_pinpoints": [[336, 672], [672, 336], [672, 672],
                             [1008, 336], [336, 1008]],
    "text_config": {
        "model_type": "llama",
        "vocab_size": 128256, "hidden_size": 4096,
        "num_hidden_layers": 32, "num_attention_heads": 32,
        "num_key_value_heads": 8, "intermediate_size": 14336,
        "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
    },
    "vision_config": {
        "image_size": 336, "patch_size": 14, "hidden_size": 1024,
        "num_hidden_layers": 24, "num_attention_heads": 16,
        "intermediate_size": 4096, "hidden_act": "quick_gelu",
    },
}


def test_qwen_7b_config_derives_registry_dims():
    arch = arch_from_hf_config(QWEN25_VL_7B_CONFIG)
    expect = registry._qwen2_5_vl_7b_arch()
    assert arch.text == expect.text
    # vision: out_hidden follows the 7B backbone width (2048 -> 3584)
    assert arch.vision.out_hidden_size == 3584
    assert arch.vision.depth == expect.vision.depth
    assert arch.text.mrope_section == (16, 24, 24)
    assert arch.text.qkv_bias and not arch.text.tie_lm_head


def test_qwen_3b_vs_7b_differ_only_in_config():
    """The same code path sizes both checkpoints — no registry pinning."""
    cfg3 = json.loads(json.dumps(QWEN25_VL_7B_CONFIG))
    cfg3["text_config"].update(
        vocab_size=151936, hidden_size=2048, num_hidden_layers=36,
        num_attention_heads=16, num_key_value_heads=2,
        intermediate_size=11008, tie_word_embeddings=True)
    cfg3["vision_config"]["out_hidden_size"] = 2048
    arch3 = arch_from_hf_config(cfg3)
    base = registry._qwen2_5_vl_3b_arch()
    assert arch3.text.hidden_size == base.text.hidden_size
    assert arch3.text.num_layers == base.text.num_layers
    assert arch3.text.tie_lm_head
    assert arch3.vision.out_hidden_size == 2048


def test_internvl_4b_config_derives_registry_dims():
    arch = arch_from_hf_config(INTERNVL25_4B_CONFIG)
    expect = registry._internvl2_5_4b_arch()
    assert arch.text == expect.text
    assert arch.vision.image_size == 448 and arch.vision.patch_size == 14
    assert arch.vision.num_layers == expect.vision.num_layers
    assert arch.num_image_tokens == expect.num_image_tokens  # 256/tile


def test_llava_next_config_derives_registry_dims():
    arch = arch_from_hf_config(LLAVA_NEXT_8B_CONFIG)
    expect = registry._llava_next_llama3_arch()
    assert arch.text == expect.text
    assert arch.vision.num_layers == expect.vision.num_layers
    assert arch.anyres and (336, 672) in arch.grid_pinpoints
    # plain llava (1.5): no pinpoints even if the key were present
    cfg15 = json.loads(json.dumps(LLAVA_NEXT_8B_CONFIG))
    cfg15["model_type"] = "llava"
    assert not arch_from_hf_config(cfg15).anyres


@pytest.mark.parametrize("arch_fn", [
    registry._llava_next_llama3_arch, registry._llava_1_5_arch,
    registry._llava_1_6_vicuna_arch, registry._qwen2_5_vl_3b_arch,
    registry._qwen2_5_vl_7b_arch, registry._internvl2_5_arch,
    registry._internvl2_5_4b_arch,
])
def test_manifest_roundtrip_exact(arch_fn):
    arch = arch_fn()
    manifest = json.loads(json.dumps(arch_to_manifest(arch)))
    assert arch_from_manifest(manifest) == arch


def test_checkpoint_dir_manifest_overrides_registry(tmp_path):
    """A converted checkpoint directory round-trips through build_model with
    the MANIFEST's dims, not the registry default — the 7B-loads-as-7B
    guarantee, exercised with a tiny Qwen arch standing in for the size
    variant."""
    from mllm_sparse_retrieval_tpu.configs import ModelConfig, ModelFamily
    from mllm_sparse_retrieval_tpu.models import build_model, qwen_vl

    tiny = registry._tiny_qwen_debug_arch(ModelConfig())
    params = qwen_vl.init_params(jax.random.PRNGKey(0), tiny)
    host = jax.tree_util.tree_map(np.asarray, params)
    with open(tmp_path / "params.pkl", "wb") as f:
        pickle.dump(host, f)
    with open(tmp_path / "arch.json", "w") as f:
        json.dump(arch_to_manifest(tiny), f)

    loaded, arch, tok, template = build_model(
        ModelConfig(family=ModelFamily.QWEN2_5_VL, dtype="float32",
                    checkpoint_path=str(tmp_path)))
    assert arch == tiny                       # manifest wins over 3B default
    assert arch != registry._qwen2_5_vl_3b_arch()
    got = jax.tree_util.tree_leaves(loaded)
    exp = jax.tree_util.tree_leaves(params)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(exp[0]))
    # and the loaded model actually runs at the manifest's dims
    ids = np.full((2, 8), 3, np.int32)
    mask = np.ones((2, 8), np.int32)
    sparse, dense = qwen_vl.encode(loaded, arch, ids, mask)
    assert dense.shape == (2, tiny.text.hidden_size)


def test_checkpoint_dir_without_manifest_uses_registry_default(tmp_path):
    """Legacy checkpoint dirs (params.pkl only) keep working on the registry
    arch."""
    from mllm_sparse_retrieval_tpu.models.convert import load_converted

    with open(tmp_path / "params.pkl", "wb") as f:
        pickle.dump({"x": np.zeros((2, 2), np.float32)}, f)
    params, tok, arch = load_converted(str(tmp_path), None)
    assert arch is None

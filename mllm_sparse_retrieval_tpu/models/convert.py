"""HF checkpoint → functional param-tree conversion.

The reference loads HF PyTorch classes directly
(/root/reference/src/train.py:70-109); here the same checkpoints are
converted once into this framework's param pytrees (host-side torch-cpu →
numpy → jnp). Covers the LLaVA-family layout (CLIP ViT tower + multimodal
projector + Llama decoder + lm_head), which serves LLaVA-1.5/1.6,
LLaVA-NeXT-Llama3, and E5-V.

Conventions translated:
- torch ``nn.Linear`` stores ``[out, in]`` → ours is ``[in, out]`` (transpose);
- CLIP's conv patch embedding ``[H, C, P, P]`` → our patchify matmul weight
  ``[P*P*C, H]`` with (row, col, channel) flattening;
- CLIP attention is separate q/k/v with biases → fused qkv here;
- rotary/GQA conventions match HF's (verified by the parity test in
  tests/test_hf_parity.py against a random-init HF model).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (float32)."""
    return np.asarray(x.detach().to("cpu").float().numpy())


def _linear(sd: Dict, prefix: str, transpose: bool = True) -> Dict:
    out = {"w": _t(sd[f"{prefix}.weight"]).T if transpose
           else _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["b"] = _t(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Dict, prefix: str) -> Dict:
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _rmsnorm(sd: Dict, prefix: str) -> Dict:
    return {"scale": _t(sd[f"{prefix}.weight"])}


def convert_llava_state_dict(sd: Dict, num_vision_layers: int,
                             num_text_layers: int,
                             patch_size: int) -> Dict:
    """Map an HF Llava*ForConditionalGeneration state dict to our tree."""
    # transformers >= 4.52 moved submodules under model.* and hoisted lm_head;
    # resolve module *prefixes* against whichever layout the checkpoint uses.
    def k(prefix: str) -> str:
        candidates = [prefix, f"model.{prefix}"]
        if prefix.startswith("language_model.model."):
            rest = prefix[len("language_model.model."):]
            candidates += [f"model.language_model.{rest}",
                           f"language_model.{rest}"]
        if prefix.startswith("language_model.lm_head"):
            candidates.append("lm_head" + prefix[len("language_model.lm_head"):])
        for cand in candidates:
            if cand in sd or f"{cand}.weight" in sd:
                return cand
        raise KeyError(prefix)

    vt = "vision_tower.vision_model"

    # --- vision tower ---
    conv = _t(sd[k(f"{vt}.embeddings.patch_embedding.weight")])  # [H, C, P, P]
    h = conv.shape[0]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, h)          # [(P,P,C), H]
    vision = {
        "patch_embed": {"w": patch_w},
        "cls_token": _t(sd[k(f"{vt}.embeddings.class_embedding")]).reshape(-1),
        "pos_embed": _t(sd[k(f"{vt}.embeddings.position_embedding.weight")]),
        "pre_ln": _layernorm(sd, k(f"{vt}.pre_layrnorm")),
        "blocks": [],
    }
    for i in range(num_vision_layers):
        p = f"{vt}.encoder.layers.{i}"
        q = _linear(sd, k(f"{p}.self_attn.q_proj"))
        kk_ = _linear(sd, k(f"{p}.self_attn.k_proj"))
        v = _linear(sd, k(f"{p}.self_attn.v_proj"))
        qkv = {"w": np.concatenate([q["w"], kk_["w"], v["w"]], axis=1)}
        if "b" in q:
            qkv["b"] = np.concatenate([q["b"], kk_["b"], v["b"]])
        vision["blocks"].append({
            "ln1": _layernorm(sd, k(f"{p}.layer_norm1")),
            "qkv": qkv,
            "out": _linear(sd, k(f"{p}.self_attn.out_proj")),
            "ln2": _layernorm(sd, k(f"{p}.layer_norm2")),
            "fc1": _linear(sd, k(f"{p}.mlp.fc1")),
            "fc2": _linear(sd, k(f"{p}.mlp.fc2")),
        })

    # --- projector ---
    projector = {
        "fc1": _linear(sd, k("multi_modal_projector.linear_1")),
        "fc2": _linear(sd, k("multi_modal_projector.linear_2")),
    }

    # --- language model ---
    lm = "language_model.model"
    text = {
        "embed": _t(sd[k(f"{lm}.embed_tokens.weight")]),
        "final_norm": _rmsnorm(sd, k(f"{lm}.norm")),
        "blocks": [],
    }
    for i in range(num_text_layers):
        p = f"{lm}.layers.{i}"
        text["blocks"].append({
            "attn_norm": _rmsnorm(sd, k(f"{p}.input_layernorm")),
            "q": _linear(sd, k(f"{p}.self_attn.q_proj")),
            "k": _linear(sd, k(f"{p}.self_attn.k_proj")),
            "v": _linear(sd, k(f"{p}.self_attn.v_proj")),
            "o": _linear(sd, k(f"{p}.self_attn.o_proj")),
            "mlp_norm": _rmsnorm(sd, k(f"{p}.post_attention_layernorm")),
            "gate": _linear(sd, k(f"{p}.mlp.gate_proj")),
            "up": _linear(sd, k(f"{p}.mlp.up_proj")),
            "down": _linear(sd, k(f"{p}.mlp.down_proj")),
        })
    try:
        text["lm_head"] = _linear(sd, k("language_model.lm_head"))
    except KeyError:
        pass  # tied embeddings

    params = {"vision": vision, "projector": projector, "text": text}
    # LLaVA-NeXT anyres models carry a learned newline embedding appended to
    # each unpadded feature row (HF ``pack_image_features``).
    for cand in ("image_newline", "model.image_newline"):
        if cand in sd:
            params["image_newline"] = _t(sd[cand]).reshape(-1)
            break
    return params


def convert_qwen25vl_state_dict(sd: Dict, num_vision_layers: int,
                                num_text_layers: int) -> Dict:
    """Map an HF Qwen2_5_VLForConditionalGeneration state dict to our tree
    (models/qwen_vl.py layout)."""

    def k(prefix: str) -> str:
        for cand in (prefix, f"model.{prefix}"):
            if cand in sd or f"{cand}.weight" in sd:
                return cand
        raise KeyError(prefix)

    conv = _t(sd[k("visual.patch_embed.proj.weight")])  # [D, C, T, P, P]
    d = conv.shape[0]
    vision = {
        # flatten order (C, T, Py, Px) matches qwen_vl.patchify features
        "patch_embed": {"w": conv.reshape(d, -1).T},
        "merger": {
            "ln_q": _rmsnorm(sd, k("visual.merger.ln_q")),
            "fc1": _linear(sd, k("visual.merger.mlp.0")),
            "fc2": _linear(sd, k("visual.merger.mlp.2")),
        },
        "blocks": [],
    }
    for i in range(num_vision_layers):
        p = f"visual.blocks.{i}"
        vision["blocks"].append({
            "norm1": _rmsnorm(sd, k(f"{p}.norm1")),
            "norm2": _rmsnorm(sd, k(f"{p}.norm2")),
            "qkv": _linear(sd, k(f"{p}.attn.qkv")),
            "proj": _linear(sd, k(f"{p}.attn.proj")),
            "gate": _linear(sd, k(f"{p}.mlp.gate_proj")),
            "up": _linear(sd, k(f"{p}.mlp.up_proj")),
            "down": _linear(sd, k(f"{p}.mlp.down_proj")),
        })

    lm = "language_model"
    text = {
        "embed": _t(sd[k(f"{lm}.embed_tokens.weight")]),
        "final_norm": _rmsnorm(sd, k(f"{lm}.norm")),
        "blocks": [],
    }
    for i in range(num_text_layers):
        p = f"{lm}.layers.{i}"
        text["blocks"].append({
            "attn_norm": _rmsnorm(sd, k(f"{p}.input_layernorm")),
            "q": _linear(sd, k(f"{p}.self_attn.q_proj")),
            "k": _linear(sd, k(f"{p}.self_attn.k_proj")),
            "v": _linear(sd, k(f"{p}.self_attn.v_proj")),
            "o": _linear(sd, k(f"{p}.self_attn.o_proj")),
            "mlp_norm": _rmsnorm(sd, k(f"{p}.post_attention_layernorm")),
            "gate": _linear(sd, k(f"{p}.mlp.gate_proj")),
            "up": _linear(sd, k(f"{p}.mlp.up_proj")),
            "down": _linear(sd, k(f"{p}.mlp.down_proj")),
        })
    try:
        text["lm_head"] = _linear(sd, k("lm_head"))
    except KeyError:
        pass  # tied embeddings
    return {"vision": vision, "text": text}


def convert_internvl_state_dict(sd: Dict, num_vision_layers: int,
                                num_text_layers: int,
                                use_qk_norm: bool = False,
                                norm_type: str = "layer_norm") -> Dict:
    """Map an HF InternVLForConditionalGeneration state dict to our tree
    (models/internvl.py layout)."""

    def k(prefix: str) -> str:
        for cand in (prefix, f"model.{prefix}"):
            if cand in sd or f"{cand}.weight" in sd:
                return cand
        raise KeyError(prefix)

    def norm(prefix: str) -> Dict:
        if norm_type == "rms_norm":
            return _rmsnorm(sd, prefix)
        return _layernorm(sd, prefix)

    vt = "vision_tower"
    conv = _t(sd[k(f"{vt}.embeddings.patch_embeddings.projection.weight")])
    h = conv.shape[0]
    vision = {
        "patch_embed": {
            "w": conv.transpose(2, 3, 1, 0).reshape(-1, h),
            "b": _t(sd[k(f"{vt}.embeddings.patch_embeddings.projection.bias")]),
        },
        "cls_token": _t(sd[k(f"{vt}.embeddings.cls_token")]).reshape(-1),
        "pos_embed": _t(sd[k(f"{vt}.embeddings.position_embeddings")])[0],
        "blocks": [],
    }
    for i in range(num_vision_layers):
        p = f"{vt}.encoder.layer.{i}"
        blk = {
            "norm1": norm(k(f"{p}.layernorm_before")),
            "norm2": norm(k(f"{p}.layernorm_after")),
            "q": _linear(sd, k(f"{p}.attention.q_proj")),
            "k": _linear(sd, k(f"{p}.attention.k_proj")),
            "v": _linear(sd, k(f"{p}.attention.v_proj")),
            "proj": _linear(sd, k(f"{p}.attention.projection_layer")),
            "fc1": _linear(sd, k(f"{p}.mlp.fc1")),
            "fc2": _linear(sd, k(f"{p}.mlp.fc2")),
            "lambda1": _t(sd[k(f"{p}.lambda_1")]),
            "lambda2": _t(sd[k(f"{p}.lambda_2")]),
        }
        if use_qk_norm:
            blk["q_norm"] = _rmsnorm(sd, k(f"{p}.attention.q_norm"))
            blk["k_norm"] = _rmsnorm(sd, k(f"{p}.attention.k_norm"))
        vision["blocks"].append(blk)

    projector = {
        "ln": _layernorm(sd, k("multi_modal_projector.layer_norm")),
        "fc1": _linear(sd, k("multi_modal_projector.linear_1")),
        "fc2": _linear(sd, k("multi_modal_projector.linear_2")),
    }

    lm = "language_model"
    text = {
        "embed": _t(sd[k(f"{lm}.embed_tokens.weight")]),
        "final_norm": _rmsnorm(sd, k(f"{lm}.norm")),
        "blocks": [],
    }
    for i in range(num_text_layers):
        p = f"{lm}.layers.{i}"
        text["blocks"].append({
            "attn_norm": _rmsnorm(sd, k(f"{p}.input_layernorm")),
            "q": _linear(sd, k(f"{p}.self_attn.q_proj")),
            "k": _linear(sd, k(f"{p}.self_attn.k_proj")),
            "v": _linear(sd, k(f"{p}.self_attn.v_proj")),
            "o": _linear(sd, k(f"{p}.self_attn.o_proj")),
            "mlp_norm": _rmsnorm(sd, k(f"{p}.post_attention_layernorm")),
            "gate": _linear(sd, k(f"{p}.mlp.gate_proj")),
            "up": _linear(sd, k(f"{p}.mlp.up_proj")),
            "down": _linear(sd, k(f"{p}.mlp.down_proj")),
        })
    try:
        text["lm_head"] = _linear(sd, k("lm_head"))
    except KeyError:
        pass
    return {"vision": vision, "projector": projector, "text": text}


# ---------------------------------------------------------------------------
# Config-driven architecture (VERDICT r2 next #4)
#
# The reference sizes its models implicitly through the HF checkpoint's
# config.json (src/train.py:70-109 just calls from_pretrained). Here the
# converter reads that config, derives OUR arch dataclass from it (so a 7B
# Qwen or 4B InternVL checkpoint gets its true dims — the registry entries
# are only defaults), and writes an ``arch.json`` manifest next to
# ``params.pkl``; ``load_converted`` rebuilds the exact arch from it.
# ---------------------------------------------------------------------------

def arch_to_manifest(arch) -> Dict:
    """Serialize an arch dataclass (MLLMConfig / QwenVLConfig /
    InternVLConfig) to a JSON-able manifest tagged with its kind."""
    from mllm_sparse_retrieval_tpu.models.internvl import InternVLConfig
    from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
    from mllm_sparse_retrieval_tpu.models.qwen_vl import QwenVLConfig

    kinds = {MLLMConfig: "mllm", QwenVLConfig: "qwen2_5_vl",
             InternVLConfig: "internvl"}
    kind = kinds.get(type(arch))
    if kind is None:
        raise TypeError(f"unknown arch type {type(arch)}")
    return {"kind": kind, "config": dataclasses.asdict(arch)}


def _dataclass_from_dict(cls, d: Dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) \
                else False:
            v = _dataclass_from_dict(f.type, v)
        elif isinstance(v, list):
            # JSON lists back to the tuples our frozen configs carry
            # (grid_pinpoints, mrope_section, fullatt_block_indexes)
            v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
        kwargs[f.name] = v
    return cls(**kwargs)


def arch_from_manifest(manifest: Dict):
    from mllm_sparse_retrieval_tpu.models.internvl import (
        InternViTConfig, InternVLConfig)
    from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig
    from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
    from mllm_sparse_retrieval_tpu.models.qwen_vl import (
        QwenViTConfig, QwenVLConfig)
    from mllm_sparse_retrieval_tpu.models.vit import ViTConfig

    kind = manifest["kind"]
    cfg = dict(manifest["config"])
    text = _dataclass_from_dict(LlamaConfig, cfg.pop("text"))
    vision_d = cfg.pop("vision")
    rest = {k: (tuple(tuple(e) if isinstance(e, list) else e for e in v)
                if isinstance(v, list) else v) for k, v in cfg.items()}
    if kind == "mllm":
        return MLLMConfig(vision=_dataclass_from_dict(ViTConfig, vision_d),
                          text=text, **rest)
    if kind == "qwen2_5_vl":
        return QwenVLConfig(
            vision=_dataclass_from_dict(QwenViTConfig, vision_d), text=text,
            **rest)
    if kind == "internvl":
        return InternVLConfig(
            vision=_dataclass_from_dict(InternViTConfig, vision_d), text=text,
            **rest)
    raise ValueError(f"unknown manifest kind {kind!r}")


def _text_cfg_from_hf(tc: Dict, mrope: bool = False):
    from mllm_sparse_retrieval_tpu.models.llama import LlamaConfig

    sec = None
    if mrope:
        rs = tc.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            sec = tuple(rs["mrope_section"])
    return LlamaConfig(
        vocab_size=tc["vocab_size"],
        hidden_size=tc["hidden_size"],
        num_layers=tc["num_hidden_layers"],
        num_heads=tc["num_attention_heads"],
        num_kv_heads=tc.get("num_key_value_heads",
                            tc["num_attention_heads"]),
        intermediate_size=tc["intermediate_size"],
        max_seq_len=tc.get("max_position_embeddings", 4096),
        rope_theta=float(tc.get("rope_theta", 10000.0)),
        rms_eps=float(tc.get("rms_norm_eps", 1e-5)),
        qkv_bias=bool(tc.get("attention_bias", False)) or
        tc.get("model_type") in ("qwen2", "qwen2_5_vl_text"),
        tie_lm_head=bool(tc.get("tie_word_embeddings", False)),
        mrope_section=sec,
    )


def arch_from_hf_config(hf_cfg: Dict):
    """Build our arch dataclass from a checkpoint's ``config.json`` dict.

    Covers the reference's dispatch surface (src/model.py:51-64): LLaVA-1.5
    (``llava``), LLaVA-NeXT/1.6/E5-V (``llava_next``), Qwen2.5-VL at any
    size (``qwen2_5_vl`` — 3B and 7B differ only in these dims), and
    HF-integrated InternVL (``internvl``).
    """
    from mllm_sparse_retrieval_tpu.models.internvl import (
        InternViTConfig, InternVLConfig)
    from mllm_sparse_retrieval_tpu.models.mllm import MLLMConfig
    from mllm_sparse_retrieval_tpu.models.qwen_vl import (
        QwenViTConfig, QwenVLConfig)
    from mllm_sparse_retrieval_tpu.models.vit import ViTConfig

    mt = hf_cfg.get("model_type")
    if mt in ("llava", "llava_next"):
        vc = hf_cfg["vision_config"]
        vision = ViTConfig(
            image_size=vc["image_size"], patch_size=vc["patch_size"],
            hidden_size=vc["hidden_size"],
            num_layers=vc["num_hidden_layers"],
            num_heads=vc["num_attention_heads"],
            mlp_ratio=vc.get("intermediate_size",
                             4 * vc["hidden_size"]) // vc["hidden_size"],
            feature_layer=hf_cfg.get("vision_feature_layer", -2),
            act=vc.get("hidden_act", "quick_gelu"),
        )
        pinpoints = tuple(
            tuple(p) for p in hf_cfg.get("image_grid_pinpoints") or ())
        return MLLMConfig(
            vision=vision, text=_text_cfg_from_hf(hf_cfg["text_config"]),
            image_token_id=hf_cfg.get("image_token_index",
                                      hf_cfg.get("image_token_id")),
            grid_pinpoints=pinpoints if mt == "llava_next" else (),
        )
    if mt == "qwen2_5_vl":
        vc = hf_cfg["vision_config"]
        # older HF configs inline the text fields at the top level
        tc = hf_cfg.get("text_config") or hf_cfg
        vision = QwenViTConfig(
            hidden_size=vc["hidden_size"], depth=vc["depth"],
            num_heads=vc["num_heads"],
            intermediate_size=vc["intermediate_size"],
            out_hidden_size=vc["out_hidden_size"],
            patch_size=vc["patch_size"],
            temporal_patch_size=vc.get("temporal_patch_size", 2),
            spatial_merge_size=vc.get("spatial_merge_size", 2),
            window_size=vc.get("window_size", 112),
            fullatt_block_indexes=tuple(
                vc.get("fullatt_block_indexes", (7, 15, 23, 31))),
        )
        return QwenVLConfig(
            vision=vision, text=_text_cfg_from_hf(tc, mrope=True),
            image_token_id=hf_cfg.get("image_token_id", 151655),
            vision_start_token_id=hf_cfg.get("vision_start_token_id", 151652),
            native_resolution=True,
        )
    if mt == "internvl":
        vc = hf_cfg["vision_config"]
        norm_type = vc.get("norm_type", "layer_norm")
        vision = InternViTConfig(
            hidden_size=vc["hidden_size"],
            num_layers=vc["num_hidden_layers"],
            num_heads=vc["num_attention_heads"],
            intermediate_size=vc["intermediate_size"],
            image_size=vc["image_size"] if isinstance(vc["image_size"], int)
            else vc["image_size"][0],
            patch_size=vc["patch_size"] if isinstance(vc["patch_size"], int)
            else vc["patch_size"][0],
            norm_type=norm_type,
            use_qk_norm=bool(vc.get("use_qk_norm", False)),
        )
        return InternVLConfig(
            vision=vision, text=_text_cfg_from_hf(hf_cfg["text_config"]),
            image_token_id=hf_cfg.get("image_token_id", 151667),
            downsample_ratio=float(hf_cfg.get("downsample_ratio", 0.5)),
        )
    raise ValueError(
        f"unsupported HF model_type {mt!r} — supported: llava, llava_next, "
        f"qwen2_5_vl, internvl")


def convert_hf_dir(hf_dir: str, out_dir: str) -> None:
    """Convert a local HF checkpoint directory (any supported family, any
    size) into a framework checkpoint dir: ``params.pkl`` + ``arch.json``
    (config-derived dims) + the tokenizer files.

    This is the one command between a weights mount and a runnable model:
    ``python -m mllm_sparse_retrieval_tpu.models.convert <hf_dir> <out_dir>``.
    """
    import torch
    from transformers import AutoConfig, AutoModel

    with open(os.path.join(hf_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    arch = arch_from_hf_config(hf_cfg)
    mt = hf_cfg["model_type"]

    if mt in ("llava", "llava_next"):
        from transformers import (LlavaForConditionalGeneration,
                                  LlavaNextForConditionalGeneration)
        cls = LlavaForConditionalGeneration if mt == "llava" \
            else LlavaNextForConditionalGeneration
        model = cls.from_pretrained(hf_dir, torch_dtype=torch.float32)
        params = convert_llava_state_dict(
            model.state_dict(), arch.vision.num_layers,
            arch.text.num_layers, arch.vision.patch_size)
    elif mt == "qwen2_5_vl":
        from transformers import Qwen2_5_VLForConditionalGeneration
        model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
            hf_dir, torch_dtype=torch.float32)
        params = convert_qwen25vl_state_dict(
            model.state_dict(), arch.vision.depth, arch.text.num_layers)
    elif mt == "internvl":
        from transformers import InternVLForConditionalGeneration
        model = InternVLForConditionalGeneration.from_pretrained(
            hf_dir, torch_dtype=torch.float32)
        params = convert_internvl_state_dict(
            model.state_dict(), arch.vision.num_layers, arch.text.num_layers,
            use_qk_norm=arch.vision.use_qk_norm,
            norm_type=arch.vision.norm_type)
    else:
        raise ValueError(f"unsupported model_type {mt!r}")

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "params.pkl"), "wb") as f:
        pickle.dump(params, f)
    with open(os.path.join(out_dir, "arch.json"), "w") as f:
        json.dump(arch_to_manifest(arch), f, indent=1)
    try:
        from transformers import AutoTokenizer
        AutoTokenizer.from_pretrained(hf_dir).save_pretrained(out_dir)
    except Exception as e:  # tokenizer files optional (WordPieceLite fallback)
        print(f"warning: tokenizer not copied ({e})")


def convert_hf_llava_dir(hf_dir: str, out_path: str, num_vision_layers: int,
                         num_text_layers: int, patch_size: int) -> None:
    """Convert a local HF LLaVA checkpoint to a pickled param tree (legacy
    single-file form; prefer ``convert_hf_dir``)."""
    import torch
    from transformers import LlavaForConditionalGeneration

    model = LlavaForConditionalGeneration.from_pretrained(
        hf_dir, torch_dtype=torch.float32)
    params = convert_llava_state_dict(
        model.state_dict(), num_vision_layers, num_text_layers, patch_size)
    with open(out_path, "wb") as f:
        pickle.dump(params, f)


def load_converted(checkpoint_path: str, spec, dtype=jnp.float32
                   ) -> Tuple[Dict, object, Optional[object]]:
    """Load a converted checkpoint: ``params.pkl`` (+ optional ``arch.json``
    manifest + HF tokenizer directory).

    Returns (params, tokenizer_or_None, arch_or_None). When the manifest is
    present the returned arch carries the CHECKPOINT's true dims (a 7B Qwen
    directory loads as 7B regardless of the registry default)."""
    params_file = checkpoint_path if checkpoint_path.endswith(".pkl") \
        else os.path.join(checkpoint_path, "params.pkl")
    with open(params_file, "rb") as f:
        host = pickle.load(f)
    import jax
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), host)

    ckpt_dir = os.path.dirname(params_file)
    arch = None
    manifest_path = os.path.join(ckpt_dir, "arch.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            arch = arch_from_manifest(json.load(f))

    tok = None
    try:
        from transformers import AutoTokenizer
        from mllm_sparse_retrieval_tpu.models.tokenizer import HFTokenizerAdapter
        tok = HFTokenizerAdapter(AutoTokenizer.from_pretrained(ckpt_dir))
    except Exception:
        pass
    return params, tok, arch


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert an HF checkpoint directory to a framework "
                    "checkpoint (params.pkl + arch.json + tokenizer)")
    ap.add_argument("hf_dir")
    ap.add_argument("out_dir")
    args = ap.parse_args()
    convert_hf_dir(args.hf_dir, args.out_dir)
    print(args.out_dir)

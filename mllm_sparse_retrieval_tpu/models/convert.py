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

import os
import pickle
from typing import Dict, Tuple

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


def convert_hf_llava_dir(hf_dir: str, out_path: str, num_vision_layers: int,
                         num_text_layers: int, patch_size: int) -> None:
    """Convert a local HF checkpoint directory to a pickled param tree."""
    import torch
    from transformers import LlavaForConditionalGeneration

    model = LlavaForConditionalGeneration.from_pretrained(
        hf_dir, torch_dtype=torch.float32)
    params = convert_llava_state_dict(
        model.state_dict(), num_vision_layers, num_text_layers, patch_size)
    with open(out_path, "wb") as f:
        pickle.dump(params, f)


def load_converted(checkpoint_path: str, spec, dtype=jnp.float32
                   ) -> Tuple[Dict, object]:
    """Load a converted checkpoint: ``params.pkl`` + HF tokenizer directory."""
    params_file = checkpoint_path if checkpoint_path.endswith(".pkl") \
        else os.path.join(checkpoint_path, "params.pkl")
    with open(params_file, "rb") as f:
        host = pickle.load(f)
    import jax
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), host)

    tok = None
    tok_dir = os.path.dirname(params_file)
    try:
        from transformers import AutoTokenizer
        from mllm_sparse_retrieval_tpu.models.tokenizer import HFTokenizerAdapter
        tok = HFTokenizerAdapter(AutoTokenizer.from_pretrained(tok_dir))
    except Exception:
        pass
    return params, tok

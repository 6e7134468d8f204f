"""Prompt-template golden tests.

The reference renders Qwen2.5-VL / InternVL2.5 prompts with
``processor.apply_chat_template(messages, tokenize=False,
add_generation_prompt=True)`` (/root/reference/src/template.py:9-46,
src/model.py:106-111). These tests render the same message structures
through the families' official Jinja chat templates (embedded below,
verbatim from the public tokenizer configs) and assert our offline fallback
wrappers produce byte-identical prompts; plus ``resolve_template``'s
HF-tokenizer path.
"""

import pytest

from mllm_sparse_retrieval_tpu.models import templates as T

jinja2 = pytest.importorskip("jinja2")

# Qwen/Qwen2.5-VL-*-Instruct tokenizer_config.json "chat_template" (public).
QWEN_CHAT_TEMPLATE = (
    "{% set image_count = namespace(value=0) %}"
    "{% set video_count = namespace(value=0) %}"
    "{% for message in messages %}"
    "{% if loop.first and message['role'] != 'system' %}"
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n{% endif %}"
    "<|im_start|>{{ message['role'] }}\n"
    "{% if message['content'] is string %}{{ message['content'] }}<|im_end|>\n"
    "{% else %}{% for content in message['content'] %}"
    "{% if content['type'] == 'image' or 'image' in content or "
    "'image_url' in content %}"
    "{% set image_count.value = image_count.value + 1 %}"
    "{% if add_vision_id %}Picture {{ image_count.value }}: {% endif %}"
    "<|vision_start|><|image_pad|><|vision_end|>"
    "{% elif content['type'] == 'video' or 'video' in content %}"
    "{% set video_count.value = video_count.value + 1 %}"
    "{% if add_vision_id %}Video {{ video_count.value }}: {% endif %}"
    "<|vision_start|><|video_pad|><|vision_end|>"
    "{% elif 'text' in content %}{{ content['text'] }}{% endif %}"
    "{% endfor %}<|im_end|>\n{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}")

# OpenGVLab/InternVL2_5-* tokenizer_config.json "chat_template": plain ChatML.
INTERNVL_CHAT_TEMPLATE = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
    " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{'<|im_start|>assistant\n' }}"
    "{% endif %}")


def render(template_str, messages):
    env = jinja2.Environment()
    return env.from_string(template_str).render(
        messages=messages, add_generation_prompt=True)


def test_qwen_fallback_matches_official_template():
    golden_img = render(QWEN_CHAT_TEMPLATE, T.QWEN2_5_VL_IMAGE_MESSAGES)
    golden_text = render(QWEN_CHAT_TEMPLATE, T.QWEN2_5_VL_TEXT_MESSAGES)
    ours_img = T.QWEN2_5_VL.expand_image(T.QWEN2_5_VL.image_prompt(), 1)
    assert ours_img == golden_img
    assert T.QWEN2_5_VL.text_prompt() == golden_text


def test_internvl_fallback_matches_official_template():
    golden_img = render(INTERNVL_CHAT_TEMPLATE, T.INTERNVL2_5_IMAGE_MESSAGES)
    golden_text = render(INTERNVL_CHAT_TEMPLATE, T.INTERNVL2_5_TEXT_MESSAGES)
    # the reference replaces <image> with <img><IMG_CONTEXT>*n</img> AFTER
    # rendering (/root/reference/src/model.py:112-118)
    ours_img = T.INTERNVL2_5.image_prompt()
    assert ours_img == golden_img
    assert T.INTERNVL2_5.text_prompt() == golden_text
    exp = T.INTERNVL2_5.expand_image(ours_img, 3)
    assert "<img><IMG_CONTEXT><IMG_CONTEXT><IMG_CONTEXT></img>" in exp


def test_image_expansion_per_family():
    q = T.QWEN2_5_VL.expand_image(T.QWEN2_5_VL.image_prompt(), 2)
    assert "<|vision_start|><|image_pad|><|image_pad|><|vision_end|>" in q
    tiny = T.TINY.expand_image(T.TINY.image_prompt(), 3)
    assert "<image> <image> <image>" in tiny  # whitespace-separated
    llama3 = T.LLAMA3.expand_image(T.LLAMA3.image_prompt(), 2)
    assert "<image><image>\n" in llama3        # HF processor expansion form


class _StubHF:
    """Minimal HF-tokenizer stand-in: chat_template + apply_chat_template."""

    def __init__(self, template_str):
        self.chat_template = template_str

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        return render(self.chat_template, messages)


class _StubAdapter:
    def __init__(self, template_str):
        self.hf_tokenizer = _StubHF(template_str)


def test_resolve_template_renders_through_hf_tokenizer():
    resolved = T.resolve_template(T.QWEN2_5_VL, _StubAdapter(QWEN_CHAT_TEMPLATE))
    assert resolved is not T.QWEN2_5_VL
    # resolved prompts equal the fallback (official template == fallback)
    assert resolved.text_prompt() == T.QWEN2_5_VL.text_prompt()
    assert (resolved.expand_image(resolved.image_prompt(), 4)
            == T.QWEN2_5_VL.expand_image(T.QWEN2_5_VL.image_prompt(), 4))
    # string-wrapper families & tokenizers without chat templates: unchanged
    assert T.resolve_template(T.LLAMA3, _StubAdapter(QWEN_CHAT_TEMPLATE)) is T.LLAMA3
    assert T.resolve_template(T.QWEN2_5_VL, object()) is T.QWEN2_5_VL


def test_registry_no_longer_maps_chat_families_to_llama3():
    from mllm_sparse_retrieval_tpu.configs import ModelFamily
    from mllm_sparse_retrieval_tpu.models.registry import _TEMPLATES

    assert _TEMPLATES[ModelFamily.QWEN2_5_VL] is T.QWEN2_5_VL
    assert _TEMPLATES[ModelFamily.INTERNVL2_5] is T.INTERNVL2_5

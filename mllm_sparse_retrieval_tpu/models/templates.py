"""Prompt templates per model family.

Behavioral parity with /root/reference/src/template.py:1-46: every family
prompts the MLLM to summarize the image/sentence "in one word", wrapped in
that family's chat format, and reads representations at the next-token
position. The ``<image>`` / ``<sent>`` slots are substituted at encode time.

Templates are expressed as a small dataclass (wrapper + body) instead of
bare string constants so families with chat-message structure (Qwen2.5-VL,
InternVL2.5) normalize through the same interface.
"""

from __future__ import annotations

from dataclasses import dataclass

IMAGE_SLOT = "<image>"
TEXT_SLOT = "<sent>"

_SUMMARY_IMG = "\nSummary above image in one word: "
_SUMMARY_TEXT = "\nSummary above sentence in one word: "
_SUMMARY_IMG_OPEN = "\nSummary above image: "
_SUMMARY_TEXT_OPEN = "\nSummary above sentence: "


@dataclass(frozen=True)
class PromptTemplate:
    """A prompt with a ``{}`` hole for the user content."""

    wrapper: str

    def image_prompt(self, one_word: bool = True) -> str:
        body = IMAGE_SLOT + (_SUMMARY_IMG if one_word else _SUMMARY_IMG_OPEN)
        return self.wrapper.format(body)

    def text_prompt(self, one_word: bool = True) -> str:
        body = TEXT_SLOT + (_SUMMARY_TEXT if one_word else _SUMMARY_TEXT_OPEN)
        return self.wrapper.format(body)

    def fill_text(self, prompt: str, sentence: str) -> str:
        return prompt.replace(TEXT_SLOT, sentence)


# Llama-3 chat wrapper (LLaVA-NeXT-Llama3-8B, E5-V), ending with the
# assistant turn open + a space+newline so the next token is the summary word.
LLAMA3 = PromptTemplate(
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n \n")

# Vicuna-ish wrapper used by the reference for LLaVA-1.5 / 1.6-Vicuna
# ("no_special" variant).
LLAVA_V1_5 = PromptTemplate("<s>user\n\n{}</s><s>assistant\n\n \n")

# Qwen2.5-VL chat-message form; rendered through the family's chat template
# at encode time. Stored structurally for the HF-processor path.
QWEN2_5_VL_IMAGE_MESSAGES = [{
    "role": "user",
    "content": [
        {"type": "image", "image": "{}"},
        {"type": "text", "text": _SUMMARY_IMG},
    ],
}]
QWEN2_5_VL_TEXT_MESSAGES = [{
    "role": "user",
    "content": [
        {"type": "text", "text": TEXT_SLOT},
        {"type": "text", "text": _SUMMARY_TEXT},
    ],
}]

INTERNVL2_5_IMAGE_MESSAGES = [
    {"role": "user", "content": IMAGE_SLOT + _SUMMARY_IMG}]
INTERNVL2_5_TEXT_MESSAGES = [
    {"role": "user", "content": TEXT_SLOT + _SUMMARY_TEXT}]

# Self-contained wrapper for the tiny debug family (WordPieceLite tokenizer —
# plain text, no chat specials).
TINY = PromptTemplate("user: {}\nassistant: ")

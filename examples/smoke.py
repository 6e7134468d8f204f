"""Smoke demo: encode one image and a few captions, print cosine similarities.

Equivalent of the reference's manual sanity script (/root/reference/main.py:
1-59): one forward pass per modality with the prompt templates, cosine
similarity matrix between the image embedding and caption embeddings, and a
peek at the top sparse terms.

Runs hermetically with the tiny-debug family; pass --checkpoint-path for a
real converted model.

    python examples/smoke.py --dataset flickr
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

from mllm_sparse_retrieval_tpu.cli.common import (
    add_common_args, build_everything, sparse_config_from_args)
from mllm_sparse_retrieval_tpu.models.reps import cosine_similarity_matrix
from mllm_sparse_retrieval_tpu.pipelines.encode import encode_examples


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    args = parser.parse_args(argv)

    corpus, params, arch, tok, template, mesh, lora = build_everything(args)
    sparse_cfg = sparse_config_from_args(args)

    image = corpus.examples_single()[:1]
    captions = corpus.examples_full()[:4]

    img = encode_examples(image, params, arch, tok, template,
                          encode_type="image", sparse_cfg=sparse_cfg,
                          batch_size=1, mesh=mesh, lora=lora)
    txt = encode_examples(captions, params, arch, tok, template,
                          encode_type="text", sparse_cfg=sparse_cfg,
                          batch_size=4, mesh=mesh, lora=lora)

    sims = np.asarray(cosine_similarity_matrix(img.dense, txt.dense))
    print(f"image {image[0].img_id} vs captions "
          f"{[c.text_id for c in captions]}")
    print("cosine similarities:", np.round(sims[0], 4).tolist())

    top_terms = sorted(img.sparse_vectors[0].items(),
                       key=lambda kv: -kv[1])[:10]
    print("top image sparse terms:", top_terms)
    top_text = sorted(txt.sparse_vectors[0].items(), key=lambda kv: -kv[1])[:10]
    print(f"caption: {captions[0].text!r}")
    print("top caption sparse terms:", top_text)


if __name__ == "__main__":
    main()

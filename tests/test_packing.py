"""Data-pipeline tests: the closed-form packer must match a literal
re-derivation of the reference's padded-corpus state machine
(custom_dataset/tokenized_corpus.py:74-194), and the mmap format must
round-trip."""

import numpy as np

from block_transformer_tpu.data.mmap_dataset import (MMapIndexedDataset,
                                                     write_mmap_dataset)
from block_transformer_tpu.data.packing import (PackedDataset, TokenizedCorpus,
                                                add_labels, make_train_batch,
                                                split_blocks)


def naive_padded_stream(corpus: TokenizedCorpus, eos, pad, block_length,
                        left_pad, pad_to_boundary=True):
    """Literal construction of the padded corpus: per doc
    [pad*left, doc, EOS, pad*right-to-boundary]."""
    out_ids, out_att = [], []
    for d in range(len(corpus)):
        ids = list(corpus.token_data[
            corpus.document_indices[d]:
            corpus.document_indices[d] + corpus.document_lengths[d]])
        seq = [pad] * int(left_pad[d]) + ids + [eos]
        att = [0] * int(left_pad[d]) + [1] * (len(ids) + 1)
        if pad_to_boundary:
            r = (-len(seq)) % block_length
            seq += [pad] * r
            att += [0] * r
        out_ids += seq
        out_att += att
    return np.array(out_ids), np.array(out_att)


def make_corpus(seed=0, n_docs=13, max_len=60):
    rng = np.random.default_rng(seed)
    docs = [rng.integers(5, 90, size=rng.integers(1, max_len)) for _ in range(n_docs)]
    lengths = np.array([len(d) for d in docs], np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    return TokenizedCorpus(np.concatenate(docs), lengths, starts), docs


def test_packer_matches_naive_stream():
    corpus, _ = make_corpus()
    ds = PackedDataset(corpus, max_length=16, eos_token=0, pad_token=0,
                       block_length=4, seed=42)
    ids_ref, att_ref = naive_padded_stream(corpus, 0, 0, 4, ds.left_pad)
    assert len(ids_ref) == ds.padded_total_length
    for i in range(len(ds)):
        s = ds[i]
        lo, hi = i * 16, (i + 1) * 16
        np.testing.assert_array_equal(s["input_ids"], ids_ref[lo:hi])
        np.testing.assert_array_equal(s["attention_mask"], att_ref[lo:hi])


def test_left_pad_distribution_seeded():
    corpus, _ = make_corpus()
    a = PackedDataset(corpus, 16, 0, 0, 4, seed=42)
    b = PackedDataset(corpus, 16, 0, 0, 4, seed=42)
    c = PackedDataset(corpus, 16, 0, 0, 4, seed=7)
    np.testing.assert_array_equal(a.left_pad, b.left_pad)
    assert (a.left_pad != c.left_pad).any()
    assert a.left_pad.max() < 4 and a.left_pad.min() >= 0


def test_vanilla_mode_no_padding():
    corpus, _ = make_corpus()
    ds = PackedDataset(corpus, max_length=16, eos_token=99, block_length=None)
    for i in range(len(ds)):
        assert (ds[i]["attention_mask"] == 1).all()


def test_batch_and_transforms():
    corpus, _ = make_corpus()
    ds = PackedDataset(corpus, 16, 0, 0, 4, seed=42)
    batch = make_train_batch(ds, [0, 1, 2], block_length=4)
    assert batch["input_ids"].shape == (3, 4, 4)
    assert batch["block_attention_mask"].shape == (3, 4)
    # every all-zero-attention block must have block mask 0
    bm = batch["attention_mask"].any(-1).astype(np.int32)
    np.testing.assert_array_equal(bm, batch["block_attention_mask"])
    # labels: -100 where not attended
    assert (batch["labels"][batch["attention_mask"] == 0] == -100).all()
    # get_batch consistency with __getitem__
    one = ds[2]
    np.testing.assert_array_equal(
        batch["input_ids"][2].reshape(-1), one["input_ids"])


def test_mmap_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    docs = [rng.integers(0, 50000, size=rng.integers(1, 30)).astype(np.uint16)
            for _ in range(7)]
    prefix = str(tmp_path / "corpus")
    write_mmap_dataset(prefix, docs)
    ds = MMapIndexedDataset(prefix)
    assert len(ds) == 7
    for i in range(7):
        np.testing.assert_array_equal(ds[i], docs[i])
    data, lengths, starts = ds.token_view()
    corpus = TokenizedCorpus(data, lengths, starts)
    np.testing.assert_array_equal(corpus.token_data[starts[3]:starts[3]+lengths[3]],
                                  docs[3])


def test_native_packer_matches_numpy():
    from block_transformer_tpu.data import native
    lib = native.get_packer()
    assert lib is not None, "native packer failed to build (g++ available?)"
    corpus, _ = make_corpus(seed=5, n_docs=23)
    # use uint16 token data like the Pile memmaps
    corpus = TokenizedCorpus(corpus.token_data.astype(np.uint16),
                             corpus.document_lengths, corpus.document_indices)
    ds = PackedDataset(corpus, 32, eos_token=0, pad_token=0, block_length=4,
                       seed=9)
    idxs = np.arange(len(ds))
    nat = ds.get_batch(idxs, use_native=True)
    ref = ds.get_batch(idxs, use_native=False)
    np.testing.assert_array_equal(nat["input_ids"], ref["input_ids"])
    np.testing.assert_array_equal(nat["attention_mask"], ref["attention_mask"])


def test_native_packer_wraparound():
    from block_transformer_tpu.data import native
    if native.get_packer() is None:
        return
    corpus, _ = make_corpus(seed=6, n_docs=5, max_len=20)
    ds = PackedDataset(corpus, 16, eos_token=0, pad_token=0, block_length=4)
    # index past the end wraps modulo padded_total_length
    big = np.array([len(ds) + 3, 2 * len(ds) + 1])
    nat = ds.get_batch(big, use_native=True)
    ref = ds.get_batch(big, use_native=False)
    np.testing.assert_array_equal(nat["input_ids"], ref["input_ids"])


def test_variable_block_split():
    from block_transformer_tpu.data.block_split import (FixedDistribution,
                                                        UniformDistribution,
                                                        split_blocks_variable)
    rng = np.random.default_rng(0)
    T = 64
    sample = {"input_ids": rng.integers(1, 90, size=T),
              "attention_mask": np.ones(T, np.int64),
              "labels": rng.integers(1, 90, size=T), "index": 7}
    dist = UniformDistribution(mean=4)
    out = split_blocks_variable(sample, dist, pad_token_id=0)
    n, L = out["input_ids"].shape
    assert L == dist.max == 7
    # token-level round trip: attended tokens re-concatenate to the input
    flat = out["input_ids"][out["attention_mask"] == 1]
    np.testing.assert_array_equal(flat, sample["input_ids"])
    # deterministic per index
    out2 = split_blocks_variable(sample, UniformDistribution(mean=4), 0)
    np.testing.assert_array_equal(out["input_ids"], out2["input_ids"])
    # different index -> different lengths (with overwhelming probability)
    s3 = dict(sample, index=8)
    out3 = split_blocks_variable(s3, UniformDistribution(mean=4), 0)
    assert out3["input_ids"].shape != out["input_ids"].shape or \
        (out3["input_ids"] != out["input_ids"]).any()

    fixed = FixedDistribution(4)
    outf = split_blocks_variable(sample, fixed, 0)
    assert outf["input_ids"].shape == (16, 4)
    np.testing.assert_array_equal(outf["input_ids"].reshape(-1),
                                  sample["input_ids"])

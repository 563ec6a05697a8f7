"""Deterministic random-access document packing for pretraining.

Re-design of the reference's ``TokenizedCorpusDataset``
(custom_dataset/tokenized_corpus.py:23-194). The padded-corpus layout is
identical — per document: seeded random left pad of 0..block_length-1
tokens (``np.random.RandomState(seed).randint(block_length, size=n_docs)``,
:167-172), the document, one EOS, right pad to the next block boundary
(:177-184); sample ``i`` is the window ``[i*max_length, (i+1)*max_length)``
of that virtual stream (:71-78) — so the two implementations yield
bit-identical samples for the same corpus/seed.

The reference walks a per-sample Python state machine; here each padded
position maps to its content in closed form, so a whole sample (or batch)
is a handful of vectorized numpy ops — the right shape for a TPU host
input pipeline (and for the C++ fast path that mirrors this logic).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


@dataclass
class TokenizedCorpus:
    """(token_data, document_lengths, document_start_indices) over a flat
    token array (typically a memmap)."""
    token_data: np.ndarray
    document_lengths: np.ndarray     # int64 [n_docs]
    document_indices: np.ndarray     # int64 [n_docs] start offset of each doc

    def __len__(self):
        return len(self.document_lengths)


class PackedDataset:
    """Deterministic random-access packed LM samples.

    Vanilla mode (block_length=None): documents joined by single EOS, no
    padding. Block mode: per-document random left pad + EOS + right pad to
    block boundary (reference semantics, see module docstring).
    """

    def __init__(self, corpus: TokenizedCorpus, max_length: int,
                 eos_token: int, pad_token: Optional[int] = None,
                 block_length: Optional[int] = None,
                 random_pad_first_block: bool = True,
                 pad_to_block_boundary: bool = True, seed: int = 42):
        self.corpus = corpus
        self.max_length = max_length
        self.eos_token = eos_token
        self.pad_token = pad_token
        self.block_length = block_length
        self.block_mode = block_length is not None
        if self.block_mode:
            if max_length % block_length != 0:
                raise ValueError("max_length must be divisible by block_length")
            if (random_pad_first_block or pad_to_block_boundary) and pad_token is None:
                raise ValueError("pad_token required in block mode")

        n_docs = len(corpus)
        doc_len = corpus.document_lengths.astype(np.int64)
        if self.block_mode and random_pad_first_block:
            rng = np.random.RandomState(seed)
            self.left_pad = rng.randint(block_length, size=n_docs,
                                        dtype=np.int16).astype(np.int64)
        else:
            self.left_pad = np.zeros(n_docs, np.int64)
        padded = doc_len + self.left_pad + 1  # +1 for EOS
        if self.block_mode and pad_to_block_boundary:
            right = (-padded) % block_length
            self.right_pad = right
        else:
            self.right_pad = np.zeros(n_docs, np.int64)
        self.padded_doc_lengths = padded + self.right_pad
        cumsum = np.concatenate([[0], np.cumsum(self.padded_doc_lengths)])
        self.padded_total_length = int(cumsum[-1])
        self.padded_doc_starts = cumsum[:-1]

    def __len__(self) -> int:
        return self.padded_total_length // self.max_length

    def positions_to_tokens(self, p: np.ndarray):
        """Map padded-corpus positions -> (input_ids, attention_mask)."""
        d = np.searchsorted(self.padded_doc_starts, p, side="right") - 1
        o = p - self.padded_doc_starts[d] - self.left_pad[d]
        doc_len = self.corpus.document_lengths[d]
        in_doc = (o >= 0) & (o < doc_len)
        is_eos = o == doc_len
        gather = np.clip(self.corpus.document_indices[d] + np.clip(o, 0, None),
                         0, len(self.corpus.token_data) - 1)
        toks = np.asarray(self.corpus.token_data[gather], dtype=np.int64)
        pad = self.pad_token if self.pad_token is not None else self.eos_token
        ids = np.where(in_doc, toks, np.where(is_eos, self.eos_token, pad))
        att = (in_doc | is_eos).astype(np.int64)
        return ids, att

    def __getitem__(self, idx: int):
        start = (idx * self.max_length) % self.padded_total_length
        p = start + np.arange(self.max_length, dtype=np.int64)
        ids, att = self.positions_to_tokens(p)
        return {"index": idx, "input_ids": ids, "attention_mask": att}

    def get_batch(self, idxs: np.ndarray, use_native: bool = True):
        """Batch fetch: [B] -> dict of [B, max_length].

        Uses the C++ packer (data/native.py, csrc/packer.cpp) when
        available; falls back to the vectorized numpy mapping (identical
        output, tested against each other)."""
        idxs = np.asarray(idxs, np.int64)
        starts = (idxs * self.max_length) % self.padded_total_length
        if use_native:
            from block_transformer_tpu.data import native
            out = native.pack_batch_native(self, starts)
            if out is not None:
                ids, att = out
                return {"input_ids": ids.astype(np.int64),
                        "attention_mask": att.astype(np.int64)}
        p = starts[:, None] + np.arange(self.max_length, dtype=np.int64)[None]
        ids, att = self.positions_to_tokens(p.reshape(-1))
        return {"input_ids": ids.reshape(len(idxs), -1),
                "attention_mask": att.reshape(len(idxs), -1)}


def split_blocks(input_ids, attention_mask, block_length: int):
    """[..., T] -> dict with [..., N, L] + block_attention_mask [..., N]
    (util/data_preprocessing.py:48-118 fixed-distribution path:
    block_attention_mask = any(attention_mask))."""
    lead = input_ids.shape[:-1]
    T = input_ids.shape[-1]
    N = T // block_length
    ids = input_ids.reshape(lead + (N, block_length))
    att = attention_mask.reshape(lead + (N, block_length))
    bam = (att != 0).any(axis=-1).astype(att.dtype)
    return {"input_ids": ids, "attention_mask": att, "block_attention_mask": bam}


def add_labels(input_ids, attention_mask):
    """labels = input_ids with -100 at unattended positions
    (util/data_preprocessing.py:25-31)."""
    return np.where(attention_mask == 0, -100, input_ids)


def make_train_batch(ds: PackedDataset, idxs, block_length: int,
                     distribution=None):
    """Fetch + blockify + label one training batch (numpy, host-side).

    ``distribution``: optional data.block_split.BlockLengthDistribution —
    variable block lengths (util/data_preprocessing.py:123-154): each
    sample is split at per-sample seeded boundaries and right-padded to
    the distribution max. ``n_blocks = ceil(max_length / mean)`` is the
    same for every sample (the adjust loop fixes the total), so batch
    shapes stay static for jit.
    """
    idxs = np.asarray(idxs)
    b = ds.get_batch(idxs)
    labels = add_labels(b["input_ids"], b["attention_mask"])
    if distribution is not None and getattr(distribution, "length", None) is None:
        from block_transformer_tpu.data.block_split import split_blocks_variable
        outs = [split_blocks_variable(
            {"input_ids": b["input_ids"][i], "attention_mask":
             b["attention_mask"][i], "labels": labels[i],
             "index": int(idxs[i])}, distribution, ds.pad_token)
            for i in range(len(idxs))]
        return {
            "input_ids": np.stack([o["input_ids"] for o in outs]).astype(np.int32),
            "attention_mask": np.stack([o["attention_mask"] for o in outs]
                                       ).astype(np.int32),
            "block_attention_mask": np.stack(
                [o["block_attention_mask"] for o in outs]).astype(np.int32),
            "labels": np.stack([o["labels"] for o in outs]).astype(np.int32),
        }
    sb = split_blocks(b["input_ids"], b["attention_mask"], block_length)
    N, L = sb["input_ids"].shape[-2:]
    return {
        "input_ids": sb["input_ids"].astype(np.int32),
        "attention_mask": sb["attention_mask"].astype(np.int32),
        "block_attention_mask": sb["block_attention_mask"].astype(np.int32),
        "labels": labels.reshape(labels.shape[0], N, L).astype(np.int32),
    }

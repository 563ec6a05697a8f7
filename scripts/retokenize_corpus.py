"""Offline corpus re-tokenization (the T5 reshard tool analogue —
util/convert_pythia_tokens_to_t5_shards.py): decode a Megatron .bin/.idx
corpus with one tokenizer, re-encode with another, write .npy shards the
T5-family training path loads (data/retokenized_corpus.py).

  python scripts/retokenize_corpus.py --src /root/corpus/pybytes \
      --src_tokenizer byte --dst_tokenizer byte --out /root/corpus/pybytes_t5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help=".bin/.idx prefix")
    ap.add_argument("--src_tokenizer", default="pythia")
    ap.add_argument("--dst_tokenizer", default="t5")
    ap.add_argument("--out", required=True)
    ap.add_argument("--shard_docs", type=int, default=1024)
    ap.add_argument("--max_docs", type=int, default=None)
    args = ap.parse_args()

    import numpy as np

    from block_transformer_tpu.data.mmap_dataset import MMapIndexedDataset
    from block_transformer_tpu.data.packing import TokenizedCorpus
    from block_transformer_tpu.data.retokenized_corpus import convert_corpus
    from block_transformer_tpu.data.tokenizer import load_tokenizer

    mm = MMapIndexedDataset(args.src)
    data, lengths, starts = mm.token_view()
    if args.max_docs:
        lengths = lengths[:args.max_docs]
        starts = starts[:args.max_docs]
    corpus = TokenizedCorpus(data, lengths, starts)
    src_tok = load_tokenizer(args.src_tokenizer)
    dst_tok = load_tokenizer(args.dst_tokenizer)
    out = convert_corpus(corpus, src_tok, dst_tok, args.out,
                         shard_docs=args.shard_docs)
    print(f"re-tokenized {len(lengths)} docs -> {out}")


if __name__ == "__main__":
    main()

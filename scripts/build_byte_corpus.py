"""Build a byte-level tokenized corpus from local text files.

The environment has no network egress, so the Pile idxmaps the reference
trains on (custom_dataset/pythia_pile_tokenized_corpus.py) are unavailable.
This script provides a *real-text* stand-in: it walks local source trees
(Python stdlib / site-packages — natural structured text), treats each file
as one document, and tokenizes at byte level with a +OFFSET shift so ids
0/1/2 stay reserved (0 = eos/pad, matching the NeoXConfig defaults).

Output is the same Megatron .bin/.idx format as the Pile idxmaps
(data/mmap_dataset.write_mmap_dataset), so the training entry consumes it
through the exact L0 path (`--pile <prefix>`). A held-out shard (every
``--holdout_every``-th file) is written separately for perplexity eval.

Usage:
  python scripts/build_byte_corpus.py --out /root/corpus/pybytes \
      --max_mb 200
"""

import argparse
import os
import pathlib
import sys
import sysconfig

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OFFSET = 3          # byte b -> token b + 3; 0 = eos/pad, 1/2 reserved
VOCAB = 256 + OFFSET  # 259 distinct ids; configs round up (e.g. 512)


def encode_bytes(data: bytes) -> np.ndarray:
    return np.frombuffer(data, np.uint8).astype(np.uint16) + OFFSET


def iter_files(roots, exts=(".py", ".md", ".txt", ".rst")):
    for root in roots:
        root = pathlib.Path(root)
        if not root.exists():
            continue
        for p in sorted(root.rglob("*")):
            if p.suffix in exts and p.is_file():
                yield p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output path prefix")
    ap.add_argument("--roots", nargs="*", default=None,
                    help="directories to walk (default: python stdlib + "
                         "site-packages)")
    ap.add_argument("--max_mb", type=float, default=200.0)
    ap.add_argument("--min_bytes", type=int, default=256)
    ap.add_argument("--max_bytes", type=int, default=262144)
    ap.add_argument("--holdout_every", type=int, default=100,
                    help="every Nth file goes to <out>_holdout")
    args = ap.parse_args()

    roots = args.roots or [
        sysconfig.get_paths()["stdlib"],
        *__import__("site").getsitepackages(),
    ]
    budget = int(args.max_mb * 1e6)
    train_docs, holdout_docs = [], []
    total = 0
    for i, p in enumerate(iter_files(roots)):
        try:
            data = p.read_bytes()
        except OSError:
            continue
        if len(data) < args.min_bytes:
            continue
        data = data[: args.max_bytes]
        doc = encode_bytes(data)
        if i % args.holdout_every == args.holdout_every - 1:
            holdout_docs.append(doc)
        else:
            train_docs.append(doc)
            total += len(doc)
        if total >= budget:
            break

    from block_transformer_tpu.data.mmap_dataset import write_mmap_dataset
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_mmap_dataset(args.out, train_docs, dtype=np.uint16)
    write_mmap_dataset(args.out + "_holdout", holdout_docs, dtype=np.uint16)
    print(f"train: {len(train_docs)} docs, {total/1e6:.1f}M tokens -> {args.out}")
    print(f"holdout: {len(holdout_docs)} docs, "
          f"{sum(len(d) for d in holdout_docs)/1e6:.1f}M tokens")


if __name__ == "__main__":
    main()

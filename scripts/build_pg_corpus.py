"""Build the pgbytes training corpus for the real-task fixtures.

Byte-level corpus from the reference's bundled Paul Graham essays
(/root/reference/needle/PaulGrahamEssays — task data, not code), using the
EXACT holdout rule of scripts/build_real_task_fixtures.py: essays are
loaded with the same load_essays() (sorted *.txt, whitespace-collapsed,
len > 2000), and every ``--holdout_every``-th essay by sorted index is
EXCLUDED from training — those are the eval-only essays the lambada_pg /
wikitext_pg fixtures mark ``seen: false``. Using the shared loader keeps
the two scripts' holdout sets identical by construction (checked against
assets/real_tasks/META.json at build time).

Output: Megatron .bin/.idx at --out (consumed via quality_run --corpus).

Usage:
  python scripts/build_pg_corpus.py --out /root/corpus/pgbytes
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.build_real_task_fixtures import load_essays

OFFSET = 3  # byte b -> token b + 3; 0 = eos/pad (matches quality_run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--essays",
                    default="/root/reference/needle/PaulGrahamEssays")
    ap.add_argument("--out", default="/root/corpus/pgbytes")
    ap.add_argument("--holdout_every", type=int, default=10)
    ap.add_argument("--meta", default="assets/real_tasks/META.json",
                    help="cross-check the holdout set against the "
                         "committed fixture META (empty to skip)")
    args = ap.parse_args()

    essays = load_essays(args.essays)
    holdout_idx = set(range(0, len(essays), args.holdout_every))
    holdout_names = sorted(essays[i][0] for i in holdout_idx)
    if args.meta and os.path.exists(args.meta):
        with open(args.meta) as f:
            meta = json.load(f)
        meta_holdout = meta.get("holdout_essays")
        if meta_holdout != holdout_names:
            raise SystemExit(
                f"holdout mismatch vs {args.meta}: corpus would train on "
                f"fixture eval essays.\n fixtures: {meta_holdout}"
                f"\n corpus:   {holdout_names}")

    train_docs, holdout_docs = [], []
    for i, (_name, text) in enumerate(essays):
        doc = np.frombuffer(text.encode("utf-8", "replace"),
                            np.uint8).astype(np.uint16)
        doc = np.minimum(doc, 255) + OFFSET
        (holdout_docs if i in holdout_idx else train_docs).append(doc)

    from block_transformer_tpu.data.mmap_dataset import write_mmap_dataset
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_mmap_dataset(args.out, train_docs, dtype=np.uint16)
    write_mmap_dataset(args.out + "_holdout", holdout_docs, dtype=np.uint16)
    n_tok = sum(len(d) for d in train_docs)
    print(f"train: {len(train_docs)} essays, {n_tok/1e6:.2f}M tokens "
          f"-> {args.out}")
    print(f"holdout (eval-only): {holdout_names}")


if __name__ == "__main__":
    main()

"""Build long-context evaluation assets from local text (offline).

The reference downloads PG19 from GCS (pg19/pg19.py:51-151) and bundles
Paul Graham essays as the needle haystack (needle/PaulGrahamEssays/) —
neither is reachable without egress. This builder produces the same
*shapes* of data from text already on the machine:

- ``books.jsonl``: PG19-style book-length documents ({"text": ...}) made
  by concatenating local prose/doc files until each reaches
  ``--min_chars`` — consumed by ``scripts/eval_longctx.py ppl --docs``.
- ``haystack.txt``: a contiguous prose haystack for needle-in-a-haystack
  sample generation (``eval_longctx.py needle --haystack``). A default
  copy is committed at assets/needle_haystack.txt.

  python scripts/build_longctx_assets.py --out results/longctx_assets
"""

import argparse
import glob
import json
import os
import sys
import sysconfig

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gather_text_files(roots, exts=(".rst", ".txt", ".md")):
    files = []
    for root in roots:
        for ext in exts:
            files.extend(glob.glob(os.path.join(root, "**", f"*{ext}"),
                                   recursive=True))
    out = []
    for p in sorted(set(files)):
        try:
            t = open(p, encoding="utf-8", errors="ignore").read()
        except OSError:
            continue
        if len(t) > 2000:
            out.append(t)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/longctx_assets")
    ap.add_argument("--roots", nargs="*", default=None)
    ap.add_argument("--n_books", type=int, default=8)
    ap.add_argument("--min_chars", type=int, default=120_000)
    ap.add_argument("--haystack_chars", type=int, default=200_000)
    args = ap.parse_args()

    roots = args.roots or [
        sysconfig.get_paths()["stdlib"],
        *__import__("site").getsitepackages(),
        "/opt/skills",
    ]
    texts = gather_text_files(roots)
    if not texts:
        raise SystemExit("no local text found under roots")
    os.makedirs(args.out, exist_ok=True)

    # PG19-style "books": concatenate prose files to book length
    books, cur = [], []
    cur_len = 0
    for t in texts:
        cur.append(t)
        cur_len += len(t)
        if cur_len >= args.min_chars:
            books.append("\n\n".join(cur))
            cur, cur_len = [], 0
        if len(books) >= args.n_books:
            break
    with open(os.path.join(args.out, "books.jsonl"), "w") as f:
        for b in books:
            f.write(json.dumps({"text": b}) + "\n")

    hay = "\n\n".join(texts)[: args.haystack_chars]
    with open(os.path.join(args.out, "haystack.txt"), "w") as f:
        f.write(hay)
    print(f"{len(books)} books ({sum(len(b) for b in books)/1e6:.1f}M chars) "
          f"+ {len(hay)/1e3:.0f}K-char haystack -> {args.out}")


if __name__ == "__main__":
    main()

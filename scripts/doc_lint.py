"""Doc-artifact lint: every results/BENCH path cited in a *.md must exist.

Round-3 and round-4 verdicts both flagged numbers whose named artifact was
missing from the tree (results/ is gitignored; artifacts survive only by
explicit `git add -f`). This lint makes the failure mechanical instead of
a judgment call: it greps every tracked markdown file for

  - ``results/<path>`` citations
  - ``BENCH_DETAIL*.json`` / ``BENCH_r*.json`` / ``MULTICHIP_r*.json``

and asserts each cited path is present in ``git ls-files`` (committed, not
just sitting untracked in a container-lifetime working tree). Wired into
the test suite as tests/test_doc_lint.py; run standalone for the report:

  python scripts/doc_lint.py [--fix-hints]
"""

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# results/... paths: stop at whitespace, quotes, markdown/table syntax.
# Trailing punctuation (.,;:)`]) is stripped afterwards. Brace families
# (results/train_mfu_{5m,85m}.json) are captured whole and expanded.
_CITE = re.compile(
    r"(?:results/[\w./-]+(?:\{[\w,.-]+\}[\w./-]*)?"
    r"|BENCH_DETAIL[\w.-]*\.json|BENCH_r[\w.-]*\.json"
    r"|MULTICHIP_r[\w.-]*\.json|COPYCHECK\.json)")
_STRIP = ".,;:)`]}'\""

# Citations that name a *pattern*, not one artifact: globs, placeholders
# (r0N, <step>), and `a..b` ranges.
_GLOBBY = re.compile(r"[*<>]|\.\.|r0N")

# The judge's and advisor's own files cite gaps and future deliverables
# (e.g. "results/decode_gate_300m.json" as a done-when target) — only
# OUR claim-bearing docs are linted.
_EXCLUDE_MD = {"VERDICT.md", "ADVICE.md"}

# A citation on a line carrying this marker is explicitly declaring the
# artifact GONE (the round-4 container wipe destroyed every untracked
# results/ file) — not silently pretending it exists. The lint's job is
# to catch the silent case; an annotated loss is honest provenance.
_LOST = "[artifact-lost]"


def _expand_braces(p):
    m = re.search(r"\{([\w,.-]+)\}", p)
    if not m:
        return [p]
    return [p[:m.start()] + alt + p[m.end():]
            for alt in m.group(1).split(",")]


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=REPO, check=True,
                         capture_output=True, text=True).stdout
    return set(out.split())


def cited_paths():
    """(md_file, lineno, path) for every artifact citation in tracked .md."""
    cites = []
    for md in sorted(p for p in tracked_files() if p.endswith(".md")
                     and os.path.basename(p) not in _EXCLUDE_MD):
        try:
            text = open(os.path.join(REPO, md), encoding="utf-8").read()
        except OSError:
            continue
        lines = text.splitlines()
        for lineno, line in enumerate(lines, 1):
            # the loss annotation may wrap onto a continuation line of the
            # same sentence — look at this line and the next two
            if any(_LOST in x for x in lines[lineno - 1:lineno + 2]):
                continue
            for m in _CITE.finditer(line):
                p = m.group(0).rstrip(_STRIP)
                if _GLOBBY.search(p):
                    continue
                for q in _expand_braces(p):
                    cites.append((md, lineno, q))
    return cites


def missing_citations():
    tracked = tracked_files()
    miss = []
    for md, lineno, p in cited_paths():
        # a cited directory counts as present if any tracked file lives in it
        if p in tracked or any(t.startswith(p.rstrip("/") + "/")
                               for t in tracked):
            continue
        miss.append((md, lineno, p))
    return miss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true",
                    help="print every citation, not just missing ones")
    args = ap.parse_args()
    cites = cited_paths()
    if args.list:
        for md, ln, p in cites:
            print(f"{md}:{ln}: {p}")
    miss = missing_citations()
    uniq = sorted({p for _, _, p in miss})
    print(f"[doc_lint] {len(cites)} citations in tracked .md; "
          f"{len(miss)} missing ({len(uniq)} unique paths)")
    for md, ln, p in miss:
        print(f"  MISSING {p}  (cited at {md}:{ln})")
    return 1 if miss else 0


if __name__ == "__main__":
    sys.exit(main())

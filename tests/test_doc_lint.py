"""Doc-artifact lint as a test (VERDICT r4 item 2): every results/BENCH
path cited in tracked markdown must exist in git ls-files (or carry an
explicit [artifact-lost] annotation). Mechanically prevents the round-3/
round-4 failure mode of quoting numbers whose named artifact is gone."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "doc_lint", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "doc_lint.py"))
doc_lint = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(doc_lint)


def test_all_cited_artifacts_exist():
    missing = doc_lint.missing_citations()
    assert not missing, (
        "cited artifacts missing from git ls-files "
        "(commit them with `git add -f`, or annotate the citation with "
        "[artifact-lost] if the file is genuinely gone):\n" +
        "\n".join(f"  {p}  (at {md}:{ln})" for md, ln, p in missing))


def test_lint_has_citations_to_check():
    # the lint must actually be seeing the docs (guard against a regex
    # or path regression silently turning it into a no-op)
    assert len(doc_lint.cited_paths()) > 30

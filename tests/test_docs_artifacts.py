"""Docs-cite-artifacts guard (VERDICT r4 weak item 5 / next-round item 5).

Three rounds running, a doc or learning artifact cited a `data/...`
evidence file that did not exist (r2: missing learning artifact; r3:
placeholder curves; r4: `h2h_r3c.json` named but never produced).  This
test makes the claim-without-artifact class fail CI: every `data/` path
named in `docs/*.md` and `LEARNING_*.json` must exist on disk, exist in
the reference tree (migration docs cite reference-side paths), or be
registered in `docs/PRUNED_ARTIFACTS.md` with a reason.  (README usage
examples and the judge-authored VERDICT/ADVICE files are out of scope —
the guarded claims are the builder's evidence citations.)
"""
import json
import os
import re
import glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# a data/ path not preceded by a word char or '.' (avoids e.g. the
# method name `push_data/pop_data_iter`); trailing punctuation stripped
_PATH_RE = re.compile(r"(?<![\w.])data/[\w./-]+")


def _cited_paths():
    cites = {}
    files = (glob.glob(os.path.join(REPO, "docs", "*.md"))
             + glob.glob(os.path.join(REPO, "LEARNING_*.json")))
    for f in files:
        with open(f, encoding="utf-8") as fh:
            text = fh.read()
        for m in _PATH_RE.finditer(text):
            p = m.group(0).rstrip(".,;:)")
            # template/placeholder citations ("data/models/<run-id>") and
            # bare directory prefixes are not artifact claims
            if "<" in p or p.rstrip("/") in ("data", "data/models",
                                             "data/summaries", "data/runs"):
                continue
            cites.setdefault(p.rstrip("/"), set()).add(os.path.basename(f))
    return cites


def _pruned_register():
    reg = set()
    path = os.path.join(REPO, "docs", "PRUNED_ARTIFACTS.md")
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            m = re.match(r"\|\s*`(data/[^`]+)`", line)
            if m:
                reg.add(m.group(1).rstrip("/"))
    return reg


def test_every_cited_data_path_exists_or_is_registered():
    pruned = _pruned_register()
    missing = {}
    for p, sources in _cited_paths().items():
        if (os.path.exists(os.path.join(REPO, p))
                or os.path.exists(os.path.join(REFERENCE, p))
                or p in pruned):
            continue
        missing[p] = sorted(sources)
    assert not missing, (
        "cited data/ artifacts neither on disk nor registered in "
        f"docs/PRUNED_ARTIFACTS.md: {json.dumps(missing, indent=1)}")

"""Artifact hygiene gate (VERDICT round-4 item 7).

Round 4 shipped a results document citing a metrics file that was never
committed (`outputs/models/scale_run4_fix/metrics.json`) — a claim a judge
has to treat as false. This test extracts every `outputs/...` path cited in
README.md and ROUND*_RESULTS.md and asserts it exists in the repo (glob
patterns must match at least one file). Results documents may therefore
only cite artifacts that have actually landed.
"""

import glob
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PATH_RE = re.compile(r"outputs/[A-Za-z0-9_*?.\-/]+")


def _cited_paths():
    docs = [os.path.join(REPO, "README.md")] + sorted(
        glob.glob(os.path.join(REPO, "ROUND*_RESULTS.md"))
    )
    cited = []
    for doc in docs:
        with open(doc) as f:
            text = f.read()
        for m in _PATH_RE.finditer(text):
            p = m.group(0).rstrip(".")  # sentence-final period
            cited.append((os.path.basename(doc), p))
    return cited


@pytest.mark.quick
def test_every_cited_output_artifact_exists():
    missing = []
    for doc, p in _cited_paths():
        full = os.path.join(REPO, p)
        if any(ch in p for ch in "*?"):
            if not glob.glob(full):
                missing.append(f"{doc}: {p} (glob matched nothing)")
        elif not os.path.exists(full):
            missing.append(f"{doc}: {p}")
    assert not missing, "cited artifacts missing from the repo:\n" + "\n".join(missing)


@pytest.mark.quick
def test_the_gate_actually_reads_citations():
    """Guard against the regex silently matching nothing (which would make
    the gate vacuous): the docs are known to cite committed artifacts."""
    assert len(_cited_paths()) >= 5

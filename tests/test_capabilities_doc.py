"""docs/CAPABILITIES.md is generated (devtools/gen_capabilities.py);
this gate fails when the committed file drifts from the generator's
output — a hand edit (wiped by the next regeneration, the r16→r17 PSL
caveat loss) or a forgotten rerun after adding queries."""

from __future__ import annotations

import os
import sys


def _gen_module():
    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, os.path.join(root, "devtools"))
    try:
        import gen_capabilities
    finally:
        sys.path.pop(0)
    return gen_capabilities


def test_committed_file_matches_generator():
    gen = _gen_module()
    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "CAPABILITIES.md")) as f:
        committed = f.read()
    assert committed == gen.render(), (
        "docs/CAPABILITIES.md drifted from the generator — rerun "
        "devtools/gen_capabilities.py (durable notes belong in "
        "docstring CAVEAT: paragraphs, not hand edits)")


def test_psl_caveat_survives_regeneration():
    gen = _gen_module()
    text = gen.render()
    row = [ln for ln in text.splitlines()
           if ln.startswith("| demo_domain_curation ")]
    assert len(row) == 1
    assert "CAVEAT" in row[0] and "640 rules" in row[0]
    assert "PublicSuffixList.load" in row[0]

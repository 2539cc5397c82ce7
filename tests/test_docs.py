"""Doc-count drift guard: the registered-query counts quoted in
COVERAGE.md and README.md must match the live registry (advisor r2:
the counts drifted twice; derive-or-assert stops it structurally)."""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _registry_size() -> int:
    import __spark_entry__ as e

    return len(e.queries())


def test_coverage_md_count_matches_registry():
    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(r"(\d+) registered queries", text)
    assert m, "COVERAGE.md no longer states a registered-query count"
    assert int(m.group(1)) == _registry_size()


def test_readme_count_matches_registry():
    text = (ROOT / "README.md").read_text()
    m = re.search(r"`queries\(\)` \((\d+) registered", text)
    assert m, "README.md no longer states a registered-query count"
    assert int(m.group(1)) == _registry_size()

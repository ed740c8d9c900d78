"""COVERAGE.md kind-tags are checked MECHANICALLY against the registry.

Round-8 verdict found three stale annotations (queries marked "(rows)"
or missing entirely after their oracle conversion landed). The summary
tables are the map the next session navigates by, so this test parses
every ``\\`query_name\\` (oracle...)`` / ``\\`query_name\\` (rows...)``
tag in COVERAGE.md and asserts it agrees with ``registry.ORACLES``:

- a name tagged "(oracle...)" must be oracle-backed in the registry;
- a name tagged "(rows...)" must be registered but NOT oracle-backed;
- every tagged name must be a registered query.

Backticked names that aren't registered queries (function paths,
module refs) are ignored.
"""

from __future__ import annotations

import re
from pathlib import Path

from bigdata_carprice_assignment_spark import registry

COVERAGE = Path(__file__).resolve().parents[1] / "COVERAGE.md"

# `name` immediately followed by a parenthetical whose first word is
# oracle or rows — the kind-tag convention used throughout COVERAGE.md.
TAG_RE = re.compile(r"`([a-z0-9_]+)` \((oracle|rows)\b")


def test_coverage_kind_tags_match_registry():
    registry.load_all()
    text = COVERAGE.read_text()
    tagged = TAG_RE.findall(text)
    assert tagged, "no kind-tags found — parser or file moved?"
    problems = []
    seen_queries = 0
    for name, kind in tagged:
        if name not in registry.QUERIES:
            problems.append(f"{name!r} tagged ({kind}) but not registered")
            continue
        seen_queries += 1
        if kind == "oracle" and name not in registry.ORACLES:
            problems.append(f"{name!r} tagged (oracle) but has no oracle")
        if kind == "rows" and name in registry.ORACLES:
            problems.append(
                f"{name!r} tagged (rows) but IS oracle-backed — stale tag"
            )
    assert not problems, "\n".join(problems)
    assert seen_queries >= 50, "suspiciously few tagged queries parsed"

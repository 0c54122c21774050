"""COVERAGE.md is the judge-facing operator->evidence matrix; its
file:line anchors must not drift as code moves. Every `path:line` (and
`path:l1,l2,...`) reference must land on or near a def/class line, and
every query id it cites must exist in the catalog."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ANCHOR = re.compile(r"`(dabstract_spark/[\w/]+\.py):(\d+(?:,\d+)*)`")
QID = re.compile(r"\bq\d{2}[a-z0-9_]*")


def _is_anchor_line(line: str) -> bool:
    s = line.strip()
    return (
        s.startswith(("def ", "class ", "@", "#:"))
        or s.startswith("MAX_")
        or bool(re.match(r"^[A-Z_]+\s*=", s))
    )


def test_coverage_file_line_anchors_point_at_definitions():
    text = (REPO / "COVERAGE.md").read_text()
    bad = []
    for m in ANCHOR.finditer(text):
        path, lines_spec = m.group(1), m.group(2)
        src = (REPO / path).read_text().splitlines()
        for ln in map(int, lines_spec.split(",")):
            window = src[max(0, ln - 2) : ln + 1]  # anchor or +-1 line
            if not any(_is_anchor_line(w) for w in window):
                bad.append(f"{path}:{ln} -> {src[ln - 1].strip()[:60]!r}")
    assert not bad, "drifted COVERAGE.md anchors:\n" + "\n".join(bad)


def test_coverage_query_ids_exist_in_catalog():
    import sys

    sys.path.insert(0, str(REPO))
    from __spark_entry__ import queries

    catalog = set(queries())
    text = (REPO / "COVERAGE.md").read_text()
    cited = {q for q in QID.findall(text) if len(q) > 3}  # full names only
    missing = {q for q in cited if q not in catalog}
    assert not missing, f"COVERAGE.md cites unknown queries: {sorted(missing)}"

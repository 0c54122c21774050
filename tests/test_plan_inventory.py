"""Catalog-wide plan-shape ratchet.

``tests/fixtures/plan_inventory.json`` records, for every catalog
query, the counted data-movement shape of its physical plan at HEAD:
shuffle exchanges, broadcast exchanges, parquet scans, Arrow Python
stages (see ``dabstract_spark.plans.plan_signature``). This test
rebuilds every catalog plan and demands EXACT equality — so any edit that
silently adds a shuffle, drops a broadcast to a shuffle join, splits a
shared scan, or routes rows through Python fails the suite with a
per-query diff, not a benchmark regression three rounds later.

Intentional changes: review the diff, then regenerate with

    python tools/plan_inventory.py

and commit the updated JSON alongside the change that caused it.
"""

from __future__ import annotations

import json
from pathlib import Path

FIXTURE = Path(__file__).resolve().parent / "fixtures" / "plan_inventory.json"


def test_catalog_plan_shapes_match_inventory(spark):
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.plan_inventory import build_inventory

    recorded = json.loads(FIXTURE.read_text())
    live = build_inventory(spark)

    missing = sorted(set(recorded) - set(live))
    unrecorded = sorted(set(live) - set(recorded))
    assert not missing, (
        f"inventory lists queries no longer in the catalog: {missing} — "
        "regenerate tools/plan_inventory.py"
    )
    assert not unrecorded, (
        f"catalog queries missing from the inventory: {unrecorded} — "
        "regenerate tools/plan_inventory.py"
    )

    drift = {
        name: {"recorded": recorded[name], "live": live[name]}
        for name in recorded
        if recorded[name] != live[name]
    }
    assert not drift, (
        "plan shapes drifted from the committed inventory (new shuffle / "
        "lost broadcast / extra scan / new Python stage?). If intentional, "
        "review and regenerate via `python tools/plan_inventory.py`:\n"
        + json.dumps(drift, indent=1, sort_keys=True)
    )

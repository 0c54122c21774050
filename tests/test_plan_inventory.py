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


RUNTIME_FIXTURE = (
    Path(__file__).resolve().parent / "fixtures" / "runtime_signatures.json"
)

# Hard cap for runtime_scans on the audited compositions: none of them
# reads more than 6 base tables, so >2x that is a recompute explosion
# no cache boundary is bounding (the r9 grouped_mad_outliers lesson:
# 28 runtime scans from composed multi-reference operators).
RUNTIME_SCAN_CAP = 12


def test_composed_queries_runtime_signatures_match(spark):
    """Post-collect runtime ratchet for the 10 highest static-signature
    (composed) queries. The STATIC inventory counts a persisted subtree
    at every printed reference (q228: 104 scans), so it cannot
    distinguish 'recompute actually bounded at runtime' from 'static
    fan-out'. This walks the EXECUTED plan tree
    (``dabstract_spark.plans.runtime_signature``) and demands exact
    equality with the committed record — proving the persists/
    checkpoints keep actual parquet re-reads bounded (q228 at HEAD:
    1 runtime scan, 16 cache reads, 7 reused exchanges). Regenerate
    after an intentional plan change:

        python tools/plan_inventory.py --runtime
    """
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.plan_inventory import RUNTIME_QUERIES, build_runtime

    recorded = json.loads(RUNTIME_FIXTURE.read_text())
    assert sorted(recorded) == sorted(RUNTIME_QUERIES)
    live = build_runtime(spark)
    drift = {
        name: {"recorded": recorded.get(name), "live": live[name]}
        for name in live
        if recorded.get(name) != live[name]
    }
    assert not drift, (
        "runtime signatures drifted (a stage boundary stopped bounding "
        "recompute?). If intentional, review and regenerate via "
        "`python tools/plan_inventory.py --runtime`:\n"
        + json.dumps(drift, indent=1, sort_keys=True)
    )
    for name, sig in live.items():
        assert sig["runtime_scans"] <= RUNTIME_SCAN_CAP, (
            f"{name} executes {sig['runtime_scans']} parquet scans at "
            f"runtime (cap {RUNTIME_SCAN_CAP}) — add localCheckpoint/"
            "persist at its multi-reference stage boundaries"
        )

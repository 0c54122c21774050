"""Physical-plan signatures: the machine-readable shuffle/scan/Arrow
shape of a DataFrame's plan, used by the catalog-wide shape ratchet
(``tools/plan_inventory.py`` + ``tests/test_plan_inventory.py``).

The signature counts the plan features that matter at 100 TB —
shuffle exchanges (every one is a full network pass over its input),
broadcast exchanges (driver/executor memory, not network), parquet
scans (how many times the input is read), and Arrow Python stages
(the only sanctioned Python; anything else is audited separately by
``tests/test_plan_audit.py``). It deliberately does NOT hash the plan
text: attribute ids, plan ids and codegen stage numbers churn on every
build, while the counted shape only changes when the query's real
data-movement strategy changes.
"""

from __future__ import annotations

import re

_SHUFFLE = re.compile(
    r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning)"
)
_SCAN = re.compile(r"(?:File)?Scan parquet")
_ARROW = re.compile(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas")


def plan_signature(df) -> dict:
    """Count the scale-relevant node families in ``df``'s (possibly
    un-executed) physical plan. Stable across rebuilds for a fixed
    input + session conf; independent of shuffle partition counts and
    expression ids."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffles": len(_SHUFFLE.findall(plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": len(_SCAN.findall(plan)),
        "arrow": len(_ARROW.findall(plan)),
    }

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


def _walk_executed(node, counts: dict) -> None:
    """Recursive JVM plan-tree walk for ``runtime_signature``. String
    counting is dishonest on executed plans: every ``InMemoryRelation``
    prints its FULL cached lineage (FileScans included) at every
    reference, and AQE prints ``== Initial Plan ==`` duplicates — q221's
    printed plan shows 50 FileScans where the runtime does exactly 1.
    The walk descends into AQE final plans and query-stage wrappers,
    and STOPS at the three nodes that end runtime recompute: cache
    reads, exchange reuses, and the scans themselves."""
    cls = node.getClass().getSimpleName()
    if "AdaptiveSparkPlan" in cls:
        _walk_executed(node.executedPlan(), counts)
        return
    if "QueryStage" in cls:
        _walk_executed(node.plan(), counts)
        return
    if "InMemoryTableScan" in cls:
        counts["cache_reads"] += 1
        return
    if "ReusedExchange" in cls:
        counts["reused_exchanges"] += 1
        return
    if "FileSourceScan" in cls:
        counts["runtime_scans"] += 1
        return
    children = node.children()
    for i in range(children.size()):
        _walk_executed(children.apply(i), counts)


def runtime_signature(df) -> dict:
    """Materialize ``df`` and read the signature off the EXECUTED plan
    tree (collect() FIRST — before execution the AQE final plan does
    not exist).

    ``plan_signature`` counts the printed plan of an unexecuted
    DataFrame, so a persisted/checkpointed subtree referenced N times is
    counted N times even when the runtime recompute is bounded (the
    q228 static row reads 104 scans). This is the complement — the
    ``test_mad_outliers_single_corpus_scan_via_checkpoints`` discipline
    generalized: ``runtime_scans`` is the number of parquet scans the
    final job actually executes, ``cache_reads`` the persisted
    stage-boundary reads, ``reused_exchanges`` the shuffles AQE served
    from a sibling. Scans paid once inside an eager
    persist/localCheckpoint during construction are deliberately not
    charged (they are the bounded stage-boundary reads the discipline
    exists to create). Subquery expressions are not traversed — the
    engine's scalar joins are crossJoin-based, so none of the audited
    queries carry them."""
    rows = len(df.collect())
    counts = {
        "rows": rows,
        "runtime_scans": 0,
        "cache_reads": 0,
        "reused_exchanges": 0,
    }
    _walk_executed(df._jdf.queryExecution().executedPlan(), counts)
    return counts


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

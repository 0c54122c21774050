"""Corpus-mixture planning operators.

``token_budget_per_group`` (operators/select.py) answers "WHICH
documents fill a given per-domain budget"; the planner here answers the
question before it: "what should each domain's budget BE" given one
global token budget — exact max-min-fair water-filling with an optional
repeat cap (the Muennighoff 2023 "scaling data-constrained LMs" regime,
where a domain may be repeated at most ``max_repeat`` epochs before its
marginal value collapses).

Everything is exact bigint arithmetic on an n_groups-sized table
(domains/sources — human-scale by contract, the grouped_rank_ppm
bound), so the plan is deterministic, engine-portable, and
DuckDB-oracle-checkable with plain window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def budget_allocation(
    df: DataFrame,
    group_col: str,
    token_col,
    total_budget: int,
    max_repeat: int = 1,
) -> DataFrame:
    """Split one global token budget across groups by exact water-
    filling (max-min fairness): every group gets its full capacity
    ``cap = n_tokens·max_repeat`` if the budget covers it, otherwise
    capped groups share the remainder as evenly as integer tokens allow
    (levels differ by at most 1).

    Returns (group, n_tokens, cap_tokens, alloc_tokens, epochs_ppm,
    capped) where ``epochs_ppm = alloc·10⁶ div max(n_tokens, 1)`` is the
    implied repeat factor and ``capped`` is 1 when the group did not
    receive its full capacity. Invariants (property-tested):
    ``sum(alloc) == min(total_budget, sum(cap))``, ``alloc <= cap``,
    and every capped group's alloc is within 1 token of every other
    capped group's.

    Algorithm (one pass over the sorted group table): sort groups by
    (cap asc, group asc); with exclusive prefix sums P and remaining
    counts r, the water level is ``c = (B - P_k) div r_k`` at the FIRST
    index k where that level is below the group's own cap; groups
    before k keep their cap, groups from k get c — plus one extra token
    each for the first ``(B - P_k) mod r_k`` of them in sort order, so
    the plan sums to the budget exactly.

    Scale shape: one map-side-combined groupBy to n_groups rows; every
    window after that runs on that tiny table (explicit constant
    partition key, the block_prefix_sum idiom); the 1-row waterline
    table and the offsets rejoin by broadcast. The 100 TB input is
    touched exactly once.
    """
    budget = int(total_budget)
    if budget < 0:
        raise ValueError("total_budget must be >= 0")
    if int(max_repeat) < 1:
        raise ValueError("max_repeat must be >= 1")
    tok = (F.col(token_col) if isinstance(token_col, str) else token_col).cast(
        "bigint"
    )
    # NULL groups are excluded: they could never receive a budget line,
    # and their sort placement differs across engines (Spark ASC is
    # NULLS FIRST, DuckDB's default NULLS LAST), which would move the
    # +1-token remainder between engines on cap ties
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.coalesce(F.sum(tok), F.lit(0)).alias("n_tokens"))
        .withColumn("cap_tokens", F.col("n_tokens") * F.lit(int(max_repeat)))
    )

    w_ord = Window.partitionBy(F.lit(0)).orderBy("cap_tokens", group_col)
    w_pre = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        counts.withColumn("__i", F.row_number().over(w_ord))
        .withColumn("__p", F.coalesce(F.sum("cap_tokens").over(w_pre), F.lit(0)))
        .withColumn("__r", F.count(F.lit(1)).over(w_all) - F.col("__i") + 1)
        .withColumn(
            "__level",
            F.expr(f"CAST(({budget} - __p) AS BIGINT) div __r"),
        )
    )
    # the waterline: first sorted index whose fair level is below its
    # own cap (NULL when the budget covers every cap). By construction
    # B - P is non-negative at that index, so the level is a real token
    # count. One row; broadcast back.
    line = ranked.agg(
        F.min(F.when(F.col("__level") < F.col("cap_tokens"), F.col("__i"))).alias(
            "__k"
        )
    )
    at_k = ranked.join(
        F.broadcast(line), F.col("__i") == F.col("__k"), "inner"
    ).select(
        F.col("__k").alias("__kk"),
        F.col("__level").alias("__c"),
        (
            F.lit(budget).cast("bigint")
            - F.col("__p")
            - F.col("__level") * F.col("__r")
        ).alias("__rem"),
    )
    # LEFT semantics for the uncapped case: at_k is EMPTY when no group
    # is capped, which would empty a plain cross join — join on a
    # constant key with "left" instead.
    out = ranked.withColumn("__j", F.lit(0)).join(
        F.broadcast(at_k.withColumn("__j", F.lit(0))), "__j", "left"
    )
    alloc = (
        F.when(F.col("__kk").isNull() | (F.col("__i") < F.col("__kk")), F.col("cap_tokens"))
        .otherwise(
            F.col("__c")
            + F.when(
                F.col("__i") - F.col("__kk") < F.col("__rem"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
    )
    return (
        out.withColumn("alloc_tokens", alloc)
        .withColumn(
            "epochs_ppm",
            F.expr(
                "CAST(CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000"
                " div CAST(greatest(n_tokens, 1) AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )
        .withColumn(
            "capped",
            (F.col("alloc_tokens") < F.col("cap_tokens")).cast("int"),
        )
        .select(
            group_col,
            "n_tokens",
            "cap_tokens",
            "alloc_tokens",
            "epochs_ppm",
            "capped",
        )
    )


def proportional_allocation(
    df: DataFrame,
    group_col: str,
    n_total: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of exactly ``n_total``
    rows across groups, proportional to group size (or to
    ``weight_col`` sums) — the eval-set builder's planner: "give me a
    10k-document split that matches the corpus mixture", the
    row-count sibling of ``budget_allocation``'s max-min token fill
    (water-filling EQUALIZES under caps; this PRESERVES the observed
    proportions). Per group: ``alloc_rows`` = floor(n_total·c_g / T)
    plus one of the k = n_total − Σfloor remainder units, awarded to
    the k largest integer remainders ``n_total·c_g mod T`` (ties →
    larger group first, then group value ascending NULLS LAST — a
    total order that places a NULL group after every non-NULL tie,
    matching SQL's ASC default), so
    Σalloc == n_total EXACTLY whenever the corpus is non-empty with a
    positive total weight, and every |alloc − exact quota| < 1. All arithmetic is exact
    DECIMAL(38,0); ``share_ppm`` is the group's observed corpus share.
    ``overfill`` flags a group whose allocation exceeds its own row
    count (only possible when n_total > corpus rows — sampling with
    replacement territory; the planner still sums to n_total and the
    flag makes the regime visible). NULL groups are real groups.

    Scale shape: one map-side-combined count over the mixture key is
    the only data-sized work; quotas, remainders, and the award rank
    run on the n_groups-row table (bounded-tiny-table window,
    ``partitionBy(lit(0))`` annotated).
    """
    if n_total < 0:
        raise ValueError(f"proportional_allocation: n_total {n_total} < 0")
    dec = "DECIMAL(38,0)"
    # coalesce(0): a group whose weights are all NULL must apportion
    # like a zero-weight group, not poison __base/__k with NULLs and
    # break the exact-sum law for everyone else. Weights must be
    # non-negative by contract; a zero-TOTAL corpus is degenerate —
    # every quota is 0, so at most one remainder unit lands per group
    # and Σalloc = min(n_groups, n_total), the only regime where the
    # exact-sum guarantee does not hold.
    w = (
        F.count(F.lit(1)).alias("__c")
        if weight_col is None
        else F.coalesce(
            F.sum(F.col(weight_col).cast("bigint")), F.lit(0)
        ).alias("__c")
    )
    counts = df.groupBy(F.col(group_col).alias("__g")).agg(w)
    tot = counts.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__t"))
    q = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "__num", F.expr(f"CAST({int(n_total)} AS {dec}) * CAST(__c AS {dec})")
        )
        .withColumn("__base", F.expr("CAST(__num div greatest(__t, 1) AS BIGINT)"))
        .withColumn(
            "__rem", F.expr("CAST(__num % greatest(__t, 1) AS BIGINT)")
        )
    )
    # k spare units onto the k largest remainders — the n_groups-row
    # award rank (bounded tiny-table window)
    # asc_nulls_last: a NULL group is a real group and can tie a non-NULL
    # group on (__rem, __c) exactly (__rem is a pure function of __c), so
    # the NULL placement decides who gets the remainder unit — pin it to
    # NULLS LAST, matching DuckDB's ASC default, or the award diverges
    # across engines.
    w_rank = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("__rem"), F.desc("__c"), F.asc_nulls_last("__g")
    )
    w_k = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        q.withColumn("__rk", F.row_number().over(w_rank))
        .withColumn(
            "__k",
            (F.lit(int(n_total)) - F.sum("__base").over(w_k)).cast("bigint"),
        )
        .withColumn("got_remainder", (F.col("__rk") <= F.col("__k")).cast("int"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__c").cast("bigint").alias("n_rows"),
            F.expr(
                "CAST(CAST(__c AS DECIMAL(38,0)) * 1000000"
                " div greatest(__t, 1) AS BIGINT)"
            ).alias("share_ppm"),
            (F.col("__base") + F.col("got_remainder")).cast("bigint").alias(
                "alloc_rows"
            ),
            "got_remainder",
            (
                (F.col("__base") + F.col("got_remainder")) > F.col("__c")
            ).cast("int").alias("overfill"),
        )
    )

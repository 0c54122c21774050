"""Data-quality validation and snapshot diffing for pipeline hygiene.

`validate` is the Deequ-style constraint pass every production ingest
runs before promoting a table: each check compiles to ONE aggregate
expression, all checks evaluate in a SINGLE scan (one Aggregate node,
map-side combined), and the output is a tiny (check, value, passed)
report — nothing data-sized ever leaves the executors.

`snapshot_diff` is the CDC primitive: classify rows of two keyed
snapshots as added / removed / changed / unchanged with one full outer
join on the key — the incremental-pipeline building block for "what
changed since the last run".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def null_rate_ppm(col: str) -> Column:
    """NULL fraction in parts-per-million — exact integer arithmetic, so
    the metric is engine-reproducible (float rates are not)."""
    return (
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)) * 1_000_000
        / F.count(F.lit(1))
    ).cast("bigint")


def validate(df: DataFrame, checks: list[tuple[str, Column, Column | None]]) -> DataFrame:
    """Run a constraint suite in ONE scan. ``checks`` is a list of
    (name, metric_expr, passed_expr) where both expressions are
    AGGREGATES over df (passed_expr may be a boolean over aggregates,
    or None for metric-only rows). Returns (check, value, passed).

    All metrics land in a single Aggregate node — the scan cost is paid
    once regardless of how many constraints run, which is what makes a
    50-constraint suite viable over a 100 TB table.
    """
    agg_cols = []
    for i, (_, value, passed) in enumerate(checks):
        agg_cols.append(value.cast("bigint").alias(f"__v{i}"))
        if passed is not None:
            agg_cols.append(passed.cast("boolean").alias(f"__p{i}"))
    row = df.agg(*agg_cols)
    parts = []
    for i, (name, _, passed) in enumerate(checks):
        parts.append(
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"__v{i}").alias("value"),
                (F.col(f"__p{i}") if passed is not None else F.lit(None).cast("boolean")).alias(
                    "passed"
                ),
            )
        )
    return row.select(F.explode(F.array(*parts)).alias("r")).select(
        F.col("r.check").alias("check"),
        F.col("r.value").alias("value"),
        F.col("r.passed").alias("passed"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key across two snapshots: 'added' (only in new),
    'removed' (only in old), 'changed' (both, any compare col differs,
    NULL-safe), 'unchanged'. One full outer join on the key — the
    incremental-processing primitive. Returns (key, change).
    """
    # presence flags via marker columns (a key can exist with all-NULL
    # compare cols, so presence needs its own marker, not coalesce)
    o = old.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__o_{c}") for c in compare_cols]
    ).withColumn("__in_o", F.lit(1))
    n = new.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__n_{c}") for c in compare_cols]
    ).withColumn("__in_n", F.lit(1))
    j = o.join(n, "__k", "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_o").isNull(), "added")
        .when(F.col("__in_n").isNull(), "removed")
        .when(differs, "changed")
        .otherwise("unchanged")
    )
    return j.select(F.col("__k").alias(key), change.alias("change"))


def maintain_rollup(
    base_rollup: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sums: list[str],
    count_col: str = "cnt",
    op_col: str = "op",
) -> DataFrame:
    """Incremental view maintenance for a distributive rollup: apply a
    CDC delta to a materialized ``GROUP BY keys`` view holding a row
    count and per-measure sums, WITHOUT rescanning the base table.

    ``base_rollup`` has columns ``keys + [count_col] + [f"sum_{m}"]``;
    ``delta`` has ``[op_col] + keys + sums`` with op in
    {'insert', 'delete'} (an update is a delete+insert pair, the
    standard CDC encoding). Deletes are assumed to reference rows that
    exist in the base — the CDC-stream guarantee. Groups whose
    maintained count reaches 0 are dropped, matching what a recomputed
    GROUP BY would produce. AVG/derived metrics follow from sum/count.

    Scale: the delta aggregates map-side to |delta groups| rows, then a
    single full-outer join on the group key against the |groups|-sized
    view — the 100 TB base is never touched. Full outer join cannot
    broadcast in Spark, but both sides are rollup-sized (group
    cardinality), not fact-sized, so the shuffle is bounded by the view
    itself."""
    sign = F.when(F.col(op_col) == "insert", F.lit(1)).otherwise(F.lit(-1))
    d = delta.groupBy(*[F.col(k).alias(f"__k_{k}") for k in keys]).agg(
        F.sum(sign).alias("__dcnt"),
        *[F.sum(sign * F.col(m)).alias(f"__d_{m}") for m in sums],
    )
    return _apply_signed_delta(base_rollup, d, keys, sums, count_col)


def apply_rollup_delta(
    base_rollup: DataFrame,
    delta_agg: DataFrame,
    keys: list[str],
    sums: list[str],
    count_col: str = "cnt",
) -> DataFrame:
    """Apply a PRE-AGGREGATED signed delta (columns ``keys + ['dcnt'] +
    [f'd_{m}']``) to a rollup — the merge half of ``maintain_rollup``,
    exposed for the streaming maintainer whose sink already holds
    per-batch partials."""
    d = delta_agg.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col("dcnt").alias("__dcnt"),
        *[F.col(f"d_{m}").alias(f"__d_{m}") for m in sums],
    )
    return _apply_signed_delta(base_rollup, d, keys, sums, count_col)


def _apply_signed_delta(
    base_rollup: DataFrame,
    d: DataFrame,
    keys: list[str],
    sums: list[str],
    count_col: str,
) -> DataFrame:
    cond = None
    for k in keys:
        c = base_rollup[k].eqNullSafe(d[f"__k_{k}"])
        cond = c if cond is None else cond & c
    j = base_rollup.join(d, cond, "full_outer")
    key_cols = [
        F.coalesce(base_rollup[k], d[f"__k_{k}"]).alias(k) for k in keys
    ]
    cnt = (
        F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("__dcnt"), F.lit(0))
    ).alias(count_col)
    sum_cols = [
        (
            F.coalesce(F.col(f"sum_{m}"), F.lit(0)) + F.coalesce(F.col(f"__d_{m}"), F.lit(0))
        ).alias(f"sum_{m}")
        for m in sums
    ]
    return j.select(*key_cols, cnt, *sum_cols).filter(F.col(count_col) > 0)


def psi_drift(
    a: DataFrame,
    b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column over FROZEN reference bins — the standard drift monitor a
    training pipeline runs between the corpus it trained on and the
    corpus it is about to train on.

    Bins are fixed-width over [lo, hi) (out-of-range values clamp to
    the edge buckets — production PSI freezes the reference binning, it
    does not re-derive it from the drifted data). NULL values of the
    monitored column are EXCLUDED on both sides (a missing measurement
    is not evidence about the distribution; without the filter Spark's
    greatest() would silently fold NULL into bucket 0, inflating the
    lowest bin). Per bucket:
    ``psi_contrib = (pa - pb) * ln(pa / pb)`` with both proportions
    clamped to ``eps`` so empty buckets stay finite. Returns one row
    per bucket: (bucket, cnt_a, cnt_b, psi_contrib rounded to 6);
    total PSI is the sum.

    Scale: each side reduces map-side to ≤ n_buckets rows; the join is
    over the constant bucket spine. Nothing data-sized shuffles, so the
    monitor costs two scans regardless of corpus size."""
    spark = a.sparkSession
    width = (hi - lo) / n_buckets
    bucket = lambda df: df.filter(F.col(col).isNotNull()).select(  # noqa: E731
        F.least(
            F.lit(n_buckets - 1),
            F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width).cast("int")),
        ).alias("bucket")
    )
    ca = bucket(a).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_a"))
    cb = bucket(b).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_b"))
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    j = (
        spine.join(ca, "bucket", "left")
        .join(cb, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )
    tot = j.agg(
        F.sum("cnt_a").alias("__ta"), F.sum("cnt_b").alias("__tb")
    )
    j = j.crossJoin(F.broadcast(tot))
    pa = F.greatest(F.col("cnt_a") / F.col("__ta"), F.lit(eps))
    pb = F.greatest(F.col("cnt_b") / F.col("__tb"), F.lit(eps))
    return j.select(
        "bucket",
        "cnt_a",
        "cnt_b",
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_contrib"),
    )


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    cols: list[str],
) -> DataFrame:
    """Relational MERGE (upsert): matched keys take the source's column
    values, unmatched target rows survive, unmatched source rows insert.
    Returns the merged table plus an ``action`` column
    (insert/update/unchanged) — the audit trail a lakehouse MERGE emits.

    One full outer join on the key (single shuffle both sides); change
    detection is null-safe per column. This is the batch semantics of
    Delta/Iceberg MERGE expressed engine-side — at scale the join is
    the unavoidable cost, and file-level pruning (see layout.zorder_write)
    is what keeps the target side from rescanning 100 TB.
    """
    t = target.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__t_{c}") for c in cols]
    ).withColumn("__in_t", F.lit(1))
    s = source.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__s_{c}") for c in cols]
    ).withColumn("__in_s", F.lit(1))
    j = t.join(s, "__k", "full_outer")
    differs = F.lit(False)
    for c in cols:
        differs = differs | ~F.col(f"__t_{c}").eqNullSafe(F.col(f"__s_{c}"))
    action = (
        F.when(F.col("__in_t").isNull(), "insert")
        # no source row -> the target row is untouched; the null-safe
        # compare below would read all-NULL source cols as a difference
        .when(F.col("__in_s").isNull(), "unchanged")
        .when(differs, "update")
        .otherwise("unchanged")
    )
    picked = [
        F.when(F.col("__in_s").isNotNull(), F.col(f"__s_{c}"))
        .otherwise(F.col(f"__t_{c}"))
        .alias(c)
        for c in cols
    ]
    return j.select(F.col("__k").alias(key), *picked, action.alias("action"))


def corpus_datasheet(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str | None = None,
    short_tokens: int = 20,
) -> DataFrame:
    """Corpus data card — the one-page summary a curation run ships with
    its output (Gebru et al., "Datasheets for Datasets"): a tall
    (metric, value) table of exact-integer corpus facts — document and
    token counts, language cardinality, short-document and PII-bearing
    counts, exact-duplicate exposure (docs whose normalized content
    digest is shared), and the integer-div mean quality score.

    One staged projection feeds everything: the scalar facts reduce in
    a single global aggregate (map-side combined to one row) and the
    duplicate count is one digest-keyed groupBy — nothing else
    shuffles, so the datasheet costs ~one scan at any corpus size.
    All values are exact integers (counts and a truncating integer-div
    mean), so the card is reproducible bit for bit."""
    from dabstract_spark.operators.dedup import normalize_text
    from dabstract_spark.operators.text import pii_count, quality_score_ppm, tokens

    staged = df.select(
        F.size(tokens(text_col)).cast("bigint").alias("__nt"),
        quality_score_ppm(text_col).alias("__q"),
        F.md5(normalize_text(text_col)).alias("__dg"),
        pii_count(text_col, "email").alias("__pe"),
        *([F.col(lang_col).alias("__lang")] if lang_col else []),
    )
    # every sum coalesces to 0 and the mean divides by greatest(n, 1):
    # sum/div over ZERO rows is NULL in Spark, and the card's contract
    # ("exact integers, bit for bit") must hold for an empty corpus too
    scalars = staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("__nt"), F.lit(0)).alias("n_tokens"),
        F.coalesce(
            F.sum((F.col("__nt") < short_tokens).cast("bigint")), F.lit(0)
        ).alias("short_docs"),
        F.coalesce(
            F.sum((F.col("__pe") > 0).cast("bigint")), F.lit(0)
        ).alias("pii_docs"),
        F.expr(
            "CAST(coalesce(sum(__q), 0) div greatest(count(1), 1) AS BIGINT)"
        ).alias("mean_quality_ppm"),
        *(
            [F.countDistinct("__lang").alias("n_langs")]
            if lang_col
            else [F.lit(0).cast("bigint").alias("n_langs")]
        ),
    )
    dups = (
        staged.groupBy("__dg")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("dup_docs"))
    )
    metrics = [
        "n_docs",
        "n_tokens",
        "n_langs",
        "short_docs",
        "pii_docs",
        "dup_docs",
        "mean_quality_ppm",
    ]
    stack = ", ".join(f"'{m}', CAST({m} AS BIGINT)" for m in metrics)
    return scalars.crossJoin(F.broadcast(dups)).select(
        F.expr(f"stack({len(metrics)}, {stack})").alias("metric", "value")
    )

"""Skew-mitigation utilities (SURVEY §7-M6 100 TB posture).

AQE's skew-join splitting handles join-side skew at runtime; these
helpers cover the cases AQE does not: aggregations over heavy-hitter
keys and joins against a side AQE can't split. The pattern is classic
two-phase salting — shard each hot key across ``n_salts`` synthetic
sub-keys (map-side), aggregate partials per sub-key, then merge partials
per real key. Both shuffles move pre-aggregated data, so one
pathological key can no longer pin a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salt_column(n_salts: int, *cols: str) -> Column:
    """Deterministic salt in [0, n_salts): hash of the row's full content
    (all columns given). Deterministic per row content (portable to an
    oracle), uniform across identical keys because the non-key columns
    differ."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_count_sum(
    df: DataFrame,
    group_cols: list[str],
    sum_col: str,
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase count+sum over possibly-skewed group keys:
    partial aggregate per (key, salt), then merge per key. Returns
    (*group_cols, n, total). Decimal-exact sums so the two-phase result
    is bit-identical to the single-phase one."""
    salt_cols = salt_on or df.columns
    salted = df.withColumn("__salt", salt_column(n_salts, *salt_cols))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(sum_col).cast("decimal(18,2)")).alias("__s"),
    )
    return (
        partial.groupBy(*group_cols)
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__s").cast("double").alias("total"),
        )
    )


def replicated_broadcast_join(
    big: DataFrame, small: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Skew-immune join shape: broadcast the small side so NO shuffle of
    the big side happens at all — a skewed key costs only its scan time.
    (Thin wrapper that documents the intent; at 100 TB prefer this over
    a shuffle join whenever the small side fits the broadcast budget.)"""
    return big.join(F.broadcast(small), on, how)

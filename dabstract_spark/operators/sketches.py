"""Re-aggregatable count-min sketches — approximate frequency counts
with the same 100 TB property the HLL rollup (q176) demonstrates for
distincts: per-partition PARTIAL sketches persist as small (j, bucket,
cnt) tables and any rollup is a merge-by-sum, never a base-data rescan.

Everything is md5-derived integer arithmetic (``md5_bucket`` row hashes,
bigint counters), so sketch contents, merges, and estimates are
bit-identical across engines and partitionings — the whole pipeline is
DuckDB-oracle-checkable, unlike a seeded-PRNG sketch.

Scale shape: building a sketch is one groupBy on (group, j, bucket) —
the shuffle carries at most |groups|·depth·width rows after map-side
partial aggregation, regardless of input size. Estimation joins probe
keys against the sketch on (j, bucket): with the default 4×256 geometry
the merged sketch is ≤1024 rows — always broadcastable.

No reference analog (the reference has no sketches); the pattern follows
Cormode & Muthukrishnan, "An Improved Data Stream Summary: The
Count-Min Sketch and its Applications" (J. Algorithms 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dabstract_spark.functions.hashing import md5_bucket


def _hash_pairs(key: Column | str, depth: int, width: int) -> Column:
    """array<struct<j, bucket>>: the key's row in each of the ``depth``
    md5 hash families (family j = md5 seeded with j)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), md5_bucket(c, width, seed=j).alias("bucket")
            )
            for j in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    key_col: str | Column,
    group_cols: tuple[str, ...] = (),
    depth: int = 4,
    width: int = 256,
    weight_col: str | Column | None = None,
) -> DataFrame:
    """Partial count-min sketch(es): one (``*group_cols``, j, bucket,
    cnt) row per touched counter. ``weight_col`` counts each row by an
    integral weight instead of 1 (e.g. token counts pre-aggregated per
    doc)."""
    w = (
        F.lit(1).cast("bigint")
        if weight_col is None
        else (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
            "bigint"
        )
    )
    exploded = df.select(
        *group_cols, F.explode(_hash_pairs(key_col, depth, width)).alias("__p"), w.alias("__w")
    )
    return (
        exploded.select(*group_cols, F.col("__p.j").alias("j"), F.col("__p.bucket").alias("bucket"), "__w")
        .groupBy(*group_cols, "j", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge partial sketches by summing counters — the rollup that
    never rescans base data. Drop partition columns from ``group_cols``
    to roll them up (exactly like re-aggregating q176's HLLs)."""
    return sketches.groupBy(*group_cols, "j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    est_col: str = "est",
) -> DataFrame:
    """Point-query the sketch: estimate(key) = min over hash families of
    the key's counter. Never underestimates (each counter ≥ the true
    count); overestimates only on hash collisions. The sketch side is
    ≤ depth·width rows — broadcast, so probing is shuffle-free on the
    probe side.

    Internal hash columns use collision-proof ``__cms_*`` names so a
    probes frame that itself carries ``j``/``bucket``/``cnt`` columns
    (they're ordinary analytics names) can never make the join or the
    final groupBy silently ambiguous — those names are grouped over as
    plain probe attributes like any other."""
    reserved = {"__cms_j", "__cms_bucket", "__cms_cnt", "__cms_p"}
    clash = reserved & set(probes.columns)
    if clash:
        raise ValueError(f"probes columns collide with cms internals: {sorted(clash)}")
    p = (
        probes.select("*", F.explode(_hash_pairs(key_col, depth, width)).alias("__cms_p"))
        .select(
            "*",
            F.col("__cms_p.j").alias("__cms_j"),
            F.col("__cms_p.bucket").alias("__cms_bucket"),
        )
        .drop("__cms_p")
    )
    others = [c for c in probes.columns]
    sk = sketch.select(
        F.col("j").alias("__cms_j"),
        F.col("bucket").alias("__cms_bucket"),
        F.col("cnt").alias("__cms_cnt"),
    )
    joined = p.join(F.broadcast(sk), ["__cms_j", "__cms_bucket"], "left")
    return joined.groupBy(*others).agg(
        F.min(F.coalesce(F.col("__cms_cnt"), F.lit(0))).cast("bigint").alias(est_col)
    )


# --------------------------------------------------------------------- #
# Re-aggregatable equi-width histogram — the QUANTILE member of the
# sketch family (CMS = frequency, Bloom = membership, HLL = distinct).
# Values are fixed-point micro-units (bigint, 1e-6 resolution) so the
# binning is pure integer arithmetic — bit-identical across engines and
# partitionings, hence DuckDB-oracle-checkable, unlike t-digest whose
# centroids depend on merge order.
#
# Scale shape: building is one groupBy on (group, bin) — the shuffle
# carries at most |groups|·bins rows after map-side partial aggregation
# regardless of input size; merging partials is a sum, never a rescan;
# quantile extraction runs on the ≤|groups|·bins sketch table with a
# group-partitioned cumulative window (bounded by `bins`, never data-
# sized). Estimation error is bounded by one bin width, a fixed
# resolution/size trade chosen up front like CMS width.
# --------------------------------------------------------------------- #


def hist_bin(value_micro: Column, width_micro: int, bins: int) -> Column:
    """Clamped equi-width bin index for a bigint micro-unit value:
    floor(v / width) clamped to [0, bins-1] (negatives to 0). Explicit
    floor() (DuckDB CAST(double AS BIGINT) ROUNDS, Spark truncates);
    the double division is exact wherever it matters — any v ≥
    bins·width clamps to the top bin, and below that the quotient is
    far inside double precision."""
    raw = F.floor(value_micro / F.lit(width_micro))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def hist_sketch(
    df: DataFrame,
    value_micro: Column | str,
    group_cols: tuple[str, ...] = (),
    width_micro: int = 4_000_000,
    bins: int = 128,
) -> DataFrame:
    """Partial histogram(s): one (``*group_cols``, bin, cnt) row per
    touched bin. ``value_micro`` must already be bigint micro-units
    (e.g. ``round(value, 6) * 1e6`` — the q203 fixed-point recipe)."""
    v = F.col(value_micro) if isinstance(value_micro, str) else value_micro
    return (
        df.select(*group_cols, hist_bin(v, width_micro, bins).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(sketches: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge partial histograms by summing bin counters — drop partition
    columns from ``group_cols`` to roll them up, never rescanning base
    data (the q176 HLL / cms_merge contract)."""
    return sketches.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    percentiles: tuple[int, ...] = (50, 95, 99),
    group_cols: tuple[str, ...] = (),
    width_micro: int = 4_000_000,
) -> DataFrame:
    """Quantile estimates from a (merged) histogram: for each percentile
    p, the LOWER EDGE (micro-units) of the smallest bin whose cumulative
    count reaches ceil(p·n/100) — the discrete-quantile rule q203 uses on
    exact values, applied to bins. True quantile lies within one bin
    width above the estimate. Output: one row per group with
    ``p{p}_lo_micro`` columns. The window is partitioned per group and
    bounded by ``bins`` rows — never data-sized."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*(group_cols or ())).orderBy("bin")
        if group_cols
        else Window.partitionBy(F.lit(0)).orderBy("bin")
    )
    cum = sketch.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w_cum.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(
            w_cum.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )

    def pick(p: int) -> Column:
        return F.min(
            F.when(100 * F.col("cum") >= p * F.col("n"), F.col("bin"))
        ) * F.lit(width_micro)

    return cum.groupBy(*group_cols).agg(
        *[pick(p).alias(f"p{p}_lo_micro") for p in percentiles]
    )


# --------------------------------------------------------------------- #
# Deterministic md5 HyperLogLog (Flajolet et al. 2007): the exact-
# arithmetic, ORACLE-REPLAYABLE sibling of Spark's built-in Datasketches
# HLL (q176 uses the built-in and can only be guard-checked; this one is
# bit-identical across engines and partitionings, so its estimate is
# value-oracled like every other card). m = 256 registers (b = 8), the
# rho stream carved from the key's md5: bucket = first 8 bits, rho = 1 +
# leading zeros of the next 48 bits (``49 − length(bin(v))``, pure
# integer/string ops both engines share). The harmonic denominator is an
# EXACT BIGINT: Σ 2^(50−M[j]) ≤ 256·2^50 < 2^59 — every term a shift, so
# merges and estimates carry no float until one final division, and
# register tables merge by MAX (idempotent + commutative: any batching,
# any replay, any partitioning gives the identical register table — a
# strictly stronger merge guarantee than additive partials).
# --------------------------------------------------------------------- #

#: 0.7213/(1 + 1.079/256) · 2^66 — the m=256 HLL alpha·m² scaled by the
#: 2^50 register-term scale, folded to ONE double literal both engines
#: parse identically (alpha itself = 0.7182725932495458)
_HLL_ALPHA_M2_SCALED = 5.2999162811336204e19


def hll_partials(
    df: DataFrame,
    key_col: str | Column,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Partial HLL register table(s): one (``*group_cols``, bucket, M)
    row per touched register (≤ 256 per group after map-side combine,
    regardless of input size — the shuffle is register-sized). NULL keys
    are excluded, matching COUNT(DISTINCT)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.md5(c.cast("string"))
    v = F.conv(F.substring(h, 3, 12), 16, 10).cast("bigint")
    rho = F.when(v > 0, F.lit(49) - F.length(F.bin(v))).otherwise(F.lit(49))
    return (
        df.filter(c.isNotNull())
        .select(
            *group_cols,
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            rho.cast("int").alias("M"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("M").alias("M"))
    )


def hll_merge(partials: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Merge register tables by MAX — idempotent, so replayed or
    overlapping partials are harmless by construction (no dedup
    needed, unlike additive count partials)."""
    return partials.groupBy(*group_cols, "bucket").agg(F.max("M").alias("M"))


def hll_card(
    registers: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Distinct-count card from a (merged) register table: per group,
    ``v_zero`` untouched registers, the exact-integer scaled harmonic
    sum ``s_scaled = Σ 2^(50−M)`` (absent registers contribute 2^50),
    and the HLL estimate in micro-units — raw ``α·m²·2^50 / s_scaled``
    with the standard small-range linear-counting correction
    ``m·ln(m/V)`` when E ≤ 2.5m and V > 0 (one libm call, round 6 —
    the proven portability recipe). The large-range correction is
    omitted: it matters only near 2^48 distincts, far beyond the 48-bit
    rho stream's own design range (documented bound). The micro-unit
    leg is DECIMAL(38,6) in BOTH engines so estimates up to the BIGINT
    micro cap (~9.2e12) never overflow the cast — non-ANSI Spark would
    have turned a DECIMAL(18,6) overflow past ~1e12 into a silent NULL
    while DuckDB errors loudly (the r9 cross-engine overflow rule)."""
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__np"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - M)")).alias("__sp"),
    )
    v = (F.lit(256) - F.col("__np")).cast("bigint")
    s = (F.col("__sp") + v * F.expr("shiftleft(CAST(1 AS BIGINT), 50)")).cast(
        "bigint"
    )
    staged = agg.select(
        *group_cols, v.alias("v_zero"), s.alias("s_scaled")
    ).withColumn(
        "__e", F.lit(_HLL_ALPHA_M2_SCALED) / F.col("s_scaled").cast("double")
    )
    est = F.when(
        (F.col("__e") <= F.lit(640.0)) & (F.col("v_zero") > 0),
        F.lit(256.0) * F.log(F.lit(256.0) / F.col("v_zero").cast("double")),
    ).otherwise(F.col("__e"))
    return staged.select(
        *group_cols,
        "v_zero",
        "s_scaled",
        (F.round(est, 6).cast("decimal(38,6)") * F.lit(1_000_000))
        .cast("bigint")
        .alias("estimate_micro"),
    )


def hll_distinct_card(
    df: DataFrame,
    key_col: str | Column,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One-shot batch card: partials → card (partials are already the
    merged registers when built in one pass)."""
    return hll_card(hll_partials(df, key_col, group_cols), group_cols)


# --------------------------------------------------------------------- #
# KMV / theta distinct sketch (Bar-Yossef et al. 2002; Dasgupta et al.'s
# theta framework): keep the k SMALLEST 48-bit md5 values per group.
# Complements the HLL card with the one operation HLL cannot do: SET
# INTERSECTION (theta-style: intersect the kept samples below the
# smaller threshold) — "distinct-user overlap between two sources"
# without an exact distinct shuffle. Every estimate is exact integer
# arithmetic ((k−1)·2^48 div (h_k+1)), so the whole family is
# value-oracled. Merge = k-smallest of the union — idempotent under
# duplicates, the same replay-proof law as the HLL register max.
# Hashes are kept as FIXED-WIDTH 12-char hex strings: lexicographic
# order == numeric order, so ranks and joins never convert until the
# one final conv() per group.
# --------------------------------------------------------------------- #


def _kmv_keep_k(hashes: DataFrame, group_cols: tuple[str, ...], k: int) -> DataFrame:
    """k smallest h per group from a DISTINCT (groups, h) table via the
    shared ``select.two_level_keep_k`` composite-bucket rank: a
    corpus-dominating group spreads over 256 window tasks; ≤ 256·k
    survivors per group reach the bounded second rank."""
    from dabstract_spark.operators.select import two_level_keep_k

    return two_level_keep_k(
        hashes, group_cols, [F.col("h")], F.substring("h", 1, 2), k
    )


def kmv_partials(
    df: DataFrame,
    key_col: str | Column,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """Partial KMV sketch(es): (``*group_cols``, h) — the k smallest
    distinct 48-bit md5 hex values per group. NULL keys excluded,
    matching COUNT(DISTINCT)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    hashes = (
        df.filter(c.isNotNull())
        .select(*group_cols, F.substring(F.md5(c.cast("string")), 1, 12).alias("h"))
        .distinct()
    )
    return _kmv_keep_k(hashes, group_cols, k)


def kmv_merge(
    partials: DataFrame, group_cols: tuple[str, ...] = (), k: int = 256
) -> DataFrame:
    """Merge sketches: k smallest of the distinct union — idempotent
    (duplicate/replayed partials change nothing)."""
    return _kmv_keep_k(partials.distinct(), group_cols, k)


def kmv_estimate(
    sketch: DataFrame, group_cols: tuple[str, ...] = (), k: int = 256
) -> DataFrame:
    """Distinct-count card per group: ``n_kept`` and the exact-integer
    estimate — EXACT n_kept when the sketch is unfull (fewer than k
    distincts exist), else ``(k−1)·2^48 div (h_k + 1)`` with h_k the
    largest kept value (the unbiased KMV estimator on the integer
    lattice)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.expr("CAST(conv(h, 16, 10) AS BIGINT)")).alias("__hk"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("bigint")).otherwise(
        F.expr(
            f"CAST(CAST({k - 1} AS BIGINT) * CAST(281474976710656 AS BIGINT)"
            " div (__hk + 1) AS BIGINT)"
        )
    )
    return agg.select(*group_cols, "n_kept", est.alias("est_distinct"))


def kmv_intersect_card(
    sketch: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """Pairwise distinct-OVERLAP card between groups — the theta-sketch
    intersection HLL cannot express: per unordered group pair,
    ``theta = min(theta_a, theta_b)`` (a group's theta is h_k + 1 when
    full, 2^48 when unfull = exact), the common kept values below theta
    are a uniform sample of the true intersection, and
    ``est_intersection = n_common · 2^48 div theta``. ``jaccard_ppm``
    derives from the three estimates (clamped at 10⁶). Pairs sharing
    no sampled value do not emit. The sketch table is ≤ n_groups·k
    rows — every join here is broadcast-sized by construction."""
    two48 = 281474976710656
    # the sketch plan (corpus distinct + two ranks) is referenced four
    # times below (theta, estimates, both self-join sides) — checkpoint
    # so the data-sized stage runs once, not once per reference (the
    # grouped_mad_outliers composition lesson)
    sketch = sketch.localCheckpoint(eager=False)
    theta = (
        sketch.groupBy(F.col(group_col).alias("__g")).agg(
            F.count(F.lit(1)).alias("__n"),
            F.max(F.expr("CAST(conv(h, 16, 10) AS BIGINT)")).alias("__hk"),
        )
        .select(
            "__g",
            "__n",
            F.when(F.col("__n") < k, F.lit(two48).cast("bigint"))
            .otherwise(F.col("__hk") + 1)
            .alias("__theta"),
        )
    )
    ests = kmv_estimate(sketch, (group_col,), k).select(
        F.col(group_col).alias("__g"), "est_distinct"
    )
    a = sketch.select(F.col(group_col).alias("__ga"), "h")
    b = sketch.select(F.col(group_col).alias("__gb"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("__ga") < F.col("__gb"))
        .join(
            F.broadcast(theta.select(F.col("__g").alias("__ga"), F.col("__theta").alias("__ta"))),
            "__ga",
        )
        .join(
            F.broadcast(theta.select(F.col("__g").alias("__gb"), F.col("__theta").alias("__tb"))),
            "__gb",
        )
        .withColumn("__tmin", F.least("__ta", "__tb"))
        # provably a no-op when BOTH sketches come from the same keep-k
        # (every kept h < its own group's theta), but REQUIRED by the
        # theta formalism the moment sketches with different k merge —
        # the filter is the operator's correctness contract, kept on
        # both engines (the oracle mirrors it); it runs on the tiny
        # pair table, never data-sized
        .filter(F.expr("CAST(conv(h, 16, 10) AS BIGINT)") < F.col("__tmin"))
        .groupBy("__ga", "__gb", "__tmin")
        .agg(F.count(F.lit(1)).alias("n_common_sample"))
    )
    out = (
        pairs.join(
            F.broadcast(ests.select(F.col("__g").alias("__ga"), F.col("est_distinct").alias("est_a"))),
            "__ga",
        )
        .join(
            F.broadcast(ests.select(F.col("__g").alias("__gb"), F.col("est_distinct").alias("est_b"))),
            "__gb",
        )
        .withColumn(
            "est_intersection",
            F.expr(
                f"CAST(n_common_sample * CAST({two48} AS BIGINT)"
                " div __tmin AS BIGINT)"
            ),
        )
    )
    return out.select(
        F.col("__ga").alias("group_a"),
        F.col("__gb").alias("group_b"),
        "n_common_sample",
        "est_a",
        "est_b",
        "est_intersection",
        # DECIMAL(38,0) legs: est·10⁶ can pass 2^63 for near-theta-1
        # sketches — a silent BIGINT wrap under non-ANSI Spark would
        # show as a hash mismatch, never an error (the r9 overflow rule)
        F.expr(
            "CAST(least(CAST(est_intersection AS DECIMAL(38,0)) * 1000000"
            " div greatest(CAST(est_a AS DECIMAL(38,0)) + est_b"
            " - est_intersection, 1), 1000000) AS BIGINT)"
        ).alias("jaccard_ppm"),
    )

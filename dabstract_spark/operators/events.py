"""Event-table operators: time windows, sessionization, event dedup,
JSON prop extraction (SURVEY §2.12 / §7-M6 — the reference has no
streaming surface; these are the batch forms, with the true streaming
variants in dabstract_spark/streaming/).

All pure built-ins: window functions partitioned by user (parallel), no
global sorts, JSON parsing JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_us(col) -> F.Column:
    """Microseconds-since-epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.

    Parquet files whose timestamps are not UTC-adjusted (timestamp[us]
    with isAdjustedToUTC=false) load as TIMESTAMP_NTZ in Spark 4, and
    ``unix_micros`` rejects that type outright. Casting NTZ→TIMESTAMP
    reinterprets the wall-clock in the session zone — a uniform shift
    that cancels in every gap/duration computation below (and is exact
    under the UTC session zone the engine standardizes on).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def _epoch_us_sql(col: str) -> str:
    """SQL-string form of :func:`_epoch_us` for F.expr aggregates."""
    return f"unix_micros(cast({col} as timestamp))"


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window aggregate (batch form of the streaming windowed
    agg). Returns (window_start, *group_cols, n_events, sum_value)."""
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *group_cols, "n_events", "sum_value")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding-window aggregate: each event lands in width/slide
    overlapping windows (batch form of the streaming sliding agg).
    Returns (window_start, *group_cols, n_events, sum_value)."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *group_cols, "n_events", "sum_value")
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    to the previous event of the same user exceeds ``gap_minutes``.
    Returns one row per event with a per-user ``session_id``. Windows are
    partitioned by user — shuffle on user_id, parallel across users
    (skewed power users handled by AQE skew-join settings)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # microsecond integers, not seconds: casting timestamp→long floors to
    # seconds and misclassifies gaps within 1 s of the threshold
    us = _epoch_us(ts_col)
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session stats: event count, duration seconds, total value."""
    s = sessionize(df, ts_col, user_col, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            f"(max({_epoch_us_sql(ts_col)}) - min({_epoch_us_sql(ts_col)})) div 1000000"
        ).alias("duration_sec"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def latest_event_dedup(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Keep the latest event per key (batch form of streaming
    dropDuplicates-keep-last; deterministic tie-break on event_id)."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.desc(tiebreak_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def extract_props(df: DataFrame, props_col: str = "props", field: str = "k") -> DataFrame:
    """Pull a typed field out of the JSON props column (JVM-side parse).
    try_cast, not cast: a malformed/non-numeric field (or empty-string
    props) reads NULL instead of raising CAST_INVALID_INPUT under ANSI —
    the oracle carries the matching TRY_CAST."""
    return df.withColumn(
        f"prop_{field}",
        F.get_json_object(F.col(props_col), f"$.{field}").try_cast("int"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    strict: bool = False,
) -> DataFrame:
    """AS-OF join: for each left row, attach the LATEST right row with
    the same key whose timestamp is <= (or < when ``strict``) the left
    timestamp. Spark has no native as-of join; this is the union-tag
    formulation — one shuffle on (key), a per-key window scan, no range
    explosion:

      union(left tagged 0, right tagged 1)
        -> window last_value(right payload ignorenulls)
           over (partition by key order by ts, tag) rows unbounded preceding
        -> keep left rows

    Ties: a right row AT the same timestamp is visible to the left row
    unless ``strict`` (right sorts before left at equal ts via the tag).
    At scale this is the plan you want — both sides shuffle once on the
    join key, the window runs per key, skew handled by AQE. DuckDB's
    native ASOF JOIN is the oracle (q101).
    """
    lcols = left.columns
    # left rows always carry tag 0; right rows sort BEFORE left at equal
    # ts for the <= (non-strict) semantics and AFTER for the strict <.
    l_tagged = left.select(
        *lcols,
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (on, ts_col) else F.lit(None).cast(t).alias(c)
            for c, t in ((c, dict(left.dtypes).get(c)) for c in lcols)
        ],
        F.lit(1 if strict else -1).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(_epoch_us(ts_col), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.select(
        *lcols,
        "__tag",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return out.filter(F.col("__tag") == 0).drop("__tag")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    before_sec: int = 0,
    after_sec: int = 60,
    right_cols: tuple[str, ...] = ("event_id", "value"),
    suffix: str = "_r",
) -> DataFrame:
    """Range (interval) join: all right rows with the same key whose
    timestamp falls in [left.ts - before_sec, left.ts + after_sec].

    A naive key-equi + range predicate makes Spark evaluate the range
    against every same-key pair (quadratic per hot key). This is the
    time-binned formulation: both sides bucket time into windows of
    width >= before+after, the left row lands in every bin its interval
    touches (<= 2 bins by construction), and the join key is (key, bin)
    — an ordinary hash join whose per-bucket fan-out is bounded by data
    density, refined by the exact predicate afterwards.
    """
    w_us = max(before_sec + after_sec, 1) * 1_000_000
    l_us = _epoch_us(ts_col)
    l2 = (
        left.withColumn("__lo", l_us - F.lit(before_sec * 1_000_000))
        .withColumn("__hi", l_us + F.lit(after_sec * 1_000_000))
        .withColumn(
            "__lbin",
            F.explode(F.sequence(F.expr(f"__lo div {w_us}"), F.expr(f"__hi div {w_us}"))),
        )
    )
    r2 = right.select(
        F.col(on).alias("__ron"),
        _epoch_us(ts_col).alias("__rus"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("__rbin", F.expr(f"__rus div {w_us}"))
    joined = l2.join(
        r2, (F.col(on) == F.col("__ron")) & (F.col("__lbin") == F.col("__rbin"))
    )
    out = joined.filter((F.col("__rus") >= F.col("__lo")) & (F.col("__rus") <= F.col("__hi")))
    return out.drop("__lo", "__hi", "__lbin", "__rbin", "__ron", "__rus")


def time_grid_fill(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    step_sec: int = 3600,
) -> DataFrame:
    """Regularize an irregular event stream onto a fixed per-key time
    grid with forward fill (gap filling — the time-series feature-prep
    step before any fixed-rate model).

    For every key, emits one row per ``step_sec`` bucket between the
    key's first and last event (bucket starts epoch-aligned); the value
    is the latest observation at-or-before the bucket start (NULL until
    the first observation). Events sharing a timestamp are pre-reduced
    to the max-event-id observation so the fill is deterministic.

    Shape at scale: grid generation is a per-key ``sequence`` explode
    (no shuffle); the fill is the asof union-tag form — one shuffle on
    the key, a per-key window scan, never a range join. Grid volume is
    keys x span/step, independent of event count.
    """
    us = _epoch_us(ts_col)
    step_us = step_sec * 1_000_000
    # Per-key gap filling requires a key: NULL-key events are excluded
    # entirely (no grid, no fill) — a relational equi/asof join cannot
    # express "NULL is its own series" portably
    df = df.filter(F.col(user_col).isNotNull())
    # NULL-value events are NOT observations: they neither fill a bucket
    # nor shadow an earlier same-timestamp reading (they still extend
    # the grid bounds below, which scan the key-filtered input)
    obs = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(user_col).alias("__u"), us.alias("__us"))
        .agg(
            F.max_by(F.col(value_col), F.col("event_id")).alias("__v")
            if "event_id" in df.columns
            else F.max(F.col(value_col)).alias("__v")
        )
    )
    bounds = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    grid = bounds.select(
        "__u",
        F.explode(
            F.sequence(
                F.expr(f"__lo div {step_us}") * step_us,
                F.expr(f"__hi div {step_us}") * step_us,
                F.lit(step_us),
            )
        ).alias("__us"),
    )
    u = grid.select("__u", "__us", F.lit(None).cast("double").alias("__v"), F.lit(0).alias("__tag")).unionByName(
        obs.select("__u", "__us", "__v", F.lit(-1).alias("__tag"))
    )
    w = (
        Window.partitionBy("__u")
        .orderBy("__us", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("__ff", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 0)
        .select(
            F.col("__u").alias(user_col),
            F.timestamp_micros(F.col("__us")).alias("bucket_ts"),
            F.col("__ff").alias("value_ff"),
        )
    )


def rolling_range_agg(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    window_sec: int = 3600,
) -> DataFrame:
    """Trailing time-range aggregate per event: count and sum of the
    key's events in the last ``window_sec`` seconds INCLUDING the
    current row (RANGE frame, so same-timestamp events see each other).

    Built on a window RANGE frame over epoch *microseconds* — exact
    boundary semantics identical to SQL ``RANGE BETWEEN INTERVAL ...
    PRECEDING AND CURRENT ROW``. One shuffle on the key; the frame scan
    is a per-key sliding two-pointer inside the sorted partition, not a
    self-join.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(_epoch_us(ts_col))
        .rangeBetween(-window_sec * 1_000_000, 0)
    )
    return df.select(
        "event_id",
        user_col,
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).over(w).cast("double").alias("sum_trailing"),
    )


def funnel_stages(
    df: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_events: int | None = 1_000_000,
    truncated_col: str | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: the deepest stage each key reached, where
    stage k counts only if it happened STRICTLY AFTER the key's entry
    into stage k-1 (min-ts chaining — the standard conversion funnel).

    Returns (user, stage_reached, t_first_stage0). Implemented as one
    conditional aggregation per stage over the same key grouping: stage
    timestamps chain through ``min(CASE WHEN type=s AND ts > prev)``.
    Spark computes all stages in a single groupBy pass (no joins): the
    per-stage mins are mutually dependent, so they are evaluated over
    the collected per-user (ts, type) pairs via aggregate expressions,
    still one shuffle.

    Scale posture of the per-user collect: events are pre-filtered to
    the funnel's stage types BEFORE collection (semantics-preserving —
    non-stage events can never advance the fold — and it shrinks the
    collected arrays to the funnel-relevant fraction of the corpus);
    users with no stage events re-enter through a distinct-user-id left
    join (user-id-only shuffle) as stage 0. The residual bound is the
    per-user STAGE-event count — fine for humans, but a bot emitting
    10⁸ stage events is still one task's array, so ``max_events`` adds
    a deterministic cap keeping each user's EARLIEST max_events stage
    events (rank-filtered before the collect — nothing over-cap is ever
    materialized; ties on (ts, type) are struct-identical so the kept
    multiset is deterministic). The cap DEFAULTS ON at 10⁶ — no human
    emits a million funnel events, so the default is output-invisible
    for real users while bounding the bot-grade array by construction;
    pass ``max_events=None`` to opt out explicitly. Documented trade: a
    capped user's funnel can only under-report progression that first
    happens after its max_events-th stage event — and because that
    trade is silent by default, ``truncated_col`` (when set) adds a
    boolean audit column marking exactly the keys the cap actually
    truncated, computed inside the existing cap window (same
    partitioning and sort — no extra shuffle), so a report can state
    "N users capped" instead of guessing.
    """
    us = _epoch_us(ts_col)
    stage_events = df.filter(F.col(type_col).isin(list(stages)))
    if truncated_col is not None and max_events is None:
        raise ValueError(
            "funnel_stages: truncated_col requires max_events (nothing "
            "can truncate without a cap)"
        )
    trunc_agg = []
    if max_events is not None:
        # NULLS LAST explicitly: Spark's asc default is NULLS FIRST,
        # DuckDB's (the q214 oracle) is NULLS LAST — and a NULL-ts
        # event is not "earliest" under the cap's documented semantics
        wcap = Window.partitionBy(user_col).orderBy(
            us.asc_nulls_last(), F.col(type_col)
        )
        stage_events = stage_events.withColumn(
            "__rn", F.row_number().over(wcap)
        )
        if truncated_col is not None:
            # flag BEFORE the cap filter (an over-cap row must be seen
            # to be counted); unbounded max over the same partition key
            w_all = Window.partitionBy(user_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            stage_events = stage_events.withColumn(
                "__truncated", F.max(F.col("__rn") > max_events).over(w_all)
            )
            trunc_agg = [F.max("__truncated").alias("__truncated")]
        stage_events = stage_events.filter(
            F.col("__rn") <= max_events
        ).drop("__rn")
    pairs = F.collect_list(F.struct(us.alias("us"), F.col(type_col).alias("t")))
    users = df.select(user_col).distinct()
    agg = users.join(
        stage_events.groupBy(user_col).agg(
            F.array_sort(pairs).alias("__p"), *trunc_agg
        ),
        user_col,
        "left",
    ).withColumn(
        "__p",
        F.coalesce(
            F.col("__p"), F.array().cast("array<struct<us:bigint,t:string>>")
        ),
    )
    # fold the sorted (ts, type) list through the stage chain: acc =
    # (stage_reached, ts_of_last_stage, t0) — one pass, pure HOF.
    n = len(stages)
    type_arr = F.array(*[F.lit(s) for s in stages])
    def _step(acc, x):
        # F.get is 0-based and NULL-safe out of range (element_at throws
        # under ANSI mode once the final stage is reached)
        type_ok = x["t"] == F.get(type_arr, acc["k"])
        advance = (
            (acc["k"] < n)
            & type_ok.isNotNull() & type_ok
            & ((acc["k"] == 0) | (x["us"] > acc["ts"]))
        )
        return F.when(
            advance,
            F.struct(
                (acc["k"] + 1).alias("k"),
                x["us"].alias("ts"),
                F.coalesce(acc["t0"], x["us"]).alias("t0"),
            ),
        ).otherwise(acc)

    folded = F.aggregate(
        F.col("__p"),
        F.struct(
            F.lit(0).cast("int").alias("k"),
            F.lit(None).cast("bigint").alias("ts"),
            F.lit(None).cast("bigint").alias("t0"),
        ),
        _step,
    )
    out_cols = [
        user_col,
        folded["k"].alias("stage_reached"),
        F.timestamp_micros(folded["t0"]).alias("t_first_stage"),
    ]
    if truncated_col is not None:
        # users with no stage events were never truncated
        out_cols.append(
            F.coalesce(F.col("__truncated"), F.lit(False)).alias(truncated_col)
        )
    return agg.select(*out_cols)


def multires_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    widths_sec: tuple[int, ...] = (900, 3600, 86400),
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: one pass emits the
    continuous aggregate at every resolution. Each event is exploded
    into (resolution_sec, bucket_start) pairs — len(widths_sec) rows —
    and ONE shuffle on (resolution, bucket, *group) produces all levels;
    at scale this beats len(widths_sec) separate scans of a 100 TB fact
    table, and coarse levels could equally be re-aggregated from the
    finest (the cascade trade: re-aggregation saves input volume but
    serializes levels; the explode form is one parallel pass).

    Returns (resolution_sec, bucket_start, *group_cols, n_events,
    sum_value); buckets are epoch-aligned (floor(epoch / width) * width).
    """
    us = _epoch_us(ts_col)
    res = F.explode(
        F.array(*[
            F.struct(
                F.lit(w).cast("int").alias("resolution_sec"),
                F.timestamp_seconds(
                    (us / 1_000_000).cast("bigint") - (us / 1_000_000).cast("bigint") % w
                ).alias("bucket_start"),
            )
            for w in widths_sec
        ])
    ).alias("r")
    return (
        df.select(*group_cols, F.col(value_col).alias("__v"), res)
        .select("r.resolution_sec", "r.bucket_start", *group_cols, "__v")
        .groupBy("resolution_sec", "bucket_start", *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("__v").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def change_intervals(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    state_col: str = "event_type",
) -> DataFrame:
    """SCD2-style history build: collapse a per-key event stream into
    validity intervals of its state column — one row per state CHANGE,
    with (valid_from, valid_to, is_current). The standard dimension-
    history shape for warehouses and feature stores.

    Two per-key window passes (same shuffle partitioning, one exchange):
    drop rows equal to their predecessor's state, then valid_to = next
    survivor's valid_from. Ties at one timestamp order by event_id so
    both engines agree.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    changed = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
        .drop("__prev")
    )
    w2 = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    return changed.select(
        user_col,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key time-weighted average (trapezoidal integration) — the
    irregular-sampling mean every metrics store needs (a value held for
    an hour must weigh 60x one held for a minute; the row-mean is
    wrong). twa = Σ (v_i + v_{i+1})·(t_{i+1} − t_i) / (2·(t_N − t_0)).

    Exact integer form: values in 1e6 micro-units, time in epoch µs —
    segment products overflow int64, so the per-key sums accumulate in
    DECIMAL(38,0) and the final division is integral (sign-safe
    magnitudes), giving a bit-identical twa_micro across engines.
    One shuffle on the key (lag window + aggregate share it); keys with
    a single sample (zero span) are excluded — their TWA is undefined.
    NULL-value rows are ignored (no observation, no segment): keeping
    them would also make the (t, v) order engine-dependent — Spark
    sorts NULLs first, DuckDB last."""
    w = Window.partitionBy(key_col).orderBy(F.col("__t"), F.col("__v"))
    seg = (
        df.filter(F.col(value_col).isNotNull()).select(
            F.col(key_col),
            _epoch_us(ts_col).alias("__t"),
            (F.round(F.col(value_col), 6).cast("decimal(18,6)") * F.lit(1000000))
            .cast("bigint")
            .alias("__v"),
        )
        .withColumn("__pt", F.lag("__t").over(w))
        .withColumn("__pv", F.lag("__v").over(w))
    )
    agg = seg.groupBy(key_col).agg(
        F.sum(
            (
                (F.col("__v") + F.col("__pv")).cast("decimal(38,0)")
                * (F.col("__t") - F.col("__pt")).cast("decimal(38,0)")
            )
        ).alias("__num"),
        (F.max("__t") - F.min("__t")).alias("__span"),
    )
    return (
        agg.filter(F.col("__span") > 0)
        .withColumn("__den", (F.col("__span").cast("decimal(38,0)") * 2))
        .select(
            key_col,
            F.when(
                F.col("__num") < 0, -F.expr("(-__num) div __den")
            ).otherwise(F.expr("__num div __den")).cast("bigint").alias("twa_micro"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str = "ts",
    period_sec: int = 604_800,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the epoch period
    (default week) of their FIRST event; for every (cohort, offset) the
    output counts the distinct users active ``offset`` periods after
    their cohort period, plus the cohort size and retention in exact
    integer ppm — the classic activation/retention analytics rollup.

    Periods are pure integer epoch buckets (``floor(epoch) div
    period``), not calendar weeks — engine-portable and DST-free. Two
    key-hashed shuffles, both on small keys: per-user min (map-side
    combinable) and a distinct over (user, period) pairs; the final
    rollup is (cohort, offset)-sized. No windows, no collects — at
    100 TB the heavy stage is the (user, period) distinct, exactly as
    dense as the raw activity and perfectly partitionable."""
    wk = F.expr(f"CAST(floor(unix_timestamp({ts_col})) AS BIGINT) div {period_sec}")
    active = df.select(F.col(user_col).alias("u"), wk.alias("wk")).distinct()
    return retention_from_activity(active)


def retention_from_activity(active: DataFrame) -> DataFrame:
    """The retention rollup over a DISTINCT (u, wk) activity table —
    shared verbatim by the batch op above and the streaming maintainer
    (one recipe, no drift). Input must already be distinct."""
    cohort = active.groupBy("u").agg(F.min("wk").alias("cohort"))
    sizes = cohort.groupBy("cohort").agg(F.countDistinct("u").alias("cohort_size"))
    ret = (
        active.join(cohort, "u")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("offset"))
        .agg(F.countDistinct("u").alias("n_users"))
    )
    return (
        ret.join(sizes, "cohort")
        .select(
            "cohort",
            "offset",
            "n_users",
            "cohort_size",
            F.expr("CAST((n_users * 1000000) div cohort_size AS BIGINT)").alias(
                "retention_ppm"
            ),
        )
    )


def theil_sen_trend(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    bucket_sec: int = 86_400,
) -> DataFrame:
    """Robust per-group activity trend: the Theil–Sen estimator (median
    of all pairwise slopes) over time-bucketed event counts — "is this
    source's volume drifting, ignoring spikes?" The median-of-slopes is
    the classic outlier-proof alternative to OLS (one crawler burst day
    cannot move it), the robust sibling of zipf_card's OLS fit.

    Slopes are exact integers: for bucket pair (d1, c1) < (d2, c2),
    ``slope_ppm = (c2 − c1)·10⁶ div (d2 − d1)`` (integer div truncates
    toward zero in BOTH engines, verified for negative deltas) — counts
    per bucket-step in ppm. The median is the exact LOWER median: the
    slope at 1-indexed rank ``(n_pairs + 1) div 2`` in (slope, d1, d2)
    order — a pure multiset function, no interpolation, bit-identical
    across engines and partitionings.

    Scale shape: ONE map-side-combined count to (group, bucket) is the
    only data-sized work. The pair expansion is a within-group
    self-join on the bucket table — n_buckets² pairs per group, where
    n_buckets is CALENDAR-bounded (days in the observation window), not
    data-bounded: 365 days → ≤66k pairs per group, constant as event
    volume grows 1000×. The rank window partitions on the real group
    key. Groups with a single active bucket have no slope and do not
    emit (documented; count them upstream if needed)."""
    bucket = F.expr(
        f"CAST(floor(unix_timestamp({ts_col})) AS BIGINT) div {int(bucket_sec)}"
    )
    counts = (
        df.select(F.col(group_col).alias("__g"), bucket.alias("__d"))
        .groupBy("__g", "__d")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return theil_sen_from_counts(counts, group_col)


def theil_sen_from_counts(counts: DataFrame, group_col: str) -> DataFrame:
    """The Theil–Sen card over a (__g, __d, __c) bucket-count table —
    shared VERBATIM by the batch op above and the streaming maintainer
    (one slope/median recipe, no twin drift). Counts must already be
    collapsed to one row per (group, bucket)."""
    a, b = counts.alias("a"), counts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__g").eqNullSafe(F.col("b.__g")))
        & (F.col("a.__d") < F.col("b.__d")),
    ).select(
        F.col("a.__g").alias("__g"),
        F.col("a.__d").alias("__d1"),
        F.expr(
            "CAST((b.__c - a.__c) * CAST(1000000 AS BIGINT)"
            " div (b.__d - a.__d) AS BIGINT)"
        ).alias("__s"),
        F.col("b.__d").alias("__d2"),
    )
    w = Window.partitionBy("__g").orderBy("__s", "__d1", "__d2")
    wn = Window.partitionBy("__g")
    ranked = pairs.select(
        "__g",
        "__s",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    # null-safe bucket-count join: a NULL group is a real group — the
    # pair join is already eqNullSafe and both oracles join with
    # IS NOT DISTINCT FROM, so a USING join here would silently drop
    # the NULL group's card
    ndays = counts.groupBy(F.col("__g").alias("__g2")).agg(
        F.count(F.lit(1)).alias("n_buckets")
    )
    return (
        ranked.filter(F.col("__rn") == F.expr("CAST((__n + 1) div 2 AS BIGINT)"))
        .join(ndays, F.col("__g").eqNullSafe(F.col("__g2")))
        .select(
            F.col("__g").alias(group_col),
            "n_buckets",
            F.col("__n").alias("n_pairs"),
            F.col("__s").alias("slope_ppm_per_bucket"),
        )
    )

"""Sequence packing: map documents into fixed-capacity training context
windows ("concat-and-chunk"), the standard LLM pre-training layout.

The core primitive is an EXACT distributed prefix sum. A naive global
cumulative sum (an ``orderBy``-only window with no partition key) collapses
the whole table into one task — the classic single-partition window
scale bug. Here the sum is computed block-wise instead:

1. rows are grouped into blocks by ``order_col`` value range (pure
   map-side arithmetic, no shuffle beyond the window's own);
2. a windowed cumsum *within* each block (one shuffle on the block id,
   local sorts only — every block is bounded);
3. per-block totals are aggregated (map-side partial agg, n_blocks tiny
   rows) and exclusive-prefix-summed with a SECOND level of the same
   blocking: totals cumsum within super-blocks (windows bounded at
   ``block_size`` rows each), then the n_blocks/block_size super-block
   totals take the one global window — at 10^12 rows and the default
   block size that table is ~233 rows, constant for any realistic n.
   The offsets join back to the data on the block id.

Nothing ever reaches the driver — every stage is executor-side and the
only global window runs over the doubly-aggregated super-block table
(n / block_size² rows). Everything row-scale stays in whole-stage
codegen.

Reference parallel: dabstract's SplitAbstract/frame bookkeeping computes
per-example split offsets with ``np.cumsum`` on the driver
(/root/reference/dabstract/abstract/abstract.py:480-520); this is the
shuffle-safe distributed analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def block_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "cum",
    block_size: int = 65536,
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` in ``order_col`` order.

    Contract: ``order_col`` is an integral column with UNIQUE, non-NULL
    values (a doc id / ordinal). Ties would make "the" prefix sum
    ill-defined; uniqueness makes the result deterministic and
    oracle-checkable against ``SUM(...) OVER (ORDER BY order_col)``.
    """
    # window/bucket expressions via one-shot F.expr (r12 chatter cut:
    # identical trees, parsed once instead of built Column-op-by-op)
    extra_drop = []
    val_sql = f"`{value_col}`" if isinstance(value_col, str) else None
    if val_sql is None:
        df = df.withColumn("__vc", value_col)
        val_sql, extra_drop = "`__vc`", ["__vc"]
    with_blk = df.withColumn(
        "__blk", F.expr(f"floor(`{order_col}` / {block_size})")
    ).withColumn("__v", F.expr(f"cast({val_sql} as bigint)"))

    # per-block totals: map-side combine shrinks this to n_blocks rows
    # before the (tiny) shuffle — this table stays on executors.
    totals = with_blk.groupBy("__blk").agg(F.expr("sum(__v) AS __tot"))

    # exclusive prefix sum OVER THE TOTALS, same blocking one level up:
    # within-super-block window (bounded at block_size rows per task),
    # then a global window over the super-block totals — a table of
    # n_blocks/block_size rows, i.e. n/block_size² (~233 rows for 10^12
    # input rows): small by construction, not by assumption.
    totals = totals.withColumn("__sb", F.expr(f"floor(__blk / {block_size})"))
    totals = totals.withColumn(
        "__off_in",
        F.expr(
            "coalesce(sum(__tot) OVER (PARTITION BY __sb ORDER BY __blk "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        ),
    )
    sb_tot = totals.groupBy("__sb").agg(F.expr("sum(__tot) AS __sbt"))
    # constant partition key: same single-partition plan over the ~233-row
    # super-block table, but no spurious no-partition WindowExec warning
    sb_off = sb_tot.withColumn(
        "__off_sb",
        F.expr(
            "coalesce(sum(__sbt) OVER (PARTITION BY 0 ORDER BY __sb "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        ),
    ).select("__sb", "__off_sb")
    off_df = (
        totals.join(F.broadcast(sb_off), "__sb")
        .selectExpr("__blk", "(__off_in + __off_sb) AS __off")
    )

    # no broadcast hint on the offsets join: off_df is n/block_size rows
    # — usually broadcastable, but at extreme n AQE should be free to
    # pick a shuffle join on __blk (the data side is already exchanged
    # on __blk by the window above, so the exchange is reused).
    return (
        with_blk.withColumn(
            "__loc",
            F.expr(
                f"sum(__v) OVER (PARTITION BY __blk ORDER BY `{order_col}` "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            ),
        )
        .join(off_df, "__blk")
        .withColumn(out_col, F.expr("__loc + __off"))
        .drop("__blk", "__v", "__loc", "__off", *extra_drop)
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    token_col: str | Column,
    capacity: int,
    block_size: int = 65536,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid out in ``id_col``
    order into one virtual token stream, then cut into context windows
    of ``capacity`` tokens (documents may span a window boundary, as in
    standard LLM pre-training).

    Returns one row per document:
      id_col, n_tokens, start_offset (0-based position in the stream),
      first_chunk / last_chunk (window indices it lands in), n_chunks.

    Zero-token documents sit at a boundary without occupying space:
    first_chunk == last_chunk == the window of their start offset.
    """
    tok_sql = (
        f"`{token_col}`" if isinstance(token_col, str) else None
    )
    ncol = (
        df.withColumn("__n", F.expr(f"cast({tok_sql} as bigint)"))
        if tok_sql is not None
        else df.withColumn("__n", token_col.cast("bigint"))
    )
    cum = block_prefix_sum(
        ncol, id_col, "__n", out_col="__end", block_size=block_size
    )
    start = "(__end - __n)"
    last = (
        f"(CASE WHEN __n > 0 THEN floor((__end - 1) / {capacity}) "
        f"ELSE floor({start} / {capacity}) END)"
    )
    return (
        cum.withColumn("n_tokens", F.expr("__n"))
        .withColumn("start_offset", F.expr(start))
        .withColumn("first_chunk", F.expr(f"floor({start} / {capacity})"))
        .withColumn("last_chunk", F.expr(last))
        .withColumn("n_chunks", F.expr("last_chunk - first_chunk + 1"))
        .drop("__n", "__end")
    )


def chunk_manifest(packed: DataFrame, id_col: str, capacity: int) -> DataFrame:
    """Per-(chunk, document) segment table from ``sequence_pack`` output
    — the manifest a packed-pretraining loader needs to build
    block-diagonal attention masks / per-document loss masks: for every
    context window, which documents occupy it and at which
    within-window token range [seg_start, seg_end).

    Pure arithmetic + one bounded explode (a document yields exactly
    n_chunks rows — output-contract-sized, n_tokens/capacity + 1 at
    most). Zero-token documents keep their boundary row with an empty
    segment (seg_start == seg_end), mirroring sequence_pack's
    zero-width placement."""
    return (
        packed.withColumn(
            "chunk", F.expr("explode(sequence(first_chunk, last_chunk))")
        )
        .selectExpr(
            f"`{id_col}`",
            "chunk",
            f"cast(greatest(start_offset - chunk * {capacity}, 0) as int)"
            " AS seg_start",
            f"cast(least(start_offset + n_tokens, (chunk + 1) * {capacity})"
            f" - chunk * {capacity} as int) AS seg_end",
        )
    )


def span_corruption_manifest(
    df: DataFrame,
    id_col: str,
    ntok_col: str,
    noise_ppm: int = 150_000,
    mean_span: int = 3,
    seed: int = 0,
) -> DataFrame:
    """T5-style span-corruption manifest (Raffel et al. 2020: 15% noise
    density, mean span 3): for every document emit the deterministic
    token spans ``[start, end)`` a denoising loader would mask.

    Placement is STRATIFIED-deterministic: the doc's n_spans =
    max(1, n·noise div (mean_span·1e6)) strata each contribute one
    span of ``min(mean_span, n)`` tokens at an md5-derived offset inside
    the stratum — non-overlapping by construction (stratum length ≥
    span length whenever n ≥ n_spans·mean_span, which the span-count
    formula guarantees), reproducible by (seed, id, span_id) like every
    other sampler here, no RNG state.

    Pure expression over (id, token-count) — a sequence explode sized by
    the noise budget; the text itself is never touched, so at 100 TB
    the manifest costs one scan of the token-count column. Returns
    (id, span_id, start, end, n_tokens)."""
    from dabstract_spark.functions.hashing import md5_order

    n = F.col(ntok_col).cast("bigint")
    n_spans = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr(f"CAST({ntok_col} AS BIGINT) * {noise_ppm} div {mean_span * 1_000_000}"),
    )
    d = (
        df.select(F.col(id_col), n.alias("__n"), n_spans.alias("__k"))
        .filter(F.col("__n") > 0)
        .withColumn("span_id", F.explode(F.sequence(F.lit(0), (F.col("__k") - 1).cast("int"))))
    )
    # stratum [lo, hi): equal integer strata; span sits at an md5 offset
    lo = F.expr("(__n * span_id) div __k")
    hi = F.expr("(__n * (span_id + 1)) div __k")
    span = F.least(F.lit(mean_span).cast("bigint"), F.col("__n"))
    slack = F.greatest(hi - lo - span + 1, F.lit(1).cast("bigint"))
    u = F.conv(
        F.substring(
            md5_order(
                F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("span_id").cast("string")),
                seed,
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    start = lo + (u % slack)
    return d.select(
        id_col,
        "span_id",
        start.alias("start"),
        F.least(start + span, F.col("__n")).alias("end"),
        F.col("__n").alias("n_tokens"),
    )


def length_bucket_batches(
    df: DataFrame,
    id_col: str,
    token_col: str,
    batch_tokens: int = 4096,
    seed: int = 0,
) -> DataFrame:
    """Length-bucketed dynamic batching (the padding-efficient loader
    layout: group similar-length sequences so a batch's padded cost
    ``n_rows·max_len`` stays near its real token count): documents land
    in power-of-2 length buckets (``cap = 2^ceil(log2(len))``, min 1 —
    derived with INTEGER bit arithmetic, ``1 << bitlength(len-1)``,
    because float ``log2`` returns 29.000000000000004 for 2^29 on
    engines that compute it as ln/ln2, doubling an exact power-of-2
    length's cap), and each bucket is cut into batches of
    ``batch_tokens div cap``
    docs in a seed-reproducible md5 order. Returns
    (id, n_tokens, bucket_cap, batch_id, slot) — ``slot`` is the
    document's position inside its batch, so the manifest fully
    determines the loader's layout.

    Scale shape: the within-bucket index comes from
    ``curriculum_order``'s composite (bucket, 256-way md5-prefix)
    bucketing minus a broadcast per-bucket min(pos) — the
    ``materialize_mixture`` recipe, so one dominant length bucket (most
    web text is short) never lands in a single task's sort; batch/slot
    are pure arithmetic on the index. Docs longer than ``batch_tokens``
    still get cap-sized singleton batches (``div`` clamps to ≥ 1).
    A NULL token count rides in the cap-1 bucket (greatest(NULL, 1) is
    1 — Spark's greatest ignores NULLs): unknown-length docs stay in
    the manifest deterministically instead of vanishing; oracles carry
    the matching ``nt IS NULL OR nt <= 1`` leg."""
    from dabstract_spark.operators.select import curriculum_order

    # 2^ceil(log2(n)) == 1 << bitlength(n-1): exact bigint for every n
    # up to 2^62, no float log anywhere
    n_sql = f"greatest(CAST({token_col} AS BIGINT), CAST(1 AS BIGINT))"
    capped = df.withColumn(
        "__cap",
        F.expr(
            f"CASE WHEN {n_sql} <= 1 THEN CAST(1 AS BIGINT)"
            f" ELSE shiftleft(CAST(1 AS BIGINT),"
            f" CAST(length(bin({n_sql} - 1)) AS INT)) END"
        ),
    )
    pos = curriculum_order(capped, "__cap", id_col, seed=seed)
    offs = pos.groupBy("__cap").agg(F.min("pos").alias("__o"))
    per = F.greatest(F.expr(f"CAST({int(batch_tokens)} AS BIGINT) div __cap"), F.lit(1))
    return (
        pos.join(F.broadcast(offs), "__cap")
        .withColumn("__idx", F.col("pos") - F.col("__o"))
        .select(
            id_col,
            F.col(token_col).cast("bigint").alias("n_tokens"),
            F.col("__cap").alias("bucket_cap"),
            F.expr(
                f"CAST(__idx div greatest(CAST({int(batch_tokens)} AS BIGINT)"
                " div __cap, 1) AS BIGINT)"
            ).alias("batch_id"),
            (F.col("__idx") % per).cast("int").alias("slot"),
        )
    )

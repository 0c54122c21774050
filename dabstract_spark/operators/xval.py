"""Cross-validation fold assignment (reference: /root/reference/dabstract/dataset/xval.py).

Each builder returns an assignment DataFrame ``(key_cols..., fold INT)``
— the long-format replacement for the reference's nested boolean masks
(dataset.py:1051-1059). Sets (train/val/test) are derived lazily in
``xval_sets``/``Dataset.get_xval_set`` so the assignment never blows up
k-fold-times.

Determinism: the reference uses unseeded numpy / seed-0 sklearn shuffles
(xval.py:69-73,90,118) — not reproducible across engines. Here all
"random" order derives from ``md5(seed || key)`` (functions/hashing.py),
which is uniform, seedable, identical in Spark/DuckDB/Python, and cheap
JVM-side. Documented divergence: fold *membership* differs from sklearn's,
set-level properties (balanced sizes, stratification, group integrity,
disjointness) are preserved and tested.

Scale: balanced folds need a global rank over the pseudo-random order.
A bare ``row_number() OVER (ORDER BY ...)`` is a single-task stage, so
``_balanced_fold`` ranks distributively (range-partition by the md5 key,
two-pass offset — same scheme as core.with_row_id). Group/stratified
variants rank within partitions of the group/label key — naturally
parallel windows, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dabstract_spark import core
from dabstract_spark.functions.hashing import md5_order, md5_unit


def _balanced_fold(df: DataFrame, key: str, folds: int, seed: int) -> DataFrame:
    """fold = global_rank(md5_order(key)) % folds — exact equal-size folds
    (±1), computed with the distributed two-pass rank."""
    # alias the key so it can't collide with the rank column's name
    tmp = df.select(F.col(key).alias("__key")).withColumn("__ord", md5_order("__key", seed))
    ranked = core.with_row_id(tmp, order_by="__ord")
    return ranked.select(
        F.col("__key").alias(key), (F.col(core.ROW_ID) % folds).cast("int").alias("fold")
    )


def random_kfold(df: DataFrame, folds: int, key: str, seed: int = 0) -> DataFrame:
    """Pseudo-random balanced k-fold (reference xval.py:114-139)."""
    return _balanced_fold(df, key, folds, seed)


def stratified_kfold(
    df: DataFrame, folds: int, key: str, label: str, seed: int = 0
) -> DataFrame:
    """Balanced folds within every label (reference xval.py:83-111).
    Window partitioned by label — parallel across labels."""
    w = Window.partitionBy(label).orderBy(md5_order(key, seed))
    return df.select(
        key, label, ((F.row_number().over(w) - 1) % folds).cast("int").alias("fold")
    ).select(key, "fold")


def group_random_kfold(
    df: DataFrame, folds: int, key: str, group: str, seed: int = 0
) -> DataFrame:
    """K-fold over distinct groups, expanded to member rows — group
    integrity preserved (reference xval.py:27-43). The distinct-group
    table is small: broadcast-joined back. NULL groups get no fold (they
    cannot survive the equi-join back anyway, and md5(NULL) would order
    NULLS FIRST in Spark but LAST in SQL engines, shifting every other
    group's fold)."""
    groups = df.select(group).filter(F.col(group).isNotNull()).distinct()
    # constant partition key over the small distinct-group table: same
    # single-partition plan, no spurious no-partition WindowExec warning
    w = Window.partitionBy(F.lit(0)).orderBy(md5_order(group, seed))
    gfold = groups.withColumn(
        "fold", ((F.row_number().over(w) - 1) % folds).cast("int")
    )
    return df.select(key, group).join(F.broadcast(gfold), group).select(key, "fold")


def sequential_kfold(
    df: DataFrame, folds: int, key: str, group: str, seed: int = 0
) -> DataFrame:
    """Per-group contiguous chunks (reference xval.py:46-80): ntile over
    the ordinal order within each group — same chunk sizes as
    np.array_split. Parallel across groups.

    Scale bound — one window partition per group, so the largest task
    sorts the hottest group's rows (the same contract-level bound as
    ``get_unique(return_idx=True)``): groups are recording sessions /
    source files by contract (moderate cardinality, bounded rows per
    group), not an open-ended skew key. ntile cannot be rank-filtered
    the way the two-level ``sample_per_group`` buckets can (fold
    boundaries depend on the exact group count AND every row gets a
    fold — no WindowGroupLimit pruning applies), so a caller with a
    dominant group should pre-split it or use ``random_kfold``; the
    ``key_skew_profile`` operator (operators/skew.py) is the
    preflight for exactly this."""
    w = Window.partitionBy(group).orderBy(key)
    return df.select(
        key, group, (F.ntile(folds).over(w) - 1).cast("int").alias("fold")
    ).select(key, "fold")


def xval_from_item(df: DataFrame, key: str, item: str, seed: int = 0) -> DataFrame:
    """One fold per distinct value of a predefined split column
    (reference xval.py:12-24). A NULL item carries no split value: the
    row keeps a NULL fold (dictionary-encode convention — NULL is never
    a fold, and its sort position differs across engines)."""
    dic = (
        df.select(item)
        .filter(F.col(item).isNotNull())
        .distinct()
        .withColumn(
            "fold",
            (
                F.dense_rank().over(Window.partitionBy(F.lit(0)).orderBy(item)) - 1
            ).cast("int"),
        )
    )
    return (
        df.select(key, item)
        .join(F.broadcast(dic), item, "left")
        .select(key, "fold")
    )


def random_split(
    df: DataFrame, key: str, val_frac: float = 0.0, test_frac: float = 0.0, seed: int = 0
) -> DataFrame:
    """Single pseudo-random 3-way split (reference xval.py:142-161):
    thresholds on the md5-uniform — no shuffle, no count, scales freely."""
    u = md5_unit(key, seed)
    set_col = (
        F.when(u < test_frac, F.lit("test"))
        .when(u < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.select(key, set_col.alias("set_name"))


def xval_sets(
    df: DataFrame,
    assignment: DataFrame,
    key: str,
    fold: int,
    set_name: str,
    val_frac: float = 0.0,
    seed: int = 0,
    test_only_col: str | None = "test_only",
) -> DataFrame:
    """Materialize one (set, fold) view: test = rows with fold==f (plus all
    test_only rows, reference dataset.py:1044-1045); val = val_frac carve
    from the remaining rows (deterministic per-fold hash); train = rest.

    Two assignment contracts are accepted:
    - ``(key, fold INT)`` — k-fold builders; sets derived per (set, fold);
    - ``(key, set_name STRING)`` — direct 3-way split (random_split);
      ``fold``/``val_frac`` are ignored, membership is the assignment's.
    """
    has_to = test_only_col and test_only_col in df.columns
    to = F.col(test_only_col) == 1 if has_to else F.lit(False)

    if "fold" not in assignment.columns and "set_name" in assignment.columns:
        joined = df.join(assignment.select(key, "set_name"), key, "left")
        if set_name == "test":
            pred = (F.col("set_name") == "test") | to
        elif set_name in ("val", "train"):
            pred = (F.col("set_name") == set_name) & ~to
        else:
            raise ValueError(f"unknown set '{set_name}'")
        return joined.filter(pred).drop("set_name")

    if "fold" not in assignment.columns:
        raise ValueError(
            f"xval assignment must have a 'fold' or 'set_name' column, got {assignment.columns}"
        )
    joined = df.join(assignment.select(key, "fold"), key, "left")
    in_test = (F.col("fold") == fold) | to
    u = md5_unit(key, seed * 7919 + fold)
    if set_name == "test":
        pred = in_test
    elif set_name == "val":
        pred = ~in_test & (u < val_frac)
    elif set_name == "train":
        pred = ~in_test & (u >= val_frac)
    else:
        raise ValueError(f"unknown set '{set_name}'")
    return joined.filter(pred).drop("fold")


_REGISTRY = {
    "random_kfold": random_kfold,
    "stratified_kfold": stratified_kfold,
    "group_random_kfold": group_random_kfold,
    "sequential_kfold": sequential_kfold,
    "xval_from_item": xval_from_item,
    "random_split": random_split,
}


def resolve(name: str):
    if name in _REGISTRY:
        return _REGISTRY[name]
    from dabstract_spark.custom import resolve_custom

    hit = resolve_custom("xval", name)
    if hit is not None:
        return hit
    raise KeyError(f"unknown xval fn '{name}'; have {sorted(_REGISTRY)}")

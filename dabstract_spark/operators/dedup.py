"""Deduplication operators for training-data pipelines (SURVEY §7-M6).

Four families, each with a distinct scale profile:

- **exact**: hash-groupBy on normalized content. One shuffle on the
  content hash; survivor = min id per group (deterministic).
- **MinHash + LSH**: per-row signatures are pure array HOFs (zero
  shuffle); banding buckets candidates so the self-join only compares
  rows sharing a band — the classic sub-quadratic near-dup path for
  100 TB corpora (Broder '97; as used by MMLU-scale dedup pipelines).
- **SimHash**: per-row bit-majority fingerprint (pure expressions);
  near-dups = equal fingerprints (or small Hamming distance via band
  splits of the bits).
- **n-gram Jaccard**: exact pairwise verification — quadratic in the
  candidate set, so at scale it runs AFTER LSH candidate generation;
  standalone it prefilters by shared shingles (inverted-index join).

All hashes are md5-derived → identical in DuckDB, so every family is
oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from dabstract_spark.operators.text import tokens, word_shingles


def normalize_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id row per exact (normalized) content group."""
    h = F.md5(normalize_text(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def minhash_signature(col: Column | str, n_hashes: int = 16, k: int = 3) -> Column:
    """Array of n_hashes MinHash values (md5-hex min per seeded hash
    family) over word k-shingles — a pure HOF expression, no shuffle,
    no UDF. Empty-shingle rows get NULL signature."""
    sh = word_shingles(col, k)

    # closure factory: a 2-param lambda would get (element, index) semantics
    def seeded(i):
        return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))

    sig = F.array(*[F.array_min(F.transform(sh, seeded(i))) for i in range(n_hashes)])
    return F.when(F.size(sh) > 0, sig)


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """(id, band_id, band_hash): LSH banding of the MinHash signature —
    rows agreeing on any full band are candidate near-duplicates."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(text_col, n_hashes, k)
    out = df.select(F.col(id_col), sig.alias("__sig")).filter(F.col("__sig").isNotNull())
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.array_join(
                    F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band), ","
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return (
        out.withColumn("__band", F.explode(F.array(*band_cols)))
        .select(id_col, F.col("__band.band_id"), F.col("__band.band_hash"))
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH band.
    The join shuffles on band_hash — collisions, not the full corpus."""
    b = minhash_bands(df, id_col, text_col, n_hashes, bands, k)
    left = b.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    right = b.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(col: Column | str, bits: int = 16) -> Column:
    """SimHash fingerprint: per-bit majority vote of token-hash bits
    (bit b = parity of hex nibble b of md5(token)). Pure expressions."""
    t = tokens(col)
    n = F.size(t)

    def bit_set(b):
        return lambda x: F.conv(F.substring(F.md5(x), b + 1, 1), 16, 10).cast("int") % 2 == 1

    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        ones = F.size(F.filter(t, bit_set(b)))
        bit = (ones * 2 > n).cast("bigint")  # majority of tokens set this bit
        acc = acc + bit * F.lit(2**b).cast("bigint")
    return F.when(n > 0, acc)


def simhash_dedup(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Keep min-id row per identical simhash (near-dup at nibble-level)."""
    out = df.withColumn("__sh", simhash(text_col, bits))
    w = Window.partitionBy("__sh").orderBy(F.col(id_col))
    return out.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn", "__sh")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle
    (inverted-index self-join — never the full cross product).
    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold."""
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(word_shingles(text_col, k))).alias("sh"))
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

"""Source / materialization query catalog entries (SURVEY §2.1) with
DuckDB oracles.

The folder-scan oracles run DuckDB's read_blob/glob over the committed
fixture tree at tests/fixtures/audiodb — a genuinely independent listing
of the same directory the Spark binaryFile source scans. Content-level
decode checks live in tests/test_sources.py (DuckDB's blob→varchar cast
escapes bytes, so content hashes can't cross engines).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from dabstract_spark.processing import ProcessingChain
from dabstract_spark.queries import _t, query
from dabstract_spark.session import scratch_dir
from dabstract_spark.sources import attach_csv_metadata, folder_dataset, get_dir_info

# fixture paths derive from the package location so the catalog (and the
# oracle SQL strings they are interpolated into) work from any checkout
_FIXTURES = str(Path(__file__).resolve().parent.parent / "tests" / "fixtures")
FIXTURE_DIR = f"{_FIXTURES}/audiodb"
FIXTURE_CSV = f"{FIXTURE_DIR}/meta/labels.csv"


# --------------------------------------------------------------------- #
# prepare_feat (§2.1 sink + re-source): materialized == directly-computed
# --------------------------------------------------------------------- #
@query(
    "q69_prepare_feat_roundtrip",
    # scalar (vec_id, pos, feat) rows — the driver canonicalizer can't
    # sort array cells, so the materialized column is posexploded
    oracle="""
    SELECT vec_id, CAST(j - 1 AS INT) AS pos,
           round(embedding[j]::DOUBLE / 32767.0, 6) + 0.0 AS feat
    FROM embeddings, UNNEST(generate_series(1, 64)) AS t(j)
    """,
)
def q69_prepare_feat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.dataset import Dataset

    emb = _t(spark, sf_dir, "embeddings")
    ds = Dataset(emb.withColumn("row_id", F.col("vec_id").cast("bigint")), name="emb_feat")
    chain = ProcessingChain().add("Scaler", {"type": "int16"})
    # overwrite=True: the roundtrip must prove THIS run's write+re-read
    ds = ds.prepare_feat("embedding", "scaled_v1", chain, new_key="feat", overwrite=True)
    return ds.full_df.select(
        "vec_id", F.posexplode("feat").alias("pos", "feat")
    ).select("vec_id", "pos", (F.round("feat", 6) + F.lit(0.0)).alias("feat"))


# --------------------------------------------------------------------- #
# Folder/binary scan source (§2.1 get_dir_info): filepath/filename/
# example/subdb derivation + ordinal row_id vs an independent DuckDB glob
# --------------------------------------------------------------------- #
@query(
    "q70_folder_scan",
    oracle=f"""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY filename) - 1 AS BIGINT) AS row_id,
           regexp_extract(filename, '([^/]+)$', 1) AS fname,
           regexp_extract(filename, '([^/]+)/[^/]+$', 1) AS subdb,
           regexp_replace(regexp_extract(filename, '([^/]+)$', 1), '\\.wav$', '') AS example,
           size AS n_bytes
    FROM read_blob('{FIXTURE_DIR}/*/*.wav')
    """,
)
def q70_folder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    info = get_dir_info(spark, FIXTURE_DIR, extension=".wav")
    return info.select(
        "row_id",
        F.col("filename").alias("fname"),
        "subdb",
        "example",
        "n_bytes",
    )


# --------------------------------------------------------------------- #
# Connector (§2.1 dbs/*): folder scan + CSV metadata alignment join
# --------------------------------------------------------------------- #
@query(
    "q71_csv_connector",
    oracle=f"""
    SELECT regexp_extract(b.filename, '([^/]+)/[^/]+$', 1) AS subdb,
           regexp_extract(b.filename, '([^/]+)$', 1) AS fname,
           m.anomaly
    FROM read_blob('{FIXTURE_DIR}/*/*.wav') b
    LEFT JOIN read_csv_auto('{FIXTURE_CSV}') m
      ON m.filepath = regexp_extract(b.filename, '([^/]+/[^/]+)$', 1)
    """,
)
def q71_csv_connector(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = folder_dataset(spark, FIXTURE_DIR, extension=".wav").reset_active_keys()
    ds = ds.add("relpath", F.concat_ws("/", F.col("subdb"), F.col("filename")))
    ds = attach_csv_metadata(ds, FIXTURE_CSV, on=("relpath", "filepath"))
    return ds.full_df.select("subdb", F.col("filename").alias("fname"), "anomaly")


# --------------------------------------------------------------------- #
# Named connector class (§2.1 dbs/*, reference DCASE2020Task1A.py:42-80):
# the full worked example — registry name -> folder scan + CSV label
# join + dense label codes + group ids, driven from a config dict
# --------------------------------------------------------------------- #
@query(
    "q98_named_connector",
    oracle=f"""
    WITH scan AS (
      SELECT regexp_extract(filename, '([^/]+)/[^/]+$', 1) AS subdb,
             regexp_extract(filename, '([^/]+)$', 1) AS fname,
             regexp_extract(filename, '([^/]+/[^/]+)$', 1) AS relpath
      FROM read_blob('{FIXTURE_DIR}/*/*.wav')),
    labeled AS (
      SELECT s.subdb, s.fname, m.anomaly
      FROM scan s LEFT JOIN read_csv_auto('{FIXTURE_CSV}') m ON m.filepath = s.relpath),
    codes AS (
      SELECT v, CAST(DENSE_RANK() OVER (ORDER BY v) - 1 AS INT) AS scene_id
      FROM (SELECT DISTINCT subdb AS v FROM labeled))
    SELECT l.subdb, l.fname, l.anomaly, c.scene_id, c.scene_id AS grp
    FROM labeled l JOIN codes c ON c.v = l.subdb
    """,
)
def q98_named_connector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.config import dataset_from_config

    cfg = {
        "datasets": [
            {
                "name": "AnomalyAudioDB",
                "parameters": {"paths": {"data": FIXTURE_DIR, "meta": FIXTURE_CSV}},
            }
        ]
    }
    ds = dataset_from_config(spark, cfg)
    return ds.full_df.select(
        "subdb",
        F.col("filename").alias("fname"),
        "anomaly",
        "scene_id",
        F.col("group").alias("grp"),
    )


# --------------------------------------------------------------------- #
# WAV decode verified at the SAMPLE level (§2.1 WavDatareader): Spark
# decodes PCM through the real reader UDF; DuckDB independently parses
# the same bytes — little-endian header fields and signed 16-bit
# samples — straight from read_blob hex. The int16 sum is exact in both
# engines (decode normalizes by 32768, so sample*32768 is the original
# integer), making the audio decode path itself driver-oracle-checked,
# not just unit-tested.
# --------------------------------------------------------------------- #
@query(
    "q122_wav_decode",
    oracle=f"""
    WITH f AS (
      SELECT filename AS fpath,
             regexp_extract(filename, '([^/]+)/[^/]+$', 1) AS subdb,
             regexp_extract(filename, '([^/]+)$', 1) AS fname,
             size, hex(content) AS hx
      FROM read_blob('{FIXTURE_DIR}/*/*.wav')),
    hdr AS (
      SELECT fpath, subdb, fname, size, hx,
             CAST(('0x' || substr(hx, 2*24+1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substr(hx, 2*25+1, 2)) AS BIGINT)
             + 65536 * CAST(('0x' || substr(hx, 2*26+1, 2)) AS BIGINT)
             + 16777216 * CAST(('0x' || substr(hx, 2*27+1, 2)) AS BIGINT) AS fs,
             (size - 44) // 2 AS n_samples
      FROM f),
    samp AS (
      SELECT fpath,
             CAST(('0x' || substr(hx, 2*(44 + 2*i) + 1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substr(hx, 2*(45 + 2*i) + 1, 2)) AS BIGINT) AS v
      FROM hdr, UNNEST(generate_series(0, CAST(n_samples AS INT) - 1)) AS t(i))
    SELECT h.subdb, h.fname, CAST(h.fs AS INT) AS fs,
           CAST(h.n_samples AS BIGINT) AS n_samples,
           CAST(SUM(CASE WHEN s.v >= 32768 THEN s.v - 65536 ELSE s.v END) AS BIGINT)
             AS pcm_sum
    FROM hdr h JOIN samp s USING (fpath)
    GROUP BY h.subdb, h.fname, h.fs, h.n_samples
    """,
)
def q122_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import decode_wav, wav_info

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .option("recursiveFileLookup", "true")
        .load(FIXTURE_DIR)
    )
    decoded = files.select(
        F.element_at(F.split("path", "/"), -2).alias("subdb"),
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        wav_info("content").alias("__info"),
        decode_wav("content").alias("__samples"),
    )
    return decoded.select(
        "subdb",
        "fname",
        F.col("__info.fs").alias("fs"),
        F.col("__info.n_samples").alias("n_samples"),
        F.aggregate(
            F.transform(F.col("__samples"), lambda x: (x * 32768).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("pcm_sum"),
    )


# --------------------------------------------------------------------- #
# Multimodal metadata extraction, JVM-only (§2.1 image columns): PNG
# header fields (IHDR fixed offsets, big-endian) parsed with
# substring/hex/conv expressions — no pixel decode, no Python stage.
# DuckDB independently parses the same bytes from read_blob hex.
# --------------------------------------------------------------------- #
IMAGE_FIXTURE_DIR = f"{_FIXTURES}/imagedb"


@query(
    "q124_image_metadata",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
           'png' AS format,
           CAST(CAST(('0x' || substr(hex(content), 2*16+1, 8)) AS BIGINT) AS INT) AS width,
           CAST(CAST(('0x' || substr(hex(content), 2*20+1, 8)) AS BIGINT) AS INT) AS height,
           CAST(CAST(('0x' || substr(hex(content), 2*24+1, 2)) AS BIGINT) AS INT) AS bit_depth,
           CAST(CAST(('0x' || substr(hex(content), 2*25+1, 2)) AS BIGINT) AS INT) AS color_type,
           size AS n_bytes
    FROM read_blob('{IMAGE_FIXTURE_DIR}/*.png')
    WHERE substr(hex(content), 1, 16) = '89504E470D0A1A0A'
    """,
)
def q124_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import image_metadata

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(IMAGE_FIXTURE_DIR)
    )
    meta = files.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        image_metadata("content").alias("__m"),
        F.col("length").alias("n_bytes"),
    )
    return meta.filter(F.col("__m").isNotNull()).select(
        "fname",
        F.col("__m.format").alias("format"),
        F.col("__m.width").alias("width"),
        F.col("__m.height").alias("height"),
        F.col("__m.bit_depth").alias("bit_depth"),
        F.col("__m.color_type").alias("color_type"),
        "n_bytes",
    )


# --------------------------------------------------------------------- #
# NPY decode verified at the value level (§2.1 NumpyDatareader): same
# treatment as q122 — Spark decodes through np.load in the reader UDF;
# DuckDB parses the npy container independently (magic + LE header
# length at bytes 8-9 -> data offset, then signed LE int16 values).
# --------------------------------------------------------------------- #
NPY_FIXTURE_DIR = f"{_FIXTURES}/npydb"


@query(
    "q125_npy_decode",
    oracle=f"""
    WITH f AS (
      SELECT filename AS fpath,
             regexp_extract(filename, '([^/]+)$', 1) AS fname,
             size, hex(content) AS hx,
             10 + CAST(('0x' || substr(hex(content), 2*8+1, 2)) AS BIGINT)
                + 256 * CAST(('0x' || substr(hex(content), 2*9+1, 2)) AS BIGINT) AS off
      FROM read_blob('{NPY_FIXTURE_DIR}/*.npy')),
    hdr AS (SELECT fpath, fname, hx, off, (size - off) // 2 AS n_samples FROM f),
    samp AS (
      SELECT fpath,
             CAST(('0x' || substr(hx, 2*(off + 2*i) + 1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substr(hx, 2*(off + 1 + 2*i) + 1, 2)) AS BIGINT) AS v
      FROM hdr, UNNEST(generate_series(0, CAST(n_samples AS INT) - 1)) AS t(i))
    SELECT h.fname, CAST(h.n_samples AS BIGINT) AS n_samples,
           CAST(SUM(CASE WHEN s.v >= 32768 THEN s.v - 65536 ELSE s.v END) AS BIGINT)
             AS val_sum
    FROM hdr h JOIN samp s USING (fpath)
    GROUP BY h.fname, h.n_samples
    """,
)
def q125_npy_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import decode_npy

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.npy")
        .load(NPY_FIXTURE_DIR)
    )
    decoded = files.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        decode_npy("content").alias("__v"),
    )
    return decoded.select(
        "fname",
        F.size("__v").cast("bigint").alias("n_samples"),
        F.aggregate(
            F.transform(F.col("__v"), lambda x: x.cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("val_sum"),
    )


# --------------------------------------------------------------------- #
# spark.sql surface (§2.9/§2.7): the engine's tables registered as temp
# views and queried with SQL TEXT — proving the declarative surface end
# to end (same SQL answered by both engines; Catalyst plans it like the
# DataFrame form). Top supplier per nation by lineitem revenue.
# --------------------------------------------------------------------- #
_TOP_SUPPLIER_SQL = """
SELECT n_name, s_name, revenue FROM (
  SELECT n.n_name, s.s_name,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         ROW_NUMBER() OVER (
           PARTITION BY n.n_name
           ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) DESC,
                    s.s_name) AS rn
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, s.s_name) ranked
WHERE rn = 1
"""


@query("q126_sql_interface", oracle=_TOP_SUPPLIER_SQL)
def q126_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.session import register_views

    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(_TOP_SUPPLIER_SQL)


# --------------------------------------------------------------------- #
# JSONL source with declared schema + drift tolerance (sources.read_jsonl
# over the committed tests/fixtures/jsonl fixture): missing fields ->
# NULL, undeclared extra fields ignored — both engines read the SAME
# file through their native newline-JSON readers.
# --------------------------------------------------------------------- #
JSONL_FIXTURE = f"{_FIXTURES}/jsonl/docs.jsonl"


@query(
    "q140_jsonl_source",
    oracle=f"""
    SELECT id, name, score, CAST(coalesce(len(tags), 0) AS INT) AS n_tags,
           tags[1] AS first_tag
    FROM read_json('{JSONL_FIXTURE}',
      format='newline_delimited',
      columns={{'id':'BIGINT','name':'VARCHAR','score':'DOUBLE','tags':'VARCHAR[]'}})
    """,
)
def q140_jsonl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources import read_jsonl

    df = read_jsonl(
        spark, JSONL_FIXTURE, "id bigint, name string, score double, tags array<string>"
    )
    return df.select(
        "id",
        "name",
        "score",
        F.coalesce(F.size("tags"), F.lit(0)).alias("n_tags"),
        F.element_at("tags", 1).alias("first_tag"),
    )


# --------------------------------------------------------------------- #
# Streaming incremental dedup (streaming/ops.incremental_dedup_stream):
# a two-file "new crawl" drains through maxFilesPerTrigger=1 so the
# cross-micro-batch dropDuplicates state is actually exercised — file 1
# carries the fresh docs, file 2 repeats every one of them plus exact
# corpus duplicates; only the first-arrival fresh digests survive.
# Output is the digest SET (arrival-order independent).
# --------------------------------------------------------------------- #
@query(
    "q162_stream_incremental_dedup",
    oracle="""
    WITH new_batch AS (
      SELECT text FROM documents
      UNION ALL
      SELECT text || ' uniq' || CAST(doc_id AS VARCHAR) AS text FROM documents),
    seen AS (
      SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
      FROM documents)
    SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_md5
    FROM new_batch
    -- NOT EXISTS, never NOT IN: a NULL digest in `seen` (NULL-text doc)
    -- makes NOT IN never-true and collapses the result to 0 rows,
    -- while the engine's anti-join/dropDuplicates keeps NULL-key rows
    -- (equality with NULL never matches) — the hostile-fixture catch
    WHERE NOT EXISTS (
      SELECT 1 FROM seen
      WHERE seen.h = md5(regexp_replace(trim(lower(new_batch.text)), '\\s+', ' ', 'g')))
    """,
)
def q162_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dabstract_spark.streaming.ops import incremental_dedup_stream

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    fresh = docs.select(
        F.concat(F.col("text"), F.lit(" uniq"), F.col("doc_id").cast("string")).alias("text")
    )
    dup = docs.select("text")
    tmp = scratch_dir("sparkdab_incdedup_")
    # file 1: fresh only; file 2: fresh AGAIN + corpus duplicates
    fresh.coalesce(1).write.parquet(f"{tmp}/in/f1")
    fresh.unionByName(dup).coalesce(1).write.parquet(f"{tmp}/in/f2")
    schema = "text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/*")
    )
    return incremental_dedup_stream(
        stream, docs, "text", f"{tmp}/out", f"{tmp}/ckpt"
    ).select("content_md5")


# --------------------------------------------------------------------- #
# Partition-pruned materialization (§2.1 sinks at scale): events written
# partitioned by day (the fixture spans one month → ~30 directories),
# read back with a single-day predicate — the scan must touch ONE
# directory (PartitionFilters, verified in tests/test_sources.py),
# which is the layout that turns a 100 TB history into a one-partition
# read.
# --------------------------------------------------------------------- #
@query(
    "q163_partitioned_events",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY event_type
    """,
)
def q163_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    events = _t(spark, sf_dir, "events")
    tmp = scratch_dir("sparkdab_part_")
    (
        events.withColumn("event_day", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("event_day")
        .parquet(f"{tmp}/events")
    )
    back = spark.read.parquet(f"{tmp}/events").filter(F.col("event_day") == "2024-01-15")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )


# --------------------------------------------------------------------- #
# Deterministic training-shard export (§2.1 sinks): md5-bucketed shard
# assignment -> partitioned parquet write -> read-back audit. The shard
# function is pure (md5 of the id), so re-exports are reproducible and
# shards are statistically balanced; the audit aggregates per shard.
# --------------------------------------------------------------------- #
@query(
    "q172_export_shards",
    oracle="""
    SELECT CAST(CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 8 AS INT) AS shard,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS sum_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY shard
    """,
)
def q172_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dabstract_spark.functions.hashing import md5_bucket

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    tmp = scratch_dir("sparkdab_shards_")
    sharded = docs.withColumn("shard", md5_bucket("doc_id", 8, seed=7))
    sharded.write.partitionBy("shard").parquet(f"{tmp}/out")
    back = spark.read.parquet(f"{tmp}/out")
    return back.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


# --------------------------------------------------------------------- #
# ANALYZE-style table statistics in ONE scan (§2.4): per-column
# null count / exact NDV / min / max — the CBO inputs a catalog keeps.
# COUNT(DISTINCT x), COUNT(DISTINCT y) in one aggregate exercises
# Spark's multi-distinct Expand rewrite.
# --------------------------------------------------------------------- #
@query(
    "q173_table_stats",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS ndv_custkey,
           COUNT(DISTINCT o_orderpriority) AS ndv_priority,
           SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nulls_totalprice,
           MIN(o_totalprice) AS min_totalprice, MAX(o_totalprice) AS max_totalprice,
           MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
    FROM orders
    """,
)
def q173_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("ndv_custkey"),
        F.countDistinct("o_orderpriority").alias("ndv_priority"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("nulls_totalprice"),
        F.min("o_totalprice").alias("min_totalprice"),
        F.max("o_totalprice").alias("max_totalprice"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


# --------------------------------------------------------------------- #
# END-TO-END audio feature pipeline (the reference's flagship use case,
# dataset.py:703-928 + processors.py:93-611 composed): raw WAV bytes →
# PCM decode → overlapping hamming frames → rFFT magnitude → mel
# filterbank → natural log, every stage the real operator. The oracle
# replays the ENTIRE chain independently in SQL: hex PCM parse, framed
# windowing, O(n²) DFT per frame, the same literal mel weights
# (ascending-bin left-associated sums, eps floor), then ln — so a
# cross-engine hash match certifies the full feature-extraction path,
# not any single stage.
# --------------------------------------------------------------------- #
_AP_FLEN, _AP_STEP, _AP_FS, _AP_BANDS = 32, 16, 800.0, 6


def _ap_fbank_sql(spec: str) -> str:
    """Literal mel band sums over a DFT-magnitude list column, mirroring
    Filterbank's unrolled JVM path (same nonzeros, same fold order)."""
    import numpy as np

    from dabstract_spark.processing.processors import mel_filterbank

    fb = mel_filterbank(_AP_BANDS, _AP_FLEN, _AP_FS, 0.0, None, "mel", None).T
    eps = repr(float(np.finfo(float).eps))
    bands = []
    for b in range(fb.shape[1]):
        terms = [
            f"({float(fb[j, b])!r}) * ({spec}[{j + 1}])"
            for j in range(fb.shape[0])
            if fb[j, b] != 0.0
        ]
        s = " + ".join(["0.0"] + terms)
        bands.append(f"CASE WHEN ({s}) = 0.0 THEN {eps} ELSE ({s}) END")
    return "[" + ", ".join(bands) + "]"


@query(
    "q175_audio_pipeline",
    oracle=f"""
    WITH f AS (
      SELECT filename AS fpath,
             regexp_extract(filename, '([^/]+)/[^/]+$', 1) AS subdb,
             regexp_extract(filename, '([^/]+)$', 1) AS fname,
             size, hex(content) AS hx
      FROM read_blob('{FIXTURE_DIR}/*/*.wav')),
    samp AS (
      SELECT fpath, subdb, fname, i,
             CAST(('0x' || substr(hx, 2*(44 + 2*i) + 1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substr(hx, 2*(45 + 2*i) + 1, 2)) AS BIGINT) AS v
      FROM f, UNNEST(generate_series(0, CAST((size - 44) // 2 AS INT) - 1)) AS t(i)),
    sig AS (
      SELECT subdb, fname,
             list((CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) / 32768.0
                  ORDER BY i) AS s
      FROM samp GROUP BY subdb, fname),
    fr AS (
      SELECT subdb, fname, fr,
             list_transform(generate_series(1, {_AP_FLEN}),
               k -> s[fr * {_AP_STEP} + k]
                    * (0.54 - 0.46 * cos(2 * pi() * (k - 1) / {_AP_FLEN}))) AS w
      FROM sig,
           UNNEST(generate_series(0,
             CAST((len(s) - {_AP_FLEN}) // {_AP_STEP} AS INT))) AS t(fr)),
    mag AS (
      SELECT subdb, fname, fr, b,
             sqrt(
               power(list_sum(list_transform(generate_series(1, {_AP_FLEN}),
                 k -> w[k] * cos(2 * pi() * b * (k - 1) / {_AP_FLEN}))), 2)
               + power(list_sum(list_transform(generate_series(1, {_AP_FLEN}),
                 k -> w[k] * sin(2 * pi() * b * (k - 1) / {_AP_FLEN}))), 2)) AS m
      FROM fr, UNNEST(generate_series(0, {_AP_FLEN // 2})) AS t(b)),
    spec AS (
      SELECT subdb, fname, fr, list(m ORDER BY b) AS sp
      FROM mag GROUP BY subdb, fname, fr)
    SELECT subdb, fname, CAST(fr AS INT) AS frame, CAST(b - 1 AS INT) AS band,
           round(ln(({_ap_fbank_sql('sp')})[b]), 4) + 0.0 AS logmel
    FROM spec, UNNEST(generate_series(1, {_AP_BANDS})) AS t(b)
    """,
)
def q175_audio_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.processing.processors import FFT, Filterbank, Framing, Logarithm
    from dabstract_spark.sources.readers import decode_wav

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .option("recursiveFileLookup", "true")
        .load(FIXTURE_DIR)
    )
    decoded = files.select(
        F.element_at(F.split("path", "/"), -2).alias("subdb"),
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        decode_wav("content").alias("samples"),
    )
    framer = ProcessingChain().add(
        Framing(
            windowsize=_AP_FLEN / _AP_FS,
            stepsize=_AP_STEP / _AP_FS,
            window_func="hamming",
            fs=_AP_FS,
        )
    )
    framed = framer.process_df(decoded, "samples", new_key="frames")
    ex = framed.select(
        "subdb", "fname", F.posexplode("frames").alias("frame", "fvec")
    )
    feats = (
        ProcessingChain()
        .add(FFT(type="real", nfft="original", format="magnitude"))
        .add(Filterbank(n_bands=_AP_BANDS, scale="mel", nfft=_AP_FLEN, fs=_AP_FS))
        .add(Logarithm("natural"))
    )
    out = feats.process_df(ex, "fvec", new_key="logmel")
    return out.select(
        "subdb", "fname", "frame", F.posexplode("logmel").alias("band", "logmel")
    ).select(
        "subdb",
        "fname",
        "frame",
        "band",
        (F.round("logmel", 4) + F.lit(0.0)).alias("logmel"),
    )


# --------------------------------------------------------------------- #
# Multimodal pixel-decode plumbing, ORACLE-checked (§2.1 image/video
# columns): the container has no PIL/cv2, so mode='fake' substitutes an
# md5-derived pixel function for the codec — but everything else
# (binary scan, Arrow batch transfer, nested array<array<double>>
# schema, posexplode downstream) is the real path, and because the
# fake is a pure function of bytes+coordinates DuckDB reproduces every
# pixel from read_blob. The decode plumbing is therefore hash-checked
# end to end, not just unit-tested for determinism.
# --------------------------------------------------------------------- #
_IMG_H, _IMG_W = 4, 6
_PX = (
    "round(CAST(('0x' || substr(md5(md5(lower(hex(content))) "
    "|| {coords}), 1, 8)) AS BIGINT) / 4294967296.0, 6)"
)


@query(
    "q185_image_decode_fake",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
           CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           {_PX.format(coords="':' || i || ':' || j")} + 0.0 AS px
    FROM read_blob('{IMAGE_FIXTURE_DIR}/*.png'),
         UNNEST(generate_series(0, {_IMG_H - 1})) AS ti(i),
         UNNEST(generate_series(0, {_IMG_W - 1})) AS tj(j)
    """,
)
def q185_image_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import decode_image

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(IMAGE_FIXTURE_DIR)
    )
    img = files.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        decode_image("content", _IMG_H, _IMG_W, mode="fake").alias("__m"),
    )
    return (
        img.select("fname", F.posexplode("__m").alias("i", "__row"))
        .select("fname", "i", F.posexplode("__row").alias("j", "px"))
        .select("fname", "i", "j", (F.round("px", 6) + F.lit(0.0)).alias("px"))
    )


@query(
    "q186_video_frames_fake",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
           CAST(f AS INT) AS frame, CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           {_PX.format(coords="':' || f || ':' || i || ':' || j")} + 0.0 AS px
    FROM read_blob('{IMAGE_FIXTURE_DIR}/*.png'),
         UNNEST(generate_series(0, 1)) AS tf(f),
         UNNEST(generate_series(0, 1)) AS ti(i),
         UNNEST(generate_series(0, 2)) AS tj(j)
    """,
)
def q186_video_frames_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import sample_video_frames

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(IMAGE_FIXTURE_DIR)
    )
    vid = files.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        sample_video_frames("content", n_frames=2, height=2, width=3, mode="fake").alias("__v"),
    )
    return (
        vid.select("fname", F.posexplode("__v").alias("frame", "__fr"))
        .select("fname", "frame", F.posexplode("__fr").alias("i", "__row"))
        .select("fname", "frame", "i", F.posexplode("__row").alias("j", "px"))
        .select(
            "fname", "frame", "i", "j", (F.round("px", 6) + F.lit(0.0)).alias("px")
        )
    )


# --------------------------------------------------------------------- #
# Small-file compaction audit (§2.1 sink maintenance): fragment events
# into 37 tiny files, compact to exactly 4, and prove the rewrite via
# an order-independent audit (row count + integer checksum + file
# count) that must hash-match the original table's numbers.
# --------------------------------------------------------------------- #
@query(
    "q189_compaction_audit",
    oracle="""
    SELECT (SELECT COUNT(*) FROM events) AS total_rows,
           (SELECT SUM(event_id) FROM events) AS id_sum,
           4 AS n_files
    """,
)
def q189_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dabstract_spark.operators.layout import compact_parquet
    from dabstract_spark.session import load_table

    base = scratch_dir("sparkdab_compact_")
    ev = load_table(spark, sf_dir, "events")
    # the fragmented "many small appends" state being repaired
    ev.select("event_id").repartition(37).write.mode("overwrite").parquet(f"{base}/frag")
    return compact_parquet(spark, f"{base}/frag", f"{base}/compacted", target_files=4)


# --------------------------------------------------------------------- #
# Concrete DCASE connector (§2.1; reference dbs/DCASE2020Task1A.py:42-88):
# config-built named dataset class — prepare hook + folder scan + tab-CSV
# broadcast metadata join keyed 'audio/<file>' + stringlist2ind codes for
# scene_id/group. The oracle independently re-derives everything from the
# committed fixture with read_blob + read_csv(delim tab) + count-of-
# smaller dense codes.
# --------------------------------------------------------------------- #
DCASE_DIR = f"{_FIXTURES}/dcase2020"


@query(
    "q196_dcase_connector",
    oracle=f"""
    WITH scan AS (
      SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname
      FROM read_blob('{DCASE_DIR}/audio/*.wav')),
    meta AS (
      SELECT * FROM read_csv('{DCASE_DIR}/meta.csv', delim='\t', header=true)),
    labeled AS (
      SELECT s.fname, m.scene_label, m.identifier, m.source_label
      FROM scan s LEFT JOIN meta m ON m.filename = 'audio/' || s.fname),
    sc AS (
      SELECT a.v, CAST(COUNT(b.v) AS INT) AS scene_id
      FROM (SELECT DISTINCT scene_label AS v FROM labeled) a
      LEFT JOIN (SELECT DISTINCT scene_label AS v FROM labeled) b ON b.v < a.v
      GROUP BY a.v),
    gc AS (
      SELECT a.v, CAST(COUNT(b.v) AS INT) AS grp
      FROM (SELECT DISTINCT identifier AS v FROM labeled) a
      LEFT JOIN (SELECT DISTINCT identifier AS v FROM labeled) b ON b.v < a.v
      GROUP BY a.v)
    SELECT l.fname, l.scene_label, l.identifier, l.source_label,
           sc.scene_id, gc.grp
    FROM labeled l
    JOIN sc ON sc.v = l.scene_label
    JOIN gc ON gc.v = l.identifier
    """,
)
def q196_dcase_connector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.config import dataset_from_config

    cfg = {
        "datasets": [
            {
                "name": "DCASE2020Task1A",
                "parameters": {"paths": {"data": f"{DCASE_DIR}/audio"}},
            }
        ]
    }
    ds = dataset_from_config(spark, cfg)
    return ds.full_df.select(
        F.col("filename").alias("fname"),
        "scene_label",
        "identifier",
        "source_label",
        "scene_id",
        F.col("group").alias("grp"),
    )


# --------------------------------------------------------------------- #
# Streaming count-min maintenance (streaming/ops.cms_sketch_stream):
# each micro-batch appends its PARTIAL (j, bucket, cnt) sketch to the
# sink; the live frequency table is cms_merge of the sink — an online
# frequency monitor that never rescans past batches. Merge-by-sum is
# batch-boundary independent, so the drained sketch equals the batch
# sketch and the per-user estimates hash-check against the batch SQL
# (including the structural never-underestimate guarantee).
# --------------------------------------------------------------------- #
_CMS_BUCKET_SQL = (
    "CAST(CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || CAST({k} AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 256 AS INT)"
)


@query(
    "q201_stream_cms",
    oracle=f"""
    WITH sk AS (
      -- NULL keys are not sketchable (md5(NULL) has no bucket): the
      -- sketch and the probe set both exclude them, in both engines
      SELECT j, {_CMS_BUCKET_SQL.format(j='j', k='user_id')} AS bucket,
             COUNT(*) AS cnt
      FROM events, UNNEST(generate_series(0, 3)) AS t(j)
      WHERE user_id IS NOT NULL
      GROUP BY j, bucket),
    exact AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events
              WHERE user_id IS NOT NULL GROUP BY user_id),
    est AS (
      SELECT e.user_id, e.exact_cnt, MIN(s.cnt) AS est
      FROM exact e JOIN sk s
        ON s.bucket = {_CMS_BUCKET_SQL.format(j='s.j', k='e.user_id')}
      GROUP BY e.user_id, e.exact_cnt)
    SELECT user_id, exact_cnt, CAST(est AS BIGINT) AS est,
           est >= exact_cnt AS never_under
    FROM est
    """,
)
def q201_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dabstract_spark.operators.sketches import cms_estimate, cms_merge
    from dabstract_spark.streaming.ops import cms_sketch_stream, stream_events

    tmp = scratch_dir("sparkdab_cms_")
    # NULL keys are not sketchable (md5(NULL) has no bucket) — both the
    # sketch stream and the probe set exclude them, like the oracle
    src = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .select("user_id")
        .filter(F.col("user_id").isNotNull())
    )
    partials = cms_sketch_stream(src, "user_id", f"{tmp}/out", f"{tmp}/ckpt")
    merged = cms_merge(partials)
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    probes = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(merged, probes, "user_id")
    return est.select(
        "user_id",
        "exact_cnt",
        "est",
        (F.col("est") >= F.col("exact_cnt")).alias("never_under"),
    )


# --------------------------------------------------------------------- #
# Streaming Bloom-filter maintenance (streaming/ops.bloom_sketch_stream):
# each micro-batch appends its PARTIAL set-bits table to the sink; the
# live filter is bloom_merge (DISTINCT) of the sink — an online
# membership monitor that never rescans past batches. Set union is
# batch-boundary and arrival-order independent, so the drained merged
# filter equals the batch filter BIT FOR BIT — which is exactly what
# this query outputs and hash-checks.
# --------------------------------------------------------------------- #
from dabstract_spark.queries_text import _BLOOM_BIT  # one bloom-bit recipe, no drift


@query(
    "q213_stream_bloom",
    oracle=f"""
    SELECT DISTINCT {_BLOOM_BIT.format(j='j', k='CAST(user_id AS VARCHAR)')} AS bit
    FROM events, UNNEST(generate_series(0, 3)) AS t(j)
    """,
)
def q213_stream_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dabstract_spark.operators.bloom import bloom_merge
    from dabstract_spark.streaming.ops import bloom_sketch_stream, stream_events

    tmp = scratch_dir("sparkdab_bloom_")
    src = stream_events(spark, f"{sf_dir}/events.parquet").select("user_id")
    partials = bloom_sketch_stream(src, "user_id", f"{tmp}/out", f"{tmp}/ckpt")
    return bloom_merge(partials)


# --------------------------------------------------------------------- #
# ORC sink/source roundtrip (§2.1 breadth: the other mainstream columnar
# format Spark ships natively): events written as ORC partitioned by
# event_type, read back with a partition-pruning filter and aggregated.
# The oracle answers from the same logical data (the parquet view), so
# the roundtrip itself is what's under test; predicate pushdown into the
# ORC scan is asserted in tests/test_sources.py.
# --------------------------------------------------------------------- #
@query(
    "q208_orc_roundtrip",
    oracle="""
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events WHERE event_type = 'click' GROUP BY user_id
    """,
)
def q208_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    ev = _t(spark, sf_dir, "events")
    tmp = scratch_dir("sparkdab_orc_")
    ev.write.mode("overwrite").partitionBy("event_type").orc(f"{tmp}/events_orc")
    back = spark.read.orc(f"{tmp}/events_orc").filter(F.col("event_type") == "click")
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )


# --------------------------------------------------------------------- #
# Image resize plumbing (sources/readers.resize_image): nearest-neighbor
# downscale of the fake-decoded 4x6 matrix to 3x4 — the standard
# pre-encoder resize, expressed as a pure-JVM gather over the decoded
# array (the only Python stage in the image path stays the codec).
# DuckDB reproduces every output pixel by applying the same
# floor(i*src/dst) index map to the md5 pixel function.
# --------------------------------------------------------------------- #
_RSZ_H, _RSZ_W = 3, 4


@query(
    "q219_image_resize",
    oracle=f"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS fname,
           CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           {_PX.format(coords="':' || CAST(FLOOR(i * 4 / 3.0) AS INT) || ':' || CAST(FLOOR(j * 6 / 4.0) AS INT)")} + 0.0 AS px
    FROM read_blob('{IMAGE_FIXTURE_DIR}/*.png'),
         UNNEST(generate_series(0, {_RSZ_H - 1})) AS ti(i),
         UNNEST(generate_series(0, {_RSZ_W - 1})) AS tj(j)
    """,
)
def q219_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import decode_image, resize_image

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(IMAGE_FIXTURE_DIR)
    )
    # decode in its own select so resize's HOF lambdas capture a
    # materialized attribute, not an inlined re-evaluated expression
    img = files.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        decode_image("content", _IMG_H, _IMG_W, mode="fake").alias("__m"),
    )
    rsz = img.select(
        "fname", resize_image("__m", _IMG_H, _IMG_W, _RSZ_H, _RSZ_W).alias("__r")
    )
    return (
        rsz.select("fname", F.posexplode("__r").alias("i", "__row"))
        .select("fname", "i", F.posexplode("__row").alias("j", "px"))
        .select("fname", "i", "j", (F.col("px") + F.lit(0.0)).alias("px"))
    )


# --------------------------------------------------------------------- #
# Streaming histogram maintenance (streaming/ops.hist_sketch_stream):
# each micro-batch appends its PARTIAL per-type (event_type, bin, cnt)
# histogram to the sink; the live quantile monitor is hist_merge of the
# sink + bin-edge extraction — an online latency/size-percentile
# dashboard that never rescans past batches. Merge-by-sum is batch-
# boundary independent, so the drained sketch equals the batch sketch
# and the p50/p95/p99 bin edges hash-check against the batch SQL
# (whose one-bin-width error bound q229_hist_quantile_sketch certifies
# against exact discrete quantiles).
# --------------------------------------------------------------------- #
@query(
    "q233_stream_histogram",
    oracle="""
    WITH vm AS (
      SELECT event_type,
             CAST(CAST(round(value, 6) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
      FROM events),
    merged AS (
      SELECT event_type,
             CAST(LEAST(GREATEST(floor(v / 4000000.0), 0), 127) AS INT) AS bin,
             COUNT(*) AS cnt
      FROM vm GROUP BY event_type, bin),
    bcum AS (
      SELECT event_type, bin,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM merged)
    SELECT event_type,
           MIN(CASE WHEN 100 * cum >= 50 * n THEN bin END) * 4000000 AS p50_lo_micro,
           MIN(CASE WHEN 100 * cum >= 95 * n THEN bin END) * 4000000 AS p95_lo_micro,
           MIN(CASE WHEN 100 * cum >= 99 * n THEN bin END) * 4000000 AS p99_lo_micro
    FROM bcum GROUP BY event_type
    """,
)
def q233_stream_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dabstract_spark.operators.sketches import hist_merge, hist_quantiles
    from dabstract_spark.streaming.ops import hist_sketch_stream, stream_events

    tmp = scratch_dir("sparkdab_hist_")
    vm = (
        (F.round(F.col("value"), 6).cast("decimal(18,6)") * F.lit(1000000))
        .cast("bigint")
        .alias("v")
    )
    src = stream_events(spark, f"{sf_dir}/events.parquet").select("event_type", vm)
    partials = hist_sketch_stream(
        src, "v", ("event_type",), f"{tmp}/out", f"{tmp}/ckpt"
    )
    merged = hist_merge(partials, ("event_type",))
    return hist_quantiles(merged, (50, 95, 99), ("event_type",))


# --------------------------------------------------------------------- #
# Perceptual image near-dup (readers.with_ahash + ahash_neardup_pairs):
# aHash fingerprints over the decoded matrices of TWO albums — the
# originals and brightness-shifted copies (+1/64, an exact binary
# fraction) — then 4x16-band Hamming LSH pairs at distance <= 3. The
# shifted copy lands at hamming 0 BY THE HASH'S INVARIANCE (every pixel
# and the mean move together), while unrelated images sit near ~32;
# banding is pigeonhole-exhaustive at radius 3, so the pair set is
# complete and the tiny-fixture oracle can brute-force all pairs.
# --------------------------------------------------------------------- #
@query(
    "q241_image_ahash_neardup",
    oracle=f"""
    WITH base AS (
      SELECT regexp_extract(filename, '([^/]+)$', 1) AS f, content
      FROM read_blob('{IMAGE_FIXTURE_DIR}/*.png')),
    cells AS (
      SELECT alb.pre || f AS fname, i * 8 + j AS idx,
             CAST(round(({_PX.format(coords="':' || i || ':' || j")} + alb.shift)
                        * 1000000) AS BIGINT) AS pxi
      FROM base,
           UNNEST(generate_series(0, 7)) AS ti(i),
           UNNEST(generate_series(0, 7)) AS tj(j),
           (VALUES ('', 0.0), ('bright_', 0.015625)) AS alb(pre, shift)),
    summed AS (
      SELECT fname, idx, pxi, SUM(pxi) OVER (PARTITION BY fname) AS s
      FROM cells),
    hs AS (
      SELECT fname,
             SUM(CASE WHEN pxi * 64 >= s AND idx < 32
                      THEN CAST(2**idx AS BIGINT) ELSE 0 END) AS w0,
             SUM(CASE WHEN pxi * 64 >= s AND idx >= 32
                      THEN CAST(2**(idx - 32) AS BIGINT) ELSE 0 END) AS w1
      FROM summed GROUP BY fname)
    SELECT a.fname AS id_a, b.fname AS id_b,
           CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) AS INT)
             AS hamming
    FROM hs a JOIN hs b ON a.fname < b.fname
    WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 3
    """,
)
def q241_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import (
        ahash_neardup_pairs,
        decode_image,
        with_ahash,
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(IMAGE_FIXTURE_DIR)
    )
    imgs = files.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        decode_image("content", 8, 8, mode="fake").alias("__m"),
    )
    bright = imgs.select(
        F.concat(F.lit("bright_"), F.col("fname")).alias("fname"),
        F.transform(
            "__m", lambda row: F.transform(row, lambda x: x + F.lit(0.015625))
        ).alias("__m"),
    )
    album = imgs.unionByName(bright)
    hashed = with_ahash(album, "__m").select("fname", "ahash_w0", "ahash_w1")
    pairs = ahash_neardup_pairs(hashed, "fname", max_hamming=3)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


# --------------------------------------------------------------------- #
# Energy-based activity segmentation (readers.energy_segments): the
# VAD-style front gate of an audio curation pipeline — exact-integer
# frame energies over the REAL decoded PCM, above-mean voicing (integer
# cross-multiply, no float threshold), gaps-and-islands segments. The
# oracle re-derives every segment from the WAV bytes alone (q122's
# 16-bit LE decode), so the whole decode→frame→energy→segment chain is
# hash-checked end to end.
# --------------------------------------------------------------------- #
@query(
    "q252_vad_segments",
    oracle=f"""
    WITH f AS (
      SELECT filename AS fpath,
             regexp_extract(filename, '([^/]+)/[^/]+$', 1) AS subdb,
             regexp_extract(filename, '([^/]+)$', 1) AS fname,
             size, hex(content) AS hx
      FROM read_blob('{FIXTURE_DIR}/*/*.wav')),
    hdr AS (SELECT fpath, subdb, fname, hx, (size - 44) // 2 AS n_samples FROM f),
    samp AS (
      SELECT fpath, subdb, fname, i,
             CAST(('0x' || substr(hx, 2*(44 + 2*i) + 1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substr(hx, 2*(45 + 2*i) + 1, 2)) AS BIGINT) AS v
      FROM hdr,
           UNNEST(generate_series(0, CAST(((n_samples // 32) * 32) AS INT) - 1)) AS t(i)),
    fr AS (
      SELECT fpath, subdb, fname, i // 32 AS frame,
             SUM(CASE WHEN v >= 32768 THEN (v - 65536) * (v - 65536)
                      ELSE v * v END) AS energy
      FROM samp GROUP BY fpath, subdb, fname, i // 32),
    st AS (SELECT fpath, SUM(energy) AS tot, COUNT(*) AS nf FROM fr GROUP BY fpath),
    vv AS (SELECT fr.* FROM fr JOIN st USING (fpath)
           WHERE fr.energy * st.nf > st.tot),
    isl AS (SELECT fpath, subdb, fname, frame,
                   frame - ROW_NUMBER() OVER (PARTITION BY fpath ORDER BY frame) AS g
            FROM vv),
    seg AS (SELECT fpath, subdb, fname, MIN(frame) AS s, MAX(frame) + 1 AS e,
                   COUNT(*) AS n
            FROM isl GROUP BY fpath, subdb, fname, g)
    SELECT subdb, fname,
           CAST(ROW_NUMBER() OVER (PARTITION BY fpath ORDER BY s) AS INT) AS seg_id,
           CAST(s AS BIGINT) AS start_frame,
           CAST(e AS BIGINT) AS end_frame,
           CAST(n AS BIGINT) AS n_frames
    FROM seg
    """,
)
def q252_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import decode_wav, energy_segments

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .option("recursiveFileLookup", "true")
        .load(FIXTURE_DIR)
    )
    decoded = files.select(
        F.element_at(F.split("path", "/"), -2).alias("subdb"),
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        decode_wav("content").alias("__s"),
    )
    return energy_segments(decoded, ["subdb", "fname"], "__s", frame=32)


# --------------------------------------------------------------------- #
# Audio fingerprint dedup (readers.audio_fingerprint_dedup): the audio
# member of the modality-dedup family — md5 of the exact integer
# frame-energy profile (shared staging with q252_vad_segments), min-name
# canonical per group. The oracle recomputes every fingerprint from the
# WAV bytes.
# --------------------------------------------------------------------- #
@query(
    "q253_audio_fingerprint_dedup",
    oracle=f"""
    WITH f AS (
      SELECT filename AS fpath,
             regexp_extract(filename, '([^/]+)/[^/]+$', 1) AS subdb,
             regexp_extract(filename, '([^/]+)$', 1) AS fname,
             size, hex(content) AS hx
      FROM read_blob('{FIXTURE_DIR}/*/*.wav')),
    hdr AS (SELECT fpath, subdb, fname, hx, (size - 44) // 2 AS n_samples FROM f),
    samp AS (
      SELECT fpath, subdb, fname, i,
             CAST(('0x' || substr(hx, 2*(44 + 2*i) + 1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substr(hx, 2*(45 + 2*i) + 1, 2)) AS BIGINT) AS v
      FROM hdr,
           UNNEST(generate_series(0, CAST(((n_samples // 32) * 32) AS INT) - 1)) AS t(i)),
    fr AS (
      SELECT fpath, subdb, fname, i // 32 AS frame,
             SUM(CASE WHEN v >= 32768 THEN (v - 65536) * (v - 65536)
                      ELSE v * v END) AS energy
      FROM samp GROUP BY fpath, subdb, fname, i // 32),
    fp AS (
      SELECT subdb, fname,
             md5(array_to_string(list(energy ORDER BY frame), ',')) AS fingerprint
      FROM fr GROUP BY fpath, subdb, fname),
    g AS (
      SELECT fingerprint, COUNT(*) AS group_size,
             MIN(subdb || '/' || fname) AS keep
      FROM fp GROUP BY fingerprint)
    SELECT fp.subdb, fp.fname, fp.fingerprint, g.group_size,
           (fp.subdb || '/' || fp.fname) = g.keep AS is_canonical
    FROM fp JOIN g USING (fingerprint)
    """,
)
def q253_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dabstract_spark.sources.readers import audio_fingerprint_dedup, decode_wav

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .option("recursiveFileLookup", "true")
        .load(FIXTURE_DIR)
    )
    decoded = files.select(
        F.element_at(F.split("path", "/"), -2).alias("subdb"),
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        decode_wav("content").alias("__s"),
    )
    return audio_fingerprint_dedup(decoded, ["subdb", "fname"], "__s", frame=32)

"""Streaming-sink replay audit (r12, VERDICT item 2).

foreachBatch is AT-LEAST-ONCE: a micro-batch whose sink append
committed but whose checkpoint offset didn't is re-executed on
restart, re-appending its rows. Every parquet-append sink in
``streaming/ops.py`` must therefore be replay-safe in exactly one of
two ways:

- MARKED: partial rows carry (run_id, batch_id) and the read path
  drops duplicate (run_id, batch_id, *keys) rows before merging
  (``dedup_marked_partials`` — required for NON-idempotent merges
  like SUM).
- IDEMPOTENT: the merge algebra absorbs byte-identical duplicate rows
  (DISTINCT / set union / elementwise MIN), so replays are invisible
  without markers.

Two layers, per the facade-audit pattern:

1. STRUCTURAL (``test_every_foreachbatch_sink_is_marked_or_idempotent``):
   AST-sweep every op that calls ``_drain_foreach_batch`` — each must
   either call ``dedup_marked_partials`` or be filed in the
   ``IDEMPOTENT`` allowlist with its algebra named. A new sink op that
   is neither fails here BEFORE it can ship an unsafe sink.
2. BEHAVIORAL (``test_sink_survives_byte_identical_replay``): for every
   sink op, run it, then duplicate one committed part-file in its sink
   directory — a byte-identical re-append, exactly what a replay (or a
   crash mid-re-append) produces — then re-invoke the op with the SAME
   checkpoint (drains nothing new, re-reads the tampered sink) and
   assert the final card is unchanged. This found the r12 bugs this
   audit exists for: cms/hist/bootstrap partials were sum-merged with
   no markers, and incremental-dedup/decontaminate returned the raw
   (non-DISTINCT) sink.
"""

from __future__ import annotations

import ast
import inspect
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

import dabstract_spark.streaming.ops as ops
from dabstract_spark.streaming.ops import stream_events

SF = "/root/testdata/sf0.001"

# merge algebra per unmarked sink op — the allowlist half of the audit
IDEMPOTENT = {
    "incremental_dedup_stream": "digest SET; read path is DISTINCT of the sink",
    "bloom_sketch_stream": "set-bits partials; live filter = bloom_merge (DISTINCT)",
    "minhash_sigs_stream": "per-group signature partials; merge = elementwise MIN",
    "decontaminate_stream": "deterministic per-doc rows; read is DISTINCT "
    "(unique-input-id contract)",
    "cohort_activity_stream": "(user, period) pair SET; read is DISTINCT",
    "curate_stream": "content-digest SET; read is DISTINCT",
    "neardup_ingest_stream": "(new_id, corpus_id) pair SET; read is DISTINCT",
    "dsir_score_stream": "deterministic per-doc scores; read is DISTINCT",
    "oov_score_stream": "deterministic per-doc scores; read is DISTINCT",
    "hll_stream": "register merge = elementwise MAX (markers written for "
    "lineage only)",
    "weighted_sample_stream": "key dedup + global top-n; race key is a pure "
    "function of (seed, key) (markers written for lineage only)",
    "kmv_stream": "k-smallest-of-DISTINCT-union merge (markers written for "
    "lineage only)",
}

# idempotent ops whose absorbing step is an algebra other than a literal
# `.distinct()` on the return (max-merge, min-merge, k-smallest,
# key-dedup) — exempt from the .distinct() source check; the behavioral
# replay test still covers them
NON_DISTINCT_IDEMPOTENT = {
    "bloom_sketch_stream",
    "minhash_sigs_stream",
    "hll_stream",
    "weighted_sample_stream",
    "kmv_stream",
}

# idempotent ops whose RETURN is the raw partial table (the absorbing
# merge happens in the consumer helper) — the harness applies that
# helper as the card; everything else's return IS the card
RAW_PARTIAL_CARD = {"bloom_sketch_stream", "minhash_sigs_stream"}


def _foreachbatch_ops() -> dict[str, str]:
    src = inspect.getsource(ops)
    out = {}
    for node in ast.parse(src).body:
        if isinstance(node, ast.FunctionDef) and node.name != "_drain_foreach_batch":
            seg = ast.get_source_segment(src, node) or ""
            if "_drain_foreach_batch(" in seg:
                out[node.name] = seg
    return out


def test_every_foreachbatch_sink_is_marked_or_idempotent():
    found = _foreachbatch_ops()
    # the audit must actually see the sink surface — a refactor that
    # hides _drain_foreach_batch behind another name must update this
    assert len(found) >= 20, sorted(found)
    problems = []
    for name, seg in sorted(found.items()):
        marked = "dedup_marked_partials(" in seg and "run_id" in seg
        idem = name in IDEMPOTENT
        if not (marked or idem):
            problems.append(f"{name}: neither marked nor filed idempotent")
        if idem and name not in NON_DISTINCT_IDEMPOTENT and ".distinct()" not in seg:
            problems.append(
                f"{name}: filed as DISTINCT-idempotent but no .distinct() on its read path"
            )
    assert not problems, problems
    # stale allowlist entries are their own smell
    gone = set(IDEMPOTENT) - set(found)
    assert not gone, f"IDEMPOTENT entries without a sink op: {sorted(gone)}"


# --------------------------------------------------------------------- #
# behavioral harness
# --------------------------------------------------------------------- #
def _canon(v):
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rows(df):
    out = {}
    for r in df.collect():
        key = tuple(_canon(v) for v in r)
        out[key] = out.get(key, 0) + 1
    return out


def _replay_one_part_file(out_dir: str):
    parts = sorted(Path(out_dir).glob("part-*.parquet"))
    assert parts, f"no committed part files under {out_dir}"
    src = parts[-1]
    shutil.copyfile(src, src.with_name("part-replayed-" + src.name[5:]))


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _docs_src(spark):
    return stream_events(spark, f"{SF}/documents.parquet")


def _events_src(spark):
    return stream_events(spark, f"{SF}/events.parquet")


def _b_incremental_dedup(spark, tmp):
    seen = _docs(spark).filter(F.col("doc_id") >= 400).select("text")
    return lambda: ops.incremental_dedup_stream(
        _docs_src(spark).filter(F.col("doc_id") < 150).select("text"),
        seen,
        "text",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_cms(spark, tmp):
    return lambda: ops.cms_sketch_stream(
        _events_src(spark).filter(F.col("user_id").isNotNull()).select("user_id"),
        "user_id",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_hist(spark, tmp):
    vm = (
        (F.round(F.col("value"), 6).cast("decimal(18,6)") * F.lit(1000000))
        .cast("bigint")
        .alias("v")
    )
    return lambda: ops.hist_sketch_stream(
        _events_src(spark).select("event_type", vm),
        "v",
        ("event_type",),
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_bloom(spark, tmp):
    from dabstract_spark.operators.bloom import bloom_merge

    return lambda: bloom_merge(
        ops.bloom_sketch_stream(
            _events_src(spark).filter(F.col("user_id").isNotNull()).select("user_id"),
            "user_id",
            f"{tmp}/out",
            f"{tmp}/ckpt",
        )
    )


def _b_minhash_sigs(spark, tmp):
    from dabstract_spark.operators.dedup import merge_group_signatures

    return lambda: merge_group_signatures(
        ops.minhash_sigs_stream(
            _docs_src(spark).select("doc_id", "source", "text"),
            "source",
            "doc_id",
            "text",
            f"{tmp}/out",
            f"{tmp}/ckpt",
        )
    )


def _b_decontaminate(spark, tmp):
    test_df = _docs(spark).filter(F.col("doc_id") >= 500).select("doc_id", "text")
    return lambda: ops.decontaminate_stream(
        _docs_src(spark).filter(F.col("doc_id") < 100),
        test_df,
        "doc_id",
        "text",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_cohort(spark, tmp):
    return lambda: ops.cohort_activity_stream(
        _events_src(spark).filter(F.col("user_id").isNotNull()),
        "user_id",
        "ts",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_curate(spark, tmp):
    test_df = _docs(spark).filter(F.col("doc_id") >= 500).select("doc_id", "text")
    return lambda: ops.curate_stream(
        _docs_src(spark).filter(F.col("doc_id") < 100),
        test_df,
        "doc_id",
        "text",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_neardup(spark, tmp):
    # corpus contains byte-identical twins of the streamed docs (ids
    # shifted by 1000) so the candidate-pair card is guaranteed non-empty
    corpus = (
        _docs(spark)
        .filter(F.col("doc_id") < 60)
        .select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    return lambda: ops.neardup_ingest_stream(
        _docs_src(spark).filter(F.col("doc_id") < 60).select("doc_id", "text"),
        corpus,
        "doc_id",
        "text",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_bootstrap(spark, tmp):
    return lambda: ops.bootstrap_stream(
        _docs_src(spark).filter(F.col("doc_id") < 150).select("doc_id", "n_chars"),
        "doc_id",
        "n_chars",
        f"{tmp}/out",
        f"{tmp}/ckpt",
        n_boot=8,
        seed=7,
    )


def _b_dsir(spark, tmp):
    from dabstract_spark.operators.text import dsir_logratio_table

    docs = _docs(spark).select("doc_id", "source", "text")
    target = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0").filter(F.col("doc_id") < 200)
    table = dsir_logratio_table(target, raw, "text", n_buckets=256)
    return lambda: ops.dsir_score_stream(
        _docs_src(spark).filter(
            (F.col("source") != "src0") & (F.col("doc_id") < 200)
        ),
        table,
        "doc_id",
        "text",
        f"{tmp}/out",
        f"{tmp}/ckpt",
        n_buckets=256,
    )


def _b_oov(spark, tmp):
    from dabstract_spark.operators.textstats import vocab_top_k

    vocab = vocab_top_k(_docs(spark), "text", k=200)
    return lambda: ops.oov_score_stream(
        _docs_src(spark).filter(F.col("doc_id") < 150).select("doc_id", "text"),
        vocab,
        "doc_id",
        "text",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_rollup(spark, tmp):
    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    delta = (
        docs.filter(F.col("doc_id") < 100)
        .withColumn("op", F.lit("insert"))
        .unionByName(
            docs.filter(F.col("doc_id") < 20).withColumn("op", F.lit("delete"))
        )
        .select("op", "lang", "n_chars")
    )
    delta.repartition(3).write.mode("overwrite").parquet(f"{tmp}/delta")

    return lambda: ops.rollup_maintain_stream(
        stream_events(spark, f"{tmp}/delta", max_files_per_trigger=1),
        ["lang"],
        ["n_chars"],
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_calibration(spark, tmp):
    return lambda: ops.calibration_stream(
        _docs_src(spark).select(
            "lang", (F.col("n_chars") * F.lit(100)).cast("int").alias("score")
        ),
        "lang",
        "score",
        f"{tmp}/out",
        f"{tmp}/ckpt",
        max_score=1_000_000,
    )


def _b_drift(spark, tmp):
    bucket = F.least(F.lit(9), F.expr("n_chars div 64")).alias("len_bucket")
    ref = (
        _docs(spark)
        .filter(F.col("lang") == "en")
        .select(bucket)
        .groupBy("len_bucket")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    return lambda: ops.drift_monitor_stream(
        _docs_src(spark)
        .filter(F.col("lang") != "en")
        .select(F.least(F.lit(9), F.expr("n_chars div 64")).alias("len_bucket")),
        ref,
        "len_bucket",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_uniqueness(spark, tmp):
    return lambda: ops.uniqueness_stream(
        _docs_src(spark).select(
            "lang",
            "source",
            F.least(F.lit(9), F.expr("n_chars div 64")).alias("lb"),
        ),
        ["lang", "source", "lb"],
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_balance(spark, tmp):
    return lambda: ops.balance_stream(
        _docs_src(spark).select("lang", "source"),
        ["lang", "source"],
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_centroid_shift(spark, tmp):
    from dabstract_spark.operators.similarity import centroid_sums

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ref = centroid_sums(emb.filter(F.col("vec_id") % 2 == 0), "label", "embedding")
    return lambda: ops.centroid_shift_stream(
        stream_events(spark, f"{SF}/embeddings.parquet").filter(
            F.col("vec_id") % 2 == 1
        ),
        ref,
        "label",
        "embedding",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_agreement(spark, tmp):
    return lambda: ops.agreement_stream(
        _docs_src(spark).select(
            "lang",
            F.when(F.col("n_chars") % 3 == 0, F.lit("xx"))
            .otherwise(F.col("lang"))
            .alias("lang_pred"),
        ),
        "lang",
        "lang_pred",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_hll(spark, tmp):
    return lambda: ops.hll_stream(
        _events_src(spark).filter(F.col("user_id").isNotNull()).select(
            "event_type", "user_id"
        ),
        "user_id",
        ["event_type"],
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_trend(spark, tmp):
    return lambda: ops.trend_stream(
        _events_src(spark).select("event_type", "ts"),
        "event_type",
        f"{tmp}/out",
        f"{tmp}/ckpt",
    )


def _b_weighted_sample(spark, tmp):
    return lambda: ops.weighted_sample_stream(
        _docs_src(spark).select("doc_id", "n_chars"),
        20,
        "n_chars",
        f"{tmp}/out",
        f"{tmp}/ckpt",
        seed=3,
        key="doc_id",
    )


def _b_kmv(spark, tmp):
    return lambda: ops.kmv_stream(
        _events_src(spark).filter(F.col("user_id").isNotNull()).select(
            "event_type", "user_id"
        ),
        "user_id",
        ["event_type"],
        f"{tmp}/out",
        f"{tmp}/ckpt",
        k=64,
    )


BUILDERS = {
    "incremental_dedup_stream": _b_incremental_dedup,
    "cms_sketch_stream": _b_cms,
    "hist_sketch_stream": _b_hist,
    "bloom_sketch_stream": _b_bloom,
    "minhash_sigs_stream": _b_minhash_sigs,
    "decontaminate_stream": _b_decontaminate,
    "cohort_activity_stream": _b_cohort,
    "curate_stream": _b_curate,
    "neardup_ingest_stream": _b_neardup,
    "bootstrap_stream": _b_bootstrap,
    "dsir_score_stream": _b_dsir,
    "oov_score_stream": _b_oov,
    "rollup_maintain_stream": _b_rollup,
    "calibration_stream": _b_calibration,
    "drift_monitor_stream": _b_drift,
    "uniqueness_stream": _b_uniqueness,
    "balance_stream": _b_balance,
    "centroid_shift_stream": _b_centroid_shift,
    "agreement_stream": _b_agreement,
    "hll_stream": _b_hll,
    "trend_stream": _b_trend,
    "weighted_sample_stream": _b_weighted_sample,
    "kmv_stream": _b_kmv,
}


def test_behavioral_specs_cover_every_sink_op():
    """The parametrized replay sweep below runs exactly the sink ops
    the structural audit found — a new sink op without a BUILDERS
    entry fails here, keeping the behavioral net as wide as the
    structural one."""
    assert set(BUILDERS) == set(_foreachbatch_ops())


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_sink_survives_byte_identical_replay(spark, tmp_path, name):
    run = BUILDERS[name](spark, str(tmp_path))
    before = _rows(run())
    assert before, f"{name}: empty first-run card"
    _replay_one_part_file(f"{tmp_path}/out")
    after = _rows(run())
    assert after == before, (
        f"{name}: card changed after a byte-identical part-file replay "
        f"({sum(before.values())} rows -> {sum(after.values())})"
    )

"""Empirical scaling probe: run the heavy operators at 1x/4x/16x input
size (self-union of the sf0.1 fixtures with id offsets — duplicated text
models a near-dup-heavy web corpus) and report wall time per scale.

Near-linear growth here is the local[32] proxy for the 1000-executor
question: no quadratic pair blowup, no driver bottleneck, no
plan-size explosion. Results are summarized in SCALE.md.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def scaled(df, id_col: str, copies: int, uniquify=None):
    """copies x the table, ids offset per copy so they stay unique.
    uniquify(df, c) optionally perturbs a column per copy."""
    n = 10_000_000
    parts = []
    for c in range(copies):
        p = df.withColumn(id_col, F.col(id_col) + F.lit(c * n))
        if uniquify is not None:
            p = uniquify(p, c)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from dabstract_spark.session import get_spark, load_table
    from dabstract_spark.operators import dedup as dd, events as ev, select as sel, text as tx
    from dabstract_spark.operators.similarity import (
        embedding_neardup_pairs,
        ivf_assign,
        ivf_centroids,
    )

    spark = get_spark("scale_probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    events = load_table(spark, sf_dir, "events")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup
    noop(lineitem.groupBy("l_returnflag").count())

    probes = {
        "minhash_pairs": lambda d: dd.minhash_candidate_pairs(d, "doc_id", "text"),
        "dedup_clusters": lambda d: dd.minhash_dedup_clusters(d, "doc_id", "text"),
        "simhash": lambda d: dd.simhash_df(d, "doc_id", "text"),
        "exact_dedup": lambda d: dd.exact_dedup(d, "doc_id", "text").select("doc_id"),
        "jaccard_pairs": lambda d: dd.jaccard_pairs(
            d, "doc_id", "text", k=2, threshold=0.12, max_df=100
        ),
        "tfdf_keywords": lambda d: tx.tfdf_keywords(d, "doc_id", "text"),
        # 80/20 split inside the probe: contamination vs a train side
        # that grows with the corpus
        "contamination": lambda d: dd.contamination_check(
            d.filter(F.col("doc_id") % 5 != 0),
            d.filter(F.col("doc_id") % 5 == 0),
            "doc_id",
            "text",
            k=3,
            max_df=100,
        ),
        "sequence_pack": lambda d: __import__(
            "dabstract_spark.operators.packing", fromlist=["sequence_pack"]
        ).sequence_pack(
            d.withColumn("__tok", tx.bpe_token_count("text")),
            "doc_id",
            "__tok",
            capacity=2048,
        ),
        "pii_stats": lambda d: tx.pii_stats_df(d, "doc_id", "text"),
        "c4_filter": lambda d: tx.c4_filter_df(d, "doc_id", "text"),
        # winnowed fingerprint pair mining: ~1/window the index density
        # of full shingling, same capped inverted-index machinery
        "winnow_pairs": lambda d: dd.winnow_pairs(
            d, "doc_id", "text", k=3, window=4, min_shared=2, max_df=100
        ),
        # bloom-pre-filtered incremental dedup: the seen corpus grows
        # with scale but its membership structure is the <= 65536-row
        # set-bits table (broadcast); only possible members reach the
        # exact anti-join
        "bloom_dedup": lambda d: __import__(
            "dabstract_spark.operators.bloom", fromlist=["dedup_against_bloom"]
        ).dedup_against_bloom(
            d.filter(F.col("doc_id") % 5 == 0),
            d.filter(F.col("doc_id") % 5 != 0),
            "doc_id",
            "text",
        ),
    }
    # fuzzy/pagerank scale with DISTINCT-ish copies: each copy remaps
    # the alphabet with a per-copy bijection (translate), so the texts
    # differ from every other copy's while each copy keeps the BASE
    # corpus's prefix-block size distribution — the growing-corpus
    # shape. (A shared prepended tag would funnel ALL docs into one
    # block; identical copies would be the duplicate bomb, quadratic BY
    # OUTPUT like embedding_neardup below.)
    _ab = "abcdefghijklmnop"
    fuzzy_uniquify = lambda p, c: p.withColumn(  # noqa: E731
        "text", F.translate(F.col("text"), _ab, _ab[c:] + _ab[:c])
    )
    fuzzy_probes = {
        "fuzzy_pairs": lambda d: dd.fuzzy_pairs(d, "doc_id", "text"),
        "pagerank": lambda d: __import__(
            "dabstract_spark.operators.graph", fromlist=["pagerank"]
        ).pagerank(dd.fuzzy_pairs(d, "doc_id", "text")),
        # vocab grows with the bijection copies -> the model tables
        # (bigram/context counts) grow too, the honest LM-training shape
        "bigram_lm": lambda d: tx.bigram_coherence(d, "doc_id", "text"),
        # BPE training: the corpus-scale stage is the word count; the
        # 5-step merge loop runs on the (bijection-grown) vocab table
        "bpe_train": lambda d: tx.bpe_learn_merges(d, "text", n_merges=5),
        # count-min sketch build: shuffle bounded at depth·width rows
        # after map-side combine regardless of input size
        "cms_sketch": lambda d: __import__(
            "dabstract_spark.operators.sketches", fromlist=["cms_sketch"]
        ).cms_sketch(
            d.select("doc_id", F.explode(tx.tokens("text")).alias("tok")), "tok"
        ),
        # decontamination: train grows with the corpus, test fixed at the
        # base 20% — shingle-key semi/anti joins only
        "decontaminate": lambda d: dd.decontaminate(
            d.filter(F.col("doc_id") % 5 != 0),
            d.filter((F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 10_000_000)),
            "doc_id",
            "text",
            k=5,
        ),
        # quality-weighted Bernoulli keep: scan-fused filter, zero shuffle
        "importance_sample": lambda d: __import__(
            "dabstract_spark.operators.select", fromlist=["importance_sample"]
        ).importance_sample(
            d.select("doc_id", tx.quality_score_ppm("text").alias("q")),
            "q",
            rate_ppm=800000,
            key="doc_id",
        ),
        # global training-order shuffle: the bucket-offset rank — no
        # global window, only the 256-row offset table is broadcast
        "training_order": lambda d: sel.training_order(
            d, "doc_id", seed=7, n_shards=64
        ).select("doc_id", "pos", "shard"),
        # curriculum order: composite (stage, 256-hex-prefix) bucketing —
        # the offset table stays n_stages×256 rows at any corpus size,
        # no window task ever holds a whole stage
        "curriculum_order": lambda d: sel.curriculum_order(
            d.withColumn("stage", (F.col("doc_id") % 10).cast("int")),
            "stage",
            "doc_id",
            seed=7,
            n_shards=64,
        ).select("doc_id", "pos", "shard"),
        # temperature mixture: map-side reduction to ≤ n_sources rows,
        # one-row broadcast normalizer — flat by construction
        "temperature_mixture": lambda d: sel.temperature_mixture(
            d.withColumn("src", (F.col("doc_id") % 20).cast("string")),
            "src",
            budget=10**12,
        ),
        # Gopher rule battery: scan-fused HOFs, per-row cost only
        "gopher_rules": lambda d: tx.gopher_rules(d, "doc_id", "text"),
        # CCNet bucketing: bigram-LM staging + a window over DISTINCT
        # scores (ppm codomain) + a score-keyed assignment join
        "ccnet_buckets": lambda d: tx.perplexity_buckets(d, "doc_id", "text"),
        # mixture materialization: composite-bucket in-source rank +
        # two broadcast joins; output sized by the (fixed) budget
        "materialize_mixture": lambda d: sel.materialize_mixture(
            d.withColumn("src", (F.col("doc_id") % 20).cast("string")),
            "src",
            "doc_id",
            budget=10_000,
        ),
        # span-corruption manifest: one scan of the token-count column,
        # explode sized by the noise budget — linear
        "span_corruption": lambda d: __import__(
            "dabstract_spark.operators.packing", fromlist=["span_corruption_manifest"]
        ).span_corruption_manifest(
            d.select("doc_id", tx.bpe_token_count("text").alias("__tok")),
            "doc_id",
            "__tok",
        ),
        # within-doc line dedup: scan-fused HOF, per-row cost only
        "dedup_lines": lambda d: tx.dedup_lines_df(d, "doc_id", "text"),
        # per-group percentile calibration: 256 value buckets fold into
        # a broadcast offset table (n_groups×256) — no group-sized window
        # even with en dominating the lang column
        "grouped_rank": lambda d: sel.grouped_rank_ppm(
            d.select(
                "doc_id",
                (F.col("doc_id") % 3).cast("string").alias("grp"),
                (F.length("text") % 1000001).cast("bigint").alias("qp"),
            ),
            "grp",
            "qp",
            "doc_id",
        ),
        # length-bucketed batching: curriculum_order composite bucketing
        # + broadcast per-bucket offsets + pure arithmetic
        "length_batches": lambda d: __import__(
            "dabstract_spark.operators.packing", fromlist=["length_bucket_batches"]
        ).length_bucket_batches(
            d.select("doc_id", (F.length("text") % 512).alias("nt")),
            "doc_id",
            "nt",
            batch_tokens=4096,
        ),
        # corpus-overlap sketch: sources fixed at 20, docs per source
        # grow 16x; shuffle stays one row per source regardless
        "source_overlap": lambda d: dd.source_overlap(
            d.withColumn("src", (F.col("doc_id") % 20).cast("string")),
            "src",
            "doc_id",
            "text",
        ),
        # DSIR selection: bucket tables reduce map-side to <= n_buckets
        # rows; scoring is one explode + broadcast join + groupBy(doc)
        "dsir_select": lambda d: __import__(
            "dabstract_spark.operators.text", fromlist=["dsir_select"]
        ).dsir_select(
            d.filter(F.col("doc_id") % 5 != 0),
            __import__(
                "dabstract_spark.operators.text", fromlist=["dsir_logratio_table"]
            ).dsir_logratio_table(
                d.filter(F.col("doc_id") % 5 == 0),
                d.filter(F.col("doc_id") % 5 != 0),
                "text",
                n_buckets=1024,
            ),
            "doc_id",
            "text",
            k=50,
            n_buckets=1024,
        ),
        # memorization audit: window explode + vocabulary-sized gram-df
        # table joined back pre-aggregated — linear in tokens
        "ngram_dup": lambda d: dd.ngram_dup_stats(d, "doc_id", "text", k=8),
        # corpus datasheet: one staged projection -> one global agg +
        # one digest groupBy; output fixed at 7 rows at any size
        "corpus_datasheet": lambda d: __import__(
            "dabstract_spark.operators.quality", fromlist=["corpus_datasheet"]
        ).corpus_datasheet(
            d.withColumn("lang", (F.col("doc_id") % 5).cast("string")),
            "doc_id",
            "text",
            lang_col="lang",
        ),
        # Poisson bootstrap: one ×32 explode (output-sized) + one
        # map-side-combinable groupBy(b) — Σ-shaped by construction
        "bootstrap_means": lambda d: sel.bootstrap_means(
            d.select("doc_id", tx.quality_score_ppm("text").alias("qp")),
            "doc_id",
            "qp",
            n_boot=32,
            seed=7,
        ),
        # collocation mining: vocab grows with the bijection copies, so
        # the unigram/bigram count tables (the only shuffles) grow too —
        # the honest corpus-analytics shape; top-k is a TakeOrdered
        "collocations": lambda d: tx.collocations(
            d, "doc_id", "text", top_k=20, min_count=5
        ),
    }

    def _heavy_hitters(d):
        from dabstract_spark.functions.hashing import md5_unit

        tok_all = d.select("doc_id", F.explode(tx.tokens("text")).alias("token"))
        samp = d.filter(
            md5_unit(F.concat(F.lit("hh/"), F.col("doc_id").cast("string")), 7) < 0.25
        ).select(F.explode(tx.tokens("text")).alias("token"))
        cand = (
            samp.groupBy("token").count().orderBy(F.desc("count"), F.asc("token"))
            .limit(50).select("token")
        )
        return (
            tok_all.join(F.broadcast(cand), "token")
            .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("token")).limit(10)
        )

    probes["heavy_hitters"] = _heavy_hitters
    emb_probes = {
        # uncapped: the duplicate bomb is quadratic BY OUTPUT (16 copies
        # of every vector share a bucket -> 256x true pairs)...
        "embedding_neardup": lambda e: embedding_neardup_pairs(
            e, threshold=0.8, n_bits=8, dim=64, seed=0, exact=False
        ),
        # JL sign projection: per-component HOFs fused into the scan,
        # zero shuffle — linear by construction
        "jl_project": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["jl_project"]
        ).jl_project(e, "vec_id", "embedding", in_dim=64, out_dim=16),
        # r9: centroid-shift card — two scans to (label, dim) map-side
        # sums, everything after on the ≤ n_labels×dim table; linear
        "centroid_shift": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["centroid_shift"]
        ).centroid_shift(
            e.filter(F.col("vec_id") % 2 == 0),
            e.filter(F.col("vec_id") % 2 == 1),
            "label",
            "embedding",
        ),
        # ...and max_bucket is the production guard that bounds it
        "embedding_neardup_cap": lambda e: embedding_neardup_pairs(
            e, threshold=0.8, n_bits=8, dim=64, seed=0, exact=False, max_bucket=64
        ),
        "ivf_assign": lambda e: ivf_assign(e, ivf_centroids(e, n_centroids=8)).select(
            "vec_id", "centroid_id"
        ),
        "embedding_cov": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["embedding_covariance"]
        ).embedding_covariance(e, "vec_id", "embedding"),
        # per-cluster GEMM: identical copies make every cluster 16x ->
        # 256x pair work, absorbed by BLAS; K (ivf_refine) is the
        # production knob that caps cluster size
        "semantic_dedup_gemm": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["semantic_dedup"]
        ).semantic_dedup(e, ivf_centroids(e, n_centroids=8), threshold=0.4),
        # corpus scales, query set fixed at 5 — the serving shape
        "topk_quantized": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["topk_quantized"]
        ).topk_quantized(e, e.filter(F.col("vec_id") < 5), k=10),
        # IVF-PQ: training is one exploded pass per Lloyd iteration
        # (codes map-side vs literal books, update a 128-row agg), ADC
        # an m-rows-per-candidate sum over the probed lists — linear in
        # corpus, query set fixed at 5
        "ivf_pq_topk": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["ivf_pq_topk"]
        ).ivf_pq_topk(e, e.filter(F.col("vec_id") < 5), k=10, nprobe=2),
        # r12: the exact-re-rank refine path — ADC as above plus one
        # broadcast join of the |queries|*C candidate set back against
        # the corpus vectors; still linear in corpus, C fixed at 100
        "ivf_pq_rerank": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["ivf_pq_topk"]
        ).ivf_pq_topk(
            e, e.filter(F.col("vec_id") < 5), k=10, nprobe=4, rerank=100
        ),
        # rows x dim^2 integer sums + a dim^2-row shuffle; the power
        # iteration itself is driver-side on a 64x64 matrix
        "pca_projection": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["pca_power_projection"]
        ).pca_power_projection(e),
        # contrastive hard negatives: corpus grows, query set fixed at
        # the base 20 — label mismatch pushed into the broadcast join
        "hard_negatives": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["hard_negatives"]
        ).hard_negatives(e, e.filter(F.col("vec_id") < 20), k=3),
        # greedy k-center: 6 rounds of literal-center HOF fold +
        # TakeOrdered(1); per-round cost linear in corpus, k fixed
        "kcenter": lambda e: __import__(
            "dabstract_spark.operators.similarity", fromlist=["kcenter_select"]
        ).kcenter_select(e, k=6),
    }
    rel_probes = {
        "pricing_summary": lambda li: li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sq"),
            F.avg("l_extendedprice").alias("ap"),
            F.count(F.lit(1)).alias("n"),
        ),
    }

    def _clicks_views(e):
        return (
            e.filter(F.col("event_type") == "click"),
            e.filter(F.col("event_type") == "view").select("user_id", "ts", "value"),
        )

    ev_probes = {
        "sessionize": lambda e: ev.session_stats(e),
        "asof_join": lambda e: ev.asof_join(*_clicks_views(e), right_cols=("value",)),
        "range_join": lambda e: ev.range_join(
            *_clicks_views(e), before_sec=1800, after_sec=1800, right_cols=("value",)
        ),
        "multires_rollup": lambda e: ev.multires_rollup(e),
        # cohort retention: shuffles only (user, period) keys; rollup is
        # (cohort, offset)-sized — linear in the activity scan
        "cohort_retention": lambda e: ev.cohort_retention(e, "user_id", "ts"),
        # r10 Theil-Sen trend: one map-side (group, day) count is the
        # only data-sized work; the pairwise-slope table is
        # calendar-bounded (days² per group), CONSTANT as volume grows —
        # the probe should read flat-to-linear with no pair blowup
        "robust_trend": lambda e: ev.theil_sen_trend(e, "event_type", "ts"),
        # r10 md5 HLL: register shuffle <= 256 rows/group after map-side
        # combine at ANY size; cardinality grows with the user uniquify —
        # should read linear in the scan, flat in the shuffle
        "hll_distinct": lambda e: __import__(
            "dabstract_spark.operators.sketches", fromlist=["hll_distinct_card"]
        ).hll_distinct_card(e, "user_id", ("event_type",)),
        # r10 KMV overlap: one distinct (g, h) shuffle + the two-level
        # keep-k rank; everything after runs on the <= n_groups*k sketch
        "kmv_overlap": lambda e: (lambda sk_mod: sk_mod.kmv_intersect_card(
            sk_mod.kmv_partials(e, "user_id", ("event_type",), 256),
            "event_type",
            256,
        ))(__import__("dabstract_spark.operators.sketches", fromlist=["kmv_partials"])),
    }

    # median-of-REPS per cell: single-run numbers in a long sequential
    # session are polluted by whatever ran just before (GC pressure from
    # a heavy neighbor once inflated asof_join 16x from 2.3s to 13.4s)
    reps = int(os.environ.get("SCALE_PROBE_REPS", "3"))

    only = {
        s for s in os.environ.get("SCALE_PROBE_ONLY", "").split(",") if s
    }

    def probe_block(block, base, id_col, uniquify=None):
        for name, fn in block.items():
            if only and name not in only:
                continue
            row = []
            for copies in (1, 4, 16):
                d = scaled(base, id_col, copies, uniquify=uniquify)
                ts = []
                for _ in range(reps):
                    t0 = time.time()
                    noop(fn(d))
                    ts.append(time.time() - t0)
                row.append(statistics.median(ts))
            print(
                f"{name:<20} {row[0]:>8.2f} {row[1]:>8.2f} {row[2]:>8.2f}", flush=True
            )

    # adversarial single-hot-band corpus: 500 docs (then 2k, 8k) with
    # IDENTICAL text — every band bucket holds the whole corpus, the
    # worst case for pair generation (mass-duplicated boilerplate at
    # web scale). Uncapped the bucket emits C(n,2) pairs from one task
    # (quadratic BY CONSTRUCTION — the blow-up the cap exists to stop);
    # max_bucket=64 bounds every bucket's contribution to C(64,2).
    hot_base = docs.filter(F.col("doc_id") < 500).withColumn(
        "text",
        F.lit("the exact same boilerplate paragraph appearing on every page "),
    )
    hot_probes = {
        "minhash_hotband_uncap": lambda d: dd.minhash_candidate_pairs(
            d, "doc_id", "text"
        ),
        "minhash_hotband_cap64": lambda d: dd.minhash_candidate_pairs(
            d, "doc_id", "text", max_bucket=64
        ),
    }
    # adversarial ubiquitous-shingle corpus: every doc keeps its real
    # text but carries the SAME boilerplate phrase — its shingles have
    # df = corpus size, the stop-shingle case the max_df cap exists
    # for. The pre-count semi-join excludes them BEFORE any
    # collect_list, so no task ever materializes the corpus-sized
    # bucket and capped time stays flat/linear under the bomb.
    boiler_docs = docs.withColumn(
        "text",
        F.concat(F.lit("the exact same boilerplate phrase on every page "), F.col("text")),
    )
    boiler_probes = {
        "jaccard_hotshingle_cap100": lambda d: dd.jaccard_pairs(
            d, "doc_id", "text", k=2, threshold=0.12, max_df=100
        ),
        "containment_hotshingle_cap100": lambda d: dd.containment_pairs(
            d, "doc_id", "text", k=2, threshold_ppm=700000, max_df=100
        ),
    }
    # adversarial identical-prefix corpus (500 -> 8k docs): a shared tag
    # funnels EVERY doc into one prefix block — uncapped, that block's
    # self-join is C(n,2) levenshteins in one task (quadratic by
    # construction); max_block=64 bounds it to C(64,2) at any size.
    hot_prefix_base = docs.filter(F.col("doc_id") < 500).withColumn(
        "text", F.concat(F.lit("samesharedprefix "), F.col("text"))
    )
    hot_prefix_probes = {
        "fuzzy_hotprefix_uncap": lambda d: dd.fuzzy_pairs(d, "doc_id", "text"),
        "fuzzy_hotprefix_cap64": lambda d: dd.fuzzy_pairs(
            d, "doc_id", "text", max_block=64
        ),
    }

    # adversarial ONE-GIANT-GROUP rank: every lineitem row in a single
    # group (a dominant domain at 100 TB), 600k -> 9.6M rows. The naive
    # Window.partitionBy(group) rank holds the WHOLE group in one
    # task's sort — the straggler shape; the r7 two-level composite
    # (group, 256-way md5-prefix) rank bounds every window task at
    # ~1/256 of the group and merges <= 256·n survivors.
    from pyspark.sql import Window

    from dabstract_spark.functions.hashing import md5_order

    giant_base = lineitem.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("row_id"),
        F.lit("mega").alias("grp"),
    )

    def _rank_naive(d):
        w = Window.partitionBy("grp").orderBy(md5_order("row_id", 0), "row_id")
        return (
            d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 50)
            .drop("__rn")
        )

    # same adversarial one-giant-domain corpus through the r8 two-level
    # token-budget cumsum vs the old single per-group window form: a
    # budget over one dominant domain is the shape the rewrite de-skews
    def _budget_naive(d):
        w = (
            Window.partitionBy("grp")
            .orderBy(F.desc("tok"), F.asc("row_id"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return d.withColumn("cum", F.sum("tok").over(w)).filter(
            F.col("cum") <= 1_000_000
        )

    # same adversarial corpus through the r9 two-level exact grouped
    # quantiles vs the naive distinct-value-table cumsum (q194/q203's
    # old shape): continuous values make the (group, value) table
    # O(rows), so the naive per-group window sorts AND streams the
    # whole giant group's distinct values in one task — a cumsum emits
    # every row, no WindowGroupLimit pruning
    _QSPEC = [("p50", 1, 2), ("p95", 95, 100), ("p99", 99, 100)]

    def _pctl_counts(d):
        # large prime: the distinct-value table grows ~linearly with the
        # input (the continuous-latency case), so the naive window's one
        # task sorts and streams the WHOLE group's values at every scale
        return d.groupBy(
            "grp", (F.col("row_id") % 99_999_989).alias("v")
        ).agg(F.count(F.lit(1)).alias("w"))

    def _pctl_naive(d):
        c = _pctl_counts(d)
        w_cum = (
            Window.partitionBy("grp")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_tot = Window.partitionBy("grp")
        cum = c.select(
            "grp",
            "v",
            F.sum("w").over(w_cum).alias("cum"),
            F.sum("w").over(w_tot).alias("n"),
        )
        return cum.groupBy("grp").agg(
            *[
                F.min(
                    F.when(den * F.col("cum") >= num * F.col("n"), F.col("v"))
                ).alias(name)
                for name, num, den in _QSPEC
            ]
        )

    # full-output rank family (percent_rank/cume_dist/ntile): like the
    # cumsums, EVERY row is emitted — the old q156 shape serializes one
    # giant group's sort-and-stream into a single task
    def _orderstats_naive(d):
        w = Window.partitionBy("grp").orderBy("row_id")
        return d.select(
            "row_id",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("tile"),
        )

    giant_probes = {
        # r10 weighted sampler: the global top-n by exponential key
        # routes through the two-level budget machinery — one giant
        # implicit group by construction, the de-skew case it exists for
        "weighted_sample": lambda d: sel.weighted_sample_n(
            d.withColumn("w", (F.pmod(F.col("row_id"), F.lit(97)) + 1).cast("double")),
            1000,
            "w",
            seed=5,
        ),
        "rank_giantgroup_naive": _rank_naive,
        "rank_giantgroup_twolevel": lambda d: sel.sample_per_group(
            d, "grp", n=50, key="row_id"
        ),
        "orderstats_giantgroup_naive": _orderstats_naive,
        "orderstats_giantgroup_twolevel": lambda d: sel.grouped_order_stats(
            d.withColumn("v", F.col("row_id").cast("bigint")),
            "grp",
            "v",
            "row_id",
            ntiles=4,
            n_groups_hint=8,
        ),
        "pctl_giantgroup_naive": _pctl_naive,
        "pctl_giantgroup_twolevel": lambda d: sel.grouped_weighted_quantiles(
            _pctl_counts(d), "grp", "v", "w", _QSPEC, n_groups_hint=8
        ),
        "budget_giantdom_naive": lambda d: _budget_naive(
            d.withColumn("tok", (F.col("row_id") % 997).cast("bigint"))
        ),
        "budget_giantdom_twolevel": lambda d: sel.token_budget_per_group(
            d.withColumn("tok", (F.col("row_id") % 997).cast("bigint")),
            "grp",
            "tok",
            [F.desc("tok"), F.asc("row_id")],
            budget=1_000_000,
            order_key=-F.col("tok"),
        ),
    }

    # modality dedup probes: the decode UDF is a fixed per-row cost (and
    # the image/WAV fixtures are tiny), so the SCALE question is the
    # post-decode miner shape — synthesize fingerprints/PCM JVM-side at
    # growing row counts and drive the same operators the queries use.
    from dabstract_spark.sources.readers import (
        ahash_neardup_pairs,
        audio_fingerprint_dedup,
        energy_segments,
    )

    # pseudo-aHash words: md5-derived 32-bit ints per image id — random
    # words model a diverse album (bucket sizes ~ n/65536 per band)
    def _ahash_base(d):
        w = lambda tag: F.conv(  # noqa: E731
            F.substring(F.md5(F.concat(F.lit(tag), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        return d.select(
            F.col("doc_id").alias("img_id"),
            w("w0:").alias("ahash_w0"),
            w("w1:").alias("ahash_w1"),
        )

    ahash_probes = {
        "ahash_neardup": lambda d: ahash_neardup_pairs(
            _ahash_base(d), "img_id", max_hamming=3
        ),
    }
    # adversarial all-identical album: every image shares one (w0, w1),
    # so all 4 band buckets hold the whole corpus — uncapped the join
    # emits C(n,2) pairs (quadratic BY CONSTRUCTION); max_bucket=64
    # bounds every bucket's contribution
    def _ahash_const(d):
        return d.select(
            F.col("doc_id").alias("img_id"),
            F.lit(123456789).cast("bigint").alias("ahash_w0"),
            F.lit(987654321).cast("bigint").alias("ahash_w1"),
        )

    hot_ahash_base = docs.filter(F.col("doc_id") < 500)
    hot_ahash_probes = {
        "ahash_hotbucket_uncap": lambda d: ahash_neardup_pairs(
            _ahash_const(d), "img_id", max_hamming=3, max_bucket=None
        ),
        "ahash_hotbucket_cap64": lambda d: ahash_neardup_pairs(
            _ahash_const(d), "img_id", max_hamming=3, max_bucket=64
        ),
    }

    # synthetic PCM: 2048 deterministic samples per recording (same
    # array shape decode_wav emits) — a 32-sample per-row varying head
    # (the only interpreted lambda) + a literal constant tail, so the
    # generator stays far cheaper than the probed operator's own
    # frame-energy fold
    def _pcm_base(d):
        return d.select(
            F.col("doc_id").cast("string").alias("fname"),
            F.expr(
                "concat("
                "transform(sequence(1, 32), i -> "
                "cast((pmod(doc_id * 2654435761 + i * 40503, 65536) - 32768)"
                " / 32768.0 as double)), "
                "array_repeat(cast(0.25 as double), 2016))"
            ).alias("__s"),
        )

    audio_probes = {
        "energy_segments": lambda d: energy_segments(
            _pcm_base(d), ["fname"], "__s", frame=32
        ),
        "audio_fingerprint": lambda d: audio_fingerprint_dedup(
            _pcm_base(d), ["fname"], "__s", frame=32
        ),
    }

    # pipeline-hygiene ops: IVM (delta agg + groups-sized join — both
    # sides grow with group cardinality, never with the base fact
    # table) and PSI (two scans reducing map-side to n_buckets rows)
    from dabstract_spark.operators.quality import maintain_rollup, psi_drift

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def _ivm(o):
        o = o.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
        )
        base = o.filter(F.col("o_orderkey") % 10 < 8)
        view = base.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("total").alias("sum_total")
        )
        delta = (
            o.filter(F.col("o_orderkey") % 10 >= 8)
            .withColumn("op", F.lit("insert"))
            .unionByName(
                base.filter(F.col("o_orderkey") % 13 == 0).withColumn(
                    "op", F.lit("delete")
                )
            )
            .select("op", "o_custkey", "total")
        )
        return maintain_rollup(view, delta, ["o_custkey"], ["total"])

    hygiene_probes = {
        "ivm_maintain_rollup": _ivm,
    }
    psi_probes = {
        "psi_drift": lambda e: psi_drift(
            e.filter(F.col("event_type") == "click"),
            e.filter(F.col("event_type") == "purchase"),
            "value",
            lo=0.0,
            hi=500.0,
            n_buckets=10,
        ),
    }

    # r6 additions: snapshot diff / shard manifest (digest-only join +
    # one groupBy — linear by construction) and the histogram sketch
    # (shuffle bounded at |groups|·bins rows regardless of input size)
    from dabstract_spark.operators.layout import shard_manifest, snapshot_diff
    from dabstract_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_sketch,
    )

    def _snapdiff(d):
        old = d.filter(F.col("doc_id") % 7 != 1)
        new = d.filter(F.col("doc_id") % 5 != 2).select(
            "doc_id",
            F.when(F.col("doc_id") % 11 == 3, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return (
            snapshot_diff(old, new, "doc_id", F.md5("text"))
            .groupBy("status")
            .count()
        )

    def _hist(e):
        vm = (
            (F.round(F.col("value"), 6).cast("decimal(18,6)") * F.lit(1000000))
            .cast("bigint")
            .alias("v")
        )
        partials = hist_sketch(e.select("event_type", vm), "v", ("event_type",))
        return hist_quantiles(
            hist_merge(partials, ("event_type",)), (50, 95, 99), ("event_type",)
        )

    layout_probes = {
        "snapshot_diff": _snapdiff,
        "shard_manifest": lambda d: shard_manifest(d, "doc_id", F.md5("text")),
    }
    hist_probes = {
        "hist_sketch_quantiles": _hist,
    }

    # r10 adversarial stop-word retrieval: every doc carries the query
    # term, so the score>0 "posting-list union" IS the corpus — the
    # case where bm25_topk's old tail (row_number over ONE constant-key
    # window, then filter(rank <= k)) LOOKS like a single-task
    # corpus-sized sort. MEASURED RESULT: near-parity (e.g. 4.8 vs 4.6 s
    # at 16x = 9.6M docs), because Spark 4's LimitPushDownThroughWindow
    # rule rewrites that literal rank filter into the same
    # TakeOrderedAndProject the explicit orderBy().limit(k) form plans —
    # verified by plan diff. The probe pair is kept as the REGRESSION
    # canary: if a future change defeats the rule (non-literal k, extra
    # projection between window and filter), the naive row diverges and
    # the explicit-form row does not.
    # short two-token docs on a lineitem-sized id space (600k -> 9.6M
    # rows at 16x): the scoring scan stays cheap, so the probe measures
    # the contested RANKING stage, not tokenization
    stop_docs = lineitem.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("doc_id")
    ).withColumn(
        "text",
        F.concat(F.lit("the w"), F.pmod(F.col("doc_id"), F.lit(1000)).cast("string")),
    )

    def _bm25_scores(d, k1=1.2, b=0.75):
        # the operator's scoring stage (stats broadcast + per-doc score),
        # shared by both probe variants so only the ranking tail differs
        staged = d.select(F.col("doc_id").alias("id"), tx.tokens("text").alias("__t"))
        dl = F.size("__t")
        stats = staged.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(dl).alias("__sumdl"),
            F.sum(F.array_contains("__t", "the").cast("long")).alias("__df0"),
        )
        scored = staged.crossJoin(F.broadcast(stats))
        avgdl = F.col("__sumdl").cast("double") / F.col("__n")
        tf = F.size(F.filter("__t", lambda x: x == F.lit("the"))).cast("double")
        dfc = F.col("__df0").cast("double")
        idf = F.log(F.lit(1.0) + (F.col("__n") - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
        score = idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / avgdl)
        )
        return scored.select("id", F.round(score, 4).alias("score")).filter(
            F.col("score") > 0.0
        )

    def _bm25_naive(d):
        from pyspark.sql import Window as W

        w = W.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("id"))
        return (
            _bm25_scores(d)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
        )

    bm25_probes = {
        "bm25_stopword_naive": _bm25_naive,
        "bm25_stopword_takeord": lambda d: tx.bm25_topk(
            d, "doc_id", "text", terms=["the"], k=10
        ),
    }

    print(
        f"{'probe':<20} {'1x':>8} {'4x':>8} {'16x':>8}"
        f"  (sec, median of {reps}; input rows scale 1:4:16)"
    )
    probe_block(hot_probes, hot_base, "doc_id")
    probe_block(boiler_probes, boiler_docs, "doc_id")
    probe_block(hot_prefix_probes, hot_prefix_base, "doc_id")
    probe_block(hot_ahash_probes, hot_ahash_base, "doc_id")
    probe_block(giant_probes, giant_base, "row_id")
    probe_block(ahash_probes, docs, "doc_id")
    # filter, NOT limit(2000): GlobalLimit collapses the scan to one
    # partition and serializes the interpreted HOF staging into a
    # single task (measured 70s/row vs seconds parallel)
    probe_block(audio_probes, docs.filter(F.col("doc_id") < 2000), "doc_id")
    probe_block(probes, docs, "doc_id")
    probe_block(fuzzy_probes, docs, "doc_id", uniquify=fuzzy_uniquify)
    probe_block(emb_probes, emb, "vec_id")
    probe_block(rel_probes, lineitem, "l_orderkey")
    # IVM scales with GROWING group cardinality (fresh customers per
    # copy) — the realistic shape: a wider view, not deeper groups
    probe_block(
        hygiene_probes,
        orders,
        "o_orderkey",
        uniquify=lambda p, c: p.withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(c * 1_000_000)
        ),
    )
    probe_block(psi_probes, events, "event_id")
    probe_block(layout_probes, docs, "doc_id")
    probe_block(hist_probes, events, "event_id")
    probe_block(bm25_probes, stop_docs, "doc_id")
    # events scale with GROWING user cardinality (each copy is a fresh
    # user population) — the realistic 100 TB shape: more users, not
    # deeper per-user history
    probe_block(
        ev_probes,
        events,
        "event_id",
        uniquify=lambda p, c: p.withColumn(
            "user_id", F.col("user_id") + F.lit(c * 1_000_000)
        ),
    )

    # streaming-sink MERGE growth (q260/q264 read side): the per-drain
    # micro-batch floor is documented, but the merge a caller runs over
    # an EVER-GROWING appended sink needed its own growth row. Drain
    # each twin once at this sf, then self-append the raw sink 1x/4x/
    # 16x — batch_id offsets per copy for the calibration partials
    # (later drains of the same groups), doc_id offsets for the dsir
    # scores (fresh documents) — and time ONLY the merge query.
    merge_names = {"calib_sink_merge", "dsir_sink_merge"}
    if not only or (only & merge_names):
        import tempfile

        from dabstract_spark.streaming import ops as sops

        tmp = tempfile.mkdtemp(prefix="sparkdab_probe_sink_")
        qsrc = sops.stream_events(spark, f"{sf_dir}/documents.parquet").select(
            "lang", tx.quality_score_ppm("text").alias("qp")
        )
        sops.calibration_stream(
            qsrc, "lang", "qp", f"{tmp}/calib", f"{tmp}/calib_ck"
        ).count()
        calib_sink = spark.read.parquet(f"{tmp}/calib")

        docs_src = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        target = docs_src.filter(F.col("source").isin("src0", "src1"))
        raw_static = docs_src.filter(~F.col("source").isin("src0", "src1"))
        table = tx.dsir_logratio_table(target, raw_static, "text", n_buckets=1024)
        dsrc = sops.stream_events(spark, f"{sf_dir}/documents.parquet").filter(
            ~F.col("source").isin("src0", "src1")
        )
        sops.dsir_score_stream(
            dsrc, table, "doc_id", "text", f"{tmp}/dsir", f"{tmp}/dsir_ck",
            n_buckets=1024,
        ).count()
        dsir_sink = spark.read.parquet(f"{tmp}/dsir")

        probe_block(
            {
                "calib_sink_merge": lambda d: d.dropDuplicates(
                    ["run_id", "batch_id", "lang", "bucket"]
                )
                .groupBy("lang", "bucket")
                .agg(F.sum("n").alias("n"))
            },
            calib_sink,
            "batch_id",
        )
        probe_block(
            {"dsir_sink_merge": lambda d: d.distinct()},
            dsir_sink,
            "doc_id",
        )

    # r8 corpus-analytics probes: raw parquet base (the hot-table cache
    # would both dwarf the scan cost AND defeat the ReusedExchange
    # sharing these plans rely on at scale); the alphabet bijection
    # grows the vocabulary honestly, so the keyness/OOV model tables
    # grow with the corpus like a real crawl's would
    from dabstract_spark.operators import textstats as ts
    from dabstract_spark.operators.planning import budget_allocation

    ts_base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    ts_probes = {
        "charclass": lambda d: ts.charclass_profile(d, "doc_id", "text"),
        "ngram_diversity": lambda d: ts.ngram_diversity(d, "lang", "text", 2),
        "keyness": lambda d: ts.keyness_terms(
            d, "source", "text", top_k=8, min_count=5
        ),
        "vocab_oov": lambda d: ts.vocab_oov(d, "lang", "text", k=500),
        "budget_alloc": lambda d: budget_allocation(
            d.select("source", tx.token_count("text").alias("nt")),
            "source",
            "nt",
            50_000,
            2,
        ),
        # r9: Gries-DP dispersion shares keyness' (group, term) shape —
        # vocab-sized shuffles, broadcast group shares, two-level top-k
        "term_dispersion": lambda d: ts.term_dispersion(
            d, "source", "text", top_k=15, min_count=10
        ),
        # r9: k-anonymity card — one combo-keyed map-side-combined count
        # + 3-row rollup; linear in scan
        "uniqueness_audit": lambda d: ts.uniqueness_audit(
            d.select(
                "lang",
                "source",
                F.least(F.lit(9), F.expr("length(text) div 64")).alias("lb"),
            ),
            ["lang", "source", "lb"],
        ),
        # r9: drift card — two map-side-combined n_bucket-row counts +
        # tiny joins; should be flat to scan cost at any size
        "histogram_drift": lambda d: ts.histogram_drift(
            d.filter(F.col("lang") == "en").select(
                F.least(F.lit(9), F.expr("length(text) div 64")).alias("lb")
            ),
            d.filter(F.col("lang") != "en").select(
                F.least(F.lit(9), F.expr("length(text) div 64")).alias("lb")
            ),
            "lb",
        ),
        # r9: balance card — one map-side-combined mixture count, then
        # everything on the n_groups-row table; flat to scan cost
        "balance_card": lambda d: ts.balance_card(
            d.select("lang", "source"), ["lang", "source"]
        ),
        # r9: Hamilton apportionment — same one-count shape as balance
        "apportion": lambda d: __import__(
            "dabstract_spark.operators.planning",
            fromlist=["proportional_allocation"],
        ).proportional_allocation(d, "source", 10_000),
        # r9: group-pair TF cosine — vocab-sized count shuffles + a
        # term-keyed self-join whose fan-out is bounded by n_groups²
        # (sources fixed at 20; the bijection copies grow the vocab)
        "group_cosine": lambda d: ts.group_term_cosine(
            d, "source", "text", min_count=2
        ),
        # r9: kappa card — scan-fused lang_id + one confusion-matrix-
        # sized count; flat to scan cost
        "agreement_kappa": lambda d: ts.agreement_card(
            d.select("lang", tx.lang_id("text").alias("p")), "lang", "p"
        ),
        # r9: Zipf OLS — vocab count + constant-bounded top-100 heap
        "zipf_fit": lambda d: ts.zipf_card(d, "text", top_n=100),
        # r9: robust MAD card — BOTH quantile passes through the
        # two-level machinery over a continuous value (text length:
        # distinct count ~ rows), collapsed table checkpointed so the
        # corpus is scanned ONCE (was 28 scans composed naively)
        "mad_outliers": lambda d: sel.grouped_mad_outliers(
            d.select("lang", F.length("text").alias("v")),
            "lang",
            "v",
            k=3,
            n_groups_hint=8,
        ),
        # r9: MI card — one (a, b) count, everything after on the
        # contingency-sized table; flat to scan cost
        "mutual_info": lambda d: ts.mutual_info_card(d, "lang", "source"),
        # r9: winsorize — the mad machinery + ONE n_groups-row band
        # join back to the original rows (full per-row output)
        "winsorize": lambda d: sel.winsorize_by_mad(
            d.select("doc_id", "lang", F.length("text").alias("v")),
            "lang",
            "v",
            k=3,
            n_groups_hint=8,
        ),
        # r9: burstiness — (doc, term) counts then a vocab-keyed rollup;
        # the bijection copies grow the vocabulary honestly
        "term_burstiness": lambda d: ts.term_burstiness(
            d, "doc_id", "text", top_k=15, min_count=10
        ),
        # r9: cross-source chunk-overlap matrix — one (group, chunk)
        # DISTINCT + digest-keyed self-join bounded by n_groups² per
        # digest (bijection copies grow the chunk vocabulary honestly)
        "source_overlap_matrix": lambda d: __import__(
            "dabstract_spark.operators.dedup", fromlist=["source_dup_matrix"]
        ).source_dup_matrix(
            tx.chunk_text(d, "doc_id", "text", window=16, stride=8).join(
                d.select("doc_id", "source"), "doc_id"
            ),
            "text",
            "source",
            key=F.col("chunk_md5"),
        ),
    }
    probe_block(ts_probes, ts_base, "doc_id", uniquify=fuzzy_uniquify)


if __name__ == "__main__":
    main()

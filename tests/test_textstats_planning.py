"""Corpus-analytics (textstats) and mixture-planning operators: exact
known-answer tests plus the water-filling fairness laws."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dabstract_spark.operators.planning import budget_allocation
from dabstract_spark.operators.textstats import (
    charclass_profile,
    keyness_terms,
    ngram_diversity,
    vocab_oov,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a", "Hello World 123 !!"),
            (2, "a", ""),
            (3, "b", "the cat sat on the mat the cat sat"),
            (4, "b", "alpha beta gamma alpha beta gamma"),
        ],
        "doc_id long, src string, text string",
    )


def test_charclass_profile_exact_ppm(spark):
    cc = {r.doc_id: r for r in charclass_profile(_docs(spark), "doc_id", "text").collect()}
    t = "Hello World 123 !!"
    n = len(t)
    letters = len(re.sub("[^A-Za-z]", "", t))
    digits = len(re.sub("[^0-9]", "", t))
    spaces = len(re.sub(r"[^\s]", "", t))
    assert cc[1].n_chars == n
    assert cc[1].letter_ppm == letters * 10**6 // n
    assert cc[1].digit_ppm == digits * 10**6 // n
    assert cc[1].space_ppm == spaces * 10**6 // n
    assert cc[1].other_ppm == (n - letters - digits - spaces) * 10**6 // n
    # total on empty text: all-zero row, no NULLs
    assert tuple(cc[2])[1:] == (0, 0, 0, 0, 0)


def test_ngram_diversity_bigram_ttr(spark):
    nd = {r.src: r for r in ngram_diversity(_docs(spark), "src", "text").collect()}
    # src b: doc3 has 9 tokens -> 8 bigrams (5 distinct: 'the cat',
    # 'cat sat', 'sat on', 'on the', 'the mat' + 'mat the' = 6 distinct;
    # recount: bigrams [the cat, cat sat, sat on, on the, the mat,
    # mat the, the cat, cat sat] -> distinct 6); doc4: 6 tokens -> 5
    # bigrams, 3 distinct (alpha beta, beta gamma, gamma alpha).
    assert nd["b"].total_ngrams == 13
    assert nd["b"].distinct_ngrams == 9
    assert nd["b"].ttr_ppm == 9 * 10**6 // 13
    # src a: doc1 tokens [hello, world, 123] -> 2 bigrams; doc2 none
    assert nd["a"].total_ngrams == 2 and nd["a"].distinct_ngrams == 2


def test_keyness_terms_lift_and_determinism(spark):
    kt = keyness_terms(_docs(spark), "src", "text", top_k=3, min_count=2)
    got = sorted((r.src, r.term, r.cnt, r.lift_ppm) for r in kt.collect())
    # only src b has terms with count >= 2; T_b = 15, T_rest = 3.
    # 'the': c=3, c_w=3 -> 3*(3+1)*1e6 div (15*(3-3+1)) = 800000
    # 'alpha' (and peers): c=2 -> 2*4e6 div (15*1) = 533333
    assert ("b", "the", 3, 800000) in got
    assert ("b", "alpha", 2, 533333) in got
    assert len([g for g in got if g[0] == "b"]) == 3
    # deterministic under repartition
    again = sorted(
        (r.src, r.term, r.cnt, r.lift_ppm)
        for r in keyness_terms(
            _docs(spark).repartition(7), "src", "text", top_k=3, min_count=2
        ).collect()
    )
    assert again == got


def test_vocab_oov_against_topk_vocab(spark):
    vo = {r.src: r for r in vocab_oov(_docs(spark), "src", "text", k=3).collect()}
    # global counts: the:3, alpha/beta/gamma/cat/sat:2, ... top-3 by
    # (count desc, term asc) = the, alpha, beta
    assert vo["a"].total_tokens == 3 and vo["a"].oov_tokens == 3
    assert vo["a"].oov_ppm == 1_000_000
    assert vo["b"].total_tokens == 15
    # in-vocab hits in b: the(3) + alpha(2) + beta(2) = 7 -> oov 8
    assert vo["b"].oov_tokens == 8
    assert vo["b"].oov_ppm == 8 * 10**6 // 15


def test_budget_allocation_waterfill_known_answer(spark):
    toks = spark.createDataFrame(
        [("w", 100), ("x", 50), ("y", 10), ("z", 5)], "g string, n int"
    )
    ba = {r.g: r for r in budget_allocation(toks, "g", "n", total_budget=60).collect()}
    # sorted caps asc: z5 y10 x50 w100; level at x = (60-15) div 2 = 22,
    # remainder 1 goes to x (first capped in sort order)
    assert {k: v.alloc_tokens for k, v in ba.items()} == {
        "w": 22, "x": 23, "y": 10, "z": 5,
    }
    assert ba["w"].capped == 1 and ba["z"].capped == 0
    assert ba["y"].epochs_ppm == 1_000_000 and ba["w"].epochs_ppm == 220_000
    # budget covers everything (with repeats): alloc = cap = n*repeat
    full = {
        r.g: r.alloc_tokens
        for r in budget_allocation(toks, "g", "n", 10**9, max_repeat=2).collect()
    }
    assert full == {"w": 200, "x": 100, "y": 20, "z": 10}
    # degenerate budgets
    zero = {r.g: r.alloc_tokens for r in budget_allocation(toks, "g", "n", 0).collect()}
    assert zero == {"w": 0, "x": 0, "y": 0, "z": 0}
    assert budget_allocation(
        spark.createDataFrame([], "g string, n int"), "g", "n", 100
    ).count() == 0


def test_budget_allocation_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([("a", 1)], "g string, n int")
    with pytest.raises(ValueError, match="total_budget"):
        budget_allocation(df, "g", "n", -1)
    with pytest.raises(ValueError, match="max_repeat"):
        budget_allocation(df, "g", "n", 10, max_repeat=0)


def test_stream_oov_equals_batch(spark, tmp_path):
    """oov_score_stream drained over a bounded backlog equals the batch
    per-doc scorer exactly (per-doc decisions vs a fixed vocabulary are
    batching-independent), and the drain releases its persisted vocab."""
    from dabstract_spark.operators.text import tokens
    from dabstract_spark.operators.textstats import vocab_top_k
    from dabstract_spark.session import load_table
    from dabstract_spark.streaming.ops import oov_score_stream, stream_events

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    vocab = vocab_top_k(docs, "text", k=50)
    batch = (
        docs.select(F.col("doc_id"), F.explode(tokens("text")).alias("term"))
        .join(
            F.broadcast(vocab.withColumn("__v", F.lit(1))), "term", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum(F.col("__v").isNull().cast("bigint")).alias("o"),
        )
    )
    want = sorted((r.doc_id, r.t, r.o) for r in batch.collect())
    src = stream_events(spark, f"{SF}/documents.parquet").select("doc_id", "text")
    got = oov_score_stream(
        src, vocab, "doc_id", "text", str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert sorted((r.doc_id, r.total_tokens, r.oov_tokens) for r in got.collect()) == want
    assert len(want) > 0


def test_canary_exposure_zero_hit_rows_survive(spark):
    from dabstract_spark.operators.textstats import canary_exposure

    df = spark.createDataFrame(
        [(1, "a table value x"), (2, "fast merge here"), (3, "table value again")],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, canary_exposure(
            df, "doc_id", "text", ["table value", "fast merge", "zzz qqq"]
        ).collect())
    )
    # zero-hit canary keeps its row (n_docs 0, no first doc)
    assert got == [
        ("fast merge", 1, 2), ("table value", 2, 1), ("zzz qqq", 0, None),
    ]
    import pytest

    with pytest.raises(ValueError, match="canary"):
        canary_exposure(df, "doc_id", "text", [])


def test_canary_exposure_total_on_empty_and_null_corpus(spark):
    """The zero-hit guarantee must hold on an EMPTY corpus (post-scrub
    audit) and NULL text must count as a miss, not poison the sums."""
    import pytest

    from dabstract_spark.operators.textstats import canary_exposure

    empty = spark.createDataFrame([], "doc_id long, text string")
    got = sorted(
        map(tuple, canary_exposure(empty, "doc_id", "text", ["a", "b"]).collect())
    )
    assert got == [("a", 0, None), ("b", 0, None)]
    nulls = spark.createDataFrame([(1, None), (2, "has a here")], "doc_id long, text string")
    got2 = {r.canary: (r.n_docs, r.first_doc_id) for r in canary_exposure(
        nulls, "doc_id", "text", ["a", "zz"]
    ).collect()}
    assert got2 == {"a": (1, 2), "zz": (0, None)}
    with pytest.raises(ValueError, match="duplicate"):
        canary_exposure(nulls, "doc_id", "text", ["a", "a"])


def test_token_budget_accepts_timestamp_order_key(spark):
    """'earliest docs first until the budget is spent' — a timestamp
    primary sort must work via the epoch-micros bucket key."""
    import datetime

    from pyspark.sql import Window

    from dabstract_spark.operators.select import token_budget_per_group

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + datetime.timedelta(seconds=i * 37 % 50), i, 10)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long, tok long")
    order = ["ts", "id"]
    w = (
        Window.partitionBy("g").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = sorted(
        (r.id, r.cum) for r in df.withColumn("cum", F.sum("tok").over(w))
        .filter(F.col("cum") <= 55).collect()
    )
    got = sorted(
        (r.id, r.cum_tokens)
        for r in token_budget_per_group(df, "g", "tok", order, 55).collect()
    )
    assert got == naive and len(got) == 5


def test_oov_scores_duplicate_vocab_does_not_fan_out(spark):
    """Regression (r9 ADVICE): a caller-supplied vocabulary with
    duplicate terms must not fan out the membership join — scores equal
    the deduplicated vocabulary's, on both the hinted-broadcast and the
    hint-less AQE join paths."""
    from dabstract_spark.operators.textstats import oov_scores

    docs = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "delta alpha")],
        "doc_id long, text string",
    )
    dup_vocab = spark.createDataFrame(
        [("alpha",), ("alpha",), ("beta",), ("beta",), ("beta",)],
        "term string",
    )
    for hint in (10, None):
        out = {
            r.doc_id: (r.total_tokens, r.oov_tokens, r.oov_ppm)
            for r in oov_scores(
                docs, "doc_id", "text", dup_vocab, vocab_size_hint=hint
            ).collect()
        }
        # doc 1: 4 tokens, 1 OOV (gamma); doc 2: 2 tokens, 1 OOV (delta)
        assert out == {1: (4, 1, 250_000), 2: (2, 1, 500_000)}, hint


def test_term_dispersion_concentrated_vs_background(spark):
    """A term living entirely in one group scores DP ≈ 1 − v_g (the
    Gries maximum); a term spread proportionally to group sizes scores
    ≈ 0. Exact-integer check against a hand-computed corpus."""
    from dabstract_spark.operators.textstats import term_dispersion

    # 2 groups, 10 tokens each (v_a = v_b = 500000 ppm exactly).
    # "zzz" occurs 4x, all in group a (concentrated).
    # "aaa" occurs 4x, 2 in each group (perfectly dispersed).
    rows = [
        ("a", "zzz zzz zzz zzz aaa aaa x1 x2 x3 x4"),
        ("b", "aaa aaa y1 y2 y3 y4 y5 y6 y7 y8"),
    ]
    df = spark.createDataFrame(rows, "grp string, text string")
    out = {
        r.term: r
        for r in term_dispersion(
            df, "grp", "text", top_k=50, min_count=1
        ).collect()
    }
    # concentrated: s_a = 10^6, s_b = 0 -> DP = (|1e6-5e5| + 5e5)/2 = 5e5
    assert out["zzz"].dp_ppm == 500_000
    assert out["zzz"].n_groups_present == 1
    # dispersed exactly with group shares -> DP = 0
    assert out["aaa"].dp_ppm == 0
    assert out["aaa"].n_groups_present == 2
    # ordering: most concentrated first
    top = term_dispersion(df, "grp", "text", top_k=1, min_count=4).collect()
    assert top[0].term == "zzz"


def test_term_dispersion_null_groups_excluded(spark):
    from dabstract_spark.operators.textstats import term_dispersion

    df = spark.createDataFrame(
        [("a", "w w w"), (None, "w q q q")], "grp string, text string"
    )
    out = {r.term: r for r in term_dispersion(df, "grp", "text", 10, 1).collect()}
    # NULL-group tokens never count: w is wholly in 'a' -> dp = 0 with
    # one group of total weight (v_a = 10^6)
    assert out["w"].total_cnt == 3
    assert "q" not in out  # only present in the NULL group


def test_histogram_drift_exact_tvd_and_missing_buckets(spark):
    from dabstract_spark.operators.textstats import histogram_drift

    a = spark.createDataFrame([(0,), (0,), (1,), (1,)], "b int")
    b = spark.createDataFrame([(0,), (2,), (2,), (2,)], "b int")
    rows = {r.b: r for r in histogram_drift(a, b, "b").collect()}
    assert set(rows) == {0, 1, 2}
    assert (rows[0].share_a_ppm, rows[0].share_b_ppm) == (500_000, 250_000)
    assert (rows[1].n_b, rows[1].share_b_ppm) == (0, 0)
    assert (rows[2].n_a, rows[2].share_a_ppm) == (0, 0)
    # TVD = (|5e5-2.5e5| + |5e5-0| + |0-7.5e5|)/2 = 75e4
    assert all(r.tvd_ppm == 750_000 for r in rows.values())


def test_histogram_drift_null_bucket_and_empty_side(spark):
    from dabstract_spark.operators.textstats import histogram_drift

    a = spark.createDataFrame([(None,), (1,)], "b int")
    b = spark.createDataFrame([(None,)], "b int").filter("b IS NOT NULL")
    rows = {r.b: r for r in histogram_drift(a, b, "b").collect()}
    # NULL bucket is a real bucket; empty B side -> all shares 0, TVD
    # = (5e5 + 5e5)/2 = 5e5 against the degenerate empty distribution
    assert set(rows) == {None, 1}
    assert rows[None].share_a_ppm == 500_000
    assert all(r.share_b_ppm == 0 for r in rows.values())
    assert all(r.tvd_ppm == 500_000 for r in rows.values())


def test_stream_drift_equals_batch_and_survives_replay(spark, tmp_path):
    """drift_monitor_stream drained over a bounded backlog equals the
    batch histogram_drift card exactly (additive counts), and a
    REPLAYED micro-batch append (at-least-once foreachBatch) is
    absorbed by the (run_id, batch_id, bucket) dedup."""
    from dabstract_spark.operators.textstats import histogram_drift
    from dabstract_spark.session import load_table
    from dabstract_spark.streaming.ops import drift_monitor_stream, stream_events

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents")
    bucket = F.least(F.lit(9), F.expr("n_chars div 64")).alias("lb")
    ref = (
        docs.filter(F.col("lang") == "en")
        .select(bucket)
        .groupBy("lb")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    want = sorted(
        (r.lb, r.n_a, r.n_b, r.share_a_ppm, r.share_b_ppm, r.tvd_ppm)
        for r in histogram_drift(
            docs.filter(F.col("lang") == "en").select(bucket),
            docs.filter(F.col("lang") != "en").select(bucket),
            "lb",
        ).collect()
    )
    src = (
        stream_events(spark, f"{SF}/documents.parquet")
        .filter(F.col("lang") != "en")
        .select(F.least(F.lit(9), F.expr("n_chars div 64")).alias("lb"))
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = drift_monitor_stream(src, ref, "lb", out, ckpt)
    got_rows = sorted(
        (r.lb, r.n_a, r.n_b, r.share_a_ppm, r.share_b_ppm, r.tvd_ppm)
        for r in got.collect()
    )
    assert got_rows == want and len(want) > 0

    # simulate an at-least-once replay: re-append one batch's partial
    # rows verbatim (same run_id/batch_id) — the dedup must absorb it
    sink = spark.read.parquet(out)
    one = sink.limit(1)
    one.write.mode("append").parquet(out)
    replayed = drift_monitor_stream(src.limit(0), ref, "lb", out, ckpt)
    # rebuild the read side directly: call again with an exhausted
    # stream (no new batches) — merged counts must be unchanged
    got2 = sorted(
        (r.lb, r.n_a, r.n_b, r.share_a_ppm, r.share_b_ppm, r.tvd_ppm)
        for r in replayed.collect()
    )
    assert got2 == want


def test_uniqueness_audit_known_answer_and_total_card(spark):
    """k-class counts on a hand-built table; every class row survives
    even when empty (the canary_exposure audit contract)."""
    from dabstract_spark.operators.textstats import uniqueness_audit

    # combos: (a,x) k=1; (b,x) k=3; (b,y) k=6  -> classes 1 / 2-4 / 5+
    rows = [("a", "x")] + [("b", "x")] * 3 + [("b", "y")] * 6
    df = spark.createDataFrame(rows, "u string, v string")
    out = {r.k_class: r for r in uniqueness_audit(df, ["u", "v"]).collect()}
    assert set(out) == {"1", "2-4", "5+"}
    assert (out["1"].n_combos, out["1"].n_rows) == (1, 1)
    assert (out["2-4"].n_combos, out["2-4"].n_rows) == (1, 3)
    assert (out["5+"].n_combos, out["5+"].n_rows) == (1, 6)
    assert out["1"].row_share_ppm == 100_000  # 1/10
    # all-unique corpus: the other classes still emit zero rows
    solo = spark.createDataFrame([("a",), ("b",)], "u string")
    card = {r.k_class: r for r in uniqueness_audit(solo, ["u"]).collect()}
    assert set(card) == {"1", "2-4", "5+"}
    assert card["1"].row_share_ppm == 1_000_000
    assert card["5+"].n_rows == 0 and card["5+"].row_share_ppm == 0
    # NULL quasi-values group together (two unlabeled rows = a crowd of 2)
    nulls = spark.createDataFrame([(None,), (None,)], "u string")
    nc = {r.k_class: r for r in uniqueness_audit(nulls, ["u"]).collect()}
    assert nc["2-4"].n_rows == 2 and nc["1"].n_rows == 0


def test_balance_card_known_answer_and_empty(spark):
    """Gini/entropy on a hand-built [1, 3] mixture; perfectly even
    mixture reads gini 0 / evenness 10⁶; empty corpus still emits one
    zero-filled card row (the datasheet contract)."""
    from decimal import ROUND_HALF_UP, Decimal
    from math import log

    from dabstract_spark.operators.textstats import balance_card

    def me6(x: float) -> int:
        # Spark round(double, 6) goes through the shortest decimal repr
        # (BigDecimal.valueOf), which Python's repr() mirrors
        return int(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
            * 1_000_000
        )

    rows = [("a",)] + [("b",)] * 3
    card = balance_card(
        spark.createDataFrame(rows, "g string"), ["g"]
    ).collect()[0]
    assert (card.n_groups, card.n_rows, card.top_share_ppm) == (2, 4, 750_000)
    # sorted sizes [1, 3]: (2·(1·1 + 2·3) − 3·4)·10⁶ div (2·4)
    assert card.gini_ppm == (2 * 7 - 3 * 4) * 10**6 // 8
    want_e = me6(0.25 * log(4.0)) + me6(0.75 * log(4.0 / 3.0))
    assert card.entropy_me6 == want_e
    assert card.entropy_norm_ppm == want_e * 10**6 // me6(log(2.0))

    even = balance_card(
        spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "g string"),
        ["g"],
    ).collect()[0]
    assert even.gini_ppm == 0
    assert even.entropy_norm_ppm == 1_000_000

    empty = balance_card(
        spark.createDataFrame([], "g string"), ["g"]
    ).collect()
    assert len(empty) == 1
    assert tuple(empty[0]) == (0, 0, 0, 0, 0, 0)


def test_group_term_cosine_known_answer(spark):
    """Hand-checkable dot/norms; disjoint-vocabulary pairs do not emit
    (cosine exactly 0); NULL groups excluded."""
    from dabstract_spark.operators.textstats import group_term_cosine

    df = spark.createDataFrame(
        [
            ("ga", "x x y"),
            ("gb", "x y y"),
            ("gc", "z z z"),
            (None, "x y z"),
        ],
        "g string, text string",
    )
    out = {
        (r.group_a, r.group_b): r
        for r in group_term_cosine(df, "g", "text").collect()
    }
    # ga=(x:2, y:1), gb=(x:1, y:2): dot 4, norms √5·√5 -> 0.8
    assert set(out) == {("ga", "gb")}
    assert out[("ga", "gb")].n_shared_terms == 2
    assert out[("ga", "gb")].cosine == 0.8
    # identical distributions -> cosine 1.0
    ident = spark.createDataFrame(
        [("p", "u v v"), ("q", "u u v v v v")], "g string, text string"
    )
    row = group_term_cosine(ident, "g", "text").collect()[0]
    assert row.cosine == 1.0


def test_agreement_kappa_known_answer(spark):
    """Classic 2×2 kappa: po=0.7, pe=0.5 -> kappa 0.4; NULL labels
    agree null-safely; constant-and-equal columns -> kappa NULL."""
    from dabstract_spark.operators.textstats import agreement_card

    rows = (
        [("a", "a")] * 20
        + [("a", "b")] * 5
        + [("b", "a")] * 10
        + [("b", "b")] * 15
    )
    card = agreement_card(
        spark.createDataFrame(rows, "gold string, pred string"), "gold", "pred"
    ).collect()[0]
    assert (card.n_rows, card.n_agree) == (50, 35)
    assert (card.po_ppm, card.pe_ppm) == (700_000, 500_000)
    assert card.kappa == 0.4

    nulls = spark.createDataFrame(
        [(None, None), ("a", "a"), ("a", None)], "gold string, pred string"
    )
    nc = agreement_card(nulls, "gold", "pred").collect()[0]
    assert nc.n_agree == 2  # (NULL, NULL) agrees

    const = spark.createDataFrame([("a", "a")] * 3, "gold string, pred string")
    cc = agreement_card(const, "gold", "pred").collect()[0]
    assert cc.kappa is None and cc.po_ppm == 1_000_000


def test_zipf_card_exact_two_point_fit(spark):
    """Counts (4, 2) at ranks (1, 2) sit EXACTLY on slope −1 in ln-ln
    space (4/2 == 2/1), so the fixed-point OLS reads slope −1.0,
    intercept ln(4), r² 1.0 bit-exactly; a 1-term corpus fits nothing."""
    from dabstract_spark.operators.textstats import zipf_card

    df = spark.createDataFrame([("aa aa aa aa bb bb",)], "text string")
    card = zipf_card(df, "text").collect()[0]
    assert card.n_terms == 2
    assert card.slope == -1.0
    assert card.intercept == 1.386294  # round(ln 4, 6)
    assert card.r2 == 1.0

    solo = zipf_card(
        spark.createDataFrame([("aa aa",)], "text string"), "text"
    ).collect()[0]
    assert solo.n_terms == 1
    assert solo.slope is None and solo.intercept is None and solo.r2 is None


def test_mad_outliers_known_answer_and_naive_window_equiv(spark):
    """Hand-built group: median/MAD boundary picks and the 3·MAD screen;
    then the two-level form must equal the naive per-group window
    cumsum on a many-distinct-values table (the q194 law, extended to
    the dev pass)."""
    from dabstract_spark.operators.select import grouped_mad_outliers

    rows = [("g", 1), ("g", 1), ("g", 2), ("g", 3), ("g", 100), ("g", None)]
    card = grouped_mad_outliers(
        spark.createDataFrame(rows, "g string, v int"), "g", "v", k=3
    ).collect()[0]
    # values [1,1,2,3,100]: median 2 (2·cum≥5 at v=2), devs [1,1,0,1,98]
    # -> MAD 1, outliers where dev > 3: the 100 row only
    assert (card.n_rows, card.median, card.mad) == (5, 2, 1)
    assert (card.n_outliers, card.outlier_ppm) == (1, 200_000)

    base = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 37) % 101).cast("int").alias("v"),
    )
    base.createOrReplaceTempView("__madbase")
    want = {
        (r.g, r.n_rows, r.median, r.mad, r.n_outliers, r.outlier_ppm)
        for r in spark.sql(
            """
            WITH cv AS (SELECT g, v, COUNT(*) AS w FROM __madbase
                        WHERE v IS NOT NULL GROUP BY 1, 2),
            c1 AS (SELECT g, v, w,
                          SUM(w) OVER (PARTITION BY g ORDER BY v) AS cw,
                          SUM(w) OVER (PARTITION BY g) AS n FROM cv),
            med AS (SELECT g, MIN(v) AS median FROM c1
                    WHERE 2 * cw >= n GROUP BY 1),
            cvm AS (SELECT cv.g, cv.v, cv.w, m.median,
                           abs(cv.v - m.median) AS dev
                    FROM cv JOIN med m ON cv.g = m.g),
            dv AS (SELECT g, dev, SUM(w) AS w FROM cvm GROUP BY 1, 2),
            c2 AS (SELECT g, dev, w,
                          SUM(w) OVER (PARTITION BY g ORDER BY dev) AS cw,
                          SUM(w) OVER (PARTITION BY g) AS n FROM dv),
            mad AS (SELECT g, MIN(dev) AS mad FROM c2
                    WHERE 2 * cw >= n GROUP BY 1)
            SELECT cvm.g, CAST(SUM(w) AS BIGINT) AS n_rows,
                   MAX(median) AS median, MAX(mad.mad) AS mad,
                   CAST(SUM(CASE WHEN dev > 3 * mad.mad THEN w ELSE 0 END)
                        AS BIGINT) AS n_outliers,
                   CAST(CAST(SUM(CASE WHEN dev > 3 * mad.mad THEN w
                                      ELSE 0 END) AS DECIMAL(38,0)) * 1000000
                        div CAST(greatest(SUM(w), 1) AS DECIMAL(38,0))
                        AS BIGINT) AS outlier_ppm
            FROM cvm JOIN mad ON cvm.g = mad.g GROUP BY cvm.g
            """
        ).collect()
    }
    got = {
        (r.g, r.n_rows, r.median, r.mad, r.n_outliers, r.outlier_ppm)
        for r in grouped_mad_outliers(
            base, "g", "v", k=3, n_groups_hint=8
        ).collect()
    }
    assert got == want and len(got) == 3


def test_uniqueness_stream_equals_batch_and_survives_replay(spark, tmp_path):
    """uniqueness_stream drained over a bounded backlog equals the batch
    uniqueness_audit card exactly (combo counts are additive even as a
    combo's k-class migrates across batches), and a replayed micro-batch
    append is absorbed by the (run_id, batch_id, combo) dedup."""
    from dabstract_spark.operators.textstats import uniqueness_audit
    from dabstract_spark.session import load_table
    from dabstract_spark.streaming.ops import stream_events, uniqueness_stream

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents")
    quasi = ["lang", "source", "lb"]
    proj = docs.select(
        "lang", "source", F.least(F.lit(9), F.expr("n_chars div 64")).alias("lb")
    )
    want = sorted(tuple(r) for r in uniqueness_audit(proj, quasi).collect())

    src = stream_events(spark, f"{SF}/documents.parquet").select(
        "lang", "source", F.least(F.lit(9), F.expr("n_chars div 64")).alias("lb")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = sorted(
        tuple(r) for r in uniqueness_stream(src, quasi, out, ckpt).collect()
    )
    assert got == want and len(want) == 3

    # at-least-once replay: re-append one batch partial verbatim
    spark.read.parquet(out).limit(1).write.mode("append").parquet(out)
    got2 = sorted(
        tuple(r)
        for r in uniqueness_stream(src.limit(0), quasi, out, ckpt).collect()
    )
    assert got2 == want


def test_balance_stream_equals_batch_and_survives_replay(spark, tmp_path):
    """balance_stream drained over a bounded backlog equals the batch
    balance_card exactly (mixture counts are additive), and a replayed
    micro-batch append is absorbed by the (run_id, batch_id, group)
    dedup."""
    from dabstract_spark.operators.textstats import balance_card
    from dabstract_spark.session import load_table
    from dabstract_spark.streaming.ops import balance_stream, stream_events

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents")
    want = [tuple(r) for r in balance_card(docs, ["lang", "source"]).collect()]

    src = stream_events(spark, f"{SF}/documents.parquet").select("lang", "source")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = [
        tuple(r)
        for r in balance_stream(src, ["lang", "source"], out, ckpt).collect()
    ]
    assert got == want and len(want) == 1

    spark.read.parquet(out).limit(1).write.mode("append").parquet(out)
    got2 = [
        tuple(r)
        for r in balance_stream(
            src.limit(0), ["lang", "source"], out, ckpt
        ).collect()
    ]
    assert got2 == want


def test_centroid_shift_known_answer_and_truncation(spark):
    """Orthogonal / identical centroids; the centroid coordinate is the
    TRUNCATING integral division (toward zero, the DuckDB // semantics),
    pinned on both a positive and a negative non-exact mean."""
    from dabstract_spark.operators.similarity import centroid_shift

    def emb(rows):
        return spark.createDataFrame(rows, "label int, embedding array<float>")

    a = emb([(0, [1.0, 0.0]), (1, [1.0, 0.0]), (1, [0.0, 0.0]), (1, [0.0, 0.0]),
             (2, [-1.0, 0.0]), (2, [0.0, 0.0]), (2, [0.0, 0.0])])
    b = emb([(0, [0.0, 1.0]), (1, [1.0, 0.0]), (2, [0.0, 0.0])])
    out = {r.label: r for r in centroid_shift(a, b, "label", "embedding").collect()}
    # label 0: orthogonal unit centroids
    assert out[0].cosine == 0.0 and out[0].l2 == 1.414214
    # label 1: mean_a = 1/3 -> 333333 µ (truncated), mean_b = 1.0
    assert out[1].cosine == 1.0 and out[1].l2 == 0.666667
    assert (out[1].n_a, out[1].n_b) == (3, 1)
    # label 2: mean_a = -1/3 -> -333333 µ (toward ZERO, not floor);
    # b centroid is the origin -> cosine undefined, l2 = 0.333333
    assert out[2].cosine is None and out[2].l2 == 0.333333

    same = centroid_shift(a, a, "label", "embedding").collect()
    assert all(r.l2 == 0.0 for r in same)
    assert all(r.cosine in (1.0, None) for r in same)


def test_mutual_info_known_answer(spark):
    """Perfectly dependent columns read MI = ln 2 = min-entropy (NMI
    10⁶); independent columns read MI 0; NULL labels count like
    values."""
    from dabstract_spark.operators.textstats import mutual_info_card

    dep = spark.createDataFrame(
        [("x", "x"), ("x", "x"), ("y", "y"), ("y", "y")], "a string, b string"
    )
    card = mutual_info_card(dep, "a", "b").collect()[0]
    assert card.n_rows == 4 and card.n_cells == 2
    # 2 cells × me6(0.5·ln 2) = 2·346574: the per-term fixed point
    # rounds UP at the 6th decimal, so the sum reads ln 2 + 1 µnat
    assert card.mi_me6 == card.h_a_me6 == card.h_b_me6 == 693148
    assert card.nmi_ppm == 1_000_000

    ind = spark.createDataFrame(
        [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")], "a string, b string"
    )
    icard = mutual_info_card(ind, "a", "b").collect()[0]
    assert icard.mi_me6 == 0 and icard.nmi_ppm == 0 and icard.n_cells == 4

    nulls = spark.createDataFrame(
        [(None, "u"), (None, "u"), ("y", "v"), ("y", "v")], "a string, b string"
    )
    ncard = mutual_info_card(nulls, "a", "b").collect()[0]
    assert ncard.mi_me6 == 693148  # NULL is a real class, fully dependent


def test_source_dup_matrix_exact_and_custom_key(spark):
    """Normalized-content digests shared across groups; containment
    denominator is the SMALLER side's distinct-digest count; a custom
    key column overrides the content digest."""
    from dabstract_spark.operators.dedup import source_dup_matrix

    df = spark.createDataFrame(
        [
            (1, "A", "Same Text"),
            (2, "A", "only a"),
            (3, "B", "same   text  "),
            (4, "C", "unique c"),
            (5, None, "same text"),
        ],
        "doc_id long, src string, text string",
    )
    out = source_dup_matrix(df, "text", "src").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b, r.n_shared) == ("A", "B", 1)
    assert r.overlap_ppm == 1_000_000  # B's 1 digest fully contained

    # a NULL-text row can never match in the join, so it must not
    # count in B's containment denominator either
    withnull = df.union(
        spark.createDataFrame([(6, "B", None)], "doc_id long, src string, text string")
    )
    rn = source_dup_matrix(withnull, "text", "src").collect()[0]
    assert rn.overlap_ppm == 1_000_000

    keyed = source_dup_matrix(
        df, "text", "src", key=F.length("text") % 2
    ).collect()
    # parity-of-length key: every group shares a key with some other
    assert all(row.n_shared >= 1 for row in keyed) and len(keyed) >= 1


def test_term_burstiness_known_answer(spark):
    """A term clumped into one doc reads VMR = (N·Σx²−c²)/(N·c) exactly;
    a perfectly spread once-per-doc term reads 0 (variance-free)."""
    from dabstract_spark.operators.textstats import term_burstiness

    df = spark.createDataFrame(
        [
            (1, "b b b b e"),
            (2, "e"),
            (3, "e"),
            (4, "e"),
        ],
        "doc_id long, text string",
    )
    out = {r.term: r for r in term_burstiness(df, "doc_id", "text", top_k=5, min_count=4).collect()}
    # b: x=[4], c=4, Σx²=16, N=4 -> (64-16)*1e6 // 16 = 3e6
    assert (out["b"].total_cnt, out["b"].n_docs) == (4, 1)
    assert out["b"].vmr_ppm == 3_000_000
    # e: once per doc -> zero variance
    assert (out["e"].total_cnt, out["e"].n_docs, out["e"].vmr_ppm) == (4, 4, 0)


def test_centroid_stream_equals_batch_and_survives_replay(spark, tmp_path):
    """centroid_shift_stream drained over a bounded backlog equals the
    batch centroid_shift card exactly (micro-unit sums are additive, so
    NO float crosses a batch boundary), and a replayed append is
    absorbed by the (run_id, batch_id, label, dim) dedup."""
    from dabstract_spark.operators.similarity import centroid_shift, centroid_sums
    from dabstract_spark.streaming.ops import centroid_shift_stream, stream_events

    SF = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ref_df = emb.filter(F.col("vec_id") % 2 == 0)
    inc_df = emb.filter(F.col("vec_id") % 2 == 1)
    want = sorted(
        tuple(r) for r in centroid_shift(ref_df, inc_df, "label", "embedding").collect()
    )
    ref = centroid_sums(ref_df, "label", "embedding")
    src = stream_events(spark, f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") % 2 == 1
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = sorted(
        tuple(r)
        for r in centroid_shift_stream(
            src, ref, "label", "embedding", out, ckpt
        ).collect()
    )
    assert got == want and len(want) > 0

    spark.read.parquet(out).limit(1).write.mode("append").parquet(out)
    got2 = sorted(
        tuple(r)
        for r in centroid_shift_stream(
            src.limit(0), ref, "label", "embedding", out, ckpt
        ).collect()
    )
    assert got2 == want


def test_cluster_purity_known_answer(spark):
    """Majority-label purity on a hand-built assignment; perfect
    clusters read purity = NMI = 10⁶."""
    from dabstract_spark.operators.textstats import cluster_purity

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "b")],
        "c int, l string",
    )
    card = cluster_purity(df, "c", "l").collect()[0]
    assert (card.n_rows, card.n_clusters, card.n_labels) == (5, 2, 2)
    assert card.purity_ppm == 4 * 10**6 // 5
    assert 0 < card.nmi_ppm < 1_000_000

    perfect = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "c int, l string"
    )
    p = cluster_purity(perfect, "c", "l").collect()[0]
    assert p.purity_ppm == 1_000_000 and p.nmi_ppm == 1_000_000


def test_agreement_stream_equals_batch_and_survives_replay(spark, tmp_path):
    """agreement_stream drained over a bounded backlog equals the batch
    agreement_card exactly (confusion counts are additive), and a
    replayed micro-batch append is absorbed by the (run_id, batch_id,
    gold, pred) dedup."""
    from dabstract_spark.operators.text import lang_id
    from dabstract_spark.operators.textstats import agreement_card
    from dabstract_spark.session import load_table
    from dabstract_spark.streaming.ops import agreement_stream, stream_events

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents")
    proj = docs.select("lang", lang_id("text").alias("p"))
    want = [tuple(r) for r in agreement_card(proj, "lang", "p").collect()]

    src = stream_events(spark, f"{SF}/documents.parquet").select(
        "lang", lang_id("text").alias("p")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = [
        tuple(r) for r in agreement_stream(src, "lang", "p", out, ckpt).collect()
    ]
    assert got == want and len(want) == 1

    spark.read.parquet(out).limit(1).write.mode("append").parquet(out)
    got2 = [
        tuple(r)
        for r in agreement_stream(src.limit(0), "lang", "p", out, ckpt).collect()
    ]
    assert got2 == want


def test_proportional_allocation_known_answer(spark):
    """Hamilton apportionment: exact quotas, largest-remainder award
    with the (rem desc, size desc, group) tie-break, Σalloc == n_total;
    n_total beyond the corpus flags overfill but still sums exactly."""
    from dabstract_spark.operators.planning import proportional_allocation

    rows = [("a",)] * 7 + [("b",)] * 2 + [("c",)] * 1
    df = spark.createDataFrame(rows, "g string")
    out = {r.g: r for r in proportional_allocation(df, "g", 5).collect()}
    # quotas 3.5 / 1.0 / 0.5 -> base 3/1/0, remainders 5/0/5 (mod 10);
    # one spare unit -> larger group wins the tie
    assert {k: v.alloc_rows for k, v in out.items()} == {"a": 4, "b": 1, "c": 0}
    assert sum(v.alloc_rows for v in out.values()) == 5
    assert out["a"].got_remainder == 1 and out["c"].got_remainder == 0
    assert all(v.overfill == 0 for v in out.values())
    assert out["a"].share_ppm == 700_000

    zero = proportional_allocation(df, "g", 0).collect()
    assert all(r.alloc_rows == 0 for r in zero)

    over = {r.g: r for r in proportional_allocation(df, "g", 25).collect()}
    assert sum(v.alloc_rows for v in over.values()) == 25
    assert over["c"].overfill == 1  # 2.5 rows asked of a 1-row group

    # weight-column mode + NULL group is a real group
    wdf = spark.createDataFrame(
        [("x", 3), (None, 1)], "g string, w int"
    )
    wout = {r.g: r for r in proportional_allocation(wdf, "g", 4, weight_col="w").collect()}
    assert wout["x"].alloc_rows == 3 and wout[None].alloc_rows == 1

    # an all-NULL-weight group apportions like a zero-weight group and
    # must NOT poison the exact-sum law for the others
    ndf = spark.createDataFrame(
        [("x", 3), ("x", 3), ("y", None)], "g string, w int"
    )
    nout = {
        r.g: r
        for r in proportional_allocation(ndf, "g", 3, weight_col="w").collect()
    }
    assert nout["x"].alloc_rows == 3 and nout["y"].alloc_rows == 0
    assert sum(v.alloc_rows for v in nout.values()) == 3


def test_proportional_allocation_null_group_tie_nulls_last(spark):
    """A NULL group is a real group, and because __rem is a pure
    function of the count, a NULL group with the SAME count as a
    non-NULL group ties on both (rem desc, c desc) award keys — the
    group-value tiebreak must then place NULL LAST (SQL's ASC default,
    what the DuckDB oracle does), so the non-NULL group wins the
    remainder unit on both engines."""
    from dabstract_spark.operators.planning import proportional_allocation

    df = spark.createDataFrame([("a",), (None,)], "g string")
    # counts 1/1, T=2, n_total=1: base 0/0, rem 1/1 — a perfect tie;
    # one spare unit must land on "a" (NULLS LAST), never the NULL group
    out = {r.g: r for r in proportional_allocation(df, "g", 1).collect()}
    assert out["a"].alloc_rows == 1 and out["a"].got_remainder == 1
    assert out[None].alloc_rows == 0 and out[None].got_remainder == 0
    assert sum(v.alloc_rows for v in out.values()) == 1

    # three-way tie: spares land on the first k non-NULL groups in
    # group order, the NULL group only after every non-NULL tie
    df3 = spark.createDataFrame([("a",), ("b",), (None,)], "g string")
    out3 = {r.g: r for r in proportional_allocation(df3, "g", 2).collect()}
    assert (out3["a"].alloc_rows, out3["b"].alloc_rows, out3[None].alloc_rows) == (1, 1, 0)


def test_centroid_stream_validates_ref_before_drain(spark, tmp_path):
    """A miswired ref_sums (not a centroid_sums() table) must raise
    BEFORE the stream drains — failing fast, not after an expensive
    side-effecting run has already appended partials to the sink."""
    import pytest

    from dabstract_spark.streaming.ops import centroid_shift_stream, stream_events

    SF = "/root/testdata/sf0.001"
    src = stream_events(spark, f"{SF}/embeddings.parquet")
    bad_ref = spark.createDataFrame([(1,)], "x int")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(ValueError, match="centroid_sums"):
        centroid_shift_stream(src, bad_ref, "label", "embedding", out, ckpt)
    # fail-fast means NO sink write and NO checkpoint were created
    import pathlib

    assert not pathlib.Path(out).exists()
    assert not pathlib.Path(ckpt).exists()


def test_dataset_source_dup_matrix_digest_kwarg(spark):
    """The Dataset facade forwards text_key as the text column and
    digest= as the operator's custom-key Column — the custom-key mode
    must be reachable from the facade (it used to be shadowed by a
    parameter also named 'key')."""
    from dabstract_spark.dataset import Dataset

    df = spark.createDataFrame(
        [
            (1, "A", "Same Text"),
            (2, "B", "same   text  "),
            (3, "C", "zz"),
        ],
        "doc_id long, src string, text string",
    )
    ds = Dataset(df, name="t")
    out = ds.source_dup_matrix("src", text_key="text").collect()
    assert len(out) == 1 and out[0].n_shared == 1

    keyed = ds.source_dup_matrix(
        "src", text_key="text", digest=F.length("text") % 2
    ).collect()
    # parity-of-length digest: "Same Text"(9)/"same   text  "(13) odd,
    # "zz"(2) even — A-B share, C shares with nobody
    assert {(r.group_a, r.group_b) for r in keyed} == {("A", "B")}

"""Bloom-filter sketch laws (operators/bloom.py): no false negatives,
merge == union, reserved-name guard, and the dedup pre-filter's
byte-identity with the plain exact anti-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dabstract_spark.operators.bloom import (
    bloom_merge,
    bloom_probe,
    bloom_sketch,
    dedup_against_bloom,
)


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_bloom_no_false_negatives_and_fp_rate_sane(spark):
    members = [f"member/{i}" for i in range(200)]
    others = [f"other/{i}" for i in range(500)]
    sk = bloom_sketch(_keys(spark, members), "k")
    probed = {
        r.k: r.possible_member
        for r in bloom_probe(sk, _keys(spark, members + others), "k").collect()
    }
    # Bloom law: every true member reports possible_member
    assert all(probed[m] for m in members)
    # 200 keys * 4 hashes in 65536 bits -> fill < 1.3%, fpp ~ (0.012)^4;
    # 500 disjoint probes should essentially never all-hit
    fps = sum(1 for o in others if probed[o])
    assert fps <= 2


def test_bloom_merge_is_union(spark):
    a, b = _keys(spark, ["x", "y"]), _keys(spark, ["y", "z"])
    merged = bloom_merge(bloom_sketch(a, "k").union(bloom_sketch(b, "k")))
    direct = bloom_sketch(_keys(spark, ["x", "y", "z"]), "k")
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in direct.collect()
    )


def test_bloom_probe_rejects_reserved_columns(spark):
    sk = bloom_sketch(_keys(spark, ["x"]), "k")
    bad = spark.createDataFrame([("x", 1)], "k string, __bloom_b0 int")
    with pytest.raises(ValueError, match="__bloom_b0"):
        bloom_probe(sk, bad, "k")


def test_bloom_probe_preserves_duplicate_probe_rows(spark):
    """Duplicate probe rows keep their multiplicity — the map-side
    broadcast-join shape never groups the probe side."""
    sk = bloom_sketch(_keys(spark, ["x"]), "k")
    probes = _keys(spark, ["x", "x", "y"])
    rows = bloom_probe(sk, probes, "k").collect()
    assert sorted((r.k, r.possible_member) for r in rows) == [
        ("x", True),
        ("x", True),
        ("y", False),
    ]


def test_dedup_against_bloom_equals_exact_anti_join(spark):
    """The headline law: the bloom pre-filtered incremental dedup is
    byte-identical to the plain exact anti-join — false positives only
    cost a redundant exact check, false negatives don't exist."""
    seen = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)], "doc_id long, text string"
    )
    # 30 genuinely new + 20 exact dupes of seen content (ids offset)
    new = spark.createDataFrame(
        [(100 + i, f"fresh doc {i}") for i in range(30)]
        + [(200 + i, f"doc number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    got = sorted(r.doc_id for r in dedup_against_bloom(new, seen, "doc_id", "text").collect())
    from dabstract_spark.operators.dedup import dedup_against

    want = sorted(r.doc_id for r in dedup_against(new, seen, "doc_id", "text").collect())
    assert got == want == [100 + i for i in range(30)]


def test_bloom_probe_broadcasts_sketch(spark):
    """The set-bits side is <= m_bits rows by construction — probing
    must plan a broadcast join, not shuffle the probe side."""
    sk = bloom_sketch(_keys(spark, ["a", "b"]), "k")
    out = bloom_probe(sk, _keys(spark, ["a", "c"]), "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _micro(x: float) -> int:
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP) * 1_000_000
    )


def test_hll_card_known_registers(spark):
    """Card math on hand-built register tables: all-256-registers-at-M=1
    exercises the raw-estimate branch with an exactly computable
    harmonic sum (2^57); a sparse table exercises the linear-counting
    correction m·ln(m/V)."""
    import math

    from dabstract_spark.operators.sketches import _HLL_ALPHA_M2_SCALED, hll_card

    full = spark.createDataFrame(
        [("g", b, 1) for b in range(256)], "g string, bucket int, M int"
    )
    row = hll_card(full, ("g",)).collect()[0]
    assert (row.v_zero, row.s_scaled) == (0, 256 * 2**49)
    assert row.estimate_micro == _micro(_HLL_ALPHA_M2_SCALED / float(2**57))

    sparse = spark.createDataFrame(
        [("g", b, 1) for b in range(100)], "g string, bucket int, M int"
    )
    row = hll_card(sparse, ("g",)).collect()[0]
    assert (row.v_zero, row.s_scaled) == (156, 100 * 2**49 + 156 * 2**50)
    assert row.estimate_micro == _micro(256.0 * math.log(256.0 / 156.0))


def test_hll_estimate_accuracy_and_merge_idempotence(spark):
    """End-to-end estimate within 3 standard errors (1.04/√256 ≈ 6.5%)
    of the exact distinct on a 5k-key corpus; merging a register table
    with ITSELF (and with an arbitrary re-partitioning of the inputs)
    changes nothing — the max-merge law streaming replay safety rests
    on."""
    from dabstract_spark.operators.sketches import (
        hll_card,
        hll_distinct_card,
        hll_merge,
        hll_partials,
    )

    n = 5000
    df = spark.range(20000).select(
        (F.col("id") % n).cast("string").alias("k")
    )
    est = hll_distinct_card(df, "k").collect()[0].estimate_micro / 1e6
    assert abs(est - n) / n < 0.20

    p = hll_partials(df, "k")
    doubled = hll_merge(p.unionByName(p))
    assert sorted(map(tuple, doubled.collect())) == sorted(
        map(tuple, p.collect())
    )
    # split the corpus arbitrarily, sketch each half, merge -> same card
    halves = hll_merge(
        hll_partials(df.filter(F.col("k").cast("long") % 2 == 0), "k").unionByName(
            hll_partials(df.filter(F.col("k").cast("long") % 2 == 1), "k")
        )
    )
    assert (
        hll_card(halves).collect()[0].estimate_micro
        == hll_card(p).collect()[0].estimate_micro
    )


def test_hll_stream_equals_batch_and_survives_replay(spark, tmp_path):
    """hll_stream drained over a bounded backlog equals the batch card
    EXACTLY (register max-merge), and a replayed partial append changes
    nothing — idempotence needs no dedup markers."""
    from dabstract_spark.operators.sketches import hll_distinct_card
    from dabstract_spark.streaming.ops import hll_stream, stream_events

    SF = "/root/testdata/sf0.001"
    from dabstract_spark.session import load_table

    ev = load_table(spark, SF, "events")
    want = sorted(
        tuple(r)
        for r in hll_distinct_card(ev, "user_id", ("event_type",)).collect()
    )
    src = stream_events(spark, f"{SF}/events.parquet").select(
        "event_type", "user_id"
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    got = sorted(
        tuple(r)
        for r in hll_stream(src, "user_id", ["event_type"], out, ckpt).collect()
    )
    assert got == want and len(want) > 0

    spark.read.parquet(out).limit(5).write.mode("append").parquet(out)
    got2 = sorted(
        tuple(r)
        for r in hll_stream(
            src.limit(0), "user_id", ["event_type"], out, ckpt
        ).collect()
    )
    assert got2 == want


def test_kmv_exact_regime_and_intersection(spark):
    """Below k the sketch IS the distinct set: estimates are exact, and
    the theta intersection card reduces to the exact overlap (theta =
    2^48 makes est_intersection = n_common exactly)."""
    from dabstract_spark.operators.sketches import (
        kmv_estimate,
        kmv_intersect_card,
        kmv_partials,
    )

    rows = (
        [("a", i) for i in range(30)]
        + [("b", i) for i in range(20, 50)]
        + [("b", 25)]  # duplicate key: distinct semantics
        + [("c", 999)]
    )
    df = spark.createDataFrame(rows, "g string, k long")
    sk = kmv_partials(df, "k", ("g",), k=256)
    est = {r.g: (r.n_kept, r.est_distinct) for r in kmv_estimate(sk, ("g",), 256).collect()}
    assert est == {"a": (30, 30), "b": (30, 30), "c": (1, 1)}
    card = {
        (r.group_a, r.group_b): r
        for r in kmv_intersect_card(sk, "g", k=256).collect()
    }
    ab = card[("a", "b")]
    assert (ab.n_common_sample, ab.est_intersection) == (10, 10)
    assert (ab.est_a, ab.est_b) == (30, 30)
    assert ab.jaccard_ppm == 10 * 10**6 // 50
    assert ("a", "c") not in card and ("b", "c") not in card


def test_kmv_estimate_accuracy_and_merge_idempotence(spark):
    """Full-sketch estimate within 3/sqrt(k) of the truth on a 5k-key
    corpus; merge with itself and split-and-merge are no-ops (k-smallest
    of a union — the replay-safety law)."""
    from dabstract_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_partials,
    )

    n = 5000
    df = spark.range(20000).select((F.col("id") % n).alias("k"))
    sk = kmv_partials(df, "k", (), k=256)
    est = kmv_estimate(sk, (), 256).collect()[0]
    assert est.n_kept == 256
    assert abs(est.est_distinct - n) / n < 3 / (256 ** 0.5)

    doubled = kmv_merge(sk.unionByName(sk), (), 256)
    assert sorted(r.h for r in doubled.collect()) == sorted(r.h for r in sk.collect())
    halves = kmv_merge(
        kmv_partials(df.filter(F.col("k") % 2 == 0), "k", (), 256).unionByName(
            kmv_partials(df.filter(F.col("k") % 2 == 1), "k", (), 256)
        ),
        (),
        256,
    )
    assert sorted(r.h for r in halves.collect()) == sorted(r.h for r in sk.collect())

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

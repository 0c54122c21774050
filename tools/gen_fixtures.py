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


if __name__ == "__main__":
    main()


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

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

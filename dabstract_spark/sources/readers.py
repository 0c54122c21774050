"""Binary-column decoders: the multimodal story at 100 TB.

Media payloads live as opaque ``binary`` columns with typed metadata
columns next to them; decode/feature-extract steps are Arrow pandas UDFs
over those bytes (one Python roundtrip per batch, never per row).

- WAV (PCM) and NPY decode are REAL (stdlib wave / numpy against bytes —
  reference ``WavDatareader``/``NumpyDatareader``,
  /root/reference/dabstract/dataprocessor/processors/processors.py:16-90).
- Image decode / video frame-sampling dispatch on library availability:
  ``mode='real'`` runs PIL / cv2 when importable and raises a clearly
  marked NotImplementedError otherwise (this container ships neither);
  ``mode='fake'`` produces a deterministic md5-seeded array with the
  real schema/partitioning/batch shape, so the Spark-side plumbing is
  fully exercised and tested either way.
"""

from __future__ import annotations

import hashlib
import importlib.util
import io
import struct
import wave

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def _has_pil() -> bool:
    return importlib.util.find_spec("PIL") is not None


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_to_gray(raw: bytes) -> list[list[int]]:
    """Minimal stdlib-only PNG decoder -> H×W grayscale (0-255 ints).

    Exists so ``decode_image(mode='png')`` gives the REAL-container
    image path a hermetic positive branch this container can run (the
    PIL branch stays skip-guarded where the lib is absent). Supports
    the common still-image profile: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced,
    all five scanline filters (None/Sub/Up/Average/Paeth). RGB(A) maps
    to luma with PIL's integer ITU-R 601-2 convert('L') formula
    ``(R*299 + G*587 + B*114) // 1000``. Pure Python per pixel — a
    correctness codec for small assets and tests, not the production
    throughput path (that is the PIL/cv2 branch where available)."""
    import zlib

    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    palette: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = bytes(data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("not a PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG profile (depth={depth}, color={color}, "
            f"interlace={interlace}); the stdlib branch handles 8-bit "
            "non-interlaced gray/RGB/palette/alpha"
        )
    if color == 3 and palette is None:
        raise ValueError("palette PNG without PLTE chunk")
    if w <= 0 or h <= 0:
        raise ValueError(f"unsupported PNG profile (empty image {w}x{h})")
    stream = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(stream) < h * (stride + 1):
        raise ValueError("truncated PNG pixel stream")
    prev = bytearray(stride)
    rows: list[list[int]] = []
    for y in range(h):
        off = y * (stride + 1)
        ftype = stream[off]
        line = bytearray(stream[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = line
        row = []
        for x in range(w):
            px = line[x * channels : (x + 1) * channels]
            if color == 3:
                idx = px[0] * 3
                if idx + 3 > len(palette):
                    raise ValueError(
                        f"palette index {px[0]} out of range for PLTE of "
                        f"{len(palette) // 3} entries"
                    )
                r, g, b = palette[idx], palette[idx + 1], palette[idx + 2]
                row.append((r * 299 + g * 587 + b * 114) // 1000)
            elif channels >= 3:
                row.append((px[0] * 299 + px[1] * 587 + px[2] * 114) // 1000)
            else:
                row.append(px[0])
        rows.append(row)
    return rows


def _has_cv2() -> bool:
    return importlib.util.find_spec("cv2") is not None


def _wav_arrays(
    raw: bytes, start: int | None = None, length: int | None = None
) -> tuple[np.ndarray, int]:
    """bytes -> (float64 samples in [-1, 1), fs). PCM16/8/32 mono or
    multi-channel (channels interleaved -> first channel, matching the
    reference's select_channel=0 common case).

    ``start``/``length`` are a RANGED read (reference
    ``WavDatareader(read_range)``, processors.py:23-47): only the
    requested frames are decoded — setpos + readframes(count), not
    decode-all-then-slice."""
    with wave.open(io.BytesIO(raw), "rb") as w:
        fs = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        ch = w.getnchannels()
        if start is not None or length is not None:
            lo = min(start or 0, n)
            count = n - lo if length is None else max(0, min(length, n - lo))
            w.setpos(lo)
            frames = w.readframes(count)
        else:
            frames = w.readframes(n)
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    elif width == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {width}")
    if ch > 1:
        arr = arr[::ch]
    return arr, fs


def decode_wav(col: Column | str, read_start: int | None = None, read_length: int | None = None) -> Column:
    """binary WAV -> array<double> samples (reference WavDatareader,
    processors.py:16-68). ``read_start``/``read_length`` are the
    reference's read_range PUSHED INTO the decode: only the requested
    frames are parsed (setpos + readframes), so a short window over a
    long recording costs O(window), not O(file)."""
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("array<double>")
    def wav_udf(s):
        import pandas as pd

        out = []
        for raw in s:
            arr, _ = _wav_arrays(bytes(raw), start=read_start, length=read_length)
            out.append(arr)
        return pd.Series(out)

    return wav_udf(c)


def wav_info(col: Column | str) -> Column:
    """binary WAV -> struct(fs, n_samples, time_step) — the header probe
    of reference get_dir_info (helpers.py:341-350) as typed metadata
    columns instead of an info side-channel."""
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("struct<fs: int, n_samples: bigint, time_step: double>")
    def info_udf(s):
        import pandas as pd

        rows = []
        for raw in s:
            with wave.open(io.BytesIO(bytes(raw)), "rb") as w:
                fs = w.getframerate()
                n = w.getnframes()
            rows.append({"fs": fs, "n_samples": n, "time_step": 1.0 / fs})
        return pd.DataFrame(rows)

    return info_udf(c)


def decode_npy(col: Column | str) -> Column:
    """binary .npy -> array<double> (reference NumpyDatareader,
    processors.py:71-90; ranged reads become array slices downstream)."""
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("array<double>")
    def npy_udf(s):
        import pandas as pd

        out = []
        for raw in s:
            arr = np.load(io.BytesIO(bytes(raw)), allow_pickle=False)
            out.append(np.asarray(arr, dtype=np.float64).ravel())
        return pd.Series(out)

    return npy_udf(c)


def decode_image(col: Column | str, height: int = 8, width: int = 8, mode: str = "real") -> Column:
    """binary image -> array<array<double>> (grayscale H×W).

    ``mode='real'`` needs an image library the container doesn't ship —
    it raises NotImplementedError at plan-BUILD time (clearly marked
    stub). ``mode='png'`` decodes genuine PNG bytes with the vendored
    stdlib-only decoder (``_png_to_gray``: zlib inflate + all five
    filter reconstructions + ITU-R 601-2 luma), then nearest-neighbor
    resizes to the declared shape — the hermetic REAL-container branch
    this container can actually run and test. ``mode='fake'`` yields a
    deterministic md5-seeded matrix of the declared shape: schema,
    Arrow batch shape and partitioning are the real plumbing, only the
    codec is substituted."""
    if mode == "real" and not _has_pil():
        raise NotImplementedError(
            "image decoding requires PIL (not in this container); "
            "use mode='png' for real PNG bytes via the stdlib decoder, "
            "or mode='fake' for deterministic plumbing tests"
        )
    if mode not in ("real", "png", "fake"):
        raise ValueError(f"unknown decode_image mode '{mode}'")
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("array<array<double>>")
    def img_udf(s):
        import pandas as pd

        out = []
        for raw in s:
            if mode == "real":
                from PIL import Image

                img = Image.open(io.BytesIO(bytes(raw))).convert("L").resize((width, height))
                out.append(np.asarray(img, dtype=np.float64) / 255.0)
            elif mode == "png":
                rows = _png_to_gray(bytes(raw))
                sh, sw = len(rows), len(rows[0])
                # nearest-neighbor to the declared shape (documented —
                # the PIL branch resamples bicubic), then the same
                # /255.0 normalization as the real branch
                out.append(
                    np.array(
                        [
                            [
                                rows[i * sh // height][j * sw // width] / 255.0
                                for j in range(width)
                            ]
                            for i in range(height)
                        ]
                    )
                )
            else:
                # md5-derived pixels (NOT a PRNG): every value is a pure
                # function of the bytes + coordinates, so the fake-decode
                # path is reproducible in SQL and the full binary→Arrow→
                # nested-array plumbing can be ORACLE-checked end to end
                # (q185), not just unit-tested for determinism
                seed = hashlib.md5(bytes(raw).hex().encode()).hexdigest()
                out.append(
                    np.array(
                        [
                            [_fake_pixel(seed, i, j) for j in range(width)]
                            for i in range(height)
                        ]
                    )
                )
        return pd.Series(out)

    return img_udf(c)


def _fake_pixel(seed_hex: str, *coords: int) -> float:
    """Deterministic engine-portable pseudo-pixel in [0,1): the first 8
    hex chars of md5('seed:coord:coord...') / 2^32, rounded to 6."""
    h = hashlib.md5((seed_hex + "".join(f":{c}" for c in coords)).encode()).hexdigest()
    return round(int(h[:8], 16) / 2**32, 6)


def resize_image(
    col: Column | str,
    src_h: int,
    src_w: int,
    dst_h: int,
    dst_w: int,
) -> Column:
    """Nearest-neighbor resize of a decoded H×W grayscale matrix
    (``array<array<double>>``): ``dst[i][j] = src[floor(i*src_h/dst_h)]
    [floor(j*src_w/dst_w)]`` — the standard preprocessing resize before
    a vision encoder. Pure JVM (a gather over the decoded array; no
    UDF, no Python stage): the only Python in the image path stays the
    codec itself. The captured input must be a materialized column
    attribute (decode in a prior select), never an inlined expression —
    HOF lambdas re-evaluate captured expressions per element."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(0), F.lit(dst_h - 1)),
        lambda i: F.transform(
            F.sequence(F.lit(0), F.lit(dst_w - 1)),
            lambda j: F.element_at(
                F.element_at(c, F.floor(i * src_h / dst_h).cast("int") + 1),
                F.floor(j * src_w / dst_w).cast("int") + 1,
            ),
        ),
    )


def sample_video_frames(col: Column | str, n_frames: int = 4, height: int = 8, width: int = 8, mode: str = "real") -> Column:
    """binary video -> n_frames grayscale frames (uniform temporal
    sampling). Same stub contract as decode_image."""
    if mode == "real" and not _has_cv2():
        raise NotImplementedError(
            "video decoding requires cv2/ffmpeg (not in this container); "
            "use mode='fake' for deterministic plumbing tests"
        )
    if mode not in ("real", "fake"):
        raise ValueError(f"unknown sample_video_frames mode '{mode}'")
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("array<array<array<double>>>")
    def vid_udf(s):
        import pandas as pd

        out = []
        for raw in s:
            if mode == "real":
                import os
                import tempfile

                import cv2

                # cv2 has no from-memory demuxer — spill to a worker-local
                # temp file (bytes are already on the executor; no shuffle)
                fd, tmp = tempfile.mkstemp(suffix=".bin")
                try:
                    with os.fdopen(fd, "wb") as fh:
                        fh.write(bytes(raw))
                    cap = cv2.VideoCapture(tmp)
                    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 1
                    idxs = np.linspace(0, total - 1, n_frames).astype(int)
                    frames = []
                    for i in idxs:
                        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
                        ok, frame = cap.read()
                        if not ok:
                            frames.append(np.zeros((height, width)))
                            continue
                        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                        frames.append(
                            cv2.resize(gray, (width, height)).astype(np.float64) / 255.0
                        )
                    cap.release()
                    out.append(np.stack(frames))
                finally:
                    os.unlink(tmp)
            else:
                # same md5-derived (SQL-reproducible) fake as decode_image,
                # with the frame index as the leading coordinate
                seed = hashlib.md5(bytes(raw).hex().encode()).hexdigest()
                out.append(
                    np.array(
                        [
                            [
                                [_fake_pixel(seed, f, i, j) for j in range(width)]
                                for i in range(height)
                            ]
                            for f in range(n_frames)
                        ]
                    )
                )
        return pd.Series(out)

    return vid_udf(c)


PNG_MAGIC_HEX = "89504E470D0A1A0A"


def image_metadata(col: Column | str) -> Column:
    """binary image -> struct(format, width, height, bit_depth,
    color_type) parsed ENTIRELY JVM-side from the header bytes — the
    multimodal-metadata pass needs no pixel decode and therefore no
    Python: substring/hex/conv expressions inside whole-stage codegen,
    which is exactly what you want when profiling 10^9 images.

    PNG is parsed for real (IHDR fixed offsets: width bytes 16-19 BE,
    height 20-23, bit depth 24, color type 25). Non-PNG payloads yield
    format=NULL and NULL fields — callers dispatch on the magic.
    """
    c = F.col(col) if isinstance(col, str) else col

    def be_int(start_1b: int, nbytes: int) -> Column:
        return F.conv(F.hex(F.substring(c, start_1b, nbytes)), 16, 10).cast("bigint")

    is_png = F.hex(F.substring(c, 1, 8)) == PNG_MAGIC_HEX
    return F.when(
        is_png,
        F.struct(
            F.lit("png").alias("format"),
            be_int(17, 4).cast("int").alias("width"),
            be_int(21, 4).cast("int").alias("height"),
            be_int(25, 1).cast("int").alias("bit_depth"),
            be_int(26, 1).cast("int").alias("color_type"),
        ),
    )


def with_ahash(df: DataFrame, matrix_col: str, out_prefix: str = "ahash") -> DataFrame:
    """Average-hash (aHash) of a decoded grayscale matrix, the classic
    perceptual image fingerprint: bit_i = pixel_i >= mean, packed as TWO
    32-bit words ``{prefix}_w0/w1`` (bit 63 of a single int64 would
    overflow the sign in one engine and wrap in the other).

    Exact integer arithmetic end to end so the hash is engine-portable:
    pixels become ppm ints, and the mean threshold ``px >= sum/N`` is
    evaluated as ``px*N >= sum`` — no float division, no summation-order
    sensitivity. By construction the hash is invariant under any
    constant brightness shift (every side of the comparison moves by
    the same amount), which is the property that makes aHash a
    *perceptual* near-dup key rather than a byte digest.

    Pure whole-stage-codegen HOFs over the (already decoded) matrix —
    the only Python in the image path stays the codec UDF."""
    d = (
        df.withColumn(
            "__pxi",
            F.expr(
                f"transform(flatten({matrix_col}),"
                " x -> CAST(round(x * 1000000) AS BIGINT))"
            ),
        )
        .withColumn("__n", F.size("__pxi").cast("bigint"))
        .withColumn("__s", F.expr("aggregate(__pxi, 0L, (a, x) -> a + x)"))
    )
    word = (
        "aggregate(transform(__pxi, (x, i) ->"
        " IF(x * __n >= __s AND i >= {lo} AND i < {hi},"
        " CAST(pow(2, i - {lo}) AS BIGINT), 0L)), 0L, (a, x) -> a + x)"
    )
    return (
        d.withColumn(f"{out_prefix}_w0", F.expr(word.format(lo=0, hi=32)))
        .withColumn(f"{out_prefix}_w1", F.expr(word.format(lo=32, hi=64)))
        .drop("__pxi", "__n", "__s")
    )


def ahash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    w0: str = "ahash_w0",
    w1: str = "ahash_w1",
    max_hamming: int = 3,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Hamming-LSH candidate pairs over aHash fingerprints: the 64 bits
    split into 4 bands of 16; two images sharing ANY band value become
    candidates, verified by exact popcount distance. Pigeonhole makes
    the banding EXHAUSTIVE for ``max_hamming <= 3`` (4 disjoint bands
    can absorb at most 3 bit errors without one band matching exactly)
    — with ``max_bucket=None`` (or no bucket over the cap) the output
    is the complete <= max_hamming pair set, not a sample — while the
    join only ever touches same-band buckets.

    ``max_bucket`` (default 64) caps any single band bucket with the
    md5-rank keep-set discipline every other pair miner here uses (a
    solid-black album at web scale would otherwise funnel into one
    bucket). Under the cap a hot bucket's dropped members can lose true
    pairs — the same capped-recall trade ``fuzzy_pairs`` documents —
    so exhaustiveness holds only when no bucket exceeds the cap."""
    if max_hamming > 3:
        raise ValueError(
            "4x16 banding is only exhaustive for max_hamming <= 3; "
            "raise the band count to widen the radius"
        )
    bands = df.select(
        F.col(id_col).alias("__id"),
        F.col(w0).alias("__w0"),
        F.col(w1).alias("__w1"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("b"),
                        F.expr(f"(({w}) div {1 << s}) % 65536").alias("v"),
                    )
                    for k, (w, s) in enumerate(
                        [(w0, 0), (w0, 16), (w1, 0), (w1, 16)]
                    )
                ]
            )
        ).alias("__band"),
    ).select("__id", "__w0", "__w1", "__band.b", "__band.v")
    if max_bucket is not None:
        keep = Window.partitionBy("b", "v").orderBy(F.md5(F.col("__id").cast("string")))
        bands = bands.withColumn("__rk", F.row_number().over(keep)).filter(
            F.col("__rk") <= max_bucket
        ).drop("__rk")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["b", "v"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (
                F.bit_count(F.expr("a.__w0 ^ b.__w0"))
                + F.bit_count(F.expr("a.__w1 ^ b.__w1"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand


def _with_frame_energies(df: DataFrame, pcm_col: str, frame: int) -> DataFrame:
    """Stage exact-integer per-frame energies (Σ pcm16² over
    non-overlapping ``frame``-sample windows, tail dropped) as an
    ``__energies`` array column — one recipe shared by the VAD
    segmenter and the audio fingerprint so the framing cannot drift.
    HOFs over the decoded array: no sample-level explode.

    The int16-recovery array is bound through ``bind_once`` before the
    per-frame fold: a staged ``__pcm`` column referenced from inside
    the frame lambda gets INLINED there by CollapseProject and
    re-evaluated once per FRAME (O(frames·samples) interpreted work per
    row — the same multiply-in-lambda trap source_overlap hit); the
    binding forces one evaluation per row no matter how many frames
    slice it."""
    from dabstract_spark.core import bind_once

    pcm = F.expr(f"transform({pcm_col}, x -> CAST(round(x * 32768) AS BIGINT))")
    energies = bind_once(
        pcm,
        lambda p: F.transform(
            F.sequence(F.lit(0), (F.size(p) / frame).cast("int") - 1),
            lambda i: F.aggregate(
                F.slice(p, i * frame + 1, frame),
                F.lit(0).cast("bigint"),
                lambda a, v: a + v * v,
            ),
        ),
    )
    # cheap early guard on the raw column (≥1 whole frame), so the
    # sequence upper bound is always ≥ 0 — no filter ever touches the
    # staged energies expression
    return df.filter(F.size(F.col(pcm_col)) >= frame).withColumn(
        "__energies", energies
    )


def energy_segments(
    df: DataFrame, name_cols: list[str], pcm_col: str, frame: int = 256
) -> DataFrame:
    """Energy-based activity segmentation over decoded PCM (the VAD-style
    front gate of an audio curation pipeline): non-overlapping frames of
    ``frame`` samples (tail dropped), per-frame energy as the EXACT
    integer Σ(pcm16²) (decode_wav yields v/32768, so ×32768 recovers the
    int16 losslessly), voiced = frames strictly above the recording's
    mean energy (``energy·n_frames > total`` — integer cross-multiply,
    no float threshold), and contiguous voiced runs folded into segments
    by gaps-and-islands. Returns (*name_cols, seg_id, start_frame,
    end_frame, n_frames).

    Scale shape: framing + energy are HOFs fused over the decoded array
    (no sample-level explode); only frame-level rows (samples/frame
    fewer) reach the shuffle, and every window partitions by the
    recording — the natural bounded unit."""
    d = _with_frame_energies(df, pcm_col, frame)
    e = d.select(*name_cols, F.posexplode("__energies").alias("frame", "energy"))
    st = e.groupBy(*name_cols).agg(
        F.sum("energy").alias("__tot"), F.count(F.lit(1)).alias("__n")
    )
    v = e.join(st, list(name_cols)).filter(
        F.col("energy") * F.col("__n") > F.col("__tot")
    )
    w = Window.partitionBy(*name_cols).orderBy("frame")
    isl = v.withColumn("__g", F.col("frame") - F.row_number().over(w))
    seg = isl.groupBy(*name_cols, "__g").agg(
        F.min("frame").cast("bigint").alias("start_frame"),
        (F.max("frame") + 1).cast("bigint").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
    )
    w2 = Window.partitionBy(*name_cols).orderBy("start_frame")
    return seg.withColumn("seg_id", F.row_number().over(w2).cast("int")).select(
        *name_cols, "seg_id", "start_frame", "end_frame", "n_frames"
    )


def audio_fingerprint_dedup(
    df: DataFrame, name_cols: list[str], pcm_col: str, frame: int = 256
) -> DataFrame:
    """Exact audio dedup by energy-profile fingerprint — the audio member
    of the modality-dedup family (text exact/minhash, image aHash):
    fingerprint = md5 of the comma-joined exact integer frame energies
    (shared ``_with_frame_energies`` staging with the VAD segmenter), so
    two recordings collide iff their full energy profiles match sample-
    exactly at the frame resolution. Returns one row per recording with
    its fingerprint, duplicate-group size, and a deterministic
    ``is_canonical`` keeper flag (min name per group — groupBy-min, no
    bucket collect). Shuffle carries 32-byte digests only."""
    d = _with_frame_energies(df, pcm_col, frame).select(
        *name_cols,
        F.md5(F.array_join(F.col("__energies").cast("array<string>"), ",")).alias(
            "fingerprint"
        ),
    )
    key = F.concat_ws("/", *[F.col(c) for c in name_cols])
    keyed = d.withColumn("__k", key)
    groups = keyed.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("group_size"), F.min("__k").alias("__keep")
    )
    return (
        keyed.join(groups, "fingerprint")
        .select(
            *name_cols,
            "fingerprint",
            "group_size",
            (F.col("__k") == F.col("__keep")).alias("is_canonical"),
        )
    )

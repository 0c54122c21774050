"""Positive-path twins for the REAL codec branches of the multimodal
decoders (``sources/readers.py`` dispatch).

This container ships neither PIL nor cv2, so ``mode='real'`` raises a
documented plan-build NotImplementedError here and every oracle check
runs the md5-fake codec (real plumbing, substituted codec). These tests
give the real branches a TESTED positive path on machines that do have
the libraries: they skip-if-absent, synthesize a genuine PNG / AVI
in-memory, run the exact UDF the production path builds, and assert
decoded values — so a signature or normalization regression in the real
branch can't hide behind the fake-codec tests.
"""

from __future__ import annotations

import numpy as np
import pytest

from dabstract_spark.sources.readers import (
    _has_cv2,
    _has_pil,
    decode_image,
    sample_video_frames,
)


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed in this container")
def test_real_image_decode_solid_gray(spark):
    """A solid-gray 16x12 PNG decodes through mode='real' to an H×W
    grayscale matrix of exactly gray/255 — pins the convert('L') →
    resize → /255.0 normalization contract of the real branch."""
    import io

    from PIL import Image

    gray = 120
    buf = io.BytesIO()
    Image.new("RGB", (16, 12), (gray, gray, gray)).save(buf, format="PNG")
    df = spark.createDataFrame([(bytearray(buf.getvalue()),)], "payload binary")
    mat = (
        df.select(decode_image("payload", height=4, width=6, mode="real").alias("m"))
        .collect()[0]
        .m
    )
    arr = np.array(mat)
    assert arr.shape == (4, 6)
    np.testing.assert_allclose(arr, gray / 255.0, atol=1e-9)


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed in this container")
def test_real_image_decode_gradient_orientation(spark):
    """A top-black / bottom-white PNG must keep its vertical orientation
    through the real decode+resize: row 0 darker than the last row
    (catches a transposed (width, height) resize call — PIL's resize
    takes (W, H), numpy's shape is (H, W))."""
    import io

    from PIL import Image

    img = Image.new("L", (8, 8))
    img.putdata([min(255, (y // 1) * 32) for y in range(8) for _x in range(8)])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([(bytearray(buf.getvalue()),)], "payload binary")
    mat = (
        df.select(decode_image("payload", height=4, width=2, mode="real").alias("m"))
        .collect()[0]
        .m
    )
    arr = np.array(mat)
    assert arr.shape == (4, 2)
    assert arr[0].mean() < arr[-1].mean()


@pytest.mark.skipif(not _has_cv2(), reason="cv2 not installed in this container")
def test_real_video_frame_sample_solid_frames(spark):
    """An 8-frame solid-gray AVI samples through mode='real' to
    n_frames × H × W with every pixel near gray/255 (lossy-codec
    tolerance) — pins the demux → BGR2GRAY → resize → /255.0 contract
    and the uniform temporal indexing of the real branch."""
    import os
    import tempfile

    import cv2

    gray = 96
    fd, tmp = tempfile.mkstemp(suffix=".avi")
    os.close(fd)
    try:
        vw = cv2.VideoWriter(
            tmp, cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (16, 16)
        )
        if not vw.isOpened():
            pytest.skip("no usable cv2 video encoder in this environment")
        frame = np.full((16, 16, 3), gray, dtype=np.uint8)
        for _ in range(8):
            vw.write(frame)
        vw.release()
        with open(tmp, "rb") as fh:
            raw = fh.read()
    finally:
        os.unlink(tmp)

    df = spark.createDataFrame([(bytearray(raw),)], "payload binary")
    vid = (
        df.select(
            sample_video_frames(
                "payload", n_frames=3, height=4, width=4, mode="real"
            ).alias("v")
        )
        .collect()[0]
        .v
    )
    arr = np.array(vid)
    assert arr.shape == (3, 4, 4)
    np.testing.assert_allclose(arr, gray / 255.0, atol=8 / 255.0)

"""Multimodal plumbing: binary schema, Arrow round-trip, decode stubs."""

from __future__ import annotations

import pytest

from gmallbiguan_parent_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    media_decode_features,
    media_table,
)

SF = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    mt = media_table(spark, SF)
    kinds = dict(mt.dtypes)
    assert kinds["content"] == "binary"
    assert kinds["meta"].startswith("struct<")
    row = mt.filter(mt.doc_id == 0).collect()[0]
    assert isinstance(bytes(row.content), bytes)
    assert row.meta.char_ct > 0


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")
    with pytest.raises(NotImplementedError):
        frame_sample(b"xx", 3)


def test_fake_decode_is_deterministic_and_content_dependent():
    a = decode_image(b"payload-a", fake=True)
    b = decode_image(b"payload-b", fake=True)
    assert a == decode_image(b"payload-a", fake=True)
    assert a != b
    assert 64 <= a["width"] < 256 and 64 <= a["height"] < 256

    frames = frame_sample(b"0123456789", 3, fake=True)
    assert len(frames) == 3
    assert frames[0] == b"012"
    assert frame_sample(b"", 3, fake=True) == []


def test_media_decode_features_through_arrow(spark):
    feats = media_decode_features(spark, SF)
    rows = feats.collect()
    assert len(rows) == spark.read.parquet(f"{SF}/documents.parquet").count()
    assert all(64 <= r.width < 256 and r.channels == 3 for r in rows)


def test_resize_stub_deterministic_and_gated():
    import pytest

    from gmallbiguan_parent_spark.operators.multimodal import resize_image

    out = resize_image(b"payload", 224, 224, fake=True)
    assert (out["width"], out["height"]) == (224, 224)
    assert out == resize_image(b"payload", 224, 224, fake=True)
    assert out["content_digest"] != resize_image(b"payload", 128, 128, fake=True)["content_digest"]
    from gmallbiguan_parent_spark.operators.multimodal import _PILImage

    if _PILImage is None:  # real path gated only where no codec exists
        with pytest.raises(NotImplementedError):
            resize_image(b"payload", 224, 224)
    with pytest.raises(ValueError):
        resize_image(b"payload", 0, 224, fake=True)


def test_real_pil_decode_branch_when_importable():
    """Exercises the REAL codec branch wherever PIL exists (skipped in
    codec-free containers): a generated PNG decodes to its true
    geometry and resizes through the same operator surface."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    import io

    from gmallbiguan_parent_spark.operators.multimodal import decode_image, resize_image

    buf = io.BytesIO()
    PIL_Image.new("RGB", (37, 21)).save(buf, format="PNG")
    png = buf.getvalue()
    meta = decode_image(png)
    assert (meta["width"], meta["height"], meta["channels"]) == (37, 21, 3)
    out = resize_image(png, 16, 8)
    assert (out["width"], out["height"]) == (16, 8)
    assert len(out["content_digest"]) == 32


def test_real_opencv_frame_sample_branch_when_importable():
    """Wherever opencv imports, frame_sample decodes a real container:
    write a tiny MJPG video, sample 4 frames, get 4 PNG payloads back.
    Skipped (not failed) in codec-free containers — the deterministic
    fake keeps the plan-level tests running there."""
    import pytest

    cv2 = pytest.importorskip("cv2")

    import os
    import tempfile

    import numpy as np

    from gmallbiguan_parent_spark.operators.multimodal import frame_sample

    fd, path = tempfile.mkstemp(suffix=".avi")
    os.close(fd)
    try:
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (32, 24))
        for i in range(10):
            w.write(np.full((24, 32, 3), i * 20, dtype=np.uint8))
        w.release()
        with open(path, "rb") as fh:
            payload = fh.read()
    finally:
        os.unlink(path)

    frames = frame_sample(payload, 4)
    assert len(frames) == 4
    # PNG magic on every re-encoded frame
    assert all(f.startswith(b"\x89PNG") for f in frames)
    # empty payload short-circuits in the real branch too
    assert frame_sample(b"", 4) == []

"""Multimodal plumbing tests beyond the oracle gate: binary schema, the
stubbed real-codec path, and fixed output shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from csv2db_spark.multimodal import (
    decode_image,
    decode_image_real,
    resize_image,
    synth_media,
)


def test_media_schema_is_binary_with_typed_meta(spark, sf_dir):
    m = synth_media(spark, sf_dir)
    assert isinstance(m.schema["payload"].dataType, T.BinaryType)
    meta = m.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == [
        "width", "height", "channels", "sample_rate", "fps", "n_frames",
    ]


def test_real_decode_guarded_without_pillow(spark, sf_dir):
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_image_real(synth_media(spark, sf_dir))
    else:
        pytest.skip("Pillow installed; covered by test_real_decode_with_pillow")


def test_real_decode_with_pillow(spark):
    # real path: only runs where Pillow exists (skips in this sandbox)
    Image = pytest.importorskip("PIL.Image")
    import io

    def png(w, h, val):
        img = Image.new("L", (w, h), color=val)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def rgb_png(w, h, rgb):
        img = Image.new("RGB", (w, h), color=rgb)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", bytearray(png(8, 4, 0))),
        (2, "image", bytearray(png(16, 16, 255))),
        (3, "audio", bytearray(b"\x00" * 10)),  # non-image: filtered out
        # RGB: luma plane via ITU-R 601 (Pillow convert("L")):
        # L = (19595 R + 38470 G + 7471 B + 0x8000) >> 16
        (4, "image", bytearray(rgb_png(4, 4, (255, 0, 0)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r.media_id: r for r in decode_image_real(df).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1].width, out[1].height) == (8, 4)
    assert out[1].mean_byte == 0.0 and out[1].hist[0] == 32
    assert out[2].mean_byte == 255.0 and out[2].hist[15] == 256
    luma = (19595 * 255 + 0x8000) >> 16  # pure red -> 76
    assert out[4].mode == "RGB" and out[4].mean_byte == float(luma)
    assert out[4].hist[luma >> 4] == 16 and sum(out[4].hist) == 16


def test_decode_outputs_fixed_hist_shape(spark, sf_dir):
    row = decode_image(synth_media(spark, sf_dir)).limit(1).collect()[0]
    assert len(row["hist"]) == 16
    assert sum(row["hist"]) == row["n_bytes"]


def test_resize_outputs_fixed_thumb_shape(spark, sf_dir):
    rows = resize_image(synth_media(spark, sf_dir)).limit(5).collect()
    assert all(len(r["thumb"]) == 64 for r in rows)


def test_sniff_mime_real_signatures(spark):
    """Hand-built payloads with genuine magic bytes classify correctly,
    including JPEG (present in the sniffer but not the fixture) and a
    too-short payload."""
    from csv2db_spark.multimodal.media import (
        MAGIC_MP4, MAGIC_PNG, MAGIC_WAV, sniff_mime,
    )

    rows = [
        (1, "image", MAGIC_PNG + b"data"),
        (2, "audio", MAGIC_WAV + b"data"),
        (3, "video", MAGIC_MP4 + b"data"),
        (4, "image", b"\xff\xd8\xff\xe0rest"),   # JPEG: kind still image
        (5, "image", b"\x89PN"),                  # truncated magic
        (6, "audio", b"plain text"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    got = {
        r["media_id"]: (r["sniffed_format"], r["sniffed_kind"], r["is_mismatch"])
        for r in sniff_mime(df).collect()
    }
    assert got[1] == ("png", "image", False)
    assert got[2] == ("wav", "audio", False)
    assert got[3] == ("mp4", "video", False)
    assert got[4] == ("jpeg", "image", False)
    assert got[5] == ("unknown", "unknown", True)
    assert got[6] == ("unknown", "unknown", True)

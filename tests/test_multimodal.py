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


def test_real_decode_is_stubbed(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        decode_image_real(synth_media(spark, sf_dir))


def test_decode_outputs_fixed_hist_shape(spark, sf_dir):
    row = decode_image(synth_media(spark, sf_dir)).limit(1).collect()[0]
    assert len(row["hist"]) == 16
    assert sum(row["hist"]) == row["n_bytes"]


def test_resize_outputs_fixed_thumb_shape(spark, sf_dir):
    rows = resize_image(synth_media(spark, sf_dir)).limit(5).collect()
    assert all(len(r["thumb"]) == 64 for r in rows)

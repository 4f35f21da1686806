"""Driver-gate queries for the multimodal binary-column surface.

The media fixture is derived deterministically from ``documents`` (payload
= UTF-8 bytes of the text; the corpus is pure ASCII, driver-checked), so
every fake-codec byte operation has an exact DuckDB re-derivation on the
text side: ``ord(substr(text, i, 1))`` IS byte i. The oracles therefore
hash-check the full mapInPandas plumbing — binary in, fixed-shape arrays /
row-explosions out — not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csv2db_spark.multimodal import (
    audio_window_energy,
    decode_image,
    media_stats,
    resize_image,
    sample_video_frames,
    synth_media,
)
from csv2db_spark.registry import query

# media table re-derivation (ASCII: length(text) == octet_length)
_M = """
m AS (
  SELECT doc_id AS media_id,
         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         text,
         n_chars
  FROM documents
)
"""

def _join_ints(df: DataFrame, col: str) -> DataFrame:
    """Serialize an integer-array column to a comma-joined string so the
    driver's pandas canonicalizer (which cannot sort/hash list cells) can
    value-hash it; DuckDB mirrors with ``array_to_string(..., ',')``."""
    return df.withColumn(
        col,
        F.array_join(F.transform(col, lambda x: x.cast("string")), ","),
    )


# per-byte explode of one media kind
_EX = """
ex AS (
  SELECT media_id, text,
         unnest(generate_series(1, length(text))) AS x
  FROM m WHERE kind = '{kind}'
),
b AS (SELECT media_id, x, ord(substr(text, x, 1)) AS bv FROM ex)
"""


@query(
    "q_mm_media_stats",
    oracle=f"""
    WITH {_M}
    SELECT media_id,
           kind,
           length(text) AS n_bytes,
           md5(text) AS checksum,
           CAST(n_chars % 64 + 16 AS INT) AS width,
           CAST((n_chars * 7) % 64 + 16 AS INT) AS height,
           CAST(ceil(n_chars / 16.0) AS INT) AS n_frames
    FROM m
    """,
)
def q_mm_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_stats(synth_media(spark, sf_dir))


@query(
    "q_mm_image_decode",
    oracle=f"""
    WITH {_M}, {_EX.format(kind="image")},
    imgs AS (SELECT media_id FROM m WHERE kind = 'image'),
    bins AS (SELECT unnest(generate_series(0, 15)) AS bin),
    cnts AS (SELECT media_id, bv // 16 AS bin, count(*) AS c FROM b GROUP BY 1, 2),
    hist AS (
      SELECT i.media_id, list(coalesce(c.c, 0) ORDER BY bn.bin) AS hist
      FROM imgs i CROSS JOIN bins bn
      LEFT JOIN cnts c ON c.media_id = i.media_id AND c.bin = bn.bin
      GROUP BY i.media_id
    ),
    stats AS (
      SELECT media_id, count(*) AS n_bytes, avg(bv) AS mean_byte
      FROM b GROUP BY media_id
    )
    SELECT i.media_id,
           CAST(coalesce(s.n_bytes, 0) AS INT) AS n_bytes,
           coalesce(s.mean_byte, 0.0) AS mean_byte,
           array_to_string(h.hist, ',') AS hist
    FROM imgs i
    LEFT JOIN stats s USING (media_id)
    LEFT JOIN hist h USING (media_id)
    """,
)
def q_mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hist serialized to a comma-joined string: the driver canonicalizer
    # hashes scalar cells only (raw arrays are unhashable in its sort).
    return _join_ints(decode_image(synth_media(spark, sf_dir)), "hist")


@query(
    "q_mm_image_resize",
    oracle=f"""
    WITH {_M}
    SELECT media_id,
           array_to_string(list_transform(
             generate_series(1, 64),
             x -> CASE WHEN x <= length(text)
                       THEN ord(substr(text, CAST(x AS INT), 1)) ELSE 0 END
           ), ',') AS thumb
    FROM m WHERE kind = 'image'
    """,
)
def q_mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # thumb serialized like hist above — driver-canonicalizer compatible.
    return _join_ints(resize_image(synth_media(spark, sf_dir)), "thumb")


@query(
    "q_mm_video_frame_sample",
    oracle=f"""
    WITH {_M},
    fr AS (
      SELECT media_id, text,
             unnest(generate_series(0, CAST(ceil(length(text) / 16.0) AS INT) - 1)) AS k
      FROM m WHERE kind = 'video'
    )
    SELECT media_id,
           CAST(k AS INT) AS frame_idx,
           CAST(length(substr(text, CAST(k AS INT) * 16 + 1, 16)) AS INT) AS frame_bytes,
           md5(substr(text, CAST(k AS INT) * 16 + 1, 16)) AS frame_md5
    FROM fr WHERE k % 4 = 0
    """,
)
def q_mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_video_frames(synth_media(spark, sf_dir), stride=4)


@query(
    "q_mm_audio_energy",
    oracle=f"""
    WITH {_M}, {_EX.format(kind="audio")}
    SELECT media_id,
           CAST((x - 1) // 32 AS INT) AS win_idx,
           CAST(count(*) AS INT) AS n_samples,
           avg(bv) AS mean_amp
    FROM b
    GROUP BY media_id, (x - 1) // 32
    """,
)
def q_mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_window_energy(synth_media(spark, sf_dir))


@query(
    "q_mm_audio_segments",
    oracle=f"""
    WITH {_M}, {_EX.format(kind="audio")},
    frames AS (
      SELECT media_id, CAST((x - 1) // 32 AS INT) AS win_idx, avg(bv) AS mean_amp
      FROM b GROUP BY media_id, (x - 1) // 32
    ),
    active AS (SELECT media_id, win_idx FROM frames WHERE mean_amp > 105.0),
    marked AS (
      SELECT media_id, win_idx,
             CASE WHEN lag(win_idx) OVER w IS NULL
                       OR win_idx != lag(win_idx) OVER w + 1
                  THEN 1 ELSE 0 END AS brk
      FROM active
      WINDOW w AS (PARTITION BY media_id ORDER BY win_idx)
    ),
    segs AS (
      SELECT media_id, win_idx,
             CAST(sum(brk) OVER (PARTITION BY media_id ORDER BY win_idx
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_id
      FROM marked
    )
    SELECT media_id, seg_id,
           min(win_idx) AS start_win,
           max(win_idx) AS end_win,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM segs GROUP BY media_id, seg_id
    """,
)
def q_mm_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-shaped segmentation (multimodal.audio_active_segments):
    energy-threshold the Arrow-featurized windows, merge consecutive
    active windows via gaps-and-islands. The boundary comparison is on an
    exact-sum/one-division mean, so segment boundaries — not just counts
    — hash-match the byte-level oracle."""
    from csv2db_spark.multimodal import audio_active_segments

    return audio_active_segments(synth_media(spark, sf_dir))

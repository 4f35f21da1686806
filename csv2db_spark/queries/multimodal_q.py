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


_DHASH_BITS = """(CASE WHEN (CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 3 THEN ord(substr(text, 3, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 3 THEN ord(substr(text, 3, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 4 THEN ord(substr(text, 4, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 4 THEN ord(substr(text, 4, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 5 THEN ord(substr(text, 5, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 5 THEN ord(substr(text, 5, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 6 THEN ord(substr(text, 6, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 6 THEN ord(substr(text, 6, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 7 THEN ord(substr(text, 7, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 7 THEN ord(substr(text, 7, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 8 THEN ord(substr(text, 8, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 8 THEN ord(substr(text, 8, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 9 THEN ord(substr(text, 9, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 10 THEN ord(substr(text, 10, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 11 THEN ord(substr(text, 11, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 11 THEN ord(substr(text, 11, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 12 THEN ord(substr(text, 12, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 12 THEN ord(substr(text, 12, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 13 THEN ord(substr(text, 13, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 13 THEN ord(substr(text, 13, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 14 THEN ord(substr(text, 14, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 14 THEN ord(substr(text, 14, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 15 THEN ord(substr(text, 15, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 15 THEN ord(substr(text, 15, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 16 THEN ord(substr(text, 16, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 16 THEN ord(substr(text, 16, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 17 THEN ord(substr(text, 17, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 17 THEN ord(substr(text, 17, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 18 THEN ord(substr(text, 18, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 19 THEN ord(substr(text, 19, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 20 THEN ord(substr(text, 20, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 20 THEN ord(substr(text, 20, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 21 THEN ord(substr(text, 21, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 21 THEN ord(substr(text, 21, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 22 THEN ord(substr(text, 22, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 22 THEN ord(substr(text, 22, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 23 THEN ord(substr(text, 23, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 23 THEN ord(substr(text, 23, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 24 THEN ord(substr(text, 24, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 24 THEN ord(substr(text, 24, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 25 THEN ord(substr(text, 25, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 25 THEN ord(substr(text, 25, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 26 THEN ord(substr(text, 26, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 26 THEN ord(substr(text, 26, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 27 THEN ord(substr(text, 27, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 28 THEN ord(substr(text, 28, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 29 THEN ord(substr(text, 29, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 29 THEN ord(substr(text, 29, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 30 THEN ord(substr(text, 30, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 30 THEN ord(substr(text, 30, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 31 THEN ord(substr(text, 31, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 31 THEN ord(substr(text, 31, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 32 THEN ord(substr(text, 32, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 32 THEN ord(substr(text, 32, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 33 THEN ord(substr(text, 33, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 33 THEN ord(substr(text, 33, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 34 THEN ord(substr(text, 34, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 34 THEN ord(substr(text, 34, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 35 THEN ord(substr(text, 35, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 35 THEN ord(substr(text, 35, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 36 THEN ord(substr(text, 36, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 37 THEN ord(substr(text, 37, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 38 THEN ord(substr(text, 38, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 38 THEN ord(substr(text, 38, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 39 THEN ord(substr(text, 39, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 39 THEN ord(substr(text, 39, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 40 THEN ord(substr(text, 40, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 40 THEN ord(substr(text, 40, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 41 THEN ord(substr(text, 41, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 41 THEN ord(substr(text, 41, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 42 THEN ord(substr(text, 42, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 42 THEN ord(substr(text, 42, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 43 THEN ord(substr(text, 43, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 43 THEN ord(substr(text, 43, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 44 THEN ord(substr(text, 44, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 44 THEN ord(substr(text, 44, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 45 THEN ord(substr(text, 45, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 46 THEN ord(substr(text, 46, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 47 THEN ord(substr(text, 47, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 47 THEN ord(substr(text, 47, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 48 THEN ord(substr(text, 48, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 48 THEN ord(substr(text, 48, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 49 THEN ord(substr(text, 49, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 49 THEN ord(substr(text, 49, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 50 THEN ord(substr(text, 50, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 50 THEN ord(substr(text, 50, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 51 THEN ord(substr(text, 51, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 51 THEN ord(substr(text, 51, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 52 THEN ord(substr(text, 52, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 52 THEN ord(substr(text, 52, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 53 THEN ord(substr(text, 53, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 53 THEN ord(substr(text, 53, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 54 THEN ord(substr(text, 54, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 55 THEN ord(substr(text, 55, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 56 THEN ord(substr(text, 56, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 56 THEN ord(substr(text, 56, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 57 THEN ord(substr(text, 57, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 57 THEN ord(substr(text, 57, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 58 THEN ord(substr(text, 58, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 58 THEN ord(substr(text, 58, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 59 THEN ord(substr(text, 59, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 59 THEN ord(substr(text, 59, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 60 THEN ord(substr(text, 60, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 60 THEN ord(substr(text, 60, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 61 THEN ord(substr(text, 61, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 61 THEN ord(substr(text, 61, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 62 THEN ord(substr(text, 62, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 62 THEN ord(substr(text, 62, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 63 THEN ord(substr(text, 63, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 64 THEN ord(substr(text, 64, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 65 THEN ord(substr(text, 65, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 65 THEN ord(substr(text, 65, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 66 THEN ord(substr(text, 66, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 66 THEN ord(substr(text, 66, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 67 THEN ord(substr(text, 67, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 67 THEN ord(substr(text, 67, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 68 THEN ord(substr(text, 68, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 68 THEN ord(substr(text, 68, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 69 THEN ord(substr(text, 69, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 69 THEN ord(substr(text, 69, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 70 THEN ord(substr(text, 70, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 70 THEN ord(substr(text, 70, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 71 THEN ord(substr(text, 71, 1)) ELSE 0 END) THEN '1' ELSE '0' END)
        || (CASE WHEN (CASE WHEN length(text) >= 71 THEN ord(substr(text, 71, 1)) ELSE 0 END) > (CASE WHEN length(text) >= 72 THEN ord(substr(text, 72, 1)) ELSE 0 END) THEN '1' ELSE '0' END)"""


@query(
    "q_mm_dhash_dedup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id AS media_id,
             {_DHASH_BITS} AS dhash
      FROM documents WHERE doc_id % 3 = 0
    ),
    g AS (SELECT dhash, count(*) AS group_size FROM h GROUP BY dhash)
    SELECT h.media_id, h.dhash, g.group_size
    FROM h JOIN g ON h.dhash = g.dhash
    WHERE g.group_size >= 2
    """,
)
def q_mm_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image groups by difference-hash
    (multimodal/media.py:image_dhash): 64 integer pixel comparisons
    concatenated to a bitstring — no arithmetic, so the mapInPandas
    result is re-derivable exactly from the text side by the SQL
    oracle. Groups of >= 2 sharing a dHash are the visual-dup clusters
    a media curation pass collapses."""
    from csv2db_spark.multimodal.media import dhash_duplicate_groups, synth_media

    return dhash_duplicate_groups(synth_media(spark, sf_dir))


@query(
    "q_mm_mime_sniff",
    oracle=f"""
    WITH {_M},
    s AS (
      SELECT media_id, kind AS declared_kind,
             CASE
               WHEN media_id % 17 = 0 THEN 'unknown'
               ELSE (['png','wav','mp4'])[CAST(
                 CASE WHEN media_id % 10 = 0
                      THEN (media_id % 3 + 1) % 3
                      ELSE media_id % 3 END AS INT) + 1]
             END AS sniffed_format
      FROM m
    )
    SELECT media_id, declared_kind, sniffed_format,
           CASE sniffed_format WHEN 'png' THEN 'image'
                               WHEN 'wav' THEN 'audio'
                               WHEN 'mp4' THEN 'video'
                               ELSE 'unknown' END AS sniffed_kind,
           CASE sniffed_format WHEN 'png' THEN 'image'
                               WHEN 'wav' THEN 'audio'
                               WHEN 'mp4' THEN 'video'
                               ELSE 'unknown' END <> declared_kind
             AS is_mismatch
    FROM s
    """,
)
def q_mm_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-number MIME sniffing audit (multimodal/media.sniff_mime over
    synth_tagged_media): the engine parses REAL container signatures —
    PNG 8-byte magic, RIFF····WAVE, ISO-BMFF ftyp at offset 4 — from the
    binary payloads in pure codegen (≤12 bytes read per row, no decode,
    no Python); the oracle re-derives the expected classification from
    the fixture's generation arithmetic. Mislabeled blobs (every 10th:
    next kind's magic) and corrupt blobs (every 17th: no magic) must
    surface with is_mismatch = true."""
    from csv2db_spark.multimodal.media import sniff_mime, synth_tagged_media

    return sniff_mime(synth_tagged_media(spark, sf_dir))

"""Multimodal (image/audio/video) column surface.

A 100 TB training-data pipeline carries media as **opaque binary columns
with typed metadata** — decode/resize/feature-extract run as Arrow-batched
Python over ``mapInPandas``, everything else (filtering, joining,
partitioning, dedup-by-checksum) stays JVM-side on the metadata. The
reference has no binary/media support at all (its only types are the 8
scalar parses in ``common/val_mapper.go:44-70``); this module is part of
the scale-oriented extension surface.

Because the container ships no image/audio codecs, the *real* decode path
is stubbed (``decode_image_real`` raises ``NotImplementedError`` unless
PIL appears), and the tested path uses a **deterministic fake codec**:
payload bytes are interpreted directly as pixels/samples/frames. The
Spark-side plumbing — binary Arrow batches into pandas, fixed-shape
array outputs, metadata structs, per-kind routing — is real and is what
the driver's oracle hash-checks.

Scale notes:
- ``mapInPandas`` streams Arrow record batches; peak memory is one batch
  of payloads per core, not one partition. For multi-MB media you bound
  batches with ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- All fake-codec outputs are pure functions of the payload bytes, so the
  operators are deterministic under any partitioning / retry.
- Checksum-level ops (``media_stats``) never leave the JVM: ``md5``,
  ``octet_length`` on binary are Catalyst expressions inside whole-stage
  codegen.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pandas only on the worker path
    import pandas as pd

MEDIA_META_FIELDS = (
    "width int, height int, channels int, sample_rate int, fps int, n_frames int"
)

_THUMB = 64  # fake resize target: 64 "pixels" (8x8)
_FRAME_BYTES = 16  # fake video codec: 16 bytes per frame
_WIN = 32  # fake audio codec: 32 bytes (samples) per energy window


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    payload = UTF-8 bytes of the text, kind round-robins image/audio/video,
    metadata is a typed struct computed from n_chars. This is the fixture
    for every media operator (and its DuckDB oracle re-derives the same
    values from the text side)."""
    from csv2db_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
        (F.col("n_chars") * 7 % 64 + 16).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        F.lit(25).alias("fps"),
        (F.ceil(F.col("n_chars") / _FRAME_BYTES)).cast("int").alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: size, checksum (dedup key), typed meta
    projection. No Python in the loop — this is the op you run over the
    full 100 TB before any decode."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode via Pillow, behind a guarded import: when
    Pillow is installed the payloads are decoded as actual images
    (PNG/JPEG/...), producing (media_id, width, height, mode,
    mean_byte, hist) with the same batch flow as ``decode_image``; when
    it is not (this sandbox ships no codec libs), raises
    ``NotImplementedError`` at PLAN TIME — before any job runs — so the
    deterministic fake path stays the gated one here and the real path
    lights up off-sandbox with no code change.

    Same scale shape as ``decode_image``: Arrow-batched mapInPandas,
    decode cost stays on executors, one batch in flight per task. The
    histogram is 16-bin over the luma plane (grayscale conversion), so
    downstream consumers are drop-in compatible with the fake path's
    byte histogram."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode needs Pillow; use decode_image (deterministic "
            "fake codec) in this environment"
        ) from exc

    out_schema = (
        "media_id bigint, width int, height int, mode string, "
        "mean_byte double, hist array<bigint>"
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import numpy as np
        import pandas as pd
        from PIL import Image

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(payload))
                arr = np.asarray(img.convert("L"), dtype=np.uint8)
                hist = np.bincount(arr.ravel() >> 4, minlength=16)
                rows.append(
                    (
                        mid,
                        int(img.width),
                        int(img.height),
                        img.mode,
                        float(arr.mean()) if arr.size else 0.0,
                        hist.astype("int64").tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "mode", "mean_byte", "hist",
                ],
            )

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(decode, out_schema)


def decode_image(media: DataFrame) -> DataFrame:
    """Fake-codec 'decode' + feature extraction over Arrow batches:
    bytes -> 16-bin intensity histogram (byte >> 4) + mean byte value.
    Shape and batching are exactly what a real decoder would use."""
    out_schema = "media_id bigint, n_bytes int, mean_byte double, hist array<bigint>"

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=16)
                rows.append(
                    (
                        mid,
                        int(b.size),
                        float(b.mean()) if b.size else 0.0,
                        hist.astype("int64").tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "mean_byte", "hist"]
            )

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(decode, out_schema)


def resize_image(media: DataFrame) -> DataFrame:
    """Fake resize: deterministic fixed-shape (64-element) thumbnail by
    byte truncate/zero-pad — stands in for interpolation; output shape,
    typing and batch flow match a real resizer."""
    out_schema = f"media_id bigint, thumb array<int>"

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)[:_THUMB]
                t = np.zeros(_THUMB, dtype="int32")
                t[: b.size] = b
                rows.append((mid, t.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "thumb"])

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(resize, out_schema)


def sample_video_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Fake frame sampler: payload sliced into 16-byte 'frames', every
    ``stride``-th frame emitted as (frame_idx, frame_md5, frame_bytes).
    One input row fans out to n_frames/stride rows — the row-explosion
    shape of real frame extraction."""
    out_schema = "media_id bigint, frame_idx int, frame_bytes int, frame_md5 string"

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for k in range(0, max(1, -(-len(payload) // _FRAME_BYTES)), stride):
                    frame = payload[k * _FRAME_BYTES : (k + 1) * _FRAME_BYTES]
                    if not frame:
                        continue
                    rows.append(
                        (mid, k, len(frame), hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_md5"]
            )

    vids = media.where(F.col("kind") == "video").select("media_id", "payload")
    return vids.mapInPandas(sample, out_schema)


def audio_window_energy(media: DataFrame) -> DataFrame:
    """Fake audio featurizer: mean 'amplitude' (byte value) per 32-byte
    window — the windowed-reduce shape of RMS/mel-energy extraction."""
    out_schema = "media_id bigint, win_idx int, n_samples int, mean_amp double"

    def energy(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                for k in range(0, b.size, _WIN):
                    w = b[k : k + _WIN]
                    rows.append(
                        (mid, k // _WIN, int(w.size), float(w.mean()))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "win_idx", "n_samples", "mean_amp"]
            )

    auds = media.where(F.col("kind") == "audio").select("media_id", "payload")
    return auds.mapInPandas(energy, out_schema)


def audio_active_segments(media: DataFrame, threshold: float = 105.0) -> DataFrame:
    """Voice-activity-detection shape: threshold the per-window energy,
    then merge consecutive active windows into segments (gaps-and-islands
    over win_idx). Pure composition — the Arrow featurizer emits frames,
    everything after is relational (one media_id shuffle), so the plan is
    the same at 100 TB: featurize map-side, one window pass, one
    aggregation. Real VAD swaps the threshold for a model score; the
    segment-merge machinery is unchanged."""
    from pyspark.sql import Window

    frames = audio_window_energy(media)
    active = frames.where(F.col("mean_amp") > threshold)
    w = Window.partitionBy("media_id").orderBy("win_idx")
    brk = F.when(
        F.lag("win_idx").over(w).isNull()
        | (F.col("win_idx") != F.lag("win_idx").over(w) + 1),
        1,
    ).otherwise(0)
    segs = active.withColumn(
        "seg_id",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return segs.groupBy("media_id", "seg_id").agg(
        F.min("win_idx").alias("start_win"),
        F.max("win_idx").alias("end_win"),
        F.count(F.lit(1)).alias("n_windows"),
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over the fake-decoded image
    payload: the first 72 bytes stand in for an 8x9 grayscale thumbnail
    and each hash bit is the integer comparison pixel[r,c] >
    pixel[r,c+1] — the classic near-duplicate image signature, here
    emitted as a 64-char bitstring so there is no arithmetic at all
    (integer comparisons + concatenation: bit-exact on any engine, and
    the DuckDB oracle can re-derive it from the text side of the synth
    fixture). Arrow-batched mapInPandas like every decode-path op; a
    real decoder swaps the byte window for actual luma pixels and
    nothing else changes."""
    out_schema = "media_id bigint, dhash string"

    def hash_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.zeros(72, dtype=np.int16)
                raw = np.frombuffer(payload[:72], dtype=np.uint8)
                b[: raw.size] = raw
                grid = b.reshape(8, 9)
                bits = (grid[:, :8] > grid[:, 1:]).astype(np.uint8).ravel()
                rows.append((mid, "".join("1" if x else "0" for x in bits)))
            yield pd.DataFrame(rows, columns=["media_id", "dhash"])

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(hash_batch, out_schema)


def dhash_duplicate_groups(media: DataFrame) -> DataFrame:
    """Perceptual-duplicate groups: images sharing a dHash. One 8-byte-
    key shuffle of (media_id, dhash); at 100 TB you extend matching to
    hamming<=k with the same pigeonhole band join the SimHash dedup
    uses (llm/dedup.py) — the signature column is format-compatible."""
    h = image_dhash(media)
    from pyspark.sql import Window

    w = Window.partitionBy("dhash")
    return (
        h.withColumn("group_size", F.count(F.lit(1)).over(w))
        .where(F.col("group_size") >= 2)
        .select("media_id", "dhash", "group_size")
    )


# magic-number prefixes for the container formats the sniffer knows.
# (Real signatures — PNG/RIFF-WAVE/ISO-BMFF ftyp/JPEG SOI — applied to
# the deterministic text payloads by synth_tagged_media.)
MAGIC_PNG = b"\x89PNG\r\n\x1a\n"
MAGIC_WAV = b"RIFF\x00\x00\x00\x00WAVE"
MAGIC_MP4 = b"\x00\x00\x00\x18ftypmp42"
_KIND_MAGIC = {"image": MAGIC_PNG, "audio": MAGIC_WAV, "video": MAGIC_MP4}
_FMT_KIND = {"png": "image", "jpeg": "image", "wav": "audio", "mp4": "video"}


def synth_tagged_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fixture WITH container magic bytes: payload = the declared
    kind's real magic prefix + the document's UTF-8 text — except every
    10th row carries the NEXT kind's magic (a mislabeled blob) and every
    17th row carries no magic at all (a corrupt/raw blob). Deterministic
    from doc_id, so the oracle re-derives the expected classification
    from the same arithmetic."""
    base = synth_media(spark, sf_dir)
    magic_kind_idx = F.when(
        F.col("media_id") % 10 == 0, (F.col("media_id") % 3 + 1) % 3
    ).otherwise(F.col("media_id") % 3)
    magic = F.element_at(
        F.array(
            F.lit(MAGIC_PNG), F.lit(MAGIC_WAV), F.lit(MAGIC_MP4)
        ),
        (magic_kind_idx + 1).cast("int"),
    )
    payload = F.when(
        F.col("media_id") % 17 == 0, F.col("payload")
    ).otherwise(F.concat(magic, F.col("payload")))
    return base.withColumn("payload", payload)


def sniff_mime(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Classify binary payloads by their magic numbers — the first pass
    of any multimodal ingest at scale: bytes lie less than extensions or
    upstream metadata, and a declared-vs-sniffed mismatch audit catches
    mislabeled and corrupt blobs BEFORE any decoder runs (decoders are
    the expensive, crash-prone stage; see decode_image_real).

    Pure whole-stage-codegen byte inspection: fixed-offset substrings of
    the binary column hex-compared against signature literals (PNG
    8-byte signature; RIFF····WAVE; ISO-BMFF 'ftyp' at offset 4; JPEG
    FFD8FF) — no Python, no decode, reads at most 12 bytes per row.
    Emits sniffed_format/sniffed_kind plus an is_mismatch flag against
    the declared kind (NULL-safe: 'unknown' counts as a mismatch)."""
    p = F.col(payload_col)

    def hexpre(pos: int, n: int) -> F.Column:
        return F.hex(F.substring(p, pos, n))

    fmt = (
        F.when(hexpre(1, 8) == F.lit(MAGIC_PNG.hex().upper()), "png")
        .when(
            (hexpre(1, 4) == F.lit(b"RIFF".hex().upper()))
            & (hexpre(9, 4) == F.lit(b"WAVE".hex().upper())),
            "wav",
        )
        .when(hexpre(5, 4) == F.lit(b"ftyp".hex().upper()), "mp4")
        .when(hexpre(1, 3) == F.lit(b"\xff\xd8\xff".hex().upper()), "jpeg")
        .otherwise("unknown")
    )
    kind_map = F.create_map(
        *[F.lit(x) for kv in _FMT_KIND.items() for x in kv]
    )
    return media.select(
        "media_id",
        F.col("kind").alias("declared_kind"),
        fmt.alias("sniffed_format"),
        F.coalesce(
            F.element_at(kind_map, fmt), F.lit("unknown")
        ).alias("sniffed_kind"),
    ).withColumn(
        "is_mismatch",
        ~F.col("sniffed_kind").eqNullSafe(F.col("declared_kind")),
    )

"""Count-min sketch built from relational primitives.

Spark ships a binary `count_min_sketch` aggregate, but its serialized
form can't be cross-checked against another engine. This construction
keeps the sketch RELATIONAL — the (row, bucket) -> count grid is a
plain aggregate output — so the DuckDB oracle can rebuild it
bit-for-bit, and downstream point queries are ordinary min-over-rows
lookups.

Hashing mirrors the MinHash discipline (llm/dedup.py): one md5 per
item split into two 48-bit halves, then Kirsch-Mitzenmacher double
hashing h1 + j*h2 derives all d row-hashes — portable to any engine
with md5.

Scale shape: building the sketch is one explode(d) + groupBy((j,
bucket)) — a d-times-item-count map side combining into d*w cells, so
the shuffle carries at most d*w rows per partition regardless of input
size. Point estimates join the QUERY set (small, broadcast) against the
d*w-cell sketch (also broadcast-size): no corpus re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_P = (1 << 48) - 59  # same 48-bit Mersenne-ish prime as MinHash


def countmin_build(
    items: DataFrame, item_col: str = "item", d: int = 4, w: int = 256
) -> DataFrame:
    """(j, bucket, cnt) cells of a d x w count-min sketch over
    ``items`` (one row per occurrence; pre-aggregate upstream to weight)."""
    hashed = items.select(
        F.conv(F.substring(F.md5(item_col), 1, 12), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5(item_col), 13, 12), 16, 10)
        .cast("long")
        .alias("h2"),
    )
    rows = hashed.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"), "h1", "h2"
    )
    return (
        rows.select(
            "j",
            (
                ((F.col("h1") + F.col("j") * F.col("h2")) % CMS_P) % w
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str = "item",
    d: int = 4, w: int = 256,
) -> DataFrame:
    """Point estimates: min over the d cells each probe item maps to."""
    h = probes.select(
        item_col,
        F.conv(F.substring(F.md5(item_col), 1, 12), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5(item_col), 13, 12), 16, 10)
        .cast("long")
        .alias("h2"),
    ).select(
        item_col,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
        "h1",
        "h2",
    ).select(
        item_col,
        "j",
        (((F.col("h1") + F.col("j") * F.col("h2")) % CMS_P) % w).alias(
            "bucket"
        ),
    )
    return (
        h.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def approx_top_k(
    items: DataFrame, item_col: str = "item", k: int = 10,
    d: int = 4, w: int = 256,
) -> DataFrame:
    """Approximate heavy hitters: the k most frequent items by count-min
    estimate, ties broken by item ascending — a total order, so the
    result is deterministic and hash-checkable (the DuckDB oracle
    rebuilds the identical sketch).

    Estimates are upper bounds (est >= true count always; equality when
    none of an item's d cells collide), so every TRUE heavy hitter is in
    the candidate ranking — count-min can promote a light item, never
    demote a heavy one.

    Scale shape: the sketch build shuffles at most d*w combined cells
    per partition regardless of corpus size; the candidate pass is one
    map-side-combined groupBy(item) to get distinct items, a broadcast
    join against the d*w-cell sketch, and a TakeOrdered top-k (per
    partition heap + k-row driver merge — never a global sort). For a
    vocabulary too large even for the distinct pass, feed ``items``
    pre-filtered by a cheap threshold; the sketch itself never grows.
    """
    sketch = countmin_build(items, item_col, d=d, w=w)
    distinct = items.select(item_col).distinct()
    est = countmin_estimate(sketch, distinct, item_col, d=d, w=w)
    return est.orderBy(
        F.col("est_count").desc(), F.col(item_col).asc()
    ).limit(k)

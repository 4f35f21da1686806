"""Iterative graph operators: connected components.

The canonical use in an LLM-data pipeline: near-duplicate PAIRS (from
MinHash/SimHash) must become duplicate CLUSTERS — each document labeled
with a canonical representative (the minimum doc_id reachable through
any chain of near-dup edges) so one keeper per cluster survives.

Algorithm: iterative min-label propagation (the simple variant of
large-star/small-star from the MapReduce connected-components
literature). Each round: every node takes the min label over itself and
its neighbors — two shuffles per round (edge join + min-agg), converges
in O(diameter) rounds; dedup graphs are near-cliques, so diameter is
tiny (2-3 rounds in practice).

Scale notes:
- The driver-side loop only checks a CONVERGENCE COUNT per round; all
  data stays distributed. This is the textbook pattern for iterative
  algorithms on Spark (driver steers, executors compute).
- ``localCheckpoint`` truncates the lineage each round — without it the
  plan doubles per iteration and the job DAG explodes by round 10.
- Edges are symmetrized once up front; the per-round join shuffles on
  node id. At 100 TB-of-pairs you'd switch to the star-contraction
  variant (fewer rounds on high-diameter graphs); for dedup graphs the
  simple variant is both fewer shuffles and simpler.

The reference has no graph/iterative surface at all (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the min node id of its component.

    ``edges``: undirected pair list (any orientation, duplicates fine).
    Returns (node, component).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node: min over own label and neighbors' labels
        neighbor = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "component")

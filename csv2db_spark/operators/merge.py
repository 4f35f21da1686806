"""Upsert / merge-by-key.

The reference's five table modes (SURVEY.md §7.3) cover append/replace
semantics only; a real warehouse sink also needs MERGE (upsert): rows
from the change set replace same-key rows in the base, new-key rows
append, unmatched base rows survive.

Spark-first formulation: an anti-join + union —

    result = changes ∪ (base ⟕anti changes.keys)

Both legs are declarative; Catalyst broadcasts the (typically small)
change-key side of the anti-join, so the base table streams through one
scan with no shuffle of the big side. At 100 TB this is exactly the
strategy Delta/Iceberg MERGE compiles to for copy-on-write tables
(minus file-level pruning, which the table format adds on top).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, changes: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge ``changes`` into ``base`` by ``keys``: change rows win on key
    collision, base rows survive otherwise. Columns must match."""
    if set(base.columns) != set(changes.columns):
        raise ValueError(
            f"column mismatch: base={sorted(base.columns)} "
            f"changes={sorted(changes.columns)}"
        )
    change_keys = changes.select(*keys).distinct()
    survivors = base.join(F.broadcast(change_keys), list(keys), "left_anti")
    return changes.unionByName(survivors)

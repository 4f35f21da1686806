"""Query definitions backing ``__spark_entry__.queries()``.

Importing this package populates ``csv2db_spark.registry.REGISTRY``.
Each module covers one operator family from SURVEY.md §2.2.
"""

from csv2db_spark.queries import (  # noqa: F401
    advanced,
    aggregates,
    analytics2,
    core,
    curation,
    ingest_q,
    llm,
    multimodal_q,
    relational,
    reshape,
    scalar,
    setops,
    sources_q,
    streaming_q,
    subqueries,
    tpch_shapes,
    windows,
)

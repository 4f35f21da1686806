"""Inline pipeline observability: metrics collected DURING an action.

At 100 TB the naive way to audit a pipeline stage — run the job, then
run ``SELECT count(*), sum(...)`` over its input again — doubles the
scan bill. Spark's Observation API attaches named aggregates to any
point of the plan and accumulates them WHILE the action runs (the same
accumulator machinery as the UI's metrics), so the audit is free: zero
extra scans, zero extra shuffles, exact results. This module wraps the
pattern the quality/WAP stages use it for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed_run(
    df: DataFrame,
    metrics: dict[str, Column],
    transform=None,
    action=None,
) -> dict:
    """Attach ``metrics`` (name -> aggregate Column) to ``df``, continue
    the pipeline with ``transform`` (the real downstream work — joins,
    aggregates, whatever), run ``action`` on the result (default: a noop
    write — the plan executes fully, nothing lands), and return the
    observed values as a dict.

    The observation point is WHERE you attach it: observe the
    post-filter frame and you meter exactly what survived the pushdown
    — the audit row a load pipeline wants next to every run, and the
    same numbers a second verification scan would cost a full pass to
    recompute. Works on any batch DataFrame; for streams use
    ``writeStream`` listeners (same accumulator plumbing) instead."""
    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    result = transform(observed) if transform is not None else observed
    if action is None:
        result.write.format("noop").mode("overwrite").save()
    else:
        action(result)
    return obs.get

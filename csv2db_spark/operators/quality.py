"""Declarative data-quality constraint checking — the Deequ/dbt-test
pattern: a rule set compiles to ONE aggregation pass over the table (plus
one distinct-shuffle per uniqueness rule), producing a verdict row per
rule. This is the load-validation layer a CSV→DB loader grows once the
"did every row arrive intact?" question matters (the reference stops at
FAILFAST parse errors; SURVEY.md §2.3's reconcile semantics are the
schema-side half of the same need).

Every metric is an exact integer count, so the report hash-matches a SQL
oracle bit-for-bit.

Scale shape (100 TB): all row-level rules (not_null / in_set / in_range /
matches / row_count) fold into a single map-combined aggregate — one scan,
zero shuffle beyond the 1-row fold. Each ``unique`` rule needs one
distinct count on its key columns (a keyed shuffle — irreducible for
exact uniqueness; swap in hll_distinct for a sketched check when
approximate suffices).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from csv2db_spark.functions.numeric import dec


@dataclass(frozen=True)
class Rule:
    """One constraint: ``name`` labels the report row, ``kind`` selects
    the check, ``violations`` (row-level rules) counts failing rows."""

    name: str
    kind: str  # not_null | in_set | in_range | matches | unique | row_count
    violations: Column | None = None
    cols: tuple[str, ...] = ()
    min_rows: int = 0


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "not_null", F.col(col).isNull())


def in_set(col: str, values: Sequence[str]) -> Rule:
    return Rule(
        f"in_set({col})",
        "in_set",
        ~F.col(col).isin(*values) | F.col(col).isNull(),
    )


def in_range(col: str, lo: float, hi: float) -> Rule:
    return Rule(
        f"in_range({col})",
        "in_range",
        (F.col(col) < lo) | (F.col(col) > hi) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches({col})",
        "matches",
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", None, tuple(cols))


def row_count_at_least(n: int) -> Rule:
    return Rule(f"row_count_at_least({n})", "row_count", None, (), n)


def check_constraints(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    (rule, n_rows, n_violations, passed). Row-level rules share a single
    aggregation; uniqueness rules add one distinct-count each and report
    duplicated-row count (n_rows − n_distinct_keys) as violations."""
    row_rules = [r for r in rules if r.violations is not None]
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
        F.sum(F.when(r.violations, 1).otherwise(0))
        .cast("long")
        .alias(f"_v{i}")
        for i, r in enumerate(row_rules)
    ]
    base = df.agg(*aggs)
    reports = []
    for i, r in enumerate(row_rules):
        reports.append(
            base.select(
                F.lit(r.name).alias("rule"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v{i}").alias("n_violations"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
        )
    for r in rules:
        if r.kind == "unique":
            reports.append(
                df.agg(
                    F.count(F.lit(1)).cast("long").alias("_n"),
                    F.count_distinct(*[F.col(c) for c in r.cols])
                    .cast("long")
                    .alias("_d"),
                ).select(
                    F.lit(r.name).alias("rule"),
                    F.col("_n").alias("n_rows"),
                    (F.col("_n") - F.col("_d")).alias("n_violations"),
                    (F.col("_n") == F.col("_d")).alias("passed"),
                )
            )
        elif r.kind == "row_count":
            reports.append(
                base.select(
                    F.lit(r.name).alias("rule"),
                    F.col("_n").alias("n_rows"),
                    F.when(F.col("_n") >= r.min_rows, F.lit(0))
                    .otherwise(F.lit(1))
                    .cast("long")
                    .alias("n_violations"),
                    (F.col("_n") >= r.min_rows).alias("passed"),
                )
            )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def k_anonymity_report(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """Privacy-risk audit: rows whose quasi-identifier combination is
    shared by fewer than ``k`` rows are re-identifiable — the k-anonymity
    criterion. Returns one row per violating combination:
    (quasi_identifiers..., group_size) plus the risk share each group
    carries, smallest (riskiest) groups first with a full tie-break.

    The privacy complement of the PII scanners in llm/curation.py:
    regexes find DIRECT identifiers; this finds rows a JOIN attack can
    single out even after direct identifiers are stripped.

    Scale shape: one map-combined groupBy on the QI columns (the
    shuffle carries one partial count per combination per task) + a
    1-row total broadcast; only combination rows — never data rows —
    sort for the report."""
    counts = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    total = F.broadcast(counts.agg(F.sum("group_size").alias("_total")))
    return (
        counts.where(F.col("group_size") < k)
        .crossJoin(total)
        .select(
            *quasi_identifiers,
            "group_size",
            (
                F.col("group_size").cast("double")
                / F.col("_total").cast("double")
            ).alias("row_share"),
        )
        .orderBy("group_size", *quasi_identifiers)
    )


def l_diversity_report(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """The companion criterion to k-anonymity: a quasi-identifier group
    can be large (k-anonymous) yet still leak the SENSITIVE attribute
    if every member shares the same value — l-diversity demands at
    least ``l`` distinct sensitive values per group. Returns one row
    per violating combination: (quasi_identifiers..., group_size,
    n_sensitive, top_value, top_share) — ``top_share`` (modal sensitive
    value's fraction) quantifies how confidently an attacker infers the
    attribute, ``top_value`` names the leak; deterministic modal
    tie-break on the value itself. Violations sort least-diverse first.

    Scale shape: one map-combined groupBy on (QI..., sensitive) —
    partials per distinct pair per task — then a |combinations|-row
    groupBy with max_by for the mode; only combination rows ever sort.
    Same cost class as k_anonymity_report, one grain finer."""
    pair = df.groupBy(*quasi_identifiers, sensitive_col).agg(
        F.count(F.lit(1)).alias("_vn")
    )
    grp = pair.groupBy(*quasi_identifiers).agg(
        F.sum("_vn").alias("group_size"),
        F.count(F.lit(1)).alias("n_sensitive"),
        # modal value; ties broken toward the LARGEST value string so
        # both engines agree (max over (count, value) pairs)
        F.max(F.struct(F.col("_vn"), F.col(sensitive_col))).alias("_m"),
    )
    return (
        grp.where(F.col("n_sensitive") < l)
        .select(
            *quasi_identifiers,
            "group_size",
            "n_sensitive",
            F.col(f"_m.{sensitive_col}").alias("top_value"),
            (F.col("_m._vn").cast("double") / F.col("group_size").cast("double")).alias(
                "top_share"
            ),
        )
        .orderBy("n_sensitive", "group_size", *quasi_identifiers)
    )


def referential_integrity_report(
    child: DataFrame,
    parent: DataFrame,
    on: dict[str, str],
    relation: str = "child->parent",
) -> DataFrame:
    """Cross-table foreign-key audit — the constraint class the
    single-table ``check_constraints`` rules can't see (Deequ's
    hasReferentialIntegrity): how many child rows point at no parent
    (orphans), how many carry NULL keys (exempt per SQL FK semantics),
    and whether the relationship holds. ``on`` maps child column ->
    parent column.

    Shape at scale: parent side reduces to DISTINCT keys first (key
    columns only — at 100 TB that's the difference between shuffling a
    key set and shuffling a table), then ONE outer-probe join feeds a
    single map-combined aggregate producing every count at once — the
    child is scanned exactly once, with no driver-side counting.
    NULL-keyed rows are tallied but never probed as violations,
    matching FK semantics where a NULL key can't violate. One row out
    per call; compose calls for a whole schema's FK graph."""
    keys = list(on.items())
    child_cols = [c for c, _ in keys]
    null_key = None
    for c in child_cols:
        cond = F.col(c).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in keys]
    ).distinct().withColumn("_hit", F.lit(1))
    probed = child.select(
        *child_cols, null_key.alias("_nullkey")
    ).join(parent_keys, child_cols, "left_outer")
    orphan = ~F.col("_nullkey") & F.col("_hit").isNull()
    return probed.agg(
        F.lit(relation).alias("relation"),
        F.count(F.lit(1)).alias("n_child_rows"),
        F.sum(F.col("_nullkey").cast("long")).alias("n_null_keys"),
        F.sum(orphan.cast("long")).alias("n_orphans"),
        (F.sum(orphan.cast("long")) == 0).alias("passed"),
    ).select("relation", "n_child_rows", "n_null_keys", "n_orphans", "passed")


# Benford first-digit expectation, permille: round(1000*log10(1+1/d)).
# Driver-side literals — engine log() calls would not cross engines
# bit-identically, and these are mathematical constants anyway.
BENFORD_PERMILLE = {
    1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46,
}


def benford_report(
    df: DataFrame,
    col: str,
    prec: int = 12,
    scale: int = 2,
) -> DataFrame:
    """Benford's-law audit of a positive fixed-point measure column —
    the classic fabricated-data / unit-mixup smell test (Nigrini's
    digital-analysis recipe): compare the observed first-significant-
    digit distribution against log10(1 + 1/d).

    Hash-exactness: the first digit comes from the DECIMAL-exact scaled
    integer (cast(x as decimal)·10^scale → bigint → leading character),
    never from float log10 (double→bigint casts TRUNCATE on Spark but
    ROUND on DuckDB — the decimal route sidesteps that trap, see
    functions/numeric.py); observed shares are integer permilles via
    floor-division; expected shares are driver-side integer literals.

    Scale shape: one groupBy over ≤9 digit groups (map-side combined),
    then a 9-row broadcast of the total. The fact table is scanned
    once, projecting one column."""
    digit = F.substring(
        (dec(col, prec, scale) * (10 ** scale)).cast("bigint").cast("string"),
        1,
        1,
    ).cast("int")
    # filter on the SCALED integer, not the raw double: a positive
    # value below half an ulp of the scale (e.g. 0.004 at scale 2)
    # rounds to zero scaled units and has no leading digit
    scaled = (dec(col, prec, scale) * (10 ** scale)).cast("bigint")
    g = (
        df.where(scaled > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    expected = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for d, p in sorted(BENFORD_PERMILLE.items())
                for x in (d, p)
            ]
        ),
        F.col("digit"),
    )
    return (
        g.withColumn("_tot", F.sum("n_obs").over(w))
        .select(
            "digit",
            "n_obs",
            F.expr("div(1000 * n_obs, _tot)").alias("permille_obs"),
            expected.alias("permille_expected"),
        )
        .withColumn(
            "abs_dev_permille",
            F.abs(F.col("permille_obs") - F.col("permille_expected")),
        )
    )

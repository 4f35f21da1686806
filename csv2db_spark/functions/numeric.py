"""Exact-decimal aggregation helpers.

Why: double-precision sums are order-dependent; Spark (partial/merge over
32+ partitions, AQE re-plans) and a single-threaded oracle will not produce
bitwise-equal doubles on large inputs. Routing aggregation through DECIMAL
makes the arithmetic exact and order-independent on BOTH engines; the final
``cast(double)`` of the identical exact value is IEEE round-to-nearest →
identical bits, at any scale factor and any partitioning. No post-hoc
rounding is applied (rounding an inexact double near a boundary is exactly
the instability this avoids).

Precision discipline: casts are as narrow as the data needs (e.g. money →
decimal(12,2), rates → decimal(4,2)) so that chained products stay under
the 38-digit cap on both engines without silent scale reduction.

The identical recipe is written into each oracle SQL string via the
``sql_*`` builders, e.g. ``cast(sum(cast(x as decimal(12,2))) as double)``.

Cost: decimal aggregation stays inside whole-stage codegen on the JVM with
map-side partial aggregation — negligible vs the shuffle it rides on.

Reference parity note: and-hom/csv2db has no aggregation at all
(SURVEY.md §2.2) — this module underpins the analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Cast a fixed-point-valued double column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def money(col: Column | str) -> Column:
    """Money-like column (< 1e10, two decimals)."""
    return dec(col, 12, 2)


def rate(col: Column | str) -> Column:
    """Small ratio column (discount/tax: < 100, two decimals)."""
    return dec(col, 4, 2)


def dsum(col: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Order-independent exact sum, presented as double."""
    return F.sum(dec(col, prec, scale)).cast("double")


def davg(col: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Exact decimal sum divided by count — one IEEE division of identical
    operands on both engines → identical double."""
    return F.sum(dec(col, prec, scale)).cast("double") / F.count(F.lit(1))


# --- unscaled-integer fast path (round 14, guide §1.2 "per-task work") ---
#
# A decimal PRODUCT inside a sum is the expensive shape: (12,2)x(5,2)
# already carries per-row overflow checks, and the three-factor charge
# product leaves the compact-long representation entirely (38-digit
# BigDecimal per row). Measured at sf0.1 (lineitem, one agg pass):
# sum(money*(1-rate)*(1+rate)) 1.14 s vs the identical-value unscaled
# form 0.61 s. The rewrite keeps the decimal CASTS (so "" / rounding
# semantics are unchanged) but extracts the exact unscaled integer and
# multiplies in plain codegen longs; only the final SUM runs in decimal
# (38,0) so partial/merge aggregation stays overflow-safe at any scale.
#
# Bit-exactness: unscaled(x, p, s) == 10^s * cast(x as decimal(p,s))
# exactly; a product of unscaled longs is the unscaled value of the
# decimal product at the summed scale; sum(decimal(38,0)) of those is
# the unscaled exact total, and the final  / 10^scale  is a decimal
# rescale (scale 6 result ≥ any scale used here → exact), so the
# closing cast(double) rounds the SAME rational number the all-decimal
# form rounds → identical bits. Oracles stay on the all-decimal SQL.
#
# Overflow domain (documented like llm/text.bigram_lm_scores): the
# per-row long product must fit int64. For the TPC-H money/rate
# columns (money < 1e8 with 2 decimals → unscaled < 1e10; rates < 1
# → |100 ± rate_c| <= 200) the three-factor product is < 4e14, five
# orders under the 9.2e18 long cap; the decimal(38,0) sum then holds
# to ~1e38 — beyond any 100 TB corpus. Callers with wider domains use
# the plain dsum/davg forms.


def unscaled(col: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Exact unscaled integer of ``cast(col as decimal(prec,scale))``
    as a long: 10^scale * value. Requires 10^scale * |value| < 2^63."""
    return (dec(col, prec, scale) * F.lit(10**scale)).cast("long")


def dsum_unscaled(u: Column, scale: int) -> Column:
    """Exact sum of an unscaled-integer expression presented as double
    at 10^-scale — bit-identical to ``cast(sum(<decimal expr>) as
    double)`` of the equivalent decimal-product expression."""
    return (F.sum(u.cast("decimal(38,0)")) / F.lit(10**scale)).cast(
        "double"
    )


def davg_unscaled(u: Column, scale: int) -> Column:
    """``dsum_unscaled`` divided by count — the davg twin."""
    return dsum_unscaled(u, scale) / F.count(F.lit(1))


# --- SQL snippet builders so oracle strings use the identical recipe ---


def sql_dec(expr: str, prec: int = 18, scale: int = 2) -> str:
    return f"cast({expr} as decimal({prec},{scale}))"


def sql_money(expr: str) -> str:
    return sql_dec(expr, 12, 2)


def sql_rate(expr: str) -> str:
    return sql_dec(expr, 4, 2)


def sql_dsum(expr: str, prec: int = 18, scale: int = 2) -> str:
    return f"cast(sum(cast({expr} as decimal({prec},{scale}))) as double)"


def sql_davg(expr: str, prec: int = 18, scale: int = 2) -> str:
    return f"(cast(sum(cast({expr} as decimal({prec},{scale}))) as double) / count(*))"

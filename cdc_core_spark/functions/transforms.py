"""Scalar transformer library — Column-expression ports of the reference's
per-row transformer classes (mapping/src/main/java/io/zyient/core/mapping/
transformers/: IntegerTransformer, LongTransformer, DoubleTransformer,
DateTransformer, DateIntegerTransformer, RegexTransformer, EnumTransformer,
CurrencyValueTransformer, StringTransformer).

Every transformer compiles to a Catalyst expression (JVM-side, codegen'd,
vectorized) instead of interpreting per row — the reference's row-at-a-time
SpEL/Java path collapses into the plan. No Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# characters stripped by the locale-aware numeric parsers
# (reference NumericTransformer uses java.text.NumberFormat with locale)
_NUM_JUNK = r"[^0-9.\-+eE]"


def _to_integral(col, t: str) -> Column:
    """Locale-tolerant integer parse (NumberFormat.parse().intValue()
    semantics): strip grouping/currency junk, then try the DIRECT integral
    cast — exact for any in-range integer string — and only fall back
    through double (truncating toward zero) for decimal strings like
    '1234.56', which a direct int cast rejects as null. The direct-first
    order matters: routing every value through double would silently lose
    precision on integer strings beyond 2^53."""
    cleaned = F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                               _NUM_JUNK, "")
    return F.coalesce(cleaned.try_cast(t),
                      cleaned.try_cast("double").try_cast(t))


def to_int(col) -> Column:
    """IntegerTransformer: locale-tolerant parse — '$1,234.56' → 1234.
    'try' semantics: unparseable → null."""
    return _to_integral(col, "int")


def to_long(col) -> Column:
    return _to_integral(col, "bigint")


def to_double(col) -> Column:
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                            _NUM_JUNK, "").try_cast("double")


def currency_value(col) -> Column:
    """CurrencyValueTransformer: '$1,234.56' → 1234.56 (symbol/grouping strip)."""
    return to_double(col)


def parse_date(col, fmt: str = "yyyy-MM-dd") -> Column:
    """DateTransformer: format-driven parse; bad input → null (try semantics)."""
    return F.to_date(F.col(col) if isinstance(col, str) else col, fmt)


def parse_timestamp(col, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col, fmt)


def date_to_epoch_days(col) -> Column:
    """DateIntegerTransformer: date ↔ integer epoch-days."""
    return F.datediff(F.col(col) if isinstance(col, str) else col, F.lit("1970-01-01"))


def epoch_days_to_date(col) -> Column:
    return F.date_add(F.lit("1970-01-01").cast("date"),
                      (F.col(col) if isinstance(col, str) else col).cast("int"))


def regex_extract(col, pattern: str, group: int = 1) -> Column:
    """RegexTransformer (extract mode)."""
    return F.regexp_extract(F.col(col) if isinstance(col, str) else col, pattern, group)


def regex_replace(col, pattern: str, replacement: str) -> Column:
    """RegexTransformer (replace mode)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                            pattern, replacement)


def enum_map(col, mapping: dict, default=None) -> Column:
    """EnumTransformer: value→value mapping with optional default, compiled
    to a chained CASE WHEN (constant-folded by Catalyst)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        cond = c == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)


def stringify(col) -> Column:
    """StringTransformer: any value → string (structs via to_json)."""
    return (F.col(col) if isinstance(col, str) else col).cast("string")


def sha256_checksum(col) -> Column:
    """ChecksumUtils.computeSHA256 analog (common/.../utils/ChecksumUtils.java:34)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def decision_tree(branches: list[tuple[str, object]], default=None) -> Column:
    """Conditional mapping tree (core/.../decisions/EvaluationTree.java):
    ordered (sql_predicate, value_or_Column) branches → chained when()."""
    expr = None
    for pred, val in branches:
        v = val if isinstance(val, Column) else F.lit(val)
        expr = F.when(F.expr(pred), v) if expr is None else expr.when(F.expr(pred), v)
    d = default if isinstance(default, Column) else F.lit(default)
    return expr.otherwise(d) if expr is not None else d


def data_size(col) -> Column:
    """UnitsParser analog (common/.../utils/UnitsParser.java:39-75,
    ``parse`` regex + ``dataSize`` unit table): ``"<int> <unit>"`` →
    bytes as bigint; units K/KB, M/MB, G/GB, T/TB case-insensitive,
    optional whitespace, bare integers = bytes; unparseable / unknown
    unit → null. Pure built-ins (regexp_extract + CASE), codegen-folded.

    Two DOCUMENTED divergences from the reference, both on inputs it
    mishandles: (1) its TB branch multiplies 1024^3 — identical to GB, an
    apparent copy-paste slip (UnitsParser.java:71-74) — we use 1024^4;
    (2) its ``(\\d*)(\\w+)`` regex tokenizes a bare "512" as value=51 +
    unit="2" and returns -1 — we parse plain integers as bytes."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, r"^\s*(\d+)\s*([A-Za-z]*)\s*$", 1)
    unit = F.upper(F.regexp_extract(c, r"^\s*(\d+)\s*([A-Za-z]*)\s*$", 2))
    mult = (F.when(unit == "", F.lit(1))
            .when(unit.isin("K", "KB"), F.lit(1024))
            .when(unit.isin("M", "MB"), F.lit(1024 ** 2))
            .when(unit.isin("G", "GB"), F.lit(1024 ** 3))
            .when(unit.isin("T", "TB"), F.lit(1024 ** 4)))
    # try_cast/try_multiply, NOT cast/*: Spark 4 runs ANSI mode, where a
    # single out-of-range row ('9' * 20, '9000000000 TB') would CRASH the
    # job instead of honoring the null-on-unparseable contract
    val = num.try_cast("bigint")
    return (F.when(num != "", F.try_multiply(val, mult.cast("bigint")))
            .cast("bigint"))

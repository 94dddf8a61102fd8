"""Z-order (Morton) clustering expression for multi-column pruning.

The table ``sort_order`` prop clusters base files linearly: row-group
statistics get tight on the FIRST sort column, but a predicate on the
second column alone still matches every row group. Z-ORDER interleaves
the bits of several columns' codes into one sort key, so a maintenance
rewrite ordered by it yields row groups whose min/max envelopes are tight
on EVERY named column at once — the Delta OSS ``OPTIMIZE ZORDER BY`` /
Iceberg ``sort_order(zorder(...))`` analog, built from JVM-side bitwise
expressions (whole-stage codegen; no UDF, no extra shuffle — the z-value
is just another ``sortWithinPartitions`` key inside the write task).

Column → fixed-width code mapping:

* **numeric / timestamp**: ``width_bucket`` over the rewrite input's own
  min/max (ONE small agg job per rewrite). Codes are range-preserving, so
  both range and equality predicates prune. Per-rewrite stats are
  sufficient — parquet pruning compares real row-group min/max values,
  never the codes, so cross-file code consistency is irrelevant.
* **string / binary / boolean / other**: ``xxhash64`` truncated to the
  code width. Hash codes carry no range order, but equal values share a
  code and therefore cluster — equality predicates prune (the same
  trade Delta makes for non-comparable types).
* **NULLs** code to 0 and cluster together.

Code width is ``min(16, 62 // n_cols)`` bits so the interleaved z-value
always fits a non-negative bigint (2-3 columns get the classic 16 bits;
capped at 4 columns — beyond that each column contributes too few bits
to prune anything, which matches the engines' practical guidance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: dtypes that get range-preserving codes (everything else hashes).
#: EXACT names plus the parameterized decimal prefix — a prefix match on
#: "int" would also capture "interval day to second", which cannot cast to
#: double and must take the hash path
_RANGE_KINDS = frozenset(("tinyint", "smallint", "int", "bigint", "float",
                          "double", "date", "timestamp", "timestamp_ntz"))


def _is_ranged(dt: str) -> bool:
    return dt in _RANGE_KINDS or dt.startswith("decimal(")

MAX_COLS = 4


def validate_zorder_cols(cols: list[str]) -> None:
    """Shared shape check, callable at PROP-RECORDING time (engine
    construction / compact prop resolution) so a bad column count fails
    where the mistake is made, not at the first maintenance rewrite."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use sort_order for 1)")
    if len(cols) > MAX_COLS:
        raise ValueError(
            f"zorder supports at most {MAX_COLS} columns (got {len(cols)}): "
            "each extra column halves every column's code resolution")


def _code(df_dtypes: dict[str, str], col: str, lo, hi, bits: int) -> Column:
    """Fixed-width [0, 2^bits) code for one column (module docstring)."""
    n = 1 << bits
    dt = df_dtypes[col]
    if _is_ranged(dt):
        v = F.col(col)
        if dt in ("date",):
            v = v.cast("timestamp")
        v = v.cast("double")
        if lo is None or hi is None or not (float(hi) > float(lo)):
            return F.lit(0).cast("bigint")  # empty/constant/all-null column
        wb = F.width_bucket(v, F.lit(float(lo)), F.lit(float(hi)), F.lit(n))
        code = F.least(F.greatest(wb - F.lit(1), F.lit(0)), F.lit(n - 1))
        return F.coalesce(code, F.lit(0)).cast("bigint")
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n)).cast("bigint")


def zorder_column(df: DataFrame, cols: list[str]) -> Column:
    """The z-value sort key over ``cols`` for ``df``'s rows.

    Computes range stats for the numeric columns with one agg job over
    ``df`` (skipped when every column hashes), then builds the bit
    interleave as a static bitwise expression tree: z bit ``i*k + j`` is
    bit ``i`` of column ``j``'s code, most significant bits aligned, so
    sorting by the z-value visits the space in Morton order.
    """
    k = len(cols)
    validate_zorder_cols(cols)
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder columns not in frame: {missing!r}")
    bits = min(16, 62 // k)

    ranged = [c for c in cols if _is_ranged(dtypes[c])]
    stats: dict[str, tuple] = {}
    if ranged:
        aggs = []
        for c in ranged:
            v = F.col(c)
            if dtypes[c] == "date":
                v = v.cast("timestamp")
            v = v.cast("double")
            aggs += [F.min(v).alias(f"lo_{c}"), F.max(v).alias(f"hi_{c}")]
        row = df.agg(*aggs).first()  # one row of stats to the driver
        stats = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in ranged}

    codes = [_code(dtypes, c, *(stats.get(c, (None, None))), bits=bits)
             for c in cols]
    one = F.lit(1).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, code in enumerate(codes):
            bit = F.shiftright(code, i).bitwiseAND(one)
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z.alias("_zvalue")

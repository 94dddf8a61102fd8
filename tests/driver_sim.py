"""Simulate the driver's correctness gate: run each __spark_entry__.queries()
entry AND its oracle_sql() on sf0.01, compare row-count, schema, value-hash
after sorting columns by name and rows by all columns.

Usage: python tests/driver_sim.py [sf_dir] [query ...]
Not collected by pytest (no test_ prefix functions).
"""
from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple[str, list[str], int]:
    """Dtype-STRICT canon mirroring the real driver (judged round 1):
    a float 2.0 is NOT the int 2 (DuckDB HUGEINT sums come back as float64 —
    oracles must CAST to BIGINT), and array/list cells are rejected outright
    (the driver's pandas sort_values crashes on unhashable cells)."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"f:{v:.6g}"
        if isinstance(v, (list, tuple, dict)) or (hasattr(v, "tolist")
                                                  and getattr(v, "ndim", 0)):
            raise TypeError(
                f"array-typed cell {type(v).__name__} — the driver's canon "
                "cannot sort these; gate queries must emit scalars only")
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        import numpy as np
        if isinstance(v, np.floating):   # float32/float64 — NEVER truncate
            # np.float32 is NOT a subclass of float, so a float32 NaN would
            # skip the top guard and canon as "f:nan" ≠ "NULL"
            return "NULL" if math.isnan(float(v)) else f"f:{float(v):.6g}"
        if isinstance(v, (bool, np.bool_)):
            return f"b:{bool(v)}"
        if isinstance(v, (int, np.integer)):
            return f"i:{int(v)}"
        # strings (and text-rendered timestamps/decimals): tag + escape the
        # row separator so ('a|b','c') ≠ ('a','b|c') and the literal string
        # 'NULL' ≠ SQL NULL — without this, structurally different results
        # hash identical and the gate prints a false OK
        return "s:" + str(v).replace("\\", "\\\\").replace("|", "\\|")

    rows = sorted(
        ["|".join(cell(v) for v in rec) for rec in df.itertuples(index=False, name=None)]
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return h, sorted(df.columns), len(df)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from cdc_core_spark.session import get_spark

    spark = get_spark(app_name="driver_sim", cores=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qmap = entry.queries()
    omap = entry.oracle_sql()
    unknown = only - set(qmap)
    if unknown:
        # a typo'd filter must not print ALL OK having verified nothing
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_fail = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in omap:
            try:
                canon(sdf)  # the real driver canonicalizes rows-only queries too
            except TypeError as e:
                print(f"FAIL  {name}: canon error {e}")
                n_fail += 1
                continue
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(omap[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        try:
            sh, scols, sn = canon(sdf)
            oh, ocols, on = canon(odf)
        except TypeError as e:
            print(f"FAIL  {name}: canon error {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: schema {scols} vs {ocols}")
            n_fail += 1
        elif sn != on:
            print(f"FAIL  {name}: rows {sn} vs {on}")
            n_fail += 1
        elif sh != oh:
            print(f"FAIL  {name}: value hash {sh} vs {oh} ({sn} rows)")
            n_fail += 1
        else:
            print(f"OK    {name}: {sn} rows hash={sh}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values. Usage:
    python tools/check_entry.py [sf_dir] [only_query_prefix]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    """Tighter than round-1 (%.9g): %.12g + Decimal→int/float folding, so a
    local pass predicts the driver's (full-precision) value hash. Every
    oracle query should CAST its integer aggregates (DuckDB sum() returns
    HUGEINT/DECIMAL) and round() float columns identically on both sides."""
    import decimal

    if isinstance(v, decimal.Decimal):
        v = int(v) if v == v.to_integral_value() else float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    import __spark_entry__ as entry_mod
    from esgkg.session import get_spark

    spark = get_spark(cores=8, app="check_entry")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"ROWS-ONLY {name}: {len(rows)} rows ({dt:.1f}s)")
            if len(rows) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            res = con.sql(osql[name])
            ocols = [c for c in res.columns]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(cols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(cols)} vs {sorted(ocols)}")
            ok = False
        elif len(rows) != len(orows):
            print(f"FAIL {name}: rowcount {len(rows)} vs {len(orows)}")
            ok = False
        else:
            a = rowset(cols, [tuple(r) for r in rows])
            b = rowset(ocols, orows)
            if a != b:
                diff_a = {k: c for k, c in a.items() if b.get(k) != c}
                diff_b = {k: c for k, c in b.items() if a.get(k) != c}
                print(
                    f"FAIL {name}: value mismatch "
                    f"(spark-only={list(diff_a)[:3]}, "
                    f"oracle-only={list(diff_b)[:3]})"
                )
                ok = False
        if ok:
            print(f"PASS {name}: {len(rows)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"SUMMARY pass={n_pass} fail={n_fail}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB
over the same sf dir, compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as E
from ptt_spider_go_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import pandas.api.types as pt

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pt.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pt.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pt.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    qs, oracles = E.queries(), E.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL {name}: spark error {str(exc)[:2000]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL {name}: duckdb error {str(exc)[:2000]}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append((name, f"columns {list(s.columns)} vs {list(o.columns)}"))
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append((name, f"rows {len(s)} vs {len(o)}"))
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        if not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            ex = []
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                ex.append(f"{c}[{i}]: spark={s[c][i]!r} duck={o[c][i]!r}")
            failures.append((name, f"values differ in {bad_cols}: {ex}"))
            print(f"FAIL {name}: values differ in {bad_cols}: {ex}")
            continue
        print(f"PASS {name} ({len(s)} rows)")

    print(f"\n{len(failures)} failures")
    for n, msg in failures:
        print(f"  {n}: {msg[:300]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

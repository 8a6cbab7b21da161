"""Emulate the round driver: run every queries() entry on Spark AND its
oracle_sql() in DuckDB at a given SF dir, compare rows / schema / values
(columns sorted by name, rows sorted, exact values after normalizing dtypes).

Usage:
    python tools/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iuf":
            df[c] = pd.to_numeric(df[c])
        df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v) if df[c].dtype == object else df[c]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spec = importlib.util.spec_from_file_location("entry", os.path.join(REPO, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from osmquadtree_bin_spark.session import get_spark

    spark = get_spark(app="driver-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, osql = m.queries(), m.oracle_sql()
    results, n_bad = {}, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sp = fn(spark, sf).toPandas()
            # q26/q27 persist their generated input and can't unpersist
            # before the caller consumes the plan — evict between queries so
            # cached frames don't accumulate over the 35+-query session
            spark.catalog.clearCache()
            if name not in osql:
                results[name] = {"rows": len(sp), "oracle": None, "ok": "rows-only"}
                continue
            orc = con.execute(osql[name]).df()
            a, b = norm(sp), norm(orc)
            ok_rows = len(a) == len(b)
            ok_cols = list(a.columns) == list(b.columns)
            ok_dtype = ok_cols and all(
                (a[c].dtype.kind == b[c].dtype.kind) or {a[c].dtype.kind, b[c].dtype.kind} <= {"i", "u"}
                for c in a.columns
            )
            ok_vals = ok_rows and ok_cols and a.astype(str).equals(b.astype(str))
            ok = ok_rows and ok_cols and ok_dtype and ok_vals
            results[name] = {
                "rows": len(a), "oracle": len(b), "cols": ok_cols,
                "dtypes_spark": {c: str(a[c].dtype) for c in a.columns} if not ok_dtype else "match",
                "dtypes_oracle": {c: str(b[c].dtype) for c in b.columns} if not ok_dtype else "match",
                "ok": bool(ok),
            }
            if not ok:
                n_bad += 1
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
            n_bad += 1
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{'ALL OK' if n_bad == 0 else f'{n_bad} FAILED'} "
          f"({sum(1 for v in results.values() if v.get('ok') is True)} hash-green, "
          f"{sum(1 for v in results.values() if v.get('ok') == 'rows-only')} rows-only)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, and
compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Byte-compatible with the driver's `_canon`: sort columns by name,
    sort rows by all columns — NO list->tuple coercion.  A query whose
    output contains array cells fails here with the same TypeError the
    driver raises (round 1 lesson: the local gate must never be more
    permissive than the driver's)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (list, np.ndarray))
        ).any():
            raise TypeError(
                f"column {c!r} contains array cells — the driver's "
                "canonicalizer cannot sort these; expose a scalar digest "
                "(tokens_digest_col) instead"
            )
        if "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    from tokforge.engine.session import build_spark

    spark = build_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    t_total0 = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = normalize(fn(spark, sf_dir).toPandas())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only, {len(sdf)} rows)")
            continue
        try:
            odf = normalize(con.execute(sql).df())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            n_fail += 1
            continue
        eq = True
        for c in sdf.columns:
            a, b = sdf[c], odf[c]
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                col_eq = np.allclose(
                    a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
                )
            else:
                col_eq = a.astype(object).equals(b.astype(object))
            if not col_eq:
                mism = (a.astype(object) != b.astype(object)).to_numpy().nonzero()[0][:3]
                print(f"FAIL {name}: column {c} differs at rows {mism.tolist()}")
                for i in mism[:2]:
                    print(f"   spark: {a.iloc[i]!r}")
                    print(f"   duck : {b.iloc[i]!r}")
                eq = False
                break
        if eq:
            print(f"PASS {name} ({len(sdf)} rows, {time.time() - t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1

    print(f"\n{n_pass} passed, {n_fail} failed in {time.time() - t_total0:.1f}s")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

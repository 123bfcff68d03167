#!/usr/bin/env python
"""Run every __spark_entry__ query against its DuckDB oracle and report
rows/schema/value-hash equality — the external driver's correctness gate,
runnable standalone at any scale factor.

Usage: python scripts/check_oracles.py [sf_dir]   (default /root/testdata/sf0.01)
Set SPARK_GRAFT_ONLY=name1,name2 to check a subset (iteration aid).
Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from literature_to_facts_spark.config import get_spark

    spark = get_spark(app_name="check-oracles", master=f"local[{os.cpu_count()}]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = em.queries(), em.oracle_sql()
    only = [s for s in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if s]
    if only:
        unknown = [n for n in only if n not in queries]
        if unknown:  # a typo must not make the gate vacuously pass
            print(f"unknown query name(s) in SPARK_GRAFT_ONLY: {unknown}")
            return 1
        queries = {k: v for k, v in queries.items() if k in only}
    n_fail = 0
    t_total = time.monotonic()
    for name in sorted(queries):
        t0 = time.monotonic()
        try:
            sdf = queries[name](spark, sf_dir)
            srows = sdf.collect()
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rows_ok = len(srows) == len(orows)
            cols_ok = sorted(sdf.columns) == sorted(ocols)
            vals_ok = _rowset(sdf.columns, srows) == _rowset(ocols, orows)
            ok = rows_ok and cols_ok and vals_ok
        except Exception as e:  # noqa: BLE001 — report, keep checking
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}")
            n_fail += 1
            continue
        status = "ok  " if ok else "FAIL"
        print(
            f"{status} {name}: rows={len(srows)} cols={cols_ok} vals={vals_ok}"
            f" sec={time.monotonic() - t0:.2f}"
        )
        if not ok:
            n_fail += 1
    spark.stop()
    print(
        f"{len(queries) - n_fail}/{len(queries)} queries match at {sf_dir}"
        f" in {time.monotonic() - t_total:.1f}s"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

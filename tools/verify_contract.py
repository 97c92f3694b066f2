"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/verify_contract.py [sf_dir] [query ...]
(extra args restrict the run to the named queries() entries)
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from rasters_rs_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    return lines


def main(sf_dir: str, only=None):
    spark = get_spark("verify-contract", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    if only:
        missing = [n for n in only if n not in qs]
        assert not missing, f"unknown queries: {missing}"
        qs = {n: qs[n] for n in only}
    else:
        print(f"== entry() smoke ==", flush=True)
        t0 = time.time()
        edf = entrymod.entry(spark)
        n = len(edf.collect())
        print(f"entry: {n} rows, schema {edf.columns} [{time.time()-t0:.1f}s]")

    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: {len(srows)} rows (rows-only) [{el:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sc = sorted(c.lower() for c in scols)
        oc = sorted(ocols)
        if sc != oc:
            print(f"FAIL  {name}: schema {sc} != {oc}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            failures += 1
            continue
        ssig = frame_sig([c.lower() for c in scols], srows)
        osig = frame_sig(ocols, orows)
        if ssig != osig:
            bad = [i for i, (a, b) in enumerate(zip(ssig, osig)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"        spark:  {ssig[i][:200]}")
                print(f"        duckdb: {osig[i][:200]}")
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows match [{el:.1f}s]")

    print(f"\n{failures} failures / {len(qs)} queries")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1 else
                       "/root/testdata/sf0.01",
                       only=sys.argv[2:] or None) else 0)

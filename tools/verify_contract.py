"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/verify_contract.py [sf_dir] [query ...]
(extra args restrict the run to the named queries() entries)

Env CONTRACT_JSON=<path>: also write a driver-shaped JSON artifact
(name -> {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}; rows-only queries get hash_match=null) — the
committed per-round CORRECTNESS_local_r{N}.json evidence.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from audit_oracle_types import expected_duck  # noqa: E402
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

    report = {}
    for name, fn in qs.items():
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            rec["err"] = f"spark error: {e}"[:500]
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        el = time.time() - t0
        rec["spark_rows"] = len(srows)
        if name not in oracles:
            rec["rows_match"] = True
            rec["schema_match"] = True
            rec["hash_match"] = None      # rows-only surface
            print(f"ok*   {name}: {len(srows)} rows (rows-only) [{el:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            otypes = {c.lower(): str(t).upper()
                      for c, t in zip(res.columns, res.types)}
            orows = res.fetchall()
        except Exception as e:
            rec["err"] = f"duckdb error: {e}"[:500]
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        rec["oracle_rows"] = len(orows)
        sc = sorted(c.lower() for c in scols)
        oc = sorted(ocols)
        if sc != oc:
            rec["err"] = f"schema {sc} != {oc}"
            print(f"FAIL  {name}: schema {sc} != {oc}")
            failures += 1
            continue
        rec["schema_match"] = True
        # type gate: the driver's value-hasher is type-sensitive
        # while norm() stringifies (r6 pack_sequences HUGEINT fail) —
        # require every oracle column to bind to the Spark type
        tbad = []
        for col, st in sdf.dtypes:
            exp = expected_duck(st)
            got = otypes.get(col.lower())
            if exp is not None and got is not None and got not in exp:
                tbad.append(f"{col}: spark {st} vs duckdb {got}")
        if tbad:
            rec["err"] = "oracle type drift: " + "; ".join(tbad)
            print(f"FAIL  {name}: {rec['err']}")
            failures += 1
            continue
        if len(srows) != len(orows):
            rec["err"] = f"rowcount {len(srows)} != {len(orows)}"
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            failures += 1
            continue
        rec["rows_match"] = True
        ssig = frame_sig([c.lower() for c in scols], srows)
        osig = frame_sig(ocols, orows)
        if ssig != osig:
            bad = [i for i, (a, b) in enumerate(zip(ssig, osig)) if a != b][:3]
            rec["err"] = f"value mismatch at sorted rows {bad}"
            print(f"FAIL  {name}: value mismatch at sorted rows {bad}")
            for i in bad[:2]:
                print(f"        spark:  {ssig[i][:200]}")
                print(f"        duckdb: {osig[i][:200]}")
            failures += 1
            continue
        rec["hash_match"] = True
        print(f"ok    {name}: {len(srows)} rows match [{el:.1f}s]")

    out_path = os.environ.get("CONTRACT_JSON")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    print(f"\n{failures} failures / {len(qs)} queries")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1 else
                       "/root/testdata/sf0.01",
                       only=sys.argv[2:] or None) else 0)

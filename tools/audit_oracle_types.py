"""Audit every oracle_sql() entry's DuckDB output types against the
Spark query's schema — WITHOUT executing either side (Spark schemas
come from the lazy plan; DuckDB types from statement binding).

The driver's value-hasher is type-sensitive while the local verifier
stringifies, so a DuckDB type drift (the classic: SUM(BIGINT) ->
HUGEINT, r6 pack_sequences hash-fail) passes locally and fails the
gate.  This audit closes that blind spot: run it after touching any
oracle.

Usage: python tools/audit_oracle_types.py [sf_dir]
Exit 1 on any mismatch.
"""

from __future__ import annotations

import re
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from rasters_rs_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# spark simpleString dtype -> acceptable DuckDB type strings
SPARK_TO_DUCK = {
    "tinyint": {"TINYINT"},
    "smallint": {"SMALLINT"},
    "int": {"INTEGER"},
    "bigint": {"BIGINT"},
    "float": {"FLOAT"},
    "double": {"DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def expected_duck(spark_dtype: str) -> set[str] | None:
    st = spark_dtype.lower()
    if st in SPARK_TO_DUCK:
        return SPARK_TO_DUCK[st]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", st)
    if m:
        return {f"DECIMAL({m.group(1)},{m.group(2)})"}
    m = re.fullmatch(r"array<(.+)>", st)
    if m:
        inner = expected_duck(m.group(1))
        if inner is None:
            return None
        return {f"{t}[]" for t in inner}
    return None  # struct/map etc: not auditable here


def main(sf_dir: str) -> int:
    spark = get_spark("audit-oracle-types", cores=4, shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if name not in oracles:
            print(f"skip  {name}: rows-only (no oracle)")
            continue
        try:
            sdf = fn(spark, sf_dir)
            sdt = {c.lower(): t for c, t in sdf.dtypes}
        except Exception as e:  # pragma: no cover - audit tool
            print(f"ERR   {name}: spark plan error: {e}")
            bad += 1
            continue
        try:
            rel = con.sql(oracles[name])
            odt = {c.lower(): str(t).upper()
                   for c, t in zip(rel.columns, rel.types)}
        except Exception as e:  # pragma: no cover - audit tool
            print(f"ERR   {name}: duckdb bind error: {e}")
            bad += 1
            continue
        issues = []
        for col, st in sorted(sdt.items()):
            if col not in odt:
                issues.append(f"{col}: missing in oracle")
                continue
            exp = expected_duck(st)
            if exp is None:
                continue  # complex type: hash gate doesn't cover these
            if odt[col] not in exp:
                issues.append(f"{col}: spark {st} vs duckdb {odt[col]}")
        for col in sorted(set(odt) - set(sdt)):
            issues.append(f"{col}: oracle-only column")
        if issues:
            bad += 1
            print(f"TYPE  {name}: " + "; ".join(issues))
        else:
            print(f"ok    {name}")
    print(f"\n{bad} queries with type issues / {len(qs)}")
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1
                       else "/root/testdata/sf0.01") else 0)

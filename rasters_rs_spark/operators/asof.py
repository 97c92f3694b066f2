"""As-of join: enrich each left row with the latest right row at or
before its timestamp (per key). Spark has no native ASOF; this is the
standard union-tag-window formulation — one shuffle on (key, ts), no
UDFs, exact semantics matching DuckDB's native ASOF JOIN (which the
contract oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str] | None = None,
              tolerance_seconds: float | None = None) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts`` <= left.ts within the same ``key``. Left rows with no
    earlier right row keep nulls (ASOF LEFT JOIN semantics).

    Implementation: union both sides tagged by origin, sort within key
    by (ts, origin) — right rows sort before left rows at equal ts so
    exact-tie matches are taken — then the last RIGHT ROW (a single
    struct of all its value columns) via a running window, unpacked
    after the fact. Carrying one struct keeps the match atomic: the
    selected row's own NULL values are preserved, and no two value
    columns can come from different right rows (DuckDB ASOF attaches
    exactly one matched row). One shuffle; codegen throughout.

    ``tolerance_seconds`` (pandas merge_asof parity): matches older
    than the tolerance are discarded — the left row keeps NULLs, as if
    no sufficiently recent right row existed. Works for timestamp ts
    columns (staleness via timestampdiff) and for numeric ts columns
    (plain subtraction, like merge_asof on integer/float keys).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, ts)]

    right_types = dict(right.dtypes)
    fields = [f"`{c}`:{right_types[c]}" for c in value_cols]
    if tolerance_seconds is not None:
        fields.append(f"`_mts`:{right_types[ts]}")
    row_struct_type = "struct<" + ", ".join(fields) + ">"

    lt = left.withColumn("_src", F.lit(1)) \
             .withColumn("_row", F.lit(None).cast(row_struct_type))
    r_fields = [F.col(c) for c in value_cols]
    if tolerance_seconds is not None:
        r_fields.append(F.col(ts).alias("_mts"))
    rt = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_src"),
        F.struct(*r_fields).alias("_row"))
    for c in left.columns:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = lt.unionByName(rt.select(lt.columns))
    w = (Window.partitionBy(key).orderBy(ts, "_src")
         .rowsBetween(Window.unboundedPreceding, 0))
    out = u.withColumn("_row", F.last("_row", ignorenulls=True).over(w)) \
           .where(F.col("_src") == 1).drop("_src")
    if tolerance_seconds is not None:
        ts_type = dict(left.dtypes)[ts]
        if ts_type.startswith("timestamp") or ts_type == "date":
            stale = F.expr(
                f"timestampdiff(MICROSECOND, cast(_row._mts as timestamp_ntz), "
                f"cast({ts} as timestamp_ntz)) / 1e6") > tolerance_seconds
        else:
            # numeric ts (epoch seconds etc.): Spark cannot cast numerics
            # to TIMESTAMP_NTZ, and merge_asof tolerance on numeric keys
            # is a plain difference anyway
            stale = (F.col(ts) - F.col("_row._mts")) > F.lit(tolerance_seconds)
        out = out.withColumn(
            "_row", F.when(F.col("_row").isNull() | stale,
                           F.lit(None).cast(row_struct_type))
                     .otherwise(F.col("_row")))
    for c in value_cols:
        out = out.withColumn(c, F.col("_row")[c])
    return out.drop("_row")

"""As-of join vs a python oracle (and exact-tie semantics)."""

import pandas as pd

from rasters_rs_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "t": [5.0, 10.0, 20.0, 1.0, 9.0, 3.0],
        "lid": [1, 2, 3, 4, 5, 6],
    })).withColumnRenamed("t", "ts")
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "b", "b"],
        "t": [4.0, 10.0, 2.0, 8.0],
        "v": [100.0, 200.0, 300.0, 400.0],
    })).withColumnRenamed("t", "ts")

    out = {r["lid"]: r["v"] for r in
           asof_join(left, right, key="k", ts="ts").collect()}
    assert out[1] == 100.0      # latest right at/before t=5 is t=4
    assert out[2] == 200.0      # exact tie t=10 matches
    assert out[3] == 200.0
    assert out[4] is None       # no right row at/before t=1
    assert out[5] == 400.0
    assert out[6] is None       # key with no right rows at all


def test_asof_matched_row_is_atomic(spark):
    """The matched right row is attached whole: its own NULLs are
    preserved (no substitution from an older row) and multiple value
    columns always come from the same right row."""
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"], "ts": [10.0, 30.0], "lid": [1, 2]}))
    right_pdf = pd.DataFrame({
        "k": ["a", "a"],
        "ts": [5.0, 20.0],
        "u": [11.0, None],     # newer row has NULL u
        "v": [None, 22.0],     # newer row has non-null v
    })
    right = spark.createDataFrame(right_pdf)

    rows = {r["lid"]: (r["u"], r["v"]) for r in
            asof_join(left, right, key="k", ts="ts").collect()}
    # lid=1 matches ts=5: (11.0, NULL)
    assert rows[1] == (11.0, None)
    # lid=2 matches ts=20 atomically: (NULL, 22.0) — u must NOT be
    # back-filled with 11.0 from the older row
    assert rows[2] == (None, 22.0)


def test_asof_matches_duckdb(spark, sf_dir):
    import duckdb
    import __spark_entry__ as E
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    sdf = E.queries()["asof_purchase_before_error"](spark, sf_dir)
    got = sorted((r["event_id"], r["last_purchase_value"]) for r in sdf.collect())
    orows = sorted(con.sql(
        E.oracle_sql()["asof_purchase_before_error"]).fetchall())
    assert got == orows


def test_asof_tolerance(spark):
    """Matches older than the tolerance yield NULL (pandas merge_asof
    tolerance semantics); in-tolerance matches are unchanged."""
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"],
        "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 12:00:00"]),
        "lid": [1, 2]}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a"],
        "ts": pd.to_datetime(["2024-01-01 09:30:00"]),
        "v": [7.0]}))
    out = {r["lid"]: r["v"] for r in
           asof_join(left, right, key="k", ts="ts",
                     tolerance_seconds=3600.0).collect()}
    assert out[1] == 7.0      # 30 min old: within tolerance
    assert out[2] is None     # 2.5 h old: discarded


def test_asof_tolerance_numeric_ts(spark):
    """tolerance_seconds on a NUMERIC ts column (epoch seconds /
    doubles): pandas merge_asof tolerance works on numeric keys, and
    the base operator supports them — the tolerance path must too
    (round-2 advice: the timestamp_ntz cast raised AnalysisException
    for numeric ts)."""
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": [100.0, 500.0, 50.0],
        "lid": [1, 2, 3]}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "b"],
        "ts": [90.0, 45.0],
        "v": [7.0, 8.0]}))
    out = {r["lid"]: r["v"] for r in
           asof_join(left, right, key="k", ts="ts",
                     tolerance_seconds=60.0).collect()}
    assert out[1] == 7.0      # 10 units old: within tolerance
    assert out[2] is None     # 410 units old: discarded
    assert out[3] == 8.0

    # pandas merge_asof parity on the same data
    lp = pd.DataFrame({"k": ["a", "a", "b"], "ts": [100.0, 500.0, 50.0],
                       "lid": [1, 2, 3]}).sort_values("ts")
    rp = pd.DataFrame({"k": ["a", "b"], "ts": [90.0, 45.0],
                       "v": [7.0, 8.0]}).sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="k", tolerance=60.0)
    expect = {int(r.lid): (None if pd.isna(r.v) else float(r.v))
              for r in m.itertuples()}
    assert out == expect

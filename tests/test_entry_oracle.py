"""Local mirror of the driver's correctness gate: every oracle-paired
query in ``__spark_entry__`` runs on Spark AND DuckDB at sf0.001; row sets
must match (order-insensitive, column-name aligned), and the canonical
md5-of-sorted-rows hashes must be IDENTICAL (the driver's hash gate shape)
— local green predicts driver green bit-for-bit, not just within
tolerance (VERDICT r4, next-round item 8)."""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    key = df.astype(str)
    df = df.loc[key.sort_values(list(df.columns)).index].reset_index(drop=True)
    return df


def _canon_cell(x) -> str:
    """Engine-independent scalar rendering for the row hash: floats
    rounded to 9 dp then repr'd (shortest round-trip), timestamps at
    microsecond text, arrays element-wise, null and NaN collapse."""
    if x is None:
        return ""
    if isinstance(x, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(v) for v in x) + "]"
    if isinstance(x, (np.floating, float)):
        x = float(x)
        if math.isnan(x):
            return ""
        return repr(round(x, 9))
    if isinstance(x, np.integer):
        return str(int(x))
    if isinstance(x, pd.Timestamp):
        return x.isoformat(sep=" ")
    if x is pd.NaT:
        return ""
    return str(x)


def _row_hash(df: pd.DataFrame) -> str:
    """md5 of the sorted canonical rows over name-sorted columns — the
    driver's value-hash shape. Equal hashes == bit-for-bit equal result
    sets under the canonicalization above."""
    df = df[sorted(df.columns)]
    rows = sorted(
        "\x1f".join(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode("utf-8")).hexdigest()


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


def _assert_frames_match(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a, b = _canon(spark_df), _canon(oracle_df)
    mismatches = []
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x = None if (isinstance(x, float) and math.isnan(x)) else x
            y = None if (isinstance(y, float) and math.isnan(y)) else y
            if x is None and y is None:
                continue
            if x is None or y is None or not _values_equal(x, y):
                mismatches.append((col, i, x, y))
                if len(mismatches) > 5:
                    break
        if len(mismatches) > 5:
            break
    assert not mismatches, f"{name}: value mismatches {mismatches[:5]}"
    ha, hb = _row_hash(spark_df), _row_hash(oracle_df)
    assert ha == hb, (
        f"{name}: canonical row-hash mismatch ({ha} vs {hb}) — results are "
        "tolerance-close but not bit-identical; the driver's hash gate "
        "would flag this"
    )


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(sql).df()
    _assert_frames_match(name, spark_pdf, oracle_pdf)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_rows_only_queries_run(spark):
    for name, fn in entry_mod.queries().items():
        if name not in entry_mod.oracle_sql():
            assert fn(spark, SF_DIR).count() >= 0, name

"""Mirror of the external driver's correctness gate: run every queries()
entry and its oracle_sql() side by side on the same parquet tables and demand
exact (order-insensitive) value equality. Uses sf0.001 for speed; the driver
runs sf0.01."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

# the driver sees exactly the 50 registered queries; the in-repo gate also
# checks the six redundant TPC-H shapes trimmed from the driver registry
from openmrs_module_epts_etl_spark.plans import (  # noqa: E402
    IN_REPO_ONLY_ORACLES,
    IN_REPO_ONLY_QUERIES,
)

QUERIES = {**entrymod.queries(), **IN_REPO_ONLY_QUERIES}
ORACLES = {**entrymod.oracle_sql(), **IN_REPO_ONLY_ORACLES}


def test_driver_registry_is_exactly_50():
    assert len(entrymod.queries()) == 50


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes,)):
            df[c] = df[c].map(lambda b: b.hex())
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            # DuckDB DECIMAL comes back as decimal.Decimal
            import decimal

            if len(df) and isinstance(df[c].iloc[0], decimal.Decimal):
                df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    got = normalize(QUERIES[name](spark, SF_DIR).toPandas())
    if name not in ORACLES:
        # rows-only check, like the driver's weaker path
        assert got.shape[0] >= 0
        return
    want = normalize(ddb.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert got.shape == want.shape, f"{name}: shape {got.shape} != {want.shape}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

"""Driver-contract tests: every queries() entry matches its DuckDB oracle
at sf0.001 (the driver's own gate runs sf0.01)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize null-likes: Spark NULLs arrive as None (object cols) while
    # DuckDB's arrive as NaN — pandas will stop treating those as equal
    # (FutureWarning in assert_frame_equal); one representation for both
    df = df.astype(object).where(df.notna(), None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"url", "text", "status"} <= {f.name for f in df.schema.fields}


def test_every_query_has_oracle_or_is_declared(spark):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)


@pytest.mark.parametrize("name", list(entrymod.queries()))
def test_query_matches_oracle(spark, oracle_con, name):
    fn = entrymod.queries()[name]
    got = _canon(fn(spark, SF_DIR).toPandas())
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        assert len(got) >= 0  # rows-only check for non-SQL-expressible ops
        return
    want = _canon(oracle_con.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_registry_within_driver_budget():
    """The driver's per-round CORRECTNESS harness runs the FIRST ~50
    queries() entries — any entry beyond 50 never gets a hard oracle row
    (this is why round 4 consolidated 79 -> 50).  Keep the registry at or
    under the budget, with an oracle for every entry."""
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) <= 50, f"registry has {len(qs)} queries; driver checks ~50"
    assert set(qs) == set(osql)

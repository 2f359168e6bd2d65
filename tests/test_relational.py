"""Registry contract tests: every query runs and matches its DuckDB oracle
at sf0.001 (the full-scale gate runs tools/oracle_check.py at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pysparkflow.relational.registry import ORACLE_SQL, QUERIES, TABLES

# fast oracle-paired queries worth running in the unit suite
SPOT_CHECK = [
    "groupagg_pricing",
    "edge_symmetrize",
    "semi_join",
    "anti_join",
    "topk_per_group",
    "hash_sample",
    "rollup",
    "events_hourly",
    "sessionize",
    "bfs_distances",
    "dedup_exact",
    "text_quality",
    "lang_id",
    "token_totals",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_every_query_has_callable_and_oracle_keys():
    assert set(ORACLE_SQL) <= set(QUERIES)
    assert len(QUERIES) >= 30


@pytest.mark.parametrize("name", SPOT_CHECK)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.sql(ORACLE_SQL[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = _normalize(sdf), _normalize(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

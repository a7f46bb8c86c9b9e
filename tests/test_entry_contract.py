"""Mimics the driver's verify: run each __spark_entry__ query on Spark and
its oracle on DuckDB at sf0.01, compare row count + order-insensitive
values (columns sorted by name, every cell stringified)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, bool):
                vals.append(str(bool(v)))
            elif isinstance(v, float):
                vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", list(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    rel = duck.sql(oracle)
    duck_rows = rel.fetchall()
    duck_cols = rel.columns

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows)
    a, b = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"first mismatches: {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["bit_identical"] for r in rows)

"""Mirror of the driver's correctness gate: run every queries() entry and
its oracle_sql() through DuckDB on the same parquet, compare row count +
columns + order-insensitive values.

Type-faithful to the driver's value-hash: both sides are converted to
pandas through the same paths the driver uses (Spark ``toPandas`` /
DuckDB ``.df()``) and the per-column dtype KINDS must agree — a Spark
int64 against a DuckDB float64 (the sum(BIGINT)→HUGEINT trap) fails here
even though Python ``44820 == 44820.0``, because the driver's hash
distinguishes them."""

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows(frame):
    rows = [tuple(_norm(v) for v in r) for r in frame.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)  # repr-key: mixed None/"nan"/float cells stay sortable


# dtype kinds that hash identically under the driver's pandas conversion
_KIND_EQ = {"i": "i", "u": "i", "f": "f", "O": "O", "b": "b", "M": "M", "m": "m"}


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, ddb, name):
    spdf = QUERIES[name](spark, SF_DIR).toPandas()
    spdf.columns = [c.lower() for c in spdf.columns]
    opdf = ddb.execute(ORACLES[name]).df()
    opdf.columns = [c.lower() for c in opdf.columns]

    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: columns {sorted(spdf.columns)} != {sorted(opdf.columns)}"
    )
    cols = sorted(spdf.columns)
    spdf, opdf = spdf[cols], opdf[cols]
    assert len(spdf) == len(opdf), f"{name}: rowcount {len(spdf)} != {len(opdf)}"

    kinds = [
        (c, _KIND_EQ.get(spdf[c].dtype.kind, "?"), _KIND_EQ.get(opdf[c].dtype.kind, "?"))
        for c in cols
    ]
    bad = [k for k in kinds if k[1] != k[2]]
    assert not bad, (
        f"{name}: dtype-kind divergence (driver hash would differ): {bad} "
        f"— cast in BOTH queries() and oracle_sql() (DuckDB sum(BIGINT) is HUGEINT→float64)"
    )

    sn, on = _rows(spdf), _rows(opdf)
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "n_docs" in df.columns

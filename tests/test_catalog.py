"""Catalog integrity + driver-contract smoke."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from airflow_embeddings_pipeline_spark.plans import get_catalog


def test_catalog_nonempty_and_consistent():
    cat = get_catalog()
    assert len(cat) >= 30
    for name, q in cat.items():
        assert q.name == name
        assert callable(q.build)
        assert q.doc


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "source",
        "lang",
        "n_refs",
        "sum_chars",
        "min_display_name_id",
        "latest_doc_id",
    ]


def test_queries_oracle_keys_align():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    # every oracle is plain SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


@pytest.mark.parametrize("name", ["q1_pricing_summary", "w_latest_per_key", "x_fingerprint"])
def test_spot_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert len(df.take(5)) > 0


def test_engine_facade(spark, sf_dir):
    from airflow_embeddings_pipeline_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    assert "documents" in eng.tables()
    n_sql = eng.sql("SELECT count(*) AS n FROM documents").collect()[0]["n"]
    assert n_sql == eng.table("documents").count() > 0
    assert eng.query("a_distinct_sources").count() > 0
    assert "flagship_merge_pipeline" in eng.catalog()


def test_every_oracle_parses_in_duckdb():
    """Syntax-check every oracle against DuckDB (PREPARE over empty
    views, no execution): a typo in an oracle string should fail here,
    not in the driver's correctness gate."""
    import duckdb

    con = duckdb.connect()
    tables = {
        "region": "r_regionkey BIGINT, r_name VARCHAR, r_comment VARCHAR",
        "nation": "n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT, n_comment VARCHAR",
        "customer": (
            "c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR, c_nationkey BIGINT,"
            " c_phone VARCHAR, c_acctbal DOUBLE, c_mktsegment VARCHAR, c_comment VARCHAR"
        ),
        "supplier": (
            "s_suppkey BIGINT, s_name VARCHAR, s_address VARCHAR, s_nationkey BIGINT,"
            " s_phone VARCHAR, s_acctbal DOUBLE, s_comment VARCHAR"
        ),
        "part": (
            "p_partkey BIGINT, p_name VARCHAR, p_mfgr VARCHAR, p_brand VARCHAR,"
            " p_type VARCHAR, p_size INT, p_container VARCHAR, p_retailprice DOUBLE,"
            " p_comment VARCHAR"
        ),
        "orders": (
            "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR,"
            " o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority VARCHAR,"
            " o_clerk VARCHAR, o_shippriority INT, o_comment VARCHAR"
        ),
        "lineitem": (
            "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,"
            " l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,"
            " l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR,"
            " l_linestatus VARCHAR, l_shipdate DATE, l_commitdate DATE,"
            " l_receiptdate DATE, l_shipinstruct VARCHAR, l_shipmode VARCHAR,"
            " l_comment VARCHAR"
        ),
        "events": (
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR,"
            " value DOUBLE, props VARCHAR"
        ),
        "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INT",
    }
    for t, cols in tables.items():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM (SELECT {cols_to_nulls(cols)}) WHERE FALSE")

    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e).splitlines()[0]
    assert not bad, f"oracles failed DuckDB syntax check: {bad}"


def cols_to_nulls(cols: str) -> str:
    """'a BIGINT, b VARCHAR' → 'CAST(NULL AS BIGINT) AS a, ...'"""
    parts = []
    for spec in cols.split(","):
        name, typ = spec.strip().split(" ", 1)
        parts.append(f"CAST(NULL AS {typ}) AS {name}")
    return ", ".join(parts)

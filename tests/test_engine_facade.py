"""Engine facade: the switch-over surface a reference user would drive."""

from __future__ import annotations

from scylladb_redpanda_cdc_spark.engine import Engine


def test_engine_sql_and_query_agree(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    assert n_sql == eng.table("orders").count() > 0


def test_engine_materialize_changelog(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    log = eng.changelog()
    state = eng.materialize(log)
    # state keys = inserted orders minus deleted ones; no key appears twice
    assert state.count() == state.select("customer_id", "order_id").distinct().count()
    assert state.filter("op = 'd'").count() == 0


def test_engine_runs_registry_query(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    assert "flagship_cdc_materialize" in eng.query_ids()
    assert eng.query("b1_scan_project").columns == [
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
    ]


def test_engine_schema_from_cql():
    from scylladb_redpanda_cdc_spark.engine import Engine
    from scylladb_redpanda_cdc_spark.sources.cql_ddl import REFERENCE_ORDERS_DDL

    pt, schema = Engine.schema_from_cql(REFERENCE_ORDERS_DDL)
    assert pt.table == "orders"
    assert [f.name for f in schema.fields] == [
        "customer_id", "order_id", "product",
    ]

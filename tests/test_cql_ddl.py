"""Unit tests for the CQL DDL bridge (sources/cql_ddl.py, A26)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from scylladb_redpanda_cdc_spark.sources.cql_ddl import (
    REFERENCE_ORDERS_DDL,
    parse_create_table,
)


def test_reference_orders_ddl_parses_exactly():
    pt = parse_create_table(REFERENCE_ORDERS_DDL)
    assert pt.table == "orders"
    assert pt.columns == (
        ("customer_id", "int"),
        ("order_id", "int"),
        ("product", "text"),
    )
    assert pt.partition_key == ("customer_id",)
    assert pt.clustering_key == ("order_id",)
    assert pt.options["cdc"] == "{'enabled': true}"
    schema = pt.spark_schema()
    assert schema["customer_id"].dataType == T.IntegerType()
    assert not schema["customer_id"].nullable
    assert not schema["order_id"].nullable
    assert schema["product"].nullable


def test_composite_partition_key_and_wide_types():
    pt = parse_create_table(
        """CREATE TABLE ks.wide(
            a bigint, b text, c timestamp, d double, e boolean,
            f blob, g uuid, h date, i decimal,
            PRIMARY KEY((a, b), c, d)) WITH cdc = {'enabled': true}
               AND comment = 'x'"""
    )
    assert pt.table == "wide"
    assert pt.partition_key == ("a", "b")
    assert pt.clustering_key == ("c", "d")
    schema = pt.spark_schema()
    assert schema["c"].dataType == T.TimestampType()
    assert schema["f"].dataType == T.BinaryType()
    assert [schema[k].nullable for k in ("a", "b", "c", "d")] == [False] * 4
    assert schema["e"].nullable
    assert pt.options["comment"] == "'x'"


def test_inline_primary_key():
    pt = parse_create_table("CREATE TABLE t(id int PRIMARY KEY, v text)")
    assert pt.partition_key == ("id",)
    assert pt.clustering_key == ()
    assert pt.pk_role("id") == "partition"
    assert pt.pk_role("v") == "regular"


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE orders",
        "CREATE TABLE t(id frozen<list<int>>, PRIMARY KEY(id))",
        "CREATE TABLE t(id int, PRIMARY KEY(missing))",
    ],
)
def test_unsupported_constructs_raise(bad):
    with pytest.raises(ValueError):
        parse_create_table(bad)
